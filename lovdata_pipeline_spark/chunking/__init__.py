"""Hierarchical XML chunking (the reference's core dataflow operator)."""

from lovdata_pipeline_spark.chunking.chunker import RawChunk, chunk_document
from lovdata_pipeline_spark.chunking.spark import chunk_documents_df

__all__ = ["RawChunk", "chunk_document", "chunk_documents_df"]
