"""Optional ChromaDB sink (op 25; reference:
infrastructure/chroma_vector_store.py:22-39).

chromadb is not installed in this container, so the sink is gated behind
an import-try: the partition-writer shape (connection per partition,
batched upserts, flattened metadata) is real; only the client import is
environment-dependent. The JSONL/parquet stores are the engine's
first-class sinks — this exists for drop-in parity with the reference's
storage option.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from lovdata_pipeline_spark.sources.jsonl import flatten_metadata


def write_to_chroma(
    chunks: DataFrame,
    persist_dir: str,
    collection_name: str = "chunks",
    batch_size: int = 1000,
) -> None:
    """Upsert chunks into an embedded Chroma collection, one client per
    partition (foreachPartition — the executor-side connection pattern
    for any non-Spark-native sink)."""
    flat = flatten_metadata(chunks).select(
        "chunk_id",
        "document_id",
        "dataset_name",
        "content",
        "token_count",
        "section_heading",
        "absolute_address",
        "split_reason",
        "source_hash",
        "cross_refs",
        "embedding",
    )

    def write_partition(rows) -> None:
        try:
            import chromadb
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "chromadb is not installed in this environment; install it or "
                "use the JSONL/parquet stores"
            ) from exc

        client = chromadb.PersistentClient(path=persist_dir)
        collection = client.get_or_create_collection(collection_name)
        batch: list = []
        for row in rows:
            batch.append(row)
            if len(batch) >= batch_size:
                _flush(collection, batch)
                batch = []
        if batch:
            _flush(collection, batch)

    def _flush(collection, batch) -> None:
        # fail loud on NULL embeddings: silently upserting [] would hand
        # Chroma mixed-dimensionality vectors — a confusing mid-partition
        # validation error at best, silently degraded search at worst
        # (r10 review). Not-yet-embedded chunks must be filtered or
        # embedded upstream.
        missing = [r.chunk_id for r in batch if not r.embedding]
        if missing:
            raise ValueError(
                f"{len(missing)} chunk(s) reached the Chroma sink without "
                f"an embedding (first: {missing[0]}); embed or filter "
                "them before landing"
            )
        collection.upsert(
            ids=[r.chunk_id for r in batch],
            embeddings=[list(r.embedding) for r in batch],
            documents=[r.content for r in batch],
            metadatas=[
                {
                    "document_id": r.document_id,
                    "dataset_name": r.dataset_name or "",
                    "token_count": int(r.token_count or 0),
                    "section_heading": r.section_heading or "",
                    "absolute_address": r.absolute_address or "",
                    "split_reason": r.split_reason or "none",
                    "source_hash": r.source_hash or "",
                    "cross_refs": r.cross_refs or "",
                }
                for r in batch
            ],
        )

    flat.foreachPartition(write_partition)
