"""lovdata_pipeline_spark — a PySpark-native analytics / ETL engine.

Brand-new engine with the query and data-processing capabilities of the
reference pipeline (martgra/lovdata-pipeline): incremental document ETL
(scan → parse → hierarchical chunk → token-count → merge/split → embed →
upsert), plus the large-scale training-data operators a 100 TB corpus
pipeline needs (dedup families, similarity search, text analytics).

Design stance (SURVEY.md §7): DataFrame/SQL-first so Catalyst handles
pushdown, pruning and join strategy; pandas UDFs only for genuinely
imperative per-document logic (XML chunking, tokenization, embedding).
"""

__version__ = "0.1.0"
