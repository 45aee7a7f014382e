"""JSONL chunk-store format + inter-format migration (ops 24, 33).

The reference's JSONL store writes one file per source hash with one
JSON object per line (reference: infrastructure/jsonl_vector_store.py:19-80)
and flattens ``cross_refs`` to a comma-joined string for its ChromaDB
metadata sibling (domain/models.py:101-132, split back on migration
cli.py:256-263). Here: Spark's native json source with an explicit
schema (validation-on-read, PERMISSIVE — bad lines become nulls rather
than failures, mirroring jsonl_vector_store.py:214-226), and migration
as a single read → transform → write job, trivially parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from lovdata_pipeline_spark.schemas import ENRICHED_CHUNKS_SCHEMA

# The flattened (ChromaDB-style) variant: arrays as delimited strings.
# The shape flatten_metadata produces / unflatten_metadata consumes —
# exported for callers reading pre-flattened JSONL with an explicit
# schema (nothing in-repo reads flattened files today).
FLAT_CHUNKS_SCHEMA = T.StructType(
    [
        f
        if f.name not in ("cross_refs", "chapter_path", "merged_with", "embedding")
        else T.StructField(
            f.name,
            T.StringType() if f.name != "embedding" else T.ArrayType(T.FloatType()),
            True,
        )
        for f in ENRICHED_CHUNKS_SCHEMA.fields
    ]
)


def write_jsonl(chunks: DataFrame, path: str) -> None:
    """Export chunks as JSONL partitioned by source_hash (the reference's
    physical layout — one directory per document hash instead of one
    file, avoiding its rewrite-whole-file upsert)."""
    chunks.write.mode("overwrite").partitionBy("source_hash").json(path)


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Validated read: declared schema + PERMISSIVE with corrupt-record
    capture; invalid lines surface as rows with null chunk_id (callers
    filter), not job failures."""
    schema = T.StructType(list(ENRICHED_CHUNKS_SCHEMA.fields)).add(
        "_corrupt_record", T.StringType()
    )
    df = spark.read.schema(schema).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    ).json(path)
    return df


def flatten_metadata(chunks: DataFrame) -> DataFrame:
    """Array → primitive flattening (the ChromaDB constraint, op 33):
    cross_refs/chapter_path/merged_with become comma-joined strings."""
    return (
        chunks.withColumn("cross_refs", F.array_join("cross_refs", ","))
        .withColumn("chapter_path", F.array_join("chapter_path", "|"))
        .withColumn("merged_with", F.array_join("merged_with", ","))
    )


def unflatten_metadata(flat: DataFrame) -> DataFrame:
    """Inverse transform; empty strings round-trip to empty arrays
    (reference filters empties on split, cli.py:259-261)."""

    def split_nonempty(col, sep):
        return F.when(
            F.col(col).isNull() | (F.col(col) == ""), F.array().cast("array<string>")
        ).otherwise(F.split(F.col(col), sep))

    return (
        flat.withColumn("cross_refs", split_nonempty("cross_refs", ","))
        .withColumn("chapter_path", split_nonempty("chapter_path", r"\|"))
        .withColumn("merged_with", split_nonempty("merged_with", ","))
    )


def migrate(source: DataFrame, writer, flatten: bool = False) -> int:
    """Generic migration (op 33): source → optional ``flatten_metadata``
    → write via ``writer(df)``. Returns migrated row count. (For the
    inverse direction, pre-apply ``unflatten_metadata`` to ``source`` —
    this helper only ever flattens.) The ``lg migrate`` CLI routes
    through here — one implementation, not a CLI re-spelling (r10
    review)."""
    df = flatten_metadata(source) if flatten else source
    n = df.count()
    writer(df)
    return n
