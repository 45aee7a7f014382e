"""Skew mitigation: salted joins and skew diagnosis.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; explicit salting is the structural fix when one join key
dominates so heavily that even split partitions overwhelm an executor —
e.g. a boilerplate shingle shared by 10% of a corpus in the dedup
inverted index.

``salted_join`` replicates the small side ``buckets`` times and spreads
the big side's hot rows across (key, salt) — semantics identical to the
plain join, shuffle skew reduced by ~buckets×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def spread_if_narrow(df: DataFrame) -> DataFrame:
    """INPUT-skew fix (guide §2.5 "one huge unsplittable file"):
    round-robin repartition ONLY when the input has fewer partitions
    than cores. A single-file parquet table arrives as one scan task,
    which serializes every interpreted/codegen-heavy per-row projection
    that runs before the first Exchange (per-token md5 hashing, gram
    explosion, winnowing, surgery splices) — measured 2.5-3× on the
    sf0.1 corpus for gopher-repetition and simhash. A corpus-scale
    table is already many-partitioned, so this is a structural no-op at
    100 TB (the condition, not the call site, carries the scale story);
    round-robin repartition is retry-safe (sort-before-repartition is
    on by default, SPARK-23207).

    Lived in queries.py since r5 applied to three queries; r13 hoists
    it here so the OPERATORS whose first stage is compute-heavy can
    spread their own input instead of relying on each caller to
    remember (the callers that did — curation_report, decontam
    benchmark flags — measured the same serialization this fixes)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def skew_report(df: DataFrame, key_cols: list[str], top_n: int = 10) -> DataFrame:
    """Per-key row counts + share of total: the diagnosis query you run
    before deciding to salt. (key..., n, share)."""
    total = df.count()
    return (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("n"))
        .withColumn("share", F.round(F.col("n") / F.lit(total), 6))
        .orderBy(F.col("n").desc())
        .limit(top_n)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the big side's rows spread over ``buckets`` salt values.

    Big side: deterministic salt from a row hash (no rand() — results
    stay reproducible). Small side: exploded once per salt value, so
    every (key, salt) bucket still finds its match. Output equals
    ``big.join(small, on, how)`` row-for-row.

    Supports inner and left joins (the shapes where the big side drives
    the skew); small-side-preserving joins don't need salting — broadcast
    the small side instead.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    keys = [on] if isinstance(on, str) else list(on)

    salt_src = F.xxhash64(*[F.col(c) for c in big.columns])
    big_salted = big.withColumn("_salt", F.pmod(salt_src, F.lit(buckets)).cast("int"))
    # explode must be top-level in the projection (no cast wrapper)
    small_salted = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return big_salted.join(small_salted, keys + ["_salt"], how).drop("_salt")
