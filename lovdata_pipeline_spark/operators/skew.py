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
