"""Range join — interval-predicate join without a nested loop.

A naive ``facts JOIN ranges ON lo <= v AND v < hi`` compiles to a
BroadcastNestedLoopJoin (every fact row probed against every range).
Fine for a handful of ranges; quadratic disaster at scale. The
bucket-expansion rewrite turns it into an equi-join:

  * each range [lo, hi) explodes into the integer buckets it overlaps
    (bucket width chosen ~ median range width);
  * each fact row computes its single bucket;
  * equi-join on bucket (hash join, shuffle on bucket), then re-check
    the exact predicate to discard same-bucket non-overlaps.

Shuffle volume ∝ facts + Σ(range width / bucket width) — linear, and the
hot path is a plain broadcast/shuffled hash join Catalyst already
optimizes. Same trick generalizes to interval-overlap joins (explode
both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 50.0,
    how: str = "inner",
) -> DataFrame:
    """Join fact rows to every range with lo ≤ value < hi.

    ``how='inner'`` drops unmatched facts; ``'left'`` keeps them with
    null range columns (implemented as inner ∪ anti to keep the
    equi-join shape).
    """
    w = float(bucket_width)
    expanded = ranges.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                # hi is exclusive: a range ending exactly on a bucket edge
                # does not reach into the next bucket
                F.floor(
                    (F.col(hi_col) - F.lit(1e-9)) / w
                ).cast("long"),
            )
        ),
    )
    bucketed = facts.withColumn("_bucket", F.floor(F.col(value_col) / w).cast("long"))
    matched = (
        bucketed.join(F.broadcast(expanded), "_bucket")
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("_bucket")
    )
    if how == "inner":
        return matched
    if how == "left":
        unmatched = bucketed.join(
            F.broadcast(expanded),
            (bucketed["_bucket"] == expanded["_bucket"])
            & (bucketed[value_col] >= expanded[lo_col])
            & (bucketed[value_col] < expanded[hi_col]),
            "left_anti",
        ).drop("_bucket")
        for c in ranges.columns:
            unmatched = unmatched.withColumn(c, F.lit(None).cast(ranges.schema[c].dataType))
        return matched.unionByName(unmatched)
    raise ValueError(f"unsupported how={how!r}")
