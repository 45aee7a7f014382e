"""As-of (point-in-time) join — a custom operator Spark lacks natively.

``asof_join(left, right, on, left_time, right_time)``: for every left
row, the single right row with the greatest ``right_time`` ≤
``left_time`` within the same key group. The classic composition on
DataFrame ops (no pandas, no cross join):

  union both sides with a side marker → one shuffle, sorted within
  (key, time) → ``last(right-cols, ignorenulls)`` over the window
  (key ORDER BY time, side) carries the most recent right row forward
  onto each left row.

One shuffle on the join key, linear scan within partitions — the same
cost profile as a sort-merge join, so it scales like any co-sorted
merge. Equivalent to DuckDB's ``ASOF JOIN`` (the oracle used in
tests/driver checks) and pandas ``merge_asof``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row + latest right row at-or-before it.

    ``right_cols``: right columns to carry (default all except key/time).
    Carried columns are suffixed. Right rows at exactly left_time match
    (≤ semantics, like ASOF JOIN's default).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_time)]

    # Order-key dtype (r10 review): when both time columns share a dtype,
    # compare them NATIVELY — the old unconditional cast("double") loses
    # precision above 2^53, so int64 nanosecond epochs (~1.7e18, ~512 ns
    # double granularity) could collapse distinct times or flip the ≤
    # boundary. Mixed integral dtypes widen to long (exact); only a
    # genuinely mixed numeric/timestamp pair falls back to double, where
    # the caller should pre-align the types.
    lt, rt = dict(left.dtypes)[left_time], dict(right.dtypes)[right_time]
    _integral = {"tinyint", "smallint", "int", "bigint"}
    if lt == rt == "string":
        # String time columns (r10 ADVICE + r11 review): a bare native
        # compare orders unpadded NUMERIC strings wrong ("10" < "9"),
        # while an unconditional cast("double") NULLs out non-numeric
        # strings (ISO dates!) and silently degrades the join. Layered
        # key instead: numeric-parseable strings order numerically and
        # sort BEFORE non-parseable ones; non-parseable (e.g. ISO-8601)
        # order lexicographically — which IS chronological for a
        # consistently-formatted column. Mixed parseability within one
        # column has no right answer; the order is then at least
        # deterministic and documented. NULL originals stay NULL
        # (whole-struct NULL sorts first → no match), preserving the
        # NULL-time semantics below.
        def _key(c):
            # try_cast, not cast: ANSI mode (Spark 4 default) makes
            # cast RAISE on non-numeric strings. DECIMAL(38,18), not
            # double: double ties distinct int64-nanosecond epochs
            # (ULP at 1.7e18 is 256 — a right row 1 ns in the future
            # would tie and match); decimal keeps 20 integer digits
            # exact AND equates different spellings of the same number
            # ("10" vs "10.0"). The raw string rides in the struct
            # ONLY for non-parseable values: an unconditional third
            # field would re-order those equal spellings and silently
            # break the <= boundary — the right row at exactly-equal
            # time must tie here so _side decides (r11 review,
            # confirmed live).
            #
            # Stated bounds of DECIMAL(38,18) (r11 ADVICE): numeric
            # strings with MORE THAN 20 integer digits overflow
            # try_cast to NULL and silently fall into the
            # lexicographic (non-parseable) class — int64 epochs in
            # any unit (<= 19 digits) and every realistic numeric
            # timestamp fit, but a column of 21+-digit numerics would
            # order as strings. Strings differing only BEYOND 18
            # fractional digits round to the same decimal and tie
            # (then _side decides, i.e. they match as simultaneous) —
            # sub-attosecond text precision is not distinguished.
            d = F.col(c).try_cast("decimal(38,18)")
            return F.when(
                F.col(c).isNotNull(),
                F.struct(
                    d.isNull().cast("int").alias("nn"),
                    d.alias("d"),
                    F.when(d.isNull(), F.col(c)).alias("s"),
                ),
            )
    elif lt == rt:
        _key = lambda c: F.col(c)
    elif lt in _integral and rt in _integral:
        _key = lambda c: F.col(c).cast("long")
    else:
        _key = lambda c: F.col(c).cast("double")

    lhs = left.withColumn("_t", _key(left_time)).withColumn("_side", F.lit(1))
    # The whole right row rides as ONE struct: last(_r, ignorenulls) then
    # picks atomically, so a NULL inside a carried column can never be
    # back-filled from an older right row (which would synthesize a row
    # that never existed).
    # NULL right_time rows are excluded: NULLS FIRST ascending would sort
    # them before every real row and last(ignorenulls) would carry them
    # as "matches" ASOF semantics exclude (DuckDB ASOF JOIN and pandas
    # merge_asof both produce no match — r10 review).
    rhs = (
        right.filter(F.col(right_time).isNotNull())
        .withColumn("_t", _key(right_time))
        .withColumn("_side", F.lit(0))
        .select(
            F.col(on),
            "_t",
            "_side",
            F.struct(
                F.col(right_time).alias(f"{right_time}{suffix}"),
                *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
            ).alias("_r"),
        )
    )
    lhs_aligned = lhs.select(
        *left.columns,
        "_t",
        "_side",
        F.lit(None).cast(rhs.schema["_r"].dataType).alias("_r"),
    )
    rhs_aligned = rhs.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c) if c != on else F.col(on)
            for c in left.columns
        ],
        "_t",
        "_side",
        "_r",
    )
    unioned = lhs_aligned.unionByName(rhs_aligned)

    # Right rows sort before left rows at equal time (side 0 < 1), so a
    # right row at exactly left_time is visible to the left row — ≤
    # semantics. "_r" is the deterministic tiebreak for equal-time right
    # rows (struct comparison; the greatest full row wins) — without it
    # the carried row depended on partition-internal sort stability and
    # could differ across runs (r10 review). When the struct is not
    # orderable (a carried column contains a MapType), struct comparison
    # would raise AnalysisException, so fall back to ordering by its
    # JSON rendering — still a deterministic function of the row bytes
    # (r10 ADVICE).
    def _orderable(dt) -> bool:
        from pyspark.sql import types as T

        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        if isinstance(dt, T.ArrayType):
            return _orderable(dt.elementType)
        return True

    _tb = F.col("_r") if _orderable(rhs.schema["_r"].dataType) else F.to_json("_r")
    w = (
        Window.partitionBy(on)
        .orderBy("_t", "_side", _tb)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *left.columns,
        "_side",
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    carried = [f"{right_time}{suffix}"] + [f"{c}{suffix}" for c in right_cols]
    return (
        filled.filter(F.col("_side") == 1)
        .select(*left.columns, *[F.col(f"_r.{c}").alias(c) for c in carried])
    )
