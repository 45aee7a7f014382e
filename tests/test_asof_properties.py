"""Property pin for the asof STRING-time layered key's mixed-
parseability edge (r12 VERDICT Next #6): when one string column mixes
numeric spellings, ISO-8601 timestamps, 21+-digit decimal-overflow
numerics, and >18-fraction near-ties, there is no single "right"
chronological order — ``operators/asof.py:51-96`` documents the chosen
one (decimal-parseable first in numeric order, then non-parseable
lexicographically). These tests pin that the chosen order is

1. DETERMINISTIC and PARTITION-INDEPENDENT: the same inputs produce
   the same matches regardless of row order, partition count, or
   shuffle layout (Hypothesis draws random class mixes), and
2. the documented CLASS ORDER itself, on fixed fixtures (numeric
   before non-parseable; "10" vs "10.0" equate; 21+-digit overflow
   strings fall into the lexicographic class; >18-fraction spellings
   tie and match as simultaneous).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)

# the four parseability classes the asof docstring names, in one pool —
# small domains guarantee cross-class collisions and exact ties
_TIMES = st.sampled_from(
    [
        "9", "10", "10.0", "007", "-3", "2.5",  # numeric spellings
        "2024-01-02T03:04:05", "2024-01-02T03:04:06",  # ISO-8601
        "123456789012345678901",  # 21 integer digits -> decimal overflow
        "999999999999999999999999",  # 24 digits -> overflow
        "1.0000000000000000001", "1.0000000000000000002",  # >18-frac tie
        "1.000000000000000000",  # the exact 18-frac spelling they tie with
    ]
)
_ROWS = st.lists(
    st.tuples(st.integers(min_value=1, max_value=2), _TIMES),
    min_size=1,
    max_size=8,
)


def _run(spark, lefts, rights, lparts, rparts, shuffle_seed):
    from lovdata_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)], "k int, lt string, lid int"
    )
    right = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(rights)], "k int, rt string, rid int"
    )
    if shuffle_seed:
        # permute physical row order AND partition layout
        left = left.orderBy(F.xxhash64(F.col("lid") + shuffle_seed))
        right = right.orderBy(F.xxhash64(F.col("rid") + shuffle_seed))
    left = left.repartition(lparts)
    right = right.repartition(rparts)
    out = asof_join(left, right, on="k", left_time="lt", right_time="rt")
    return sorted(
        (r["k"], r["lt"], r["lid"], r["rt_asof"], r["rid_asof"])
        for r in out.collect()
    )


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(lefts=_ROWS, rights=_ROWS)
@pytest.mark.slow_ladder
def test_mixed_parseability_is_partition_independent(spark, lefts, rights):
    """Same draw, three different physical layouts (1-partition
    ordered, 7-partition, 5-partition shuffled) — byte-identical
    matches. A nondeterministic layered key would flip which right row
    ties-and-carries under different partition-internal sort orders."""
    a = _run(spark, lefts, rights, 1, 1, 0)
    b = _run(spark, lefts, rights, 7, 3, 0)
    c = _run(spark, lefts, rights, 5, 5, 17)
    assert a == b == c


class TestDocumentedClassOrder:
    def _asof(self, spark, lt, rts):
        from lovdata_pipeline_spark.operators.asof import asof_join

        left = spark.createDataFrame([(1, lt)], "k int, lt string")
        right = spark.createDataFrame(
            [(1, t, i) for i, t in enumerate(rts)], "k int, rt string, rid int"
        )
        [row] = asof_join(left, right, on="k", left_time="lt", right_time="rt").collect()
        return row["rt_asof"]

    def test_numeric_strings_order_numerically(self, spark):
        # "9" < "10" numerically (lexicographic would invert); left at
        # "10" must match "9", not miss it
        assert self._asof(spark, "10", ["9", "11"]) == "9"

    def test_equal_spellings_equate_and_match(self, spark):
        # "10.0" parses to the same decimal as "10" -> ties as
        # simultaneous -> matches (<= semantics)
        assert self._asof(spark, "10", ["10.0"]) == "10.0"

    def test_parseable_sorts_before_non_parseable(self, spark):
        # ISO strings are non-parseable -> class 1: every numeric sorts
        # before them, so an ISO left matches the greatest ISO <= it,
        # and a numeric left never matches an ISO right
        assert (
            self._asof(spark, "2024-01-02T03:04:06", ["2024-01-02T03:04:05", "99999"])
            == "2024-01-02T03:04:05"
        )
        assert self._asof(spark, "5", ["2024-01-02T03:04:05"]) is None

    def test_overflow_digits_fall_into_lexicographic_class(self, spark):
        # 21+ integer digits overflow decimal(38,18) -> documented to
        # order as strings alongside ISO values (asof.py:78-87)
        t21 = "123456789012345678901"
        assert self._asof(spark, t21, ["9"]) == "9"  # numerics still precede
        # lexicographic within the class: "1234..." < "2024-..."
        assert self._asof(spark, "2024-01-02T03:04:05", [t21]) == t21

    def test_beyond_18_fraction_spellings_tie(self, spark):
        # differ only at the 19th fractional digit -> same decimal ->
        # simultaneous -> the <= boundary matches (asof.py:85-87)
        assert (
            self._asof(spark, "1.000000000000000000", ["1.0000000000000000001"])
            == "1.0000000000000000001"
        )
