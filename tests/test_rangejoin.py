"""Range join boundary semantics: inclusive lo, exclusive hi,
bucket-spanning ranges, left-join nulls."""

from lovdata_pipeline_spark.operators.rangejoin import range_join


def _data(spark):
    facts = spark.createDataFrame(
        [(1, 0.0), (2, 9.99), (3, 10.0), (4, 149.99), (5, 150.0), (6, 999.0)],
        "id long, value double",
    )
    ranges = spark.createDataFrame(
        [(0.0, 10.0, "a"), (10.0, 150.0, "b")], "lo double, hi double, band string"
    )
    return facts, ranges


class TestRangeJoin:
    def test_boundaries_and_spanning(self, spark):
        facts, ranges = _data(spark)
        out = {
            r.id: r.band
            for r in range_join(facts, ranges, "value", bucket_width=50.0).collect()
        }
        assert out[1] == "a"  # v == lo inclusive
        assert out[2] == "a"
        assert out[3] == "b"  # v == hi of a → falls into next band
        assert out[4] == "b"  # range b spans buckets 0..2
        assert 5 not in out  # v == hi exclusive
        assert 6 not in out  # beyond all ranges

    def test_left_join_keeps_unmatched(self, spark):
        facts, ranges = _data(spark)
        rows = {r.id: r for r in range_join(facts, ranges, "value", bucket_width=50.0, how="left").collect()}
        assert len(rows) == 6
        assert rows[6].band is None and rows[6].lo is None
        assert rows[4].band == "b"

    def test_tiny_bucket_width_same_result(self, spark):
        facts, ranges = _data(spark)
        a = sorted(
            (r.id, r.band)
            for r in range_join(facts, ranges, "value", bucket_width=50.0).collect()
        )
        b = sorted(
            (r.id, r.band)
            for r in range_join(facts, ranges, "value", bucket_width=3.0).collect()
        )
        assert a == b  # bucket width is a perf knob, never a semantics knob
