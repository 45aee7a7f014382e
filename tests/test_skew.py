"""Salted join equivalence with plain joins under heavy key skew."""

from pyspark.sql import functions as F

from lovdata_pipeline_spark.operators.skew import salted_join, skew_report


def _skewed(spark):
    # 90% of big rows share key 1
    big = spark.range(1000).select(
        F.when(F.col("id") < 900, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(1, "hot"), (950, "cold"), (999, "cold2")], "k long, label string"
    )
    return big, small


class TestSaltedJoin:
    def test_inner_equals_plain(self, spark):
        big, small = _skewed(spark)
        plain = sorted(map(tuple, big.join(small, "k").collect()))
        salted = sorted(map(tuple, salted_join(big, small, "k", buckets=8).collect()))
        assert salted == plain
        assert len(plain) == 902  # 900 hot + 2 cold

    def test_left_equals_plain(self, spark):
        big, small = _skewed(spark)
        plain = sorted(map(tuple, big.join(small, "k", "left").collect()), key=repr)
        salted = sorted(
            map(tuple, salted_join(big, small, "k", buckets=8, how="left").collect()),
            key=repr,
        )
        assert salted == plain

    def test_skew_report_finds_hot_key(self, spark):
        big, _ = _skewed(spark)
        top = skew_report(big, ["k"], top_n=1).first()
        assert top.k == 1 and top.n == 900 and top.share == 0.9
