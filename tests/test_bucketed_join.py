"""Bucketed co-located join: pre-bucketing both sides of a recurring
join key eliminates the shuffle entirely — the physical plan contains
no Exchange. This is the 100 TB strategy for the engine's standing
joins (manifest↔state on doc_id, chunks↔chunks on document_id): pay
one bucketed write, then every subsequent join is shuffle-free.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    for name, df, key in (("b_orders", orders, "o_orderkey"), ("b_lineitem", li, "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


class TestBucketedJoin:
    def test_join_has_no_exchange(self, spark, bucketed_tables):
        # force the shuffle-join path (at test SF Catalyst would just
        # broadcast; at 100 TB neither side broadcasts)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = (
                spark.table("b_orders")
                .join(
                    spark.table("b_lineitem"),
                    F.col("o_orderkey") == F.col("l_orderkey"),
                )
                .groupBy("o_orderstatus")
                .agg(F.count("*").alias("n"))
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        # the join itself must not shuffle; the only exchange allowed is
        # the post-join single-column aggregation
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in join_part

    def test_bucketed_results_match_plain(self, spark, bucketed_tables):
        sf = "/root/testdata/sf0.001"
        plain = (
            spark.read.parquet(f"{sf}/orders.parquet")
            .join(
                spark.read.parquet(f"{sf}/lineitem.parquet"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        bucketed = (
            spark.table("b_orders")
            .join(
                spark.table("b_lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, bucketed.collect())
        )
