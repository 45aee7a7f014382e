"""Training-shard packing: assign documents to fixed token-budget shards
in a stable global order — the "pack the corpus into ~N-token training
shards" step of an LLM data pipeline.

The core is a DISTRIBUTED PREFIX SUM (the textbook two-phase scan): a
single global window (``Window.orderBy(id)`` with no partition key) would
funnel the whole corpus through one task, the classic scale cliff. Here:

  phase 1  repartitionByRange(id)  → per-partition token subtotals
           (one row per partition, k rows collected to the driver);
  phase 2  driver prefix-sums the k subtotals into partition offsets
           (a k-element loop), broadcasts them back, and a
           partition-LOCAL window (partitionBy spark_partition_id)
           computes the within-partition running sum.

global running total = partition offset + local running sum. Every step
is JVM-side; the only driver materialization is k subtotal rows. The
assignment is independent of the partition count (pinned by
``test_pack_into_shards_partition_independent``) because prefix sums are
a function of the global id order only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_into_shards(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, n_tokens, shard_id): shard_id = floor(tokens-before-this-doc /
    budget) in ascending ``id_col`` order — documents stream into a shard
    until the budget is crossed, then the next shard starts.

    ``num_partitions`` sizes the range partitioning (default: session
    shuffle partitions). Output values are partition-count-independent.
    """
    parts = df.select(id_col, token_col)
    ranged = (
        parts.repartitionByRange(num_partitions, F.col(id_col))
        if num_partitions is not None
        else parts.repartitionByRange(F.col(id_col))
    )
    # PIN the range partitioning before anything reads it. Each action
    # re-plans the physical Exchange, and RangePartitioner boundaries come
    # from reservoir sampling (plus AQE coalescing with no explicit
    # partition count) — two executions can legally disagree once upstream
    # exceeds the sample size. Persisting makes the first physical plan an
    # InMemoryRelation both phases (and any cache-miss recomputation) read,
    # so _pid is one consistent assignment; it also keeps the corpus scan
    # single-pass. Released before return, same cache+count discipline as
    # ngram_jaccard_pairs.
    with_pid = ranged.withColumn("_pid", F.spark_partition_id()).persist()
    with_pid.count()

    # phase 1: k subtotal rows — the ONLY driver materialization.
    # range partitioner maps ascending id ranges to ascending partition
    # ids, so prefix-summing subtotals in _pid order gives each
    # partition the total token mass of all ids before its range.
    subtotals = {
        int(r["_pid"]): int(r["t"])
        for r in with_pid.groupBy("_pid").agg(F.sum(token_col).alias("t")).collect()
    }
    offsets, running = {}, 0
    for pid in sorted(subtotals):
        offsets[pid] = running
        running += subtotals[pid]

    spark = df.sparkSession
    offset_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
    )

    # phase 2: partition-local running sum (window keyed by _pid never
    # crosses partitions → no single-task funnel), plus the offset.
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(local_w), F.lit(0)) + F.col("_offset")
    result = (
        with_pid.join(F.broadcast(offset_df), "_pid")
        .select(
            F.col(id_col),
            F.col(token_col),
            F.floor(cum_before / F.lit(budget)).cast("long").alias("shard_id"),
        )
    ).cache()
    result.count()
    with_pid.unpersist()
    return result
