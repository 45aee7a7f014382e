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

Two consumers of the same prefix sum:
  * ``pack_into_shards``     — whole documents → fixed token-budget shards;
  * ``pack_token_sequences`` — token-level fixed-length training sequences
    crossing document boundaries (the "concatenate the corpus, cut every
    seq_len tokens" pretraining step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def global_token_offsets(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, n_tokens, tok_start): tok_start = sum of ``token_col`` over
    all rows with smaller ``id_col`` — the distributed prefix sum
    described in the module docstring.

    The returned frame is CACHED and eagerly materialized: the cache is
    load-bearing, not an optimization — it pins the offsets computed
    against the (sampling-dependent) range partitioning before
    ``with_pid`` is released, so later actions can never recompute
    against a re-drawn partitioning. The cost is one retained
    (id, n_tokens, tok_start) InMemoryRelation per call: long-lived
    sessions packing many batches should ``.unpersist()`` the result
    (or its derived frame) once consumed — bench and the registry rely
    on the session's cache clearing.
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
            cum_before.cast("long").alias("tok_start"),
        )
    ).cache()
    result.count()
    with_pid.unpersist()
    return result


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
    off = global_token_offsets(df, id_col, token_col, num_partitions)
    return off.select(
        F.col(id_col),
        F.col(token_col),
        F.floor(F.col("tok_start") / F.lit(budget)).cast("long").alias("shard_id"),
    )


def pack_token_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Fixed-length training-sequence assignment: the corpus is one
    virtual token stream in ascending ``id_col`` order, cut every
    ``seq_len`` tokens; each document reports where its tokens land.

    (id, n_tokens, tok_start, seq_start, seq_end, n_seqs, offset_in_seq):
    ``seq_start``/``seq_end`` are the first/last sequence index touched,
    ``n_seqs`` how many sequences the document spans (0 for empty
    documents), ``offset_in_seq`` the position of the document's first
    token within its first sequence. Downstream shuffle-writers group by
    sequence index to emit actual training rows; this operator is the
    distributed bookkeeping that makes that grouping local arithmetic.
    """
    off = global_token_offsets(df, id_col, token_col, num_partitions)
    return _sequence_fields(off, seq_len, id_col, token_col)


def _sequence_fields(
    off: DataFrame, seq_len: int, id_col: str, token_col: str
) -> DataFrame:
    tok_start = F.col("tok_start")
    n_tok = F.col(token_col)
    seq_start = F.floor(tok_start / F.lit(seq_len)).cast("long")
    seq_end = F.floor((tok_start + n_tok - 1) / F.lit(seq_len)).cast("long")
    return off.select(
        F.col(id_col),
        n_tok,
        tok_start,
        seq_start.alias("seq_start"),
        F.when(n_tok > 0, seq_end).otherwise(seq_start).alias("seq_end"),
        F.when(n_tok > 0, seq_end - seq_start + 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_seqs"),
        (tok_start % seq_len).cast("long").alias("offset_in_seq"),
    )


def sequence_manifest(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """One row per TRAINING SEQUENCE: (seq_id, n_docs, n_tokens_filled,
    first_doc, last_doc) — the writer-side view of sequence packing:
    grouping by seq_id is exactly the shuffle a sequence emitter runs,
    and the manifest is what a data loader reads to locate documents.

    Per-(doc, sequence) token contribution is pure interval arithmetic
    over the prefix sum — min(doc_end, seq_end) − max(doc_start,
    seq_start), all integers. Every interior sequence reports exactly
    ``seq_len`` filled tokens (only the corpus tail may be short), an
    invariant the tests pin. explode(sequence(...)) fans each doc to
    the sequences it touches — bounded by n_tokens/seq_len + 1 rows per
    doc, so the fan-out carries small ints, never text.
    """
    seqs = pack_token_sequences(df, seq_len, id_col, token_col, num_partitions)
    per = (
        seqs.filter(F.col("n_seqs") > 0)
        .select(
            F.col(id_col),
            F.col("tok_start"),
            F.col(token_col),
            F.explode(F.sequence(F.col("seq_start"), F.col("seq_end"))).alias("seq_id"),
        )
        .withColumn(
            "filled",
            F.least(F.col("tok_start") + F.col(token_col), (F.col("seq_id") + 1) * seq_len)
            - F.greatest(F.col("tok_start"), F.col("seq_id") * seq_len),
        )
    )
    return per.groupBy("seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("filled").alias("n_tokens_filled"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )
