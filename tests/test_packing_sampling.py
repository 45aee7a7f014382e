"""LLM-curation operators: shard packing, stratified sampling,
repetition signals, PII scan. Oracle parity is covered by the
auto-parametrized test_queries_oracle; these pin the distributed-
correctness and determinism properties the oracles can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from lovdata_pipeline_spark.operators import textstats
from lovdata_pipeline_spark.operators.packing import (
    emit_token_sequences,
    pack_into_shards,
    pack_token_sequences,
    sequence_manifest,
)
from lovdata_pipeline_spark.operators.sampling import (
    epoch_mix,
    portable_rate_hash,
    stratified_sample,
    temperature_sample,
    temperature_thresholds,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs_with_tokens(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", textstats.token_count_col("text").alias("n_tokens"))
    )


def test_pack_into_shards_partition_independent(spark):
    """The two-phase prefix sum must assign identical shards for any
    range-partition count — 1 (the degenerate single-task case), a
    non-divisor, and more partitions than make sense."""
    docs = _docs_with_tokens(spark)
    base = sorted(map(tuple, pack_into_shards(docs, 512, num_partitions=1).collect()))
    assert base  # non-vacuous
    for n in (3, 8, 64):
        got = sorted(map(tuple, pack_into_shards(docs, 512, num_partitions=n).collect()))
        assert got == base, f"num_partitions={n}"


def test_pack_into_shards_budget_semantics(spark):
    """shard_id must equal floor(tokens-before / budget) in id order —
    checked against a driver-side fold; shards are contiguous in id
    order and every shard's PRE-boundary total stays below budget+max."""
    docs = _docs_with_tokens(spark)
    rows = sorted(
        map(tuple, pack_into_shards(docs, 512, num_partitions=5).collect())
    )
    running = 0
    for doc_id, n_tokens, shard_id in rows:
        assert shard_id == running // 512, doc_id
        running += n_tokens


def test_pack_token_sequences_matches_driver_fold(spark):
    """Sequence assignment must equal a driver-side cumulative fold:
    tok_start is the exact prefix sum, seq indices are the integer cuts,
    and consecutive docs tile the token stream with no gap/overlap."""
    docs = _docs_with_tokens(spark)
    rows = sorted(
        map(tuple, pack_token_sequences(docs, seq_len=64, num_partitions=5).collect())
    )
    expect, cum = [], 0
    for doc_id, n in sorted((r.doc_id, r.n_tokens) for r in docs.collect()):
        if n > 0:
            expect.append(
                (doc_id, n, cum, cum // 64, (cum + n - 1) // 64,
                 (cum + n - 1) // 64 - cum // 64 + 1, cum % 64)
            )
        else:
            expect.append((doc_id, n, cum, cum // 64, cum // 64, 0, cum % 64))
        cum += n
    assert rows == expect


def test_pack_token_sequences_partition_independent(spark):
    docs = _docs_with_tokens(spark)
    base = sorted(
        map(tuple, pack_token_sequences(docs, 128, num_partitions=1).collect())
    )
    assert base
    for n in (3, 64):
        got = sorted(
            map(tuple, pack_token_sequences(docs, 128, num_partitions=n).collect())
        )
        assert got == base, f"num_partitions={n}"


def test_pack_token_sequences_empty_doc(spark):
    """A zero-token row spans no sequences and must not shift later
    offsets; seq_end stays clamped to seq_start (no floor(-1/L) wrap)."""
    df = spark.createDataFrame(
        [(1, 10), (2, 0), (3, 5)], "doc_id long, n_tokens long"
    )
    got = {r.doc_id: r for r in pack_token_sequences(df, seq_len=8).collect()}
    assert (got[2].tok_start, got[2].n_seqs, got[2].seq_start, got[2].seq_end) == (10, 0, 1, 1)
    assert (got[3].tok_start, got[3].seq_start, got[3].seq_end, got[3].n_seqs) == (10, 1, 1, 1)


def test_stratified_sample_deterministic_and_stratified(spark):
    """Same seed → identical rows across invocations and partitionings;
    different seed → a different (decorrelated) selection; unlisted
    strata drop entirely by default."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    rates = {"1-URGENT": 0.5, "5-LOW": 0.05}
    take = lambda df: sorted(r["o_orderkey"] for r in df.select("o_orderkey").collect())
    a = take(stratified_sample(orders, rates, "o_orderpriority", "o_orderkey"))
    b = take(
        stratified_sample(
            orders.repartition(7), rates, "o_orderpriority", "o_orderkey"
        )
    )
    assert a == b and a
    seeded = take(
        stratified_sample(orders, rates, "o_orderpriority", "o_orderkey", seed="v2")
    )
    assert seeded != a
    kept_prios = {
        r["o_orderpriority"]
        for r in stratified_sample(orders, rates, "o_orderpriority", "o_orderkey")
        .select("o_orderpriority")
        .distinct()
        .collect()
    }
    assert kept_prios <= set(rates)


def test_stratified_sample_rates_roughly_hold(spark):
    """The kept fraction per stratum lands near its configured rate
    (md5 is uniform; tolerance generous for the small corpus)."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    rates = {"1-URGENT": 0.5}
    total = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    kept = stratified_sample(orders, rates, "o_orderpriority", "o_orderkey").count()
    assert 0.3 * total <= kept <= 0.7 * total


def test_stratified_sample_integer_boundary(spark):
    """r3 ADVICE: a rate whose float product is inexact (0.07 * 10000 =
    700.0000000000001) must not flip rows hashing exactly to the
    threshold. The decision compares against the driver-fixed INTEGER
    round(rate*DENOM), so a key hashing to exactly 700 is excluded at
    rate 0.07 on every engine — verified against a pure-Python decimal
    replica of the decision."""
    import hashlib

    from lovdata_pipeline_spark.operators.sampling import DENOM

    def h(key: int) -> int:
        return int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16) % DENOM

    boundary = next(k for k in range(100_000) if h(k) == 700)
    keys = [boundary] + [k for k in range(200) if h(k) != 700]
    df = spark.createDataFrame([(k, "s") for k in keys], "key long, stratum string")
    kept = {
        r["key"]
        for r in stratified_sample(df, {"s": 0.07}, "stratum", "key").collect()
    }
    assert boundary not in kept  # 700 < 700 is false — no float fuzz
    assert kept == {k for k in keys if h(k) < 700}  # exact replica agreement


def test_sequence_manifest_invariants(spark):
    """Every interior sequence is exactly seq_len full, the tail holds
    the remainder, filled tokens conserve the corpus total, and doc
    ranges are contiguous across consecutive sequences."""
    docs = _docs_with_tokens(spark)
    total = docs.agg(F.sum("n_tokens")).first()[0]
    rows = sorted(
        (r.seq_id, r.n_docs, r.n_tokens_filled, r.first_doc, r.last_doc)
        for r in sequence_manifest(docs, seq_len=64, num_partitions=7).collect()
    )
    assert [r[0] for r in rows] == list(range(len(rows)))  # dense seq ids
    assert all(r[2] == 64 for r in rows[:-1])
    assert rows[-1][2] == total - 64 * (len(rows) - 1)
    assert sum(r[2] for r in rows) == total
    for prev, nxt in zip(rows, rows[1:]):
        # a sequence boundary either splits a doc (shared id) or falls
        # exactly between two docs (adjacent ids)
        assert nxt[3] in (prev[4], prev[4] + 1)


def test_emit_token_sequences_reconstructs_corpus(spark):
    """The emitter's output, concatenated in seq_id order, must be
    byte-identical to the whitespace-normalized corpus concatenated in
    doc_id order — every token present exactly once, in order."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    rows = sorted(
        (r.seq_id, r.n_docs, r.n_tokens_filled, r.seq_text)
        for r in emit_token_sequences(docs, seq_len=64, num_partitions=5).collect()
    )
    assert [r[0] for r in rows] == list(range(len(rows)))  # dense seq ids
    assert all(r[2] == 64 for r in rows[:-1])  # interior sequences full
    assert all(len(r[3].split(" ")) == r[2] for r in rows)  # text agrees with count
    expected = " ".join(
        " ".join(r.text.split())
        for r in docs.orderBy("doc_id").collect()
        if r.text is not None and r.text.strip()
    )
    assert " ".join(r[3] for r in rows) == expected


def test_emit_token_sequences_matches_manifest(spark):
    """Emitter bookkeeping columns must agree with sequence_manifest
    computed independently from the same corpus."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    counts = docs.select("doc_id", textstats.token_count_col("text").alias("n_tokens"))
    man = {
        r.seq_id: (r.n_docs, r.n_tokens_filled)
        for r in sequence_manifest(counts, seq_len=64).collect()
    }
    emit = {
        r.seq_id: (r.n_docs, r.n_tokens_filled)
        for r in emit_token_sequences(docs, seq_len=64).collect()
    }
    assert emit == man


def test_emit_token_sequences_handles_empty_and_null_docs(spark):
    """Empty/NULL-text docs contribute nothing, never crash, and doc
    boundaries splice mid-sequence correctly."""
    rows = [(0, "a b c"), (1, None), (2, ""), (3, "d e"), (4, "f g h i")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.seq_id: (r.n_docs, r.n_tokens_filled, r.seq_text)
        for r in emit_token_sequences(docs, seq_len=4).collect()
    }
    assert got == {
        0: (2, 4, "a b c d"),
        1: (2, 4, "e f g h"),
        2: (1, 1, "i"),
    }


def test_release_offsets_caches(spark):
    """Every packing call retains one offsets cache; release drops all
    of them (assertable via the JVM persistent-RDD map)."""
    from lovdata_pipeline_spark.operators.packing import release_offsets_caches

    release_offsets_caches()  # clean slate from earlier tests
    docs = _docs_with_tokens(spark)
    pack_into_shards(docs, 512).count()
    pack_token_sequences(docs, 64).count()
    assert release_offsets_caches() == 2
    assert release_offsets_caches() == 0


def test_temperature_thresholds_semantics():
    """α=0.5 upweights rare strata: smallest keeps all, rates fall as
    sqrt(c_min/c); α=1 is proportional passthrough (keep everything)."""
    counts = {"rare": 100, "mid": 400, "big": 10000}
    th = temperature_thresholds(counts, alpha=0.5)
    assert th["rare"] == 10000
    assert th["mid"] == 5000  # sqrt(100/400) = 0.5 exactly
    assert th["big"] == 1000  # sqrt(100/10000) = 0.1 exactly
    assert all(t == 10000 for t in temperature_thresholds(counts, alpha=1.0).values())


def test_temperature_sample_deterministic_and_skew_corrected(spark):
    rows = [(i, "rare" if i < 50 else "big") for i in range(2050)]
    df = spark.createDataFrame(rows, "k long, dom string")
    a = sorted(r.k for r in temperature_sample(df, "dom", "k", seed="s").collect())
    b = sorted(r.k for r in temperature_sample(df.repartition(7), "dom", "k", seed="s").collect())
    assert a == b  # deterministic under any partitioning
    kept = temperature_sample(df, "dom", "k", seed="s").groupBy("dom").count().collect()
    by_dom = {r.dom: r["count"] for r in kept}
    # rare kept fully; big kept at ~sqrt(50/2000) ≈ 15.8%
    assert by_dom["rare"] == 50
    assert 200 <= by_dom.get("big", 0) <= 450


def test_repetition_signals_detect_stutter(spark):
    """A stuttered doc must score a LOWER distinct-word ratio and a
    HIGHER top-bigram fraction than honest prose; empty text is (0,0,0)."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again"),
            (2, "spam spam spam spam spam spam spam spam"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textstats.repetition_signals(docs).collect()}
    assert rows[2]["distinct_word_ratio"] < rows[1]["distinct_word_ratio"]
    assert rows[2]["top_bigram_frac"] > rows[1]["top_bigram_frac"]
    assert rows[3]["n_words"] == 0 and rows[3]["top_bigram_frac"] == 0.0


def test_pii_scan_counts_and_redacts(spark):
    """Counts fire per occurrence and the redacted hash equals the hash
    of the masked text (emails masked before phones)."""
    import hashlib

    text = "reach a@b.com or c.d+x@e.org, dial +1-555-123456 now"
    docs = spark.createDataFrame([(1, text), (2, "clean")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in textstats.pii_scan(docs).collect()}
    assert rows[1]["n_emails"] == 2 and rows[1]["n_phones"] == 1
    masked = "reach [EMAIL] or [EMAIL], dial [PHONE] now"
    assert rows[1]["redacted_hash"] == hashlib.md5(masked.encode()).hexdigest()
    assert rows[2]["n_emails"] == 0 and rows[2]["n_phones"] == 0
    assert rows[2]["redacted_hash"] == hashlib.md5(b"clean").hexdigest()


def test_bm25_ranking_semantics(spark):
    """BM25 must rank the doc matching BOTH query terms first, weight
    rare terms above common ones (idf), and saturate repeated terms
    (a 50× stuffed doc must not score 50× the single-mention doc)."""
    from lovdata_pipeline_spark.operators.search import bm25_topk

    filler = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (1, f"rare common {filler}"),          # both terms
            (2, f"rare {filler}"),                 # rare only
            (3, f"common {filler}"),               # common only
            (4, ("common " * 50) + filler),        # term stuffing
        ]
        + [(10 + i, f"common {filler}") for i in range(6)],  # make 'common' common
        "doc_id long, text string",
    )
    ranked = bm25_topk(docs, ["rare", "common"], k=10).collect()
    scores = {r["doc_id"]: r["score"] for r in ranked}
    assert ranked[0]["doc_id"] == 1                     # both terms win
    assert scores[2] > scores[3]                        # idf: rare > common
    assert scores[4] < scores[3] * (1.2 + 1.0)          # saturation bound (k1+1)


def test_rrf_fusion_semantics(spark):
    """A doc ranked by BOTH systems must outrank docs ranked by one;
    rank contributions follow 1/(60+rank) exactly."""
    from lovdata_pipeline_spark.operators.search import rrf_fuse

    lexical = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7)], "doc_id long, score double"
    )
    semantic = spark.createDataFrame(
        [(1, 0.95), (4, 0.9), (5, 0.85)], "doc_id long, score double"
    )
    rows = rrf_fuse(lexical, semantic, k=10).collect()
    assert rows[0]["doc_id"] == 1  # in both lists at rank 1
    assert rows[0]["rrf_score"] == round(1.0 / 61 + 1.0 / 61, 6)
    only_one = {r["doc_id"]: r["rrf_score"] for r in rows[1:]}
    assert only_one[2] == only_one[4] == round(1.0 / 62, 6)  # both rank-2 singles


def test_unigram_surprisal_orders_rarity(spark):
    """A doc of corpus-rare tokens must score higher mean surprisal than
    a doc of corpus-common tokens; n_tokens counts whitespace tokens."""
    common = "alpha beta gamma"
    docs = spark.createDataFrame(
        [(i, common) for i in range(10)]
        + [(100, "zzyzx qwfp vexing"), (101, common)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textstats.unigram_surprisal(docs).collect()}
    assert rows[100]["mean_surprisal"] > rows[101]["mean_surprisal"]
    assert rows[100]["n_tokens"] == 3


def test_training_order_is_permutation_and_partition_independent(spark):
    from lovdata_pipeline_spark.operators.packing import training_order

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    got = training_order(docs).collect()
    n = docs.count()
    ranks = sorted(r.shuffle_rank for r in got)
    assert ranks == list(range(n))  # dense 0-based permutation
    # deterministic: same seed → same assignment, any partitioning
    again = {
        r.doc_id: r.shuffle_rank
        for r in training_order(docs.repartition(7)).collect()
    }
    assert {r.doc_id: r.shuffle_rank for r in got} == again
    # a different seed decorrelates
    other = {
        r.doc_id: r.shuffle_rank
        for r in training_order(docs, seed="other").collect()
    }
    assert other != again


def test_epoch_mix_copy_counts(spark):
    from lovdata_pipeline_spark.operators.sampling import epoch_mix, portable_rate_hash

    rows = [(i, "books" if i % 2 == 0 else "logs") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = epoch_mix(df, {"books": 2.5, "logs": 0.3}, "source", "doc_id", seed="e1")
    counts = {
        (r.doc_id, r.source): r.cnt
        for r in got.groupBy("doc_id", "source").agg(F.count("*").alias("cnt")).collect()
    }
    hashes = {
        r.doc_id: r.h
        for r in df.select(
            "doc_id", portable_rate_hash(F.col("doc_id"), "e1").alias("h")
        ).collect()
    }
    for i, src in rows:
        whole = 2 if src == "books" else 0
        frac_th = 5000 if src == "books" else 3000
        expect = whole + (1 if hashes[i] < frac_th else 0)
        assert counts.get((i, src), 0) == expect
    # epoch indices are dense per row
    eps = got.filter(F.col("source") == "books").groupBy("doc_id").agg(
        F.sort_array(F.collect_list("epoch")).alias("e")
    )
    for r in eps.collect():
        assert r.e == list(range(len(r.e)))


def test_cluster_balanced_sample_caps_dominant_clusters(spark):
    from lovdata_pipeline_spark.operators.sampling import cluster_balanced_sample
    from lovdata_pipeline_spark.operators.similarity import deterministic_centroids

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = deterministic_centroids(emb, n_cells=4, portable=True)
    kept = cluster_balanced_sample(emb, cents, target_per_cluster=5, seed="t")
    per_cell = {r.cell: r.n for r in kept.groupBy("cell").agg(F.count("*").alias("n")).collect()}
    total = emb.count()
    assert sum(per_cell.values()) < total  # it actually samples
    # hash-rate sampling: expected 5 per cell, allow generous noise
    assert all(n <= 5 * 4 for n in per_cell.values())
    # deterministic under re-run and partitioning
    again = {r.vec_id for r in cluster_balanced_sample(
        emb.repartition(7), cents, target_per_cluster=5, seed="t").collect()}
    assert again == {r.vec_id for r in kept.collect()}


def test_hash_split_partitions_exhaustively_and_append_stable(spark):
    from lovdata_pipeline_spark.operators.sampling import hash_split

    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = hash_split(df, w, "k", seed="s1")
    counts = {r.split: r.n for r in got.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000  # every row exactly one slice
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert abs(counts["train"] - 1600) < 200  # ~80%
    # append-stable: the first 1000 rows keep their assignment
    first = {r.k: r.split for r in hash_split(
        spark.range(0, 1000).withColumnRenamed("id", "k"), w, "k", seed="s1").collect()}
    full = {r.k: r.split for r in got.collect()}
    assert all(full[k] == v for k, v in first.items())
    import pytest as _pytest
    with _pytest.raises(ValueError):
        hash_split(df, {}, "k")


# ---- property tests: random tiny corpora exercise edges the curated
# ---- testdata can't (empty docs, docs spanning many sequences, ties)

from hypothesis import HealthCheck, given, settings, strategies as st

_words = st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=9)
_corpus = st.lists(_words.map(" ".join), min_size=1, max_size=8)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_corpus, seq_len=st.sampled_from([1, 3, 5]))
def test_emit_token_sequences_matches_driver_fold(spark, texts, seq_len):
    """Against a pure-Python fold: concatenate all docs' tokens in
    doc_id order, cut every seq_len — the emitter must reproduce every
    sequence's text exactly."""
    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.seq_id: r.seq_text
        for r in emit_token_sequences(docs, seq_len=seq_len).collect()
    }
    stream = [w for _, t in rows for w in t.split()]
    want = {
        i: " ".join(stream[i * seq_len:(i + 1) * seq_len])
        for i in range((len(stream) + seq_len - 1) // seq_len)
    }
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(min_value=1, max_value=40),
    e_books=st.sampled_from([0.0, 0.5, 1.0, 2.25, 3.0]),
    e_logs=st.sampled_from([0.0, 0.4, 1.5]),
)
def test_epoch_mix_expected_copy_counts(spark, n, e_books, e_logs):
    """Every row's copy count equals floor(e) + [hash < frac(e)·DENOM],
    derived independently here from the published rule."""
    from lovdata_pipeline_spark.operators.sampling import DENOM

    rows = [(i, "books" if i % 2 == 0 else "logs") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {
        r.doc_id: r.cnt
        for r in epoch_mix(df, {"books": e_books, "logs": e_logs}, "source",
                           "doc_id", seed="p")
        .groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()
    }
    hashes = {
        r.doc_id: r.h
        for r in df.select("doc_id",
                           portable_rate_hash(F.col("doc_id"), "p").alias("h")).collect()
    }
    for i, src in rows:
        e = e_books if src == "books" else e_logs
        expect = int(e) + (1 if hashes[i] < int(round((e % 1.0) * DENOM)) else 0)
        assert got.get(i, 0) == expect


def test_length_bucketed_batches_order_and_fill(spark):
    from lovdata_pipeline_spark.operators.packing import length_bucketed_batches

    rows = [(i, (i * 7) % 23 + 1) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    got = sorted(
        ((r.rank, r.n_tokens, r.doc_id, r.batch_id)
         for r in length_bucketed_batches(df, batch_size=8).collect())
    )
    assert [g[0] for g in got] == list(range(50))  # dense rank
    # rank order IS (n_tokens, id) order
    assert got == sorted(got, key=lambda g: (g[1], g[2]))
    # batches are rank // 8 and full except the tail
    assert all(g[3] == g[0] // 8 for g in got)
    # partition-independence
    again = sorted(
        ((r.rank, r.n_tokens, r.doc_id, r.batch_id)
         for r in length_bucketed_batches(df.repartition(7), batch_size=8).collect())
    )
    assert again == got


def test_length_bucketed_batches_rejects_non_integral_keys(spark):
    from lovdata_pipeline_spark.operators.packing import length_bucketed_batches

    import pytest as _pytest

    df = spark.createDataFrame([("a", 3)], "doc_id string, n_tokens int")
    with _pytest.raises(ValueError, match="integral"):
        length_bucketed_batches(df, batch_size=8)
