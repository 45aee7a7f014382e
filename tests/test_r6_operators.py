"""Round-6 pins: the r5 ADVICE fixes (ES hash resolution, top-k column
contract, knn NULL labels), the tfidf two-phase rank stage, and the
single-scan curation report's plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from lovdata_pipeline_spark.operators import similarity, textstats
from lovdata_pipeline_spark.operators.sampling import (
    top_k_per_group,
    weighted_sample_per_group,
)


def test_tfidf_two_phase_matches_naive_window_under_skew(spark):
    """tfidf's rank stage routes through top_k_per_group (r5 VERDICT #1):
    the result equals the naive per-group window on a vocabulary-skewed
    corpus, at several physical partitionings."""
    # source 'big' carries a much larger vocabulary than 'small' — the
    # skew that made the old single-window rank stage a one-task funnel
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(8)) + " shared", "big")
            for i in range(40)]
    rows += [(100 + i, "shared common tiny", "small") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    def naive(d):
        toks = d.filter(F.trim("text") != "").select(
            "doc_id", "source",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
        )
        n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
        tf = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf"))
        dfreq = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
        scored = tf.join(dfreq, "term").crossJoin(F.broadcast(n_docs)).select(
            "source", "term",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("tfidf"),
        )
        w = Window.partitionBy("source").orderBy(F.col("tfidf").desc(), "term")
        return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)

    want = sorted(map(tuple, naive(docs).collect()))
    for nparts in (1, 3, 11):
        got = sorted(
            map(tuple, textstats.tfidf_keywords(docs.repartition(nparts), k=5).collect())
        )
        assert got == want


def test_es_score_full_hash_resolution(spark):
    """u comes from the full 60-bit hash (r5 ADVICE): in a group far
    larger than the old 10k-value quantization, every selected row has
    a DISTINCT score — no tie mass for the id-asc break to bias toward
    low ids — and the draw spans the id range."""
    n = 25_000
    df = spark.createDataFrame(
        [(i, "g", 1.0) for i in range(n)], "id long, g string, w double"
    )
    got = weighted_sample_per_group(df, 100, "g", "w", "id", seed="res-v1").collect()
    assert len(got) == 100
    scores = [r.es_score for r in got]
    # the quantized u had ~2.5 rows per value (~40 distinct among 100);
    # the only ties left now come from the 6-dp score rounding near 0
    assert len(set(scores)) >= 95
    # equal weights ⇒ a uniform draw; the old tie-break bias concentrated
    # picks at low ids. A uniform 100-of-25k draw has max id > 20k with
    # probability 1 - (0.8)^100 ≈ 1 - 2e-10.
    assert max(r.id for r in got) > 20_000


def test_top_k_per_group_dict_quotas(spark):
    """Per-group k (r5 VERDICT stretch #7): dict quotas match the naive
    per-group windows; absent groups are excluded."""
    rows = [(i, ["a", "b", "c"][i % 3], float(i)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, g string, score double")
    got = top_k_per_group(df, {"a": 3, "b": 1}, "g", "score", "id")
    by_g = {}
    for r in got.collect():
        by_g.setdefault(r.g, []).append((r.rk, r.id, r.score))
    assert set(by_g) == {"a", "b"}  # 'c' has no quota → excluded
    assert sorted(by_g["a"]) == [(1, 57, 57.0), (2, 54, 54.0), (3, 51, 51.0)]
    assert sorted(by_g["b"]) == [(1, 58, 58.0)]
    # partition-independence holds for dict quotas too
    again = sorted(map(tuple, top_k_per_group(
        df.repartition(13), {"a": 3, "b": 1}, "g", "score", "id").collect()))
    assert again == sorted(map(tuple, got.collect()))


def test_top_k_per_group_column_contract(spark):
    """Reserved helper names raise instead of silently overwriting; an
    input rk column is REPLACED by the output rank (r5 ADVICE)."""
    df = spark.createDataFrame(
        [(1, "g", 1.0, 99), (2, "g", 2.0, 98)], "id long, g string, w double, rk int"
    )
    out = top_k_per_group(df, 1, "g", "w", "id")
    assert out.columns.count("rk") == 1
    assert [(r.id, r.rk) for r in out.collect()] == [(2, 1)]
    bad = spark.createDataFrame([(1, "g", 1.0, 0)], "id long, g string, w double, _tkpg_pid int")
    with pytest.raises(ValueError, match="_tkpg_pid"):
        top_k_per_group(bad, 1, "g", "w", "id")


def test_knn_classify_ignores_null_labels(spark):
    """NULL-labeled corpus rows never vote (r5 ADVICE): a NULL that would
    have won the vote tie under NULLS FIRST ordering is excluded, so the
    real label wins."""
    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0], None), (11, [0.95, 0.05], 7)],
        "vec_id long, embedding array<double>, label int",
    )
    q = spark.createDataFrame([(1, [1.0, 0.0])], "query_id long, embedding array<double>")
    got = similarity.knn_classify(q, corpus, k=2).collect()
    assert [(r.predicted_label, r.n_votes) for r in got] == [(7, 1)]
    # an all-NULL corpus yields no prediction rather than a NULL one
    null_corpus = spark.createDataFrame(
        [(10, [1.0, 0.0], None)], "vec_id long, embedding array<double>, label int"
    )
    assert similarity.knn_classify(q, null_corpus, k=2).count() == 0


def test_curation_report_single_scan_plan(spark):
    """The report builder scans the corpus at most twice (r5 VERDICT #2):
    one flags projection + one gram explode for the decontam semi-join;
    the benchmark is an independent input."""
    import re

    from lovdata_pipeline_spark.queries import build_curation_report

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i} gamma delta", f"s{i % 2}") for i in range(30)],
        "doc_id long, text string, source string",
    )
    docs.write.mode("overwrite").parquet("/tmp/r6_report_docs")
    docs_p = spark.read.parquet("/tmp/r6_report_docs")
    bench = spark.createDataFrame(
        [(999, "alpha beta w3 gamma")], "doc_id long, text string"
    )
    rep = build_curation_report(docs_p, bench)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    n_scans = len(re.findall(r"r6_report_docs", plan))
    assert n_scans <= 2, f"expected ≤2 corpus scans, plan has {n_scans}"
    # and the numbers stay right: 30 docs, sources s0/s1, doc 3 contaminated
    rows = {r.source: r for r in rep.collect()}
    assert rows["s0"].n_docs == 15 and rows["s1"].n_docs == 15
    assert rows["s0"].n_contaminated + rows["s1"].n_contaminated == 1
