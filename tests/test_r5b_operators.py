"""Unit pins for the late-r5 operators: TF-IDF keyword ranking, BPE
pair statistics, the RANGE-frame rolling window, and majority-vote k-NN
classification (including its tie-break contracts)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from lovdata_pipeline_spark.operators import similarity, textstats


def test_tfidf_keywords_ranks_distinctive_terms(spark):
    """A term unique to one source outranks a corpus-wide term there
    (idf of an everywhere-term is ln(1)=0), and rk is dense 1..k."""
    df = spark.createDataFrame(
        [
            (1, "the spark engine spark", "a"),
            (2, "the spark shuffle", "a"),
            (3, "the quantum garden quantum", "b"),
            (4, "the quantum ledger", "b"),
        ],
        "doc_id long, text string, source string",
    )
    out = textstats.tfidf_keywords(df, k=2).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    # 'the' appears in all 4 docs: idf = ln(4/4) = 0 → never a keyword
    assert all(r.term != "the" for r in out)
    assert [r.rk for r in by_src["a"]] == [1, 2]
    # 'spark' (tf=3, df=2) beats single-occurrence terms in source a
    assert by_src["a"][0].term == "spark"
    assert by_src["b"][0].term == "quantum"
    expected = round(3 * math.log(4 / 2), 6)
    assert by_src["a"][0].tfidf == expected


def test_bpe_pair_counts_matches_brute_force(spark):
    texts = ["banana and ananas", "  ", "na na batman", None]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    brute: dict[str, int] = {}
    for t in texts:
        if t is None or not t.strip():
            continue
        for w in t.strip().lower().split():
            if len(w) < 2:
                continue
            for i in range(len(w) - 1):
                p = w[i : i + 2]
                brute[p] = brute.get(p, 0) + 1
    got = {r.pair: r.n_occurrences for r in textstats.bpe_pair_counts(df, k=100).collect()}
    assert got == brute
    # top-1 of banana-heavy corpus is 'an' or 'na' (tie broken ascending)
    top = textstats.bpe_pair_counts(df, k=1).collect()[0]
    assert top.pair == min(p for p, c in brute.items() if c == max(brute.values()))


def test_events_rolling_1h_frame_membership(spark):
    """Rows exactly 3600 s apart are IN the frame (inclusive bound);
    3601 s is out; other users never contribute."""
    rows = [
        (1, 100, "2024-01-01 10:00:00", 1.0),
        (2, 100, "2024-01-01 11:00:00", 2.0),  # 3600s after e1 → includes e1
        (3, 100, "2024-01-01 12:00:01", 4.0),  # 3601s after e2 → alone
        (4, 200, "2024-01-01 11:00:00", 8.0),  # other user, same ts as e2
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts string, value double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    w = (
        __import__("pyspark.sql", fromlist=["Window"]).Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, 0)
    )
    out = {
        r.event_id: (r.sum_1h, r.n_1h)
        for r in df.select(
            "event_id",
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).over(w), 6)
            .cast("double")
            .alias("sum_1h"),
            F.count(F.lit(1)).over(w).alias("n_1h"),
        ).collect()
    }
    assert out[1] == (1.0, 1)
    assert out[2] == (3.0, 2)
    assert out[3] == (4.0, 1)
    assert out[4] == (8.0, 1)


def test_knn_classify_majority_and_tiebreak(spark):
    """3 near neighbors of label 1 beat 2 of label 0; an exact 1-1 vote
    tie (k=2) resolves to the SMALLER label."""
    corpus = spark.createDataFrame(
        [
            (10, [1.0, 0.0], 1),
            (11, [0.99, 0.01], 1),
            (12, [0.98, 0.02], 1),
            (13, [0.0, 1.0], 0),
            (14, [0.01, 0.99], 0),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    q = spark.createDataFrame([(1, [1.0, 0.0])], "query_id long, embedding array<double>")
    got = similarity.knn_classify(q, corpus, k=5).collect()[0]
    assert (got.predicted_label, got.n_votes) == (1, 3)
    # tie at k=2: one vote each for label 0 and 5 → pick 0
    tie_corpus = spark.createDataFrame(
        [(20, [1.0, 0.0], 5), (21, [0.9, 0.1], 0)],
        "vec_id long, embedding array<double>, label int",
    )
    tied = similarity.knn_classify(q, tie_corpus, k=2).collect()[0]
    assert (tied.predicted_label, tied.n_votes) == (0, 1)


def test_top_k_per_group_exact_and_partition_independent(spark):
    """Two-phase top-k equals the naive single-window result on every
    partitioning, including ties broken by id."""
    from pyspark.sql import Window

    from lovdata_pipeline_spark.operators.sampling import top_k_per_group

    rows = [(i, "g%d" % (i % 3), float((i * 7) % 5)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, g string, score double")
    naive_w = Window.partitionBy("g").orderBy(F.col("score").desc(), F.col("id"))
    naive = (
        df.withColumn("rk", F.row_number().over(naive_w))
        .filter(F.col("rk") <= 4)
        .orderBy("g", "rk")
        .collect()
    )
    for nparts in (1, 2, 13):
        got = (
            top_k_per_group(df.repartition(nparts), 4, "g", "score", "id")
            .orderBy("g", "rk")
            .collect()
        )
        assert [tuple(r) for r in got] == [tuple(r) for r in naive]


def test_weighted_sample_per_group_bias_and_determinism(spark):
    """Heavily-weighted rows win far more slots than light ones; the
    draw is identical across partitionings and changes with the seed."""
    from lovdata_pipeline_spark.operators.sampling import weighted_sample_per_group

    # one group: 100 heavy rows (w=50) + 100 light rows (w=0.1)
    rows = [(i, "g", 50.0 if i < 100 else 0.1) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g string, w double")
    got = weighted_sample_per_group(df, 20, "g", "w", "id", seed="s1").collect()
    assert len(got) == 20
    heavy = sum(1 for r in got if r.id < 100)
    assert heavy >= 16  # 500× weight ratio ⇒ light rows rarely win
    # determinism across partitionings
    a = sorted(r.id for r in weighted_sample_per_group(
        df.repartition(3), 20, "g", "w", "id", seed="s1").collect())
    b = sorted(r.id for r in weighted_sample_per_group(
        df.repartition(17), 20, "g", "w", "id", seed="s1").collect())
    assert a == b == sorted(r.id for r in got)
    # a different seed decorrelates the draw
    c = sorted(r.id for r in weighted_sample_per_group(
        df, 20, "g", "w", "id", seed="s2").collect())
    assert c != a
    # zero/negative weights are never drawn
    df2 = spark.createDataFrame(
        [(1, "g", 0.0), (2, "g", -1.0), (3, "g", 1.0)], "id long, g string, w double"
    )
    only = weighted_sample_per_group(df2, 3, "g", "w", "id").collect()
    assert [r.id for r in only] == [3]


def test_new_operators_empty_and_null_inputs(spark):
    """Empty frames and NULL text degrade to empty results, not errors,
    across the late-r5 family."""
    from lovdata_pipeline_spark.operators.sampling import (
        top_k_per_group,
        weighted_sample_per_group,
    )

    empty = spark.createDataFrame([], "doc_id long, text string, source string")
    assert textstats.tfidf_keywords(empty).count() == 0
    assert textstats.bpe_pair_counts(empty).count() == 0
    nulls = spark.createDataFrame(
        [(1, None, "a"), (2, "  ", "a")], "doc_id long, text string, source string"
    )
    assert textstats.tfidf_keywords(nulls).count() == 0
    assert textstats.bpe_pair_counts(nulls).count() == 0
    empty_w = spark.createDataFrame([], "id long, g string, w double")
    assert top_k_per_group(empty_w, 3, "g", "w", "id").count() == 0
    assert weighted_sample_per_group(empty_w, 3, "g", "w", "id").count() == 0
    empty_q = spark.createDataFrame([], "query_id long, embedding array<double>")
    empty_c = spark.createDataFrame(
        [], "vec_id long, embedding array<double>, label int"
    )
    assert similarity.knn_classify(empty_q, empty_c).count() == 0
