"""Round-7b pins: the sequential conversion funnel's strict-after
gating, margin-based bitext mining, the exact-count stratified split,
the min-max quality blend, and Kneser-Ney surprisal.

Each class pins the SEMANTICS on hand-built fixtures (the driver's
oracle gate already covers sf0.01 equality); partition-independence is
asserted wherever a ranking or accumulation could leak order.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _ts(s):
    return datetime.datetime.fromisoformat(s)


class TestBitextMargin:
    def _frames(self, spark):
        # tgt 100 is a HUB (close to every source); tgt 200 is the true
        # match of src 1. Raw cosine ranks the hub first for src 1
        # (0.714 > 0.70) but the margin criterion must flip the pick:
        # the hub's k-NN neighborhood mean (~0.9975) inflates its
        # denominator while tgt 200's (~0.42) does not. tgt 300 is
        # zero-norm and must be excluded, not crash ANSI division.
        src = spark.createDataFrame(
            [
                (1, [0.714, 0.70]),
                (2, [1.0, 0.0]),
                (3, [0.995, 0.0999]),
                (4, [0.99, 0.141]),
            ],
            "src_id long, embedding array<double>",
        )
        tgt = spark.createDataFrame(
            [(100, [1.0, 0.0]), (200, [0.0, 1.0]), (300, [0.0, 0.0])],
            "tgt_id long, embedding array<double>",
        )
        return src, tgt

    def test_margin_beats_raw_cosine_on_hubs(self, spark):
        from lovdata_pipeline_spark.operators.similarity import bitext_margin_mine

        src, tgt = self._frames(spark)
        rows = {
            r.src_id: r
            for r in bitext_margin_mine(src, tgt, k=2, threshold=1.0).collect()
        }
        assert rows[1].tgt_id == 200  # margin pick, not the raw-cosine hub
        assert rows[1].margin > 1.0
        assert all(r.tgt_id != 300 for r in rows.values())

    def test_partition_independent(self, spark):
        from lovdata_pipeline_spark.operators.similarity import bitext_margin_mine

        src, tgt = self._frames(spark)
        a = sorted(
            map(tuple, bitext_margin_mine(src, tgt, k=2).collect())
        )
        b = sorted(
            map(
                tuple,
                bitext_margin_mine(
                    src.repartition(7), tgt.repartition(5), k=2
                ).collect(),
            )
        )
        assert a == b


class TestStratifiedSplit:
    def test_exact_counts_per_stratum(self, spark):
        from lovdata_pipeline_spark.operators.sampling import stratified_split

        rows = [(i, "a") for i in range(7)] + [(100 + i, "b") for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = stratified_split(df).groupBy("source", "split").count().collect()
        got = {(r.source, r.split): r["count"] for r in out}
        # stratum a (n=7): train floor(5.6)=5, val floor(6.3)-5=1, test 1
        assert got[("a", "train")] == 5
        assert got[("a", "val")] == 1
        assert got[("a", "test")] == 1
        # stratum b (n=20): exactly 16/2/2
        assert got[("b", "train")] == 16
        assert got[("b", "val")] == 2
        assert got[("b", "test")] == 2

    def test_partition_independent_and_seeded(self, spark):
        from lovdata_pipeline_spark.operators.sampling import stratified_split

        df = spark.createDataFrame(
            [(i, "s" if i % 3 else "t") for i in range(50)],
            "doc_id long, source string",
        )
        a = sorted(map(tuple, stratified_split(df).collect()))
        b = sorted(map(tuple, stratified_split(df.repartition(13)).collect()))
        assert a == b
        c = sorted(map(tuple, stratified_split(df, seed="epoch-2").collect()))
        assert a != c  # a new seed redraws the assignment

    def test_rejects_bad_percents(self, spark):
        import pytest

        from lovdata_pipeline_spark.operators.sampling import stratified_split

        df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
        with pytest.raises(ValueError):
            stratified_split(df, (("train", 70), ("val", 10)))


class TestR7bCLI:
    def test_split_stratified_exact_counts(self, spark, tmp_path, capsys):
        import json

        from lovdata_pipeline_spark.cli import main

        src = tmp_path / "docs"
        spark.createDataFrame(
            [(i, "a" if i < 20 else "b") for i in range(40)],
            "doc_id long, source string",
        ).write.parquet(str(src))
        rc = main(
            [
                "split",
                "--input", str(src),
                "--output", str(tmp_path / "out"),
                "--stratified", "source",
            ]
        )
        assert rc == 0
        got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        # both strata have n=20: exactly 16/2/2 each
        assert got["splits"] == {"train": 32, "val": 4, "test": 4}

    def test_split_stratified_rejects_fractional_percent(
        self, spark, tmp_path, capsys
    ):
        from lovdata_pipeline_spark.cli import main

        src = tmp_path / "docs2"
        spark.createDataFrame(
            [(1, "a")], "doc_id long, source string"
        ).write.parquet(str(src))
        rc = main(
            [
                "split",
                "--input", str(src),
                "--output", str(tmp_path / "out2"),
                "--weights", "train=0.805,val=0.1,test=0.095",
                "--stratified", "source",
            ]
        )
        assert rc == 2

    def test_mine_cli_round_trip(self, spark, tmp_path, capsys):
        import json

        from lovdata_pipeline_spark.cli import main

        emb = tmp_path / "emb"
        docs = tmp_path / "docs3"
        rows = [
            (1, [0.714, 0.70], "en"),
            (2, [1.0, 0.0], "en"),
            (3, [0.995, 0.0999], "en"),
            (100, [1.0, 0.0], "zh"),
            (200, [0.0, 1.0], "zh"),
        ]
        spark.createDataFrame(
            [(i, v) for i, v, _ in rows], "vec_id long, embedding array<double>"
        ).write.parquet(str(emb))
        spark.createDataFrame(
            [(i, lang) for i, _, lang in rows], "doc_id long, lang string"
        ).write.parquet(str(docs))
        rc = main(
            [
                "mine",
                "--embeddings", str(emb),
                "--documents", str(docs),
                "--output", str(tmp_path / "pairs"),
                "--src-lang", "en",
                "--tgt-lang", "zh",
                "--k", "2",
            ]
        )
        assert rc == 0
        got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert got["mined_pairs"] >= 1
        assert spark.read.parquet(str(tmp_path / "pairs")).columns == [
            "src_id", "tgt_id", "score", "margin",
        ]


class TestRetentionCohorts:
    def test_cohort_matrix(self, spark, tmp_path):
        rows = [
            # cohort of Mon 2024-01-01: users 1,2 — user 1 returns in
            # week 1 and 3, user 2 never returns
            (1, 1, "2024-01-02T10:00:00"),
            (2, 1, "2024-01-09T10:00:00"),
            (3, 1, "2024-01-23T10:00:00"),
            (4, 2, "2024-01-03T10:00:00"),
            # cohort of Mon 2024-01-08: user 3 (first event that week)
            (5, 3, "2024-01-08T00:00:00"),
            (6, 3, "2024-01-10T12:00:00"),  # same week: still offset 0
        ]
        ev = spark.createDataFrame(
            [(i, _ts(t), u, "view", 0.0, "{}") for i, (_, u, t) in zip(range(6), [(None, u, t) for _, u, t in rows])],
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        )
        out_dir = str(tmp_path / "ret")
        ev.write.parquet(out_dir + "/events.parquet")

        from lovdata_pipeline_spark.queries import events_retention_cohorts

        got = {
            (r.cohort_week.date().isoformat(), r.week_offset): (
                r.n_active,
                r.retention,
            )
            for r in events_retention_cohorts(spark, out_dir).collect()
        }
        assert got[("2024-01-01", 0)] == (2, 1.0)
        assert got[("2024-01-01", 1)] == (1, 0.5)
        assert got[("2024-01-01", 3)] == (1, 0.5)
        assert ("2024-01-01", 2) not in got  # nobody active that week
        assert got[("2024-01-08", 0)] == (1, 1.0)
        assert len(got) == 4


class TestStreamingSessionCounts:
    def test_boundary_rule_gap_equal_merges(self, spark):
        """session_window's boundary is INCLUSIVE: an event at exactly
        last_ts+gap merges into the window, and one microsecond past it
        starts a new session — so the oracle's gaps-and-islands rule is
        the batch one (new session iff gap > 1800), pinned here because
        microsecond data makes exact-boundary ties measure-zero."""
        rows = [
            (1, 10, _ts("2024-01-01T00:00:00")),
            (2, 10, _ts("2024-01-01T00:30:00")),            # exactly gap -> merges
            (3, 10, _ts("2024-01-01T01:00:00.000001")),     # 1 us past -> NEW
        ]
        df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
        sess = (
            df.groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .select("user_id", F.col("s.start").alias("st"), "n")
            .orderBy("st")
            .collect()
        )
        assert [(r.st.hour, r.st.minute, r.n) for r in sess] == [
            (0, 0, 2),   # 00:00 + 00:30 merge (inclusive boundary)
            (1, 0, 1),   # 01:00:00.000001 is past 00:30's window end
        ]

    def test_multibatch_complete_drain_equals_batch(self, spark, tmp_path):
        """availableNow split into one-file micro-batches must land the
        same final session table as a single batch (complete mode:
        last batch wins)."""
        import datetime as dt

        src = tmp_path / "ev_src"
        src.mkdir()
        rows1 = [
            (i, i % 5, dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=i))
            for i in range(40)
        ]
        rows2 = [
            (100 + i, i % 5, dt.datetime(2024, 1, 1, 6, 0, 0) + dt.timedelta(minutes=i * 40))
            for i in range(20)
        ]
        schema = "event_id long, user_id long, ts timestamp"
        # the file stream source lists FILES: land each frame as one
        # parquet file and link it into the source dir (the graded
        # query's symlink trick)
        import glob
        import os

        for name, rows in (("a", rows1), ("b", rows2)):
            d = tmp_path / f"_{name}"
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(d))
            [part] = glob.glob(str(d / "part-*.parquet"))
            os.symlink(part, str(src / f"{name}.parquet"))
        batch = spark.read.parquet(str(src))

        def sessionize(df):
            return (
                df.groupBy(
                    F.session_window("ts", "30 minutes").alias("s"), "user_id"
                )
                .agg(F.count(F.lit(1)).alias("n_events"))
                .select(
                    "user_id",
                    F.col("s.start").alias("session_start"),
                    F.col("s.end").alias("session_end"),
                    "n_events",
                )
            )

        out = tmp_path / "out"
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )

        def land(bdf, _bid):
            bdf.write.mode("overwrite").parquet(str(out))

        q = (
            sessionize(stream)
            .writeStream.outputMode("complete")
            .foreachBatch(land)
            .option("checkpointLocation", str(tmp_path / "chk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(map(tuple, spark.read.parquet(str(out)).collect()))
        want = sorted(map(tuple, sessionize(batch).collect()))
        assert got == want
        assert len(want) > 5


class TestQualityBlend:
    def test_constant_signal_is_neutral_and_bands_cut(self, spark):
        from lovdata_pipeline_spark.operators.textstats import quality_blend

        # single-doc source: every signal is source-constant -> all four
        # normalize to the neutral 0.5 -> blend exactly 0.5 -> medium
        df = spark.createDataFrame(
            [(1, "solo", "the cat and the dog went to the house of that")],
            "doc_id long, source string, text string",
        )
        [r] = quality_blend(df).collect()
        assert r.blend_score == 0.5
        assert r.quality_band == "medium"

    def test_better_doc_scores_higher(self, spark):
        from lovdata_pipeline_spark.operators.textstats import quality_blend

        good = "the report and the summary of that work is in the archive " * 10
        junk = "xx1 9#@ 0000 ~~~ %% !! 22 33 44 55"
        df = spark.createDataFrame(
            [(1, "web", good), (2, "web", junk)],
            "doc_id long, source string, text string",
        )
        rows = {r.doc_id: r for r in quality_blend(df).collect()}
        assert rows[1].blend_score > rows[2].blend_score
        assert rows[1].quality_band == "high"
        assert rows[2].quality_band == "low"

    def test_partition_independent(self, spark):
        from lovdata_pipeline_spark.operators.textstats import quality_blend

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = sorted(map(tuple, quality_blend(docs).collect()))
        b = sorted(map(tuple, quality_blend(docs.repartition(17)).collect()))
        assert a == b


class TestKNSurprisal:
    def test_hand_computed_tiny_corpus(self, spark):
        import math

        from lovdata_pipeline_spark.operators.textstats import kn_surprisal

        df = spark.createDataFrame(
            [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
        )
        rows = {r.doc_id: r for r in kn_surprisal(df).collect()}
        # corpus: c(a,b)=2 c(b,a)=1 c(a,c)=1, B=3, ctx(a)=3 n1f(a)=2,
        # ctx(b)=1 n1f(b)=1, n1b(.)=1 for a/b/c
        p_ab = (2 - 0.75) / 3 + 0.75 * 2 / 3 * (1 / 3)
        p_ba = (1 - 0.75) / 1 + 0.75 * 1 / 1 * (1 / 3)
        p_ac = (1 - 0.75) / 3 + 0.75 * 2 / 3 * (1 / 3)
        exp1 = round(
            (round(-math.log(p_ab), 9) * 2 + round(-math.log(p_ba), 9)) / 3, 6
        )
        exp2 = round(round(-math.log(p_ac), 9), 6)
        assert rows[1].n_bigrams == 3
        assert rows[1].mean_kn_surprisal == exp1
        assert rows[2].mean_kn_surprisal == exp2

    def test_continuation_backoff_beats_addone(self, spark):
        """KN's point: a word frequent ONLY after one context ('francisco'
        after 'san') gets a small continuation weight, so an unusual
        transition into it is penalized more than its raw frequency
        suggests — its KN surprisal must exceed the diverse-context
        word's for equally-frequent transitions."""
        from lovdata_pipeline_spark.operators.textstats import kn_surprisal

        ctxdoc = " ".join(["san francisco"] * 20 + ["a x", "b x", "c x", "d x"])
        probe_f = "q francisco"
        probe_x = "q x"
        df = spark.createDataFrame(
            [(1, ctxdoc), (2, probe_f), (3, probe_x)],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in kn_surprisal(df).collect()}
        assert (
            rows[2].mean_kn_surprisal > rows[3].mean_kn_surprisal
        )  # x follows 5 contexts, francisco only 2

    def test_partition_independent(self, spark):
        from lovdata_pipeline_spark.operators.textstats import kn_surprisal

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = sorted(map(tuple, kn_surprisal(docs).collect()))
        b = sorted(map(tuple, kn_surprisal(docs.repartition(19)).collect()))
        assert a == b


class TestFunnelGating:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            [(i, _ts(t), u, e, 0.0, "{}") for i, (u, t, e) in enumerate(rows)],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )

    def test_strict_after_gating(self, spark, tmp_path):
        rows = [
            # user 1: full conversion
            (1, "2024-01-01T00:00:00", "view"),
            (1, "2024-01-01T00:10:00", "click"),
            (1, "2024-01-01T00:20:00", "purchase"),
            # user 2: click BEFORE first view -> must not convert
            (2, "2024-01-01T00:00:00", "click"),
            (2, "2024-01-01T00:10:00", "view"),
            # user 3: purchase without a gated click -> must not convert
            (3, "2024-01-01T00:00:00", "view"),
            (3, "2024-01-01T00:10:00", "purchase"),
            # user 4: click at EXACTLY the view ts -> strict after fails
            (4, "2024-01-01T00:00:00", "view"),
            (4, "2024-01-01T00:00:00", "click"),
            # user 5: never viewed -> outside the funnel entirely
            (5, "2024-01-01T00:00:00", "click"),
            (5, "2024-01-01T00:10:00", "purchase"),
        ]
        ev = self._events(spark, rows)
        out_dir = str(tmp_path / "ev")
        ev.write.parquet(out_dir + "/events.parquet")

        from lovdata_pipeline_spark.queries import events_funnel_counts

        [r] = events_funnel_counts(spark, out_dir).collect()
        assert r.n_view_users == 4
        assert r.n_click_users == 1
        assert r.n_purchase_users == 1
        assert r.conv_view_click == 0.25
        assert r.conv_click_purchase == 1.0
        assert r.conv_view_purchase == 0.25
        assert r.mean_view_to_purchase_s == 1200.0

    def test_zero_denominators_are_null(self, spark, tmp_path):
        ev = self._events(spark, [(1, "2024-01-01T00:00:00", "view")])
        out_dir = str(tmp_path / "ev0")
        ev.write.parquet(out_dir + "/events.parquet")

        from lovdata_pipeline_spark.queries import events_funnel_counts

        [r] = events_funnel_counts(spark, out_dir).collect()
        assert r.n_view_users == 1
        assert r.n_click_users == 0
        assert r.conv_click_purchase is None
        assert r.mean_view_to_purchase_s is None
