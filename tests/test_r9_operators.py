"""Round-9 operators: the bitext LSH pre-bucketing scale path and the
append-mode streaming session drain's holdback rule."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lovdata_pipeline_spark.operators.similarity import bitext_margin_mine


def _clustered_bitext(spark, n_clusters=4, per_side=3, dim=8, jitter=1e-3):
    """Planted-pair fixture: orthogonal cluster centers, both sides
    jittered copies — every true pair and every k-NN neighborhood lives
    inside one cluster (in-cluster cosine ≈ 1, cross-cluster ≈ 0), the
    clustered-corpus case the bucketed path is built for."""
    rng = np.random.RandomState(7)
    centers = np.eye(dim)[:n_clusters]
    src_rows, tgt_rows = [], []
    for c in range(n_clusters):
        for i in range(per_side):
            src_rows.append(
                (c * 100 + i, (centers[c] + jitter * rng.randn(dim)).tolist())
            )
            tgt_rows.append(
                (c * 100 + 50 + i, (centers[c] + jitter * rng.randn(dim)).tolist())
            )
    schema = "vec_id long, embedding array<double>"
    src = spark.createDataFrame(src_rows, schema).select(
        F.col("vec_id").alias("src_id"), "embedding"
    )
    tgt = spark.createDataFrame(tgt_rows, schema).select(
        F.col("vec_id").alias("tgt_id"), "embedding"
    )
    return src, tgt


def test_bitext_bucketed_matches_exact_on_clustered(spark):
    """buckets=16 == exact on the planted-cluster fixture: SRP co-buckets
    each cluster, so every neighborhood (and therefore every margin and
    the forward-max) is computed over the same pair set both ways — the
    knn_edges ivf==blocked pin, for bitext."""
    src, tgt = _clustered_bitext(spark)
    exact = sorted(
        map(tuple, bitext_margin_mine(src, tgt, k=2, threshold=0.0).collect())
    )
    bucketed = sorted(
        map(
            tuple,
            bitext_margin_mine(src, tgt, k=2, threshold=0.0, buckets=16).collect(),
        )
    )
    assert exact == bucketed
    assert len(exact) == 12  # one forward-max pair per source


def test_bitext_bucketed_single_bucket_degrades_to_exact(spark):
    """buckets=2 with a single plane and 1-bit probing covers BOTH
    buckets from every source — candidate coverage is total, so the
    result must equal exact on ANY data (the n_probe=n_cells analog)."""
    src, tgt = _clustered_bitext(spark, n_clusters=2, per_side=2)
    exact = sorted(
        map(tuple, bitext_margin_mine(src, tgt, k=2, threshold=0.0).collect())
    )
    # n_probe_bits=1 with a single plane probes BOTH buckets from every
    # source — candidate coverage is total regardless of the plane
    bucketed = sorted(
        map(
            tuple,
            bitext_margin_mine(
                src, tgt, k=2, threshold=0.0, buckets=2, n_probe_bits=1
            ).collect(),
        )
    )
    assert exact == bucketed


def test_bitext_bucketed_pairs_never_duplicate(spark):
    """Multi-probe fans the SOURCE side out; each target lives in exactly
    one bucket, so no (src, tgt) pair can appear twice in the scored
    set — pinned via the output being one row per source."""
    src, tgt = _clustered_bitext(spark)
    out = bitext_margin_mine(src, tgt, k=2, threshold=0.0, buckets=16).collect()
    srcs = [r.src_id for r in out]
    assert len(srcs) == len(set(srcs))


class TestJaccardDfCap:
    """ngram_jaccard_pairs(max_df=...): the SSJoin stop-word escape
    hatch for saturated shingle spaces (r9 audit — see SCALING.md
    named causes)."""

    def _docs(self, spark):
        # two true near-dup pairs + a hot boilerplate line shared by all
        rows = [
            (1, "the same header alpha beta gamma delta one"),
            (2, "the same header alpha beta gamma delta two"),
            (3, "the same header epsilon zeta eta theta one"),
            (4, "the same header epsilon zeta eta theta two"),
            (5, "the same header completely different words here"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_capped_equals_exact_when_cap_above_max_posting(self, spark):
        from lovdata_pipeline_spark.operators.dedup import ngram_jaccard_pairs

        docs = self._docs(spark)
        exact = sorted(map(tuple, ngram_jaccard_pairs(docs, 0.5).collect()))
        capped = sorted(
            map(tuple, ngram_jaccard_pairs(docs, 0.5, max_df=100).collect())
        )
        assert exact == capped and len(exact) >= 2

    def test_capped_is_subset_of_exact(self, spark):
        """An aggressive cap may only DROP pairs (candidate generation
        shrinks; verification is unchanged) — never invent or rescore."""
        from lovdata_pipeline_spark.operators.dedup import ngram_jaccard_pairs

        docs = self._docs(spark)
        exact = set(map(tuple, ngram_jaccard_pairs(docs, 0.5).collect()))
        capped = set(
            map(tuple, ngram_jaccard_pairs(docs, 0.5, max_df=2).collect())
        )
        assert capped <= exact


class TestKnnIndexPath:
    """knn_edges(candidates='ivf', index_path=...): persisted-geometry
    candidates must equal the in-memory IVF path, and a subset build
    must prune the index scan to its probed cells."""

    def _clustered(self, spark, n_clusters=4, per=6, dim=8, jitter=1e-3):
        rng = np.random.RandomState(11)
        centers = np.eye(dim)[:n_clusters]
        rows = [
            (c * 100 + i, (centers[c] + jitter * rng.randn(dim)).tolist())
            for c in range(n_clusters)
            for i in range(per)
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_index_path_equals_in_memory_ivf(self, spark, tmp_path):
        from lovdata_pipeline_spark.operators.graph import (
            knn_edges,
            knn_write_ivf_index,
        )

        vecs = self._clustered(spark)
        idx = str(tmp_path / "knn_idx")
        knn_write_ivf_index(vecs, idx, n_cells=4)
        mem = sorted(
            map(
                tuple,
                knn_edges(vecs, k=3, candidates="ivf", n_cells=4, n_probe=2).collect(),
            )
        )
        via_idx = sorted(
            map(
                tuple,
                knn_edges(
                    vecs, k=3, candidates="ivf", n_probe=2, index_path=idx
                ).collect(),
            )
        )
        assert mem == via_idx

    def test_subset_build_prunes_partitions(self, spark, tmp_path):
        """Incremental form: a 3-row batch from one cluster probes <
        n_cells cells — the index read carries a PartitionFilter on
        cell, and its edges equal the full build's edges restricted to
        those sources."""
        from lovdata_pipeline_spark.operators.graph import (
            knn_edges,
            knn_write_ivf_index,
        )

        vecs = self._clustered(spark)
        idx = str(tmp_path / "knn_idx_sub")
        knn_write_ivf_index(vecs, idx, n_cells=4)
        batch = vecs.filter(F.col("vec_id") < 100)  # cluster 0 only
        df = knn_edges(batch, k=3, candidates="ivf", n_probe=2, index_path=idx)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "cell" in plan
        got = sorted(map(tuple, df.collect()))
        full = knn_edges(
            vecs, k=3, candidates="ivf", n_cells=4, n_probe=2
        ).filter(F.col("src") < 100)
        assert got == sorted(map(tuple, full.collect()))


def test_session_append_drain_holds_back_trailing_sessions(spark, tmp_path):
    """The append-mode session drain WITHOUT a watermark heartbeat holds
    back every user's final session (its end is gap past the last event,
    which no watermark reading only the data can pass) — the behavior
    the graded row's sentinel exists to fix."""
    import os

    from lovdata_pipeline_spark.streaming.windows import session_windows

    rows = [
        # user 1: two sessions 2h apart; user 2: one session
        (1, "2024-01-01 10:00:00", 1),
        (2, "2024-01-01 10:05:00", 1),
        (3, "2024-01-01 12:30:00", 1),
        (4, "2024-01-01 10:00:00", 2),
    ]
    src = tmp_path / "events_src"
    src.mkdir()
    df = spark.createDataFrame(rows, "event_id long, ts string, user_id long")
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "ev"))
    part = [f for f in os.listdir(tmp_path / "ev") if f.endswith(".parquet")][0]
    os.symlink(str(tmp_path / "ev" / part), str(src / "events.parquet"))

    stream = spark.readStream.schema(df.schema).parquet(str(src))
    sess = session_windows(stream, gap="30 minutes", watermark="0 seconds")
    out = tmp_path / "out"
    chk = tmp_path / "chk"

    def land(b, _):
        b.write.mode("append").parquet(str(out))

    q = (
        sess.writeStream.outputMode("append")
        .foreachBatch(land)
        .option("checkpointLocation", str(chk))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.read.schema(
            "user_id long, session_start timestamp, session_end timestamp, n_events long"
        )
        .parquet(str(out))
        .collect()
    )
    # watermark = max ts (12:30); user 1's FIRST session (end 10:35) is
    # finalized and emitted; user 1's second session (end 13:00) and
    # user 2's only session (end 10:30 <= 12:30 → emitted too). The one
    # held back is the session whose end exceeds the final watermark.
    emitted = {(r.user_id, r.n_events) for r in got}
    assert (1, 2) in emitted  # first session of user 1 flushed
    assert (2, 1) in emitted  # user 2's session end precedes the watermark
    assert (1, 1) not in emitted  # user 1's trailing session held back


def test_session_append_multibatch_with_heartbeat_equals_batch(spark, tmp_path):
    """maxFilesPerTrigger=1 drain of the APPEND plan: a session spanning
    two micro-batches merges in the state store, the watermark advances
    per batch without late-dropping anything (files land in time order),
    and the trailing sentinel flushes every real session exactly once —
    the multi-batch pin the complete-mode row has, for the production
    append form."""
    import datetime as dt
    import glob
    import os

    from pyspark.sql import functions as F2

    from lovdata_pipeline_spark.streaming.windows import session_windows

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    file_a = [(1, 1, t0), (2, 1, t0 + dt.timedelta(minutes=10)),
              (3, 2, t0), (4, 3, t0 + dt.timedelta(minutes=20))]
    # user 1's event here MERGES into the batch-1 session (gap 25 min);
    # user 2 starts a new session (gap 110 min)
    file_b = [(5, 1, t0 + dt.timedelta(minutes=35)),
              (6, 2, t0 + dt.timedelta(minutes=120))]
    sentinel = [(7, -999, t0 + dt.timedelta(hours=8))]
    schema = "event_id long, user_id long, ts timestamp"

    src = tmp_path / "src"
    src.mkdir()
    for i, (name, rows) in enumerate((("a", file_a), ("b", file_b), ("zz", sentinel))):
        d = tmp_path / f"_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(d))
        [part] = glob.glob(str(d / "part-*.parquet"))
        link = str(src / f"{name}.parquet")
        os.symlink(part, link)
        # file source orders batches by (mtime, path): pin time order so
        # no real event arrives behind the watermark
        os.utime(part, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(
            spark.read.parquet(str(src)).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    sess = session_windows(stream, gap="30 minutes", watermark="0 seconds")
    out = tmp_path / "out"

    def land(bdf, _bid):
        bdf.write.mode("append").parquet(str(out))

    q = (
        sess.writeStream.outputMode("append")
        .foreachBatch(land)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        map(
            tuple,
            spark.read.schema(
                "user_id long, session_start timestamp, session_end timestamp, n_events long"
            )
            .parquet(str(out))
            .filter("user_id <> -999")
            .collect(),
        )
    )
    batch = spark.createDataFrame(file_a + file_b, schema)
    want = sorted(
        map(
            tuple,
            batch.groupBy(F2.session_window("ts", "30 minutes").alias("s"), "user_id")
            .agg(F2.count(F2.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F2.col("s.start").alias("session_start"),
                F2.col("s.end").alias("session_end"),
                "n_events",
            )
            .collect(),
        )
    )
    assert got == want
    # the cross-batch merge really happened: user 1 has ONE 3-event session
    assert (1,) == tuple({r[0] for r in got if r[3] == 3})
