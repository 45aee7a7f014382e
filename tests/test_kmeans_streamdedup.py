"""k-means refinement convergence and streaming dedup."""

import pandas as pd


class TestKmeansRefine:
    def test_refinement_tightens_cells(self, spark):
        from pyspark.sql import functions as F

        from lovdata_pipeline_spark.operators import similarity

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        seed = similarity.deterministic_centroids(emb, n_cells=4)
        refined = similarity.kmeans_refine(emb, seed, iterations=3)
        assert len(refined) == len(seed)
        assert all(len(c) == len(seed[0]) for c in refined)

        def sq_error(centroids):
            assigned = similarity.ivf_assign(emb, centroids)
            dists = []
            rows = assigned.collect()
            for r in rows:
                c = centroids[r.cell]
                dists.append(sum((float(v) - x) ** 2 for v, x in zip(r.embedding, c)))
            return sum(dists)

        assert sq_error(refined) <= sq_error(seed)  # Lloyd never increases SSE

    def test_refined_centroids_deterministic(self, spark):
        from lovdata_pipeline_spark.operators import similarity

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        seed = similarity.deterministic_centroids(emb, n_cells=4)
        a = similarity.kmeans_refine(emb.repartition(7), seed, iterations=2)
        b = similarity.kmeans_refine(emb.repartition(2), seed, iterations=2)
        # avg() is a float reduction — allow tiny accumulation-order noise
        for ca, cb in zip(a, b):
            for x, y in zip(ca, cb):
                assert abs(x - y) < 1e-9


class TestStatefulTotals:
    def test_running_user_totals(self, spark, tmp_path):
        from lovdata_pipeline_spark.streaming.windows import running_user_totals

        src = tmp_path / "stream"
        src.mkdir()
        pd.DataFrame(
            {
                "ts": pd.to_datetime(
                    ["2024-01-01 00:00:00", "2024-01-01 00:01:00", "2024-01-01 00:02:00"]
                ),
                "user_id": [1, 1, 2],
                "value": [10.0, 5.0, 7.0],
            }
        ).to_parquet(src / "p0.parquet", coerce_timestamps="us")
        stream = spark.readStream.schema(
            "ts timestamp, user_id long, value double"
        ).parquet(str(src))

        collected: list = []

        def run_once():
            import time

            # memory sink can't recover a stateful checkpoint; foreachBatch can.
            # NOTE: with ProcessingTimeTimeout the query stays alive to fire
            # timeouts even under availableNow — stop it explicitly once the
            # data batch has been delivered.
            q = (
                running_user_totals(stream, timeout_minutes=60)
                .writeStream.foreachBatch(
                    lambda df, _id: collected.extend(df.collect())
                )
                .outputMode("update")
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            deadline = time.time() + 120
            seen = len(collected)
            while time.time() < deadline:
                if not q.isActive:
                    break
                if len(collected) > seen and not q.status["isDataAvailable"]:
                    break
                time.sleep(0.5)
            q.stop()
            q.awaitTermination(30)

        run_once()
        rows = {r.user_id: r for r in collected}
        assert rows[1].n_events == 2 and rows[1].total_value == 15.0
        assert rows[2].n_events == 1 and rows[2].total_value == 7.0

        # second batch continues the state from the checkpoint
        pd.DataFrame(
            {
                "ts": pd.to_datetime(["2024-01-01 00:03:00"]),
                "user_id": [1],
                "value": [1.0],
            }
        ).to_parquet(src / "p1.parquet", coerce_timestamps="us")
        collected.clear()
        run_once()
        rows2 = {r.user_id: r for r in collected}
        assert rows2[1].n_events == 3 and rows2[1].total_value == 16.0


class TestStreamingDedup:
    def test_duplicates_dropped_within_watermark(self, spark, tmp_path):
        from lovdata_pipeline_spark.streaming.windows import streaming_dedup

        src = tmp_path / "stream"
        src.mkdir()
        pd.DataFrame(
            {
                "ts": pd.to_datetime(
                    [
                        "2024-01-01 00:00:00",
                        "2024-01-01 00:05:00",  # dup key within watermark
                        "2024-01-01 00:10:00",
                    ]
                ),
                "key": ["a", "a", "b"],
                "value": [1.0, 2.0, 3.0],
            }
        ).to_parquet(src / "p0.parquet", coerce_timestamps="us")
        stream = spark.readStream.schema("ts timestamp, key string, value double").parquet(
            str(src)
        )
        deduped = streaming_dedup(stream, ["key"], "ts", "1 hour")
        q = (
            deduped.writeStream.format("memory")
            .queryName("dedup_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT key, count(*) n FROM dedup_out GROUP BY key").collect()
        counts = {r.key: r.n for r in rows}
        assert counts == {"a": 1, "b": 1}


class TestStatefulTimeout:
    def test_timed_out_state_is_removed_not_rearmed(self):
        """The timeout invocation must DROP state (bounded streaming state);
        re-arming would keep every key alive forever and phantom-emit."""
        from lovdata_pipeline_spark.streaming.windows import _totals_update

        class FakeState:
            hasTimedOut = True
            exists = True
            get = (3, 30.0)

            def __init__(self):
                self.removed = False
                self.updated = False

            def remove(self):
                self.removed = True

            def update(self, v):
                self.updated = True

            def setTimeoutDuration(self, ms):
                self.updated = True

        state = FakeState()
        out = list(_totals_update(60)((1,), iter([]), state))
        assert out == []          # no phantom emission on expiry
        assert state.removed      # state dropped
        assert not state.updated  # not re-armed

    def test_update_accumulates_and_arms_timeout(self):
        from lovdata_pipeline_spark.streaming.windows import _totals_update

        class FakeState:
            hasTimedOut = False
            exists = True
            get = (2, 10.0)

            def __init__(self):
                self.value = None
                self.timeout_ms = None

            def update(self, v):
                self.value = v

            def setTimeoutDuration(self, ms):
                self.timeout_ms = ms

        state = FakeState()
        batch = pd.DataFrame({"value": [5.0, 7.0]})
        out = list(_totals_update(60)((42,), iter([batch]), state))
        assert state.value == (4, 22.0)
        assert state.timeout_ms == 60 * 60 * 1000
        assert len(out) == 1 and out[0].iloc[0]["total_value"] == 22.0
