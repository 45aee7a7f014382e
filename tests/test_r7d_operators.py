"""Round-7d pins: count-min sketch and portable HyperLogLog — the
sketch family's exactly-SQL-replayable members.

The driver's oracle gate covers sf0.01 bit-equality; these pin the
sketch SEMANTICS (never-underestimate, mergeability, register math vs
an independent python replica) and partition independence.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class TestCountMin:
    def test_never_underestimates_and_exact_when_wide(self, spark):
        from lovdata_pipeline_spark.operators.sketches import (
            cms_estimate,
            cms_sketch,
        )

        rows = [(i, " ".join(f"w{j}" for j in range(i % 7)), "s") for i in range(1, 40)]
        docs = _docs(spark, rows)
        tok = docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("token")).filter(
            F.col("token") != ""
        )
        true = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n_true"))
        # narrow sketch: estimates may only go UP
        est = cms_estimate(cms_sketch(docs, w=4, d=2), true, w=4, d=2)
        j = true.join(est, "token").collect()
        assert j and all(r.n_est >= r.n_true for r in j)
        # wide sketch: 6 distinct tokens into 512 buckets — collisions
        # essentially impossible, estimates exact
        est_w = cms_estimate(cms_sketch(docs, w=512, d=3), true, w=512, d=3)
        jw = true.join(est_w, "token").collect()
        assert all(r.n_est == r.n_true for r in jw)

    def test_unseen_token_estimates_zero_when_cells_empty(self, spark):
        from lovdata_pipeline_spark.operators.sketches import (
            cms_estimate,
            cms_sketch,
        )

        docs = _docs(spark, [(1, "alpha alpha beta", "s")])
        sk = cms_sketch(docs, w=512, d=3)
        q = spark.createDataFrame([("never-seen-token-xyz",)], "token string")
        [row] = cms_estimate(sk, q, w=512, d=3).collect()
        assert row.n_est == 0

    def test_sketches_merge_by_cellwise_sum(self, spark):
        """CMS(A ∪ B) == cellwise sum of CMS(A) and CMS(B) — the
        mergeable-sketch property the map-side partial aggregation
        relies on."""
        from lovdata_pipeline_spark.operators.sketches import cms_sketch

        a = _docs(spark, [(1, "x y z x", "s")])
        b = _docs(spark, [(2, "y z q q q", "s")])
        merged = (
            cms_sketch(a, w=8, d=2)
            .unionByName(cms_sketch(b, w=8, d=2))
            .groupBy("r", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        direct = cms_sketch(a.unionByName(b), w=8, d=2)
        assert sorted(merged.collect()) == sorted(direct.collect())

    def test_partition_independent(self, spark):
        from lovdata_pipeline_spark.operators.sketches import cms_sketch

        rows = [(i, f"t{i % 11} t{i % 5} common", "s") for i in range(60)]
        docs = _docs(spark, rows)
        a = sorted(cms_sketch(docs, w=16, d=2).collect())
        b = sorted(cms_sketch(docs.repartition(13), w=16, d=2).collect())
        assert a == b


class TestHyperLogLog:
    P = 5
    M = 32

    def _replica(self, tokens: set[str]) -> float:
        """Independent python HLL replica (same hash, same registers,
        same estimate arithmetic)."""
        regs: dict[int, int] = {}
        for t in tokens:
            h = _h60("hll-v1:" + t)
            b = h & (self.M - 1)
            rem = h >> self.P
            rho = (60 - self.P + 1) - rem.bit_length()
            regs[b] = max(regs.get(b, 0), rho)
        scale = 60 - self.P + 1
        s = sum(1 << (scale - r) for r in regs.values())
        v = self.M - len(regs)
        s += v * (1 << scale)
        e = 0.697 * self.M * self.M * float(1 << scale) / s
        if e <= 2.5 * self.M and v > 0:
            e = self.M * math.log(self.M / v)
        return round(e, 6)

    def test_matches_python_replica_bitwise(self, spark):
        from lovdata_pipeline_spark.operators.sketches import (
            hll_estimate,
            hll_registers,
        )

        rows = [(i, " ".join(f"tok{j}" for j in range(i)), f"g{i % 2}") for i in range(1, 9)]
        docs = _docs(spark, rows)
        out = {
            r.source: r.n_est
            for r in hll_estimate(hll_registers(docs, p=self.P), p=self.P).collect()
        }
        for g in ("g0", "g1"):
            toks = set()
            for i, text, src in rows:
                if src == g:
                    toks |= set(text.split())
            assert out[g] == self._replica(toks), g

    def test_estimate_tracks_cardinality(self, spark):
        """500 distinct tokens, m=32: the estimate must land within the
        ~5σ band of HLL's 1.04/√m relative error (≈ ±0.92 here, i.e.
        just a sanity corridor — the replica pin above is the exact
        check)."""
        from lovdata_pipeline_spark.operators.sketches import (
            hll_estimate,
            hll_registers,
        )

        rows = [(i, " ".join(f"u{i}_{j}" for j in range(10)), "big") for i in range(50)]
        docs = _docs(spark, rows)
        [row] = hll_estimate(hll_registers(docs, p=self.P), p=self.P).collect()
        assert 500 * 0.5 < row.n_est < 500 * 2.0

    def test_registers_merge_by_max(self, spark):
        from lovdata_pipeline_spark.operators.sketches import hll_registers

        a = _docs(spark, [(1, "x y z", "s")])
        b = _docs(spark, [(2, "z q r s t", "s")])
        merged = (
            hll_registers(a, p=self.P)
            .unionByName(hll_registers(b, p=self.P))
            .groupBy("source", "bucket")
            .agg(F.max("reg").alias("reg"))
        )
        direct = hll_registers(a.unionByName(b), p=self.P)
        assert sorted(merged.collect()) == sorted(direct.collect())

    def test_partition_independent(self, spark):
        from lovdata_pipeline_spark.operators.sketches import (
            hll_estimate,
            hll_registers,
        )

        rows = [(i, f"a{i % 23} b{i % 7} c", f"s{i % 3}") for i in range(80)]
        docs = _docs(spark, rows)
        a = sorted(hll_estimate(hll_registers(docs, p=self.P), p=self.P).collect())
        b = sorted(
            hll_estimate(hll_registers(docs.repartition(17), p=self.P), p=self.P).collect()
        )
        assert a == b


class TestStreamingSketches:
    """The sketch builders are plain hash aggregates, so they run
    UNCHANGED on a readStream frame (complete mode): each micro-batch
    merges into the running sketch by the sketch's own merge operator
    (cellwise sum / register max). Pinned: multi-batch AvailableNow
    drain == batch sketch, bit-for-bit."""

    def _stream_src(self, spark, tmp_path, name):
        import pandas as pd

        src = tmp_path / name
        src.mkdir()
        # two files => two micro-batches under maxFilesPerTrigger=1
        pd.DataFrame(
            {"doc_id": [1, 2], "text": ["x y z x", "y common common"], "source": ["a", "a"]}
        ).to_parquet(src / "p0.parquet")
        pd.DataFrame(
            {"doc_id": [3, 4], "text": ["z q q common", "x common w"], "source": ["b", "b"]}
        ).to_parquet(src / "p1.parquet")
        batch = spark.read.parquet(str(src))
        stream = spark.readStream.schema(batch.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(str(src))
        return batch, stream

    def test_streaming_cms_equals_batch(self, spark, tmp_path):
        from lovdata_pipeline_spark.operators.sketches import cms_sketch

        batch, stream = self._stream_src(spark, tmp_path, "cms_stream")
        q = (
            cms_sketch(stream, w=8, d=2)
            .writeStream.format("memory")
            .queryName("cms_stream_cells")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt_cms"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            (r.r, r.bucket, r.cnt)
            for r in spark.sql("SELECT * FROM cms_stream_cells").collect()
        )
        want = sorted(
            (r.r, r.bucket, r.cnt) for r in cms_sketch(batch, w=8, d=2).collect()
        )
        assert got == want and got

    def test_streaming_hll_registers_equal_batch(self, spark, tmp_path):
        from lovdata_pipeline_spark.operators.sketches import hll_registers

        batch, stream = self._stream_src(spark, tmp_path, "hll_stream")
        q = (
            hll_registers(stream, p=4)
            .writeStream.format("memory")
            .queryName("hll_stream_regs")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt_hll"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            (r.source, r.bucket, r.reg)
            for r in spark.sql("SELECT * FROM hll_stream_regs").collect()
        )
        want = sorted(
            (r.source, r.bucket, r.reg) for r in hll_registers(batch, p=4).collect()
        )
        assert got == want and got


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_tok = st.sampled_from(["a", "b", "c", "d", "e"])
_text = st.lists(_tok, min_size=0, max_size=10).map(" ".join)
_texts = st.lists(_text, min_size=1, max_size=6)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_texts)
def test_cms_property_vs_counter(spark, texts):
    """Property: on any corpus, narrow-sketch estimates dominate the
    exact Counter, and wide-sketch estimates equal it."""
    from collections import Counter

    from lovdata_pipeline_spark.operators.sketches import cms_estimate, cms_sketch

    docs = spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    true = Counter(w for t in texts for w in t.split())
    if not true:
        return
    q = spark.createDataFrame([(t,) for t in true], "token string")
    narrow = {
        r.token: r.n_est
        for r in cms_estimate(cms_sketch(docs, w=2, d=2), q, w=2, d=2).collect()
    }
    wide = {
        r.token: r.n_est
        for r in cms_estimate(cms_sketch(docs, w=512, d=3), q, w=512, d=3).collect()
    }
    for t, n in true.items():
        assert narrow[t] >= n
        assert wide[t] == n
