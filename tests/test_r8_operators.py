"""Round-8 pins: trigram Kneser-Ney (two back-off levels), the HLL
register store (write/load/merge symmetry with the CMS store), and the
IVF candidate path for graph.knn_edges.

Each class pins SEMANTICS on hand-built fixtures (the driver's oracle
gate covers sf0.01 equality); partition-independence is asserted
wherever an accumulation could leak order.
"""

from __future__ import annotations

from pyspark.sql import functions as F


class TestTrigramKN:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_single_trigram_closed_form(self, spark):
        """One doc, one trigram: every count and fan-out is 1, so
        P = (1-D)/1 + D*((1-D)/1 + D*(1/1)) = 0.25 + 0.75*1.0 = 1.0
        exactly and the surprisal is 0."""
        from lovdata_pipeline_spark.operators.textstats import (
            kn_trigram_surprisal,
        )

        [row] = kn_trigram_surprisal(self._docs(spark, [(1, "a b c")])).collect()
        assert row.n_trigrams == 1
        assert row.mean_kn3_surprisal == 0.0

    def test_short_docs_absent(self, spark):
        from lovdata_pipeline_spark.operators.textstats import (
            kn_trigram_surprisal,
        )

        docs = self._docs(spark, [(1, "only two"), (2, "x"), (3, "a b c d")])
        got = {r.doc_id for r in kn_trigram_surprisal(docs).collect()}
        assert got == {3}

    def test_francisco_continuation_one_order_up(self, spark):
        """KN's point, one order up (extends the bigram 'francisco'
        pin): two probe trigrams (q q f) and (q q x) share every
        highest- and middle-order count, but f continues only TWO
        distinct left contexts in the corpus while x continues six —
        so f's unigram-continuation weight is smaller and (q q f)
        carries HIGHER surprisal, even though f's raw corpus frequency
        (20x) dwarfs x's."""
        from lovdata_pipeline_spark.operators.textstats import (
            kn_trigram_surprisal,
        )

        rows = [(1, " ".join(["a b f"] * 20))]
        rows += [(10 + i, f"p c{i} x") for i in range(5)]
        rows += [(100, "q q f"), (200, "q q x")]
        out = {r.doc_id: r.mean_kn3_surprisal for r in
               kn_trigram_surprisal(self._docs(spark, rows)).collect()}
        assert out[100] > out[200]

    def test_partition_independent(self, spark):
        from lovdata_pipeline_spark.operators.textstats import (
            kn_trigram_surprisal,
        )

        rows = [(i, "the quick brown fox jumps over the lazy dog the quick fox")
                for i in range(8)] + [(99, "over the lazy brown fox")]
        docs = self._docs(spark, rows)
        a = sorted(map(tuple, kn_trigram_surprisal(docs).collect()))
        b = sorted(map(tuple, kn_trigram_surprisal(docs.repartition(13)).collect()))
        assert a == b


class TestKnnEdgesIvfCandidates:
    def _clusters(self, spark):
        """Four tight, well-separated clusters on the unit sphere: each
        vector's true k-NN are its own cluster-mates, so probing the
        own-cluster cells recovers the exact graph."""
        import math

        rows = []
        anchors = [(1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0),
                   (-1.0, 0.0, 0.0)]
        vid = 0
        for ci, (ax, ay, az) in enumerate(anchors):
            for j in range(15):
                eps = 1e-3 * (j + 1)
                vec = [ax + eps * math.sin(j), ay + eps * math.cos(j),
                       az + eps * math.sin(2 * j)]
                rows.append((vid, vec))
                vid += 1
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_ivf_equals_blocked_on_clustered_data(self, spark):
        from lovdata_pipeline_spark.operators.graph import knn_edges

        vecs = self._clusters(spark)
        exact = sorted(map(tuple, knn_edges(vecs, k=3).collect()))
        ivf = sorted(map(tuple, knn_edges(
            vecs, k=3, candidates="ivf", n_cells=8, n_probe=4
        ).collect()))
        assert ivf == exact

    def test_ivf_full_probe_degrades_to_exact(self, spark):
        """n_probe = n_cells probes every cell — the graceful
        degradation bound: exact on ANY data, clustered or not."""
        import math

        from lovdata_pipeline_spark.operators.graph import knn_edges

        rows = [(i, [math.cos(0.37 * i + 0.1 * j) for j in range(8)])
                for i in range(40)]
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        exact = sorted(map(tuple, knn_edges(vecs, k=3).collect()))
        ivf = sorted(map(tuple, knn_edges(
            vecs, k=3, candidates="ivf", n_cells=4, n_probe=4
        ).collect()))
        assert ivf == exact

    def test_ivf_excludes_self_and_zero_norm(self, spark):
        from lovdata_pipeline_spark.operators.graph import knn_edges

        vecs = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]),
             (4, [0.1, 0.9]), (5, [0.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        edges = knn_edges(vecs, k=2, candidates="ivf", n_cells=2, n_probe=2).collect()
        assert 5 not in {r.src for r in edges}
        assert all(r.dst != 5 and r.src != r.dst for r in edges)

    def test_unknown_candidates_raises(self, spark):
        import pytest
        from lovdata_pipeline_spark.operators.graph import knn_edges

        vecs = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="candidates"):
            knn_edges(vecs, candidates="nope")


class TestHllRegisterStore:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, source string, text string")

    def test_write_load_round_trip(self, spark, tmp_path):
        from lovdata_pipeline_spark.operators.sketches import (
            hll_registers,
            hll_registers_load,
            hll_registers_write,
        )

        docs = self._docs(spark, [(1, "web", "alpha beta gamma"),
                                  (2, "books", "delta epsilon")])
        regs = hll_registers(docs, p=5)
        path = str(tmp_path / "hll_store")
        hll_registers_write(regs, path, p=5)
        loaded, p, group_col = hll_registers_load(spark, path)
        assert (p, group_col) == (5, "source")
        assert sorted(map(tuple, loaded.collect())) == sorted(
            map(tuple, regs.collect())
        )

    def test_version_and_salt_gates(self, spark, tmp_path):
        import json
        import pytest
        from lovdata_pipeline_spark.operators.sketches import (
            hll_registers,
            hll_registers_load,
            hll_registers_write,
        )

        docs = self._docs(spark, [(1, "web", "alpha")])
        path = str(tmp_path / "hll_gate")
        hll_registers_write(hll_registers(docs, p=5), path, p=5)
        side = tmp_path / "hll_gate" / "_hll_params.json"
        params = json.loads(side.read_text())
        params["salt"] = "hll-v0"
        side.write_text(json.dumps(params))
        with pytest.raises(ValueError, match="salt"):
            hll_registers_load(spark, path)
        params["salt"] = "hll-v1"
        params["version"] = 99
        side.write_text(json.dumps(params))
        with pytest.raises(ValueError, match="version"):
            hll_registers_load(spark, path)

    def test_cross_store_merge_equals_full_corpus(self, spark, tmp_path):
        """The mergeability contract, now THROUGH the store: registers
        built on two disjoint halves, persisted separately, loaded and
        register-wise MAXed == registers built on the full corpus —
        so cross-day estimates never require re-reading day text."""
        from lovdata_pipeline_spark.operators.sketches import (
            hll_estimate,
            hll_registers,
            hll_registers_load,
            hll_registers_merge,
            hll_registers_write,
        )

        rows = [(i, "web" if i % 3 else "books",
                 f"tok{i} tok{i % 7} shared word{i % 11}") for i in range(60)]
        docs = self._docs(spark, rows)
        day1 = docs.filter(F.col("doc_id") % 2 == 0)
        day2 = docs.filter(F.col("doc_id") % 2 == 1)
        p1, p2 = str(tmp_path / "d1"), str(tmp_path / "d2")
        hll_registers_write(hll_registers(day1, p=5), p1, p=5)
        hll_registers_write(hll_registers(day2, p=5), p2, p=5)
        r1, _, g1 = hll_registers_load(spark, p1)
        r2, _, _ = hll_registers_load(spark, p2)
        merged = hll_registers_merge([r1, r2], group_col=g1)
        full = hll_registers(docs, p=5)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, full.collect())
        )
        est_m = {r.source: r.n_est for r in hll_estimate(merged, p=5).collect()}
        est_f = {r.source: r.n_est for r in hll_estimate(full, p=5).collect()}
        assert est_m == est_f

    def test_merge_empty_list_raises(self, spark):
        import pytest
        from lovdata_pipeline_spark.operators.sketches import hll_registers_merge

        with pytest.raises(ValueError, match="no stores"):
            hll_registers_merge([])


class TestR8Properties:
    """Hypothesis pins for the r8 operators (the dedup_properties
    discipline: few examples, real Spark, no deadline)."""

    from hypothesis import HealthCheck, given, settings, strategies as st

    _texts = st.lists(
        st.text(alphabet="ab cd", min_size=0, max_size=40),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
    @given(texts=_texts)
    def test_bloom_never_false_negative(self, spark, texts):
        """∀ corpus: every token the corpus contains probes True, at
        any filter width — the Bloom contract's hard half."""
        from pyspark.sql import functions as F

        from lovdata_pipeline_spark.operators.sketches import (
            bloom_build,
            bloom_probe,
        )
        from lovdata_pipeline_spark.operators.textstats import _words

        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        vocab = docs.select(F.explode(_words("text")).alias("token")).distinct()
        if not vocab.count():
            return
        sk = bloom_build(docs, m_bits=126, k=2)  # deliberately narrow
        got = bloom_probe(sk, vocab, m_bits=126, k=2)
        assert got.filter(~F.col("in_filter")).count() == 0

    @settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
    @given(texts=_texts)
    def test_trigram_kn_probabilities_valid(self, spark, texts):
        """∀ corpus: every observed trigram's interpolated KN
        probability lies in (0, 1] ⇒ surprisal ≥ 0 and finite — no
        max(·,0) branch is ever needed because the corpus is its own
        model."""
        import math

        from lovdata_pipeline_spark.operators.textstats import (
            kn_trigram_surprisal,
        )

        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        for r in kn_trigram_surprisal(docs).collect():
            assert r.n_trigrams >= 1
            assert r.mean_kn3_surprisal >= 0.0
            assert math.isfinite(r.mean_kn3_surprisal)


class TestBloomFilter:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_no_false_negatives(self, spark):
        from lovdata_pipeline_spark.operators.sketches import (
            bloom_build,
            bloom_probe,
        )

        docs = self._docs(
            spark, [(i, f"tok{i} shared word{i % 5}") for i in range(30)]
        )
        sk = bloom_build(docs, m_bits=256, k=3)
        vocab = spark.createDataFrame(
            [(f"tok{i}",) for i in range(30)] + [("shared",)], "token string"
        )
        got = {r.token: r.in_filter for r in
               bloom_probe(sk, vocab, m_bits=256, k=3).collect()}
        assert all(got.values())  # every inserted token must hit

    def test_mergeability_union_equals_bitor(self, spark):
        """filter(A ∪ B) == bit_or-merge of filter(A), filter(B) — the
        mergeable-sketch property: day filters combine with one word
        aggregate, no corpus re-read."""
        from pyspark.sql import functions as F

        from lovdata_pipeline_spark.operators.sketches import bloom_build

        a = self._docs(spark, [(i, f"alpha{i} x") for i in range(10)])
        b = self._docs(spark, [(100 + i, f"beta{i} y") for i in range(10)])
        full = bloom_build(a.unionByName(b), m_bits=128, k=3)
        merged = (
            bloom_build(a, m_bits=128, k=3)
            .unionByName(bloom_build(b, m_bits=128, k=3))
            .groupBy("word_idx")
            .agg(F.bit_or("bits").alias("bits"))
        )
        assert sorted(map(tuple, full.collect())) == sorted(
            map(tuple, merged.collect())
        )

    def test_partition_independent(self, spark):
        from lovdata_pipeline_spark.operators.sketches import bloom_build

        docs = self._docs(
            spark, [(i, f"w{i % 17} q{i % 3}") for i in range(40)]
        )
        a = sorted(map(tuple, bloom_build(docs, m_bits=128, k=2).collect()))
        b = sorted(
            map(tuple, bloom_build(docs.repartition(13), m_bits=128, k=2).collect())
        )
        assert a == b
