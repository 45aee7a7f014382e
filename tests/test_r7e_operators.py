"""Round-7e pins: per-label centroid outliers and positional-index
phrase search (the driver oracle covers sf0.01 bit-equality)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestLabelCentroidOutliers:
    def _vectors(self, spark):
        # label 0 clusters near +x with one planted -x outlier (id 99);
        # label 1 clusters near +y with one planted +x outlier (id 88)
        rows = [
            (1, [1.0, 0.0, 0.0], 0),
            (2, [0.9, 0.1, 0.0], 0),
            (3, [0.95, -0.05, 0.0], 0),
            (99, [-1.0, 0.0, 0.0], 0),
            (11, [0.0, 1.0, 0.0], 1),
            (12, [0.1, 0.9, 0.0], 1),
            (88, [1.0, 0.05, 0.0], 1),
            (50, None, 0),  # NULL vector: excluded
            (51, [1.0, 1.0, 1.0], None),  # NULL label: excluded
            (52, [0.0, 0.0, 0.0], 1),  # zero norm: excluded
        ]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )

    def test_planted_outliers_rank_first(self, spark):
        from lovdata_pipeline_spark.operators.similarity import (
            label_centroid_outliers,
        )

        out = label_centroid_outliers(self._vectors(spark), k=2).collect()
        worst = {r.label: r.vec_id for r in out if r.rk == 1}
        assert worst == {0: 99, 1: 88}
        ids = {r.vec_id for r in out}
        assert 50 not in ids and 51 not in ids and 52 not in ids

    def test_scores_are_cosine_to_centroid_direction(self, spark):
        """The planted -x outlier of the +x cluster must score ~-1."""
        from lovdata_pipeline_spark.operators.similarity import (
            label_centroid_outliers,
        )

        out = {
            (r.label, r.vec_id): r.cos_centroid
            for r in label_centroid_outliers(self._vectors(spark), k=4).collect()
        }
        assert out[(0, 99)] < -0.95
        # 88 drags its own centroid toward +x, so its score is mid-range
        # (centroid ~(1.1, 1.95)) — still clearly below the cluster's
        assert out[(1, 88)] < 0.6 < out[(1, 11)]

    def test_partition_independent(self, spark):
        from lovdata_pipeline_spark.operators.similarity import (
            label_centroid_outliers,
        )

        rows = [
            (i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(6)], i % 3)
            for i in range(60)
        ]
        vecs = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )
        a = sorted(label_centroid_outliers(vecs, k=3).collect())
        b = sorted(label_centroid_outliers(vecs.repartition(13), k=3).collect())
        assert a == b


class TestPhraseSearch:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_counts_and_order_sensitivity(self, spark):
        from lovdata_pipeline_spark.operators.search import phrase_match_counts

        docs = self._docs(
            spark,
            [
                (1, "the quick brown fox and the quick brown dog"),
                (2, "brown quick the"),  # reversed: no match
                (3, "THE Quick BROWN"),  # case-folded: matches
                (4, "the quick quick brown"),  # interrupted: no match
                (5, None),
            ],
        )
        out = {
            r.doc_id: r.n_matches
            for r in phrase_match_counts(docs, "the quick brown").collect()
        }
        assert out == {1: 2, 3: 1}

    def test_overlapping_matches_count_separately(self, spark):
        from lovdata_pipeline_spark.operators.search import phrase_match_counts

        docs = self._docs(spark, [(1, "a a a a")])
        [row] = phrase_match_counts(docs, "a a").collect()
        assert row.n_matches == 3

    def test_empty_phrase_raises(self, spark):
        from lovdata_pipeline_spark.operators.search import phrase_match_counts

        with pytest.raises(ValueError):
            phrase_match_counts(self._docs(spark, [(1, "x")]), "   ")

    def test_single_term_phrase_is_term_count(self, spark):
        from lovdata_pipeline_spark.operators.search import phrase_match_counts

        docs = self._docs(spark, [(1, "x y x z x"), (2, "y z")])
        out = {r.doc_id: r.n_matches for r in phrase_match_counts(docs, "x").collect()}
        assert out == {1: 3}

    def test_partition_independent(self, spark):
        from lovdata_pipeline_spark.operators.search import phrase_match_counts

        rows = [(i, "alpha beta gamma " * (i % 4 + 1)) for i in range(40)]
        docs = self._docs(spark, rows)
        a = sorted(phrase_match_counts(docs, "beta gamma alpha").collect())
        b = sorted(
            phrase_match_counts(docs.repartition(11), "beta gamma alpha").collect()
        )
        assert a == b and a


class TestPostingsIndex:
    """Persisted positional inverted index: layout (tbucket partition
    pruning), version gate, and index == in-memory equality (both forms
    share _phrase_align, so alignment cannot diverge — this pins the
    LAYOUT path: write, sidecar, bucket probe, pushed term filter)."""

    def _docs(self, spark):
        rows = [
            (1, "the quick brown fox and the quick brown dog"),
            (2, "brown quick the"),
            (3, "THE Quick BROWN"),
            (4, "row column sort row column sort"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_index_equals_in_memory_and_prunes_partitions(self, spark, tmp_path):
        from lovdata_pipeline_spark.operators.search import (
            phrase_match_counts,
            postings_phrase_counts,
            postings_write,
        )

        docs = self._docs(spark)
        idx = str(tmp_path / "postings_idx")
        postings_write(docs, idx, n_buckets=8)
        for phrase in ("the quick brown", "row column sort", "quick"):
            via_index = sorted(postings_phrase_counts(spark, idx, phrase).collect())
            in_memory = sorted(phrase_match_counts(docs, phrase).collect())
            assert via_index == in_memory and via_index, phrase
        plan = (
            postings_phrase_counts(spark, idx, "the quick brown")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PartitionFilters" in plan and "tbucket" in plan

    def test_version_gate(self, spark, tmp_path):
        import json
        import os

        from lovdata_pipeline_spark.operators.search import (
            postings_phrase_counts,
            postings_write,
        )

        idx = str(tmp_path / "postings_vgate")
        postings_write(self._docs(spark), idx, n_buckets=4)
        p = os.path.join(idx, "_postings_params.json")
        params = json.load(open(p))
        params["version"] = 999
        json.dump(params, open(p, "w"))
        with pytest.raises(ValueError, match="version"):
            postings_phrase_counts(spark, idx, "the quick")


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_token = st.sampled_from(["a", "b", "c", "d"])
_doc = st.lists(_token, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)
_phrase = st.lists(_token, min_size=1, max_size=3).map(" ".join)


def _naive_phrase_counts(texts, phrase):
    terms = phrase.split()
    out = {}
    for i, t in enumerate(texts):
        words = t.lower().split()
        n = sum(
            1
            for p in range(len(words) - len(terms) + 1)
            if words[p : p + len(terms)] == terms
        )
        if n:
            out[i] = n
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_corpus, phrase=_phrase)
def test_phrase_search_matches_naive_matcher(spark, texts, phrase):
    """Property: the positional-index join equals a naive sliding-window
    matcher on any small-alphabet corpus and any 1-3 token phrase
    (overlaps, repeats, and absent terms included)."""
    from lovdata_pipeline_spark.operators.search import phrase_match_counts

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: r.n_matches for r in phrase_match_counts(docs, phrase).collect()}
    assert got == _naive_phrase_counts(texts, phrase)


_dim = 4
_vec = st.lists(
    st.integers(-5, 5).map(float), min_size=_dim, max_size=_dim
)
_labeled = st.lists(
    st.tuples(_vec, st.integers(0, 1)), min_size=2, max_size=10
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=_labeled)
def test_centroid_outlier_scores_match_numpy(spark, data):
    """Property: cos_centroid equals a numpy replica of the quantized
    sum-vector cosine on random integer-valued labeled vectors."""
    import numpy as np

    from lovdata_pipeline_spark.operators.similarity import label_centroid_outliers

    rows = [(i, v, lab) for i, (v, lab) in enumerate(data)]
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = {
        (r.label, r.vec_id): r.cos_centroid
        for r in label_centroid_outliers(vecs, k=len(rows)).collect()
    }
    scale = 1 << 20
    by_label = {}
    for i, v, lab in rows:
        a = np.array(v)
        if np.sqrt(np.sum(a * a)) == 0:
            continue
        by_label.setdefault(lab, []).append((i, a))
    for lab, members in by_label.items():
        s = np.sum([np.floor(m * scale) for _, m in members], axis=0)
        sn = np.sqrt(np.sum(s * s))
        if sn == 0:
            assert not any(k[0] == lab for k in got)
            continue
        for i, a in members:
            want = round(float(np.dot(a, s)) / (float(np.sqrt(np.sum(a * a))) * float(sn)), 6)
            assert got[(lab, i)] == pytest.approx(want, abs=2e-6), (lab, i)
