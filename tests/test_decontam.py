"""Benchmark decontamination: the n-gram overlap flags must equal a
brute-force set computation for any corpus, and the cut must remove
exactly the flagged documents. Random corpora over a tiny vocabulary
force heavy collisions (the interesting regime) plus the edge cases:
documents shorter than the n-gram width, empty benchmark, a document
fully contained in the benchmark.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from lovdata_pipeline_spark.operators.decontam import (
    benchmark_ngram_set,
    decontaminate,
    decontaminate_rowlocal,
    ngram_overlap_flags,
)

VOCAB = ["a", "b", "c", "d"]
_doc = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=10).map(" ".join)


def _grams(t: str, n: int) -> set[str]:
    w = t.split()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _brute(train, bench, n, min_overlaps):
    bgrams = {}
    for i, t in bench:
        for g in _grams(t, n):
            bgrams.setdefault(g, set()).add(i)
    out = {}
    for i, t in train:
        gs = _grams(t, n)
        hit = {g for g in gs if g in bgrams}
        if len(hit) >= min_overlaps:
            bdocs = set().union(*(bgrams[g] for g in hit)) if hit else set()
            out[i] = (len(gs), len(hit), len(bdocs), len(hit) / len(gs))
    return out


@pytest.mark.usefixtures("spark")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(_doc, min_size=2, max_size=10),
    n=st.sampled_from([2, 3]),
    min_overlaps=st.sampled_from([1, 2]),
)
def test_flags_match_brute_force(spark, texts, n, min_overlaps):
    rows = [(i, t) for i, t in enumerate(texts)]
    bench_rows = [r for r in rows if r[0] % 3 == 0]
    train_rows = [r for r in rows if r[0] % 3 != 0]
    schema = "doc_id long, text string"
    train = spark.createDataFrame(train_rows, schema)
    bench = spark.createDataFrame(bench_rows, schema)
    got = {
        r.doc_id: (r.n_ngrams, r.n_overlap, r.n_benchmark_docs, r.overlap_frac)
        for r in ngram_overlap_flags(
            train, bench, n=n, min_overlaps=min_overlaps
        ).collect()
    }
    assert got == _brute(train_rows, bench_rows, n, min_overlaps)


def test_short_docs_never_flag(spark):
    """Documents with fewer than n words have no n-grams → never flagged,
    and sequence(1, size-n+1) must not wrap to a descending sequence."""
    train = spark.createDataFrame(
        [(1, "x"), (2, "x y"), (3, ""), (4, "x y z")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(0, "x y z w")], "doc_id long, text string")
    flags = ngram_overlap_flags(train, bench, n=3).collect()
    assert {r.doc_id for r in flags} == {4}
    (r,) = flags
    assert (r.n_ngrams, r.n_overlap, r.n_benchmark_docs) == (1, 1, 1)


def test_decontaminate_removes_exactly_the_flags(spark):
    train = spark.createDataFrame(
        [(1, "a b c d"), (2, "c d e f"), (3, "p q r s")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(0, "a b c"), (9, "d e f")], "doc_id long, text string")
    clean = decontaminate(train, bench, n=3)
    assert {r.doc_id for r in clean.collect()} == {3}


def test_null_text_never_flags_and_survives(spark):
    """NULL text has no n-grams: never flagged, survives the cut (both
    join and row-local forms) — 'no content' is trivially clean."""
    train = spark.createDataFrame(
        [(1, None), (2, "a b c d")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    assert {r.doc_id for r in ngram_overlap_flags(train, bench, n=3).collect()} == {2}
    assert {r.doc_id for r in decontaminate(train, bench, n=3).collect()} == {1}
    assert {
        r.doc_id
        for r in decontaminate_rowlocal(train, benchmark_ngram_set(bench)).collect()
    } == {1}


def test_empty_benchmark_flags_nothing(spark):
    train = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    bench = spark.createDataFrame([], "doc_id long, text string")
    assert ngram_overlap_flags(train, bench, n=3).count() == 0
    assert decontaminate(train, bench, n=3).count() == 1
    assert decontaminate_rowlocal(train, benchmark_ngram_set(bench)).count() == 1


@pytest.mark.usefixtures("spark")
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(_doc, min_size=2, max_size=10), n=st.sampled_from([2, 3]))
def test_rowlocal_equals_join_form(spark, texts, n):
    """The streaming row-local filter must keep exactly the rows the
    batch anti-join form keeps, for any corpus."""
    rows = [(i, t) for i, t in enumerate(texts)]
    schema = "doc_id long, text string"
    train = spark.createDataFrame([r for r in rows if r[0] % 3 != 0], schema)
    bench = spark.createDataFrame([r for r in rows if r[0] % 3 == 0], schema)
    via_join = {r.doc_id for r in decontaminate(train, bench, n=n).collect()}
    via_local = {
        r.doc_id
        for r in decontaminate_rowlocal(
            train, benchmark_ngram_set(bench, n=n), n=n
        ).collect()
    }
    assert via_local == via_join


def test_exact_substring_contamination(spark):
    from lovdata_pipeline_spark.operators.decontam import (
        exact_substring_contamination,
    )

    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (1, "prefix words then alpha beta gamma delta epsilon more"),
            (2, "xalpha beta gamma delta epsilon zeta"),  # misaligned: no hit
            (3, "alpha  beta\tgamma   delta epsilon"),  # odd whitespace: hit
            (4, None),
        ],
        "doc_id long, text string",
    )
    needles = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.needle_id): r.position
        for r in exact_substring_contamination(corpus, needles).collect()
    }
    assert got == {(0, 100): 1, (1, 100): 19, (3, 100): 1}
    # needles below the anchor floor take no part
    short = spark.createDataFrame([(101, "alpha beta")], "doc_id long, text string")
    assert exact_substring_contamination(corpus, short).count() == 0


def test_exact_contamination_rowlocal_matches_join_form(spark):
    from lovdata_pipeline_spark.operators.decontam import (
        exact_contamination_rowlocal,
        exact_substring_contamination,
    )

    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "unrelated words entirely different content here"),
            (2, "pre alpha  beta\tgamma delta epsilon post"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    needles_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    flagged = {
        r.doc_id
        for r in exact_substring_contamination(corpus, needles_df).collect()
    }
    survivors = {
        r.doc_id
        for r in exact_contamination_rowlocal(
            corpus, ["alpha   beta gamma delta epsilon"]  # un-normalized input
        ).collect()
    }
    all_ids = {r.doc_id for r in corpus.collect()}
    assert survivors == all_ids - flagged == {1, 3}
    # empty needle list keeps everything
    assert exact_contamination_rowlocal(corpus, ["", "   "]).count() == 4


class TestRemoveContaminatedSpans:
    def _run(self, spark, rows, needles, **kw):
        from lovdata_pipeline_spark.operators.decontam import (
            remove_contaminated_spans,
        )

        corpus = spark.createDataFrame(rows, "doc_id long, text string")
        ndl = spark.createDataFrame(needles, "doc_id long, text string")
        return {
            r.doc_id: r
            for r in remove_contaminated_spans(
                corpus, ndl, keep_text=True, **kw
            ).collect()
        }

    def test_surgery_union_semantics(self, spark):
        """Chains of consecutive occurrences are fully excised, the
        whole-doc match empties the doc, overlapping needles compose by
        position union, and untouched/NULL/short docs pass through."""
        got = self._run(
            spark,
            [
                (1, "x a b c d e a b c d e y"),  # consecutive chain
                (2, "a b c d e"),  # doc == needle
                (3, "clean document with no leak here at all"),
                (4, None),
                (5, "tiny"),
                (6, "  p q   a b c d e  r   "),  # messy whitespace
                (7, "a b c d e f g h"),  # two needles overlap on d..e
            ],
            [(100, "a b c d e"), (101, "d e f g h"), (102, "a b")],
        )
        assert (got[1].n_needles_hit, got[1].n_tokens_removed, got[1].clean_text) == (1, 10, "x y")
        assert (got[2].n_tokens_removed, got[2].clean_text) == (5, "")
        assert (got[3].n_needles_hit, got[3].clean_text) == (0, "clean document with no leak here at all")
        assert (got[4].n_needles_hit, got[4].clean_text) == (0, "")
        assert got[5].clean_text == "tiny"
        assert got[6].clean_text == "p q r"
        # union of needle 100 (pos 1-5) and 101 (pos 4-8) covers all 8
        assert (got[7].n_needles_hit, got[7].n_tokens_removed, got[7].clean_text) == (2, 8, "")

    def test_clean_hash_matches_normalized_text(self, spark):
        import hashlib

        got = self._run(
            spark,
            [(1, " spaced   out  doc "), (2, "a b c d e tail words")],
            [(100, "a b c d e")],
        )
        assert got[1].clean_hash == hashlib.md5(b"spaced out doc").hexdigest()
        assert got[2].clean_hash == hashlib.md5(b"tail words").hexdigest()

    def test_partition_independence(self, spark):
        """Same result under different input partitionings (the surgery
        is scan-local; only the candidate join shuffles)."""
        from lovdata_pipeline_spark.operators.decontam import (
            remove_contaminated_spans,
        )

        rows = [
            (i, f"w{i} a b c d e suffix{i} a b c d e")
            for i in range(40)
        ] + [(99, None)]
        corpus = spark.createDataFrame(rows, "doc_id long, text string")
        ndl = spark.createDataFrame(
            [(100, "a b c d e")], "doc_id long, text string"
        )
        a = sorted(
            map(tuple, remove_contaminated_spans(corpus, ndl).collect())
        )
        b = sorted(
            map(
                tuple,
                remove_contaminated_spans(
                    corpus.repartition(13), ndl.repartition(3)
                ).collect(),
            )
        )
        assert a == b and len(a) == 41
        n_removed = {t[0]: t[2] for t in a}
        assert all(n_removed[i] == 10 for i in range(40))


class TestRemoveContaminatedSpansRowlocal:
    def test_matches_join_form(self, spark):
        """For needles at/above the join form's anchor floor, the pure
        projection form produces identical rows (including hashes)."""
        from lovdata_pipeline_spark.operators.decontam import (
            remove_contaminated_spans,
            remove_contaminated_spans_rowlocal,
        )

        corpus = spark.createDataFrame(
            [
                (1, "x a b c d e a b c d e y"),
                (2, "a b c d e"),
                (3, "clean document with no leak here at all"),
                (4, None),
                (5, "a b c d e f g h"),
            ],
            "doc_id long, text string",
        )
        ndl_rows = [(100, "a b c d e"), (101, "d e f g h")]
        ndl_df = spark.createDataFrame(ndl_rows, "doc_id long, text string")
        via_join = sorted(
            map(tuple, remove_contaminated_spans(corpus, ndl_df, keep_text=True).collect())
        )
        via_local = sorted(
            map(
                tuple,
                remove_contaminated_spans_rowlocal(
                    corpus, [t for _, t in ndl_rows], keep_text=True
                ).collect(),
            )
        )
        assert via_join == via_local

    def test_empty_needles_and_below_floor(self, spark):
        from lovdata_pipeline_spark.operators.decontam import (
            remove_contaminated_spans_rowlocal,
        )

        corpus = spark.createDataFrame(
            [(1, "a b word"), (2, " padded  text ")], "doc_id long, text string"
        )
        got = {
            r.doc_id: r
            for r in remove_contaminated_spans_rowlocal(
                corpus, [], keep_text=True
            ).collect()
        }
        assert got[1].clean_text == "a b word" and got[1].n_needles_hit == 0
        assert got[2].clean_text == "padded text"
        # short needles DO take part here (no anchor floor) — documented
        got2 = {
            r.doc_id: r
            for r in remove_contaminated_spans_rowlocal(
                corpus, ["a b"], keep_text=True
            ).collect()
        }
        assert got2[1].clean_text == "word" and got2[1].n_tokens_removed == 2

    def test_streaming_composes(self, spark, tmp_path):
        """The projection form runs inside a real stream (availableNow)
        with no watermark or state requirements."""
        import pandas as pd

        from lovdata_pipeline_spark.operators.decontam import (
            remove_contaminated_spans_rowlocal,
        )

        src = tmp_path / "docs_surgery_stream"
        src.mkdir()
        pd.DataFrame(
            {"doc_id": [1, 2], "text": ["keep secret leak phrase out", "fine text"]}
        ).to_parquet(src / "p0.parquet")
        stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
        out = remove_contaminated_spans_rowlocal(
            stream, ["secret leak phrase"], keep_text=True
        )
        q = (
            out.writeStream.format("memory").queryName("surg_stream")
            .option("checkpointLocation", str(tmp_path / "ckpt_surg"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = {r.doc_id: r for r in spark.sql("SELECT * FROM surg_stream").collect()}
        assert rows[1].clean_text == "keep out" and rows[1].n_tokens_removed == 3
        assert rows[2].clean_text == "fine text" and rows[2].n_needles_hit == 0


class TestSurgeryRandomizedDifferential:
    def test_matches_python_replica_on_random_corpus(self, spark):
        """200 random docs × 4 needles over a tiny vocabulary (maximizes
        chance overlaps, chains, and adjacent matches) must match a
        direct Python implementation of the covered-position-union
        semantics row for row."""
        import random

        rng = random.Random(1234)
        vocab = ["a", "b", "c", "d"]
        docs_rows = []
        for i in range(200):
            n = rng.randrange(0, 25)
            docs_rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
        needle_texts = ["a b a", "b b", "c d a b", "a a a"]

        def replica(text, needles):
            words = text.split() if text else []
            covered = set()
            hit = set()
            for ndl in needles:
                nw = ndl.split()
                for p in range(len(words) - len(nw) + 1):
                    if words[p : p + len(nw)] == nw:
                        covered.update(range(p, p + len(nw)))
                        hit.add(ndl)
            kept = [w for j, w in enumerate(words) if j not in covered]
            return len(hit), len(covered), " ".join(kept)

        from lovdata_pipeline_spark.operators.decontam import (
            remove_contaminated_spans_rowlocal,
        )

        docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_needles_hit, r.n_tokens_removed, r.clean_text)
            for r in remove_contaminated_spans_rowlocal(
                docs, needle_texts, keep_text=True
            ).collect()
        }
        n_docs_hit = 0
        for did, text in docs_rows:
            want = replica(text, needle_texts)
            assert got[did] == want, (did, text, got[did], want)
            n_docs_hit += want[0] > 0
        # the fixture must actually exercise the machinery
        assert n_docs_hit > 50


def test_surgery_hot_anchor_candidates_stay_correct(spark):
    """A stock-phrase anchor shared by EVERY doc floods the candidate
    join (documented contract: wider candidates, never wider output) —
    only docs containing the FULL needle get cut, and only at the
    needle, not the shared anchor."""
    from lovdata_pipeline_spark.operators.decontam import (
        remove_contaminated_spans,
    )

    stock = "in the matter of the application"
    rows = []
    for i in range(60):
        if i % 3 == 0:
            rows.append((i, f"{stock} for case {i} granted with costs"))
        else:
            rows.append((i, f"{stock} concerning case {i} dismissed today"))
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    needles = spark.createDataFrame(
        [(100, f"{stock} for case 0 granted")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r
        for r in remove_contaminated_spans(
            corpus, needles, anchor_n=5, keep_text=True
        ).collect()
    }
    assert got[0].n_needles_hit == 1 and got[0].clean_text == "with costs"
    hit = [d for d, r in got.items() if r.n_needles_hit > 0]
    assert hit == [0]  # every other doc shares the anchor but not the needle
    assert got[3].clean_text == rows[3][1]
