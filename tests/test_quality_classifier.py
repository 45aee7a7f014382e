"""Hashed linear quality classifier: Spark output must equal a pure-
Python replica of the hash-weight model (md5-derived integer weights,
exact integer sum, one IEEE division), stay partition-independent, and
handle the short-document edges."""

from __future__ import annotations

import hashlib
import math

from lovdata_pipeline_spark.operators.textstats import hashed_linear_quality

SEED = "quality-v1"


def _weight(w: str) -> int:
    h = int(hashlib.md5((w + SEED).encode()).hexdigest()[:15], 16)
    return h % 10001 - 5000


def _expect(text: str):
    toks = text.strip().lower().split()
    if not toks:
        toks = [""]  # split('') yields one empty token in both engines
    s = sum(_weight(w) for w in toks)
    logit = s / (len(toks) * 5000)
    return (
        len(toks),
        logit,
        round(1.0 / (1.0 + math.exp(-4.0 * logit)), 6),
        logit > 0,
    )


def test_matches_python_replica(spark):
    texts = ["the quick brown fox", "spark spark spark", "a", "x y z w v u"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.quality_logit, r.quality_score, r.keep)
        for r in hashed_linear_quality(df).collect()
    }
    for i, t in enumerate(texts):
        n, logit, score, keep = _expect(t)
        assert got[i][0] == n
        assert got[i][1] == logit  # bit-exact: integer sum + one division
        assert abs(got[i][2] - score) < 2e-6
        assert got[i][3] == keep


def test_null_text_scores_instead_of_vanishing(spark):
    """A NULL text row must still produce a scored row, never silently
    drop from the output. Since the r6 whitespace audit removed phantom
    '' tokens, empty/NULL docs score the NEUTRAL point (0 tokens, logit
    0, sigmoid 0.5, keep False) instead of an arbitrary ''-hash weight."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "real words")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in hashed_linear_quality(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].n_tokens == got[2].n_tokens == 0
    assert got[1].quality_logit == got[2].quality_logit == 0.0
    assert got[1].quality_score == 0.5 and got[1].keep is False


def test_partition_independent(spark):
    rows = [(i, f"w{i % 7} w{i % 5} w{i % 3} common words here") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, hashed_linear_quality(df).collect()))
    b = sorted(map(tuple, hashed_linear_quality(df.repartition(13)).collect()))
    assert a == b


def test_stutter_scores_single_token_weight(spark):
    """A document repeating one token n times has logit = w/5000 exactly,
    independent of n — the mean normalization contract."""
    df = spark.createDataFrame(
        [(1, "dup"), (2, "dup dup dup dup")], "doc_id long, text string"
    )
    r = {x.doc_id: x.quality_logit for x in hashed_linear_quality(df).collect()}
    assert r[1] == r[2] == _weight("dup") / 5000


def test_gopher_quality_rules(spark):
    from lovdata_pipeline_spark.operators.textstats import gopher_quality

    good = "the quick brown fox jumps over that lazy dog with style and grace " * 5
    bullets = "\n".join(f"- item {i}" for i in range(60))
    dups = "\n".join(["same line of text here"] * 40 + ["the of and"] * 10)
    rows = [
        (0, good),        # passes every rule
        (1, "short"),     # word-count floor
        (2, bullets),     # bullet-line fraction
        (3, dups),        # duplicate-line fraction
        (4, None),        # NULL text: zeros, no crash
        (5, ""),          # empty text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_quality(df).collect()}
    assert got[0].gopher_pass
    assert not got[1].gopher_pass and got[1].n_words == 1
    assert not got[2].gopher_pass and got[2].frac_bullet_lines == 1.0
    assert not got[3].gopher_pass and got[3].frac_dup_lines > 0.3
    for i in (4, 5):
        assert got[i].n_words == 0 and not got[i].gopher_pass
        assert got[i].mean_word_len == 0.0 and got[i].frac_dup_lines == 0.0
    assert got[0].n_stop_present >= 2


def test_hashed_importance_score_prefers_target_like_docs(spark):
    from lovdata_pipeline_spark.operators.textstats import hashed_importance_score

    target_phrase = "alpha beta gamma delta " * 10
    noise = "zulu yankee xray whiskey " * 10
    raw_rows = [(i, target_phrase if i < 5 else noise) for i in range(10)]
    tgt_rows = [(100 + i, target_phrase) for i in range(5)]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tgt = spark.createDataFrame(tgt_rows, "doc_id long, text string")
    got = {r.doc_id: r for r in hashed_importance_score(raw, tgt).collect()}
    assert len(got) == 10
    for i in range(5):
        # target-like docs must outscore noise docs
        assert got[i].importance > got[5 + i].importance
        assert got[i].target_mass > 0
    # docs with <2 words produce no features and are absent
    tiny = spark.createDataFrame([(0, "one")], "doc_id long, text string")
    assert hashed_importance_score(tiny, tgt).count() == 0


def test_bigram_surprisal_flags_shuffled_text(spark):
    """Shuffled word order must score higher bigram surprisal than the
    natural order it was built from, while a doc with <2 words is
    absent — the transition-level signal unigram filters can't see."""
    from lovdata_pipeline_spark.operators.textstats import bigram_surprisal

    natural = "the cat sat on the mat and the dog sat on the rug " * 4
    words = natural.split()
    shuffled = " ".join(words[::2] + words[1::2])  # same unigrams, broken pairs
    df = spark.createDataFrame(
        [(0, natural), (1, shuffled), (2, "single")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bigram_surprisal(df).collect()}
    assert set(got) == {0, 1}  # <2-word doc absent
    assert got[1].mean_surprisal > got[0].mean_surprisal
    assert got[0].n_bigrams == len(words) - 1


def test_gopher_quality_crlf_lines(spark):
    """CRLF documents shed the \\r at line split, so line metrics match
    the LF form exactly (Java rlike `$` would otherwise diverge from the
    oracle's RE2 on a trailing \\r)."""
    from lovdata_pipeline_spark.operators.textstats import gopher_quality

    lf = "keep going...\nplain line\n- bullet\n"
    crlf = lf.replace("\n", "\r\n")
    df = spark.createDataFrame([(0, lf), (1, crlf)], "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_quality(df).collect()}
    for col in ("frac_bullet_lines", "frac_ellipsis_lines", "frac_dup_lines"):
        assert got[0][col] == got[1][col], col
    assert got[0].frac_ellipsis_lines == 1 / 3


class TestCompressionSignals:
    def test_matches_zlib_replica_and_gate(self, spark):
        import zlib

        from lovdata_pipeline_spark.operators.textstats import (
            compression_signals,
        )

        rows = [
            (1, "spam spam spam spam spam spam spam spam spam spam"),
            # varied-vocabulary long doc (hash-derived words): zlib ratio
            # ~0.57, solidly inside the keep band — templated/repeated
            # prose would (correctly) gate out as boilerplate
            (2, " ".join(
                __import__("hashlib").md5(str(i).encode()).hexdigest()[: 3 + i % 8]
                for i in range(300)
            )),
            (3, ""),
            (4, None),
            (5, "æøå ünïcode — multibyte œ∑´®†"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in compression_signals(docs).collect()}
        for did, text in rows:
            raw = (text or "").encode("utf-8")
            want_b, want_c = len(raw), len(zlib.compress(raw, 6))
            assert (got[did].n_bytes, got[did].n_compressed) == (want_b, want_c), did
            want_ratio = 0.0 if want_b == 0 else want_c / want_b
            assert abs(got[did].compression_ratio - want_ratio) < 1e-12
            assert got[did].comp_keep == (0.30 <= want_ratio <= 0.95)
        # the repetitive doc must gate OUT low, empty/NULL out at 0
        assert not got[3].comp_keep and not got[4].comp_keep
        assert got[2].comp_keep  # normal prose stays

    def test_partition_independent(self, spark):
        from lovdata_pipeline_spark.operators.textstats import (
            compression_signals,
        )

        rows = [(i, f"document {i} body " * (i % 7 + 1)) for i in range(60)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(map(tuple, compression_signals(docs).collect()))
        b = sorted(map(tuple, compression_signals(docs.repartition(13)).collect()))
        assert a == b and len(a) == 60
