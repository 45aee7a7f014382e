"""Property tests for the TIE/DUPLICATE class in the remaining
order-dependent operators (r11 VERDICT Next #4): r10's scd2 bug and
r11's dedup_remove_spans flap were both tie-ambiguity bugs, so the
three operators whose semantics pivot on ordering get Hypothesis
coverage with PLANTED ties — duplicate timestamps on both interval
sides, identical paragraphs at equal positions across documents,
equal-length token runs in the packer — each checked against a
straight-line Python reference model, independent of row order and
partitioning.
"""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

_SETTINGS = dict(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)

T0 = datetime.datetime(2024, 1, 1)


# --- interval_join: duplicate timestamps both sides ----------------------

# tiny domains GUARANTEE planted ties: 2 keys x 4 minute-marks means
# almost every draw has duplicate (key, ts) rows on both sides,
# including exact boundary collisions at lookback distance
_ev = st.tuples(
    st.integers(min_value=1, max_value=2),  # user_id
    st.integers(min_value=0, max_value=3),  # minutes after T0
)
_events = st.lists(_ev, min_size=0, max_size=6)


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(lefts=_events, rights=_events)
def test_interval_join_multiset_matches_brute_force(spark, lefts, rights):
    """The join must return EVERY qualifying (left, right) pair exactly
    once — duplicate timestamps multiply pairs multiplicatively, and
    both interval endpoints are inclusive (r.ts in [l.ts - lookback,
    l.ts]). Multiset compare: duplicates must neither collapse nor
    inflate."""
    from lovdata_pipeline_spark.streaming.windows import interval_join

    lookback_min = 2
    left = spark.createDataFrame(
        [(i, k, T0 + datetime.timedelta(minutes=m)) for i, (k, m) in enumerate(lefts)],
        "l_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(i, k, T0 + datetime.timedelta(minutes=m)) for i, (k, m) in enumerate(rights)],
        "r_id int, user_id int, ts timestamp",
    )
    names = {}
    out = interval_join(
        left, right, on="user_id", left_time="ts", right_time="ts",
        lookback=f"{lookback_min} minutes", names_out=names,
    )
    got = sorted((r.l_id, r.r_id) for r in out.collect())
    want = sorted(
        (li, ri)
        for li, (lk, lm) in enumerate(lefts)
        for ri, (rk, rm) in enumerate(rights)
        if lk == rk and lm - lookback_min <= rm <= lm
    )
    assert got == want
    # the names_out contract: the right key/time are reachable under
    # the reported names
    assert names["user_id"] in out.columns and names["ts"] in out.columns


# --- remove_duplicate_paragraphs: equal paragraphs at equal positions ----

# a 3-symbol paragraph vocabulary + whitespace-only entries plants
# cross-document duplicates at EQUAL positions (the tie the global
# min(struct(doc, pos)) winner rule must break deterministically)
_para = st.sampled_from(["alpha", "beta", "gamma", "  ", ""])
_doc_paras = st.lists(_para, min_size=1, max_size=4)
_corpus = st.lists(_doc_paras, min_size=1, max_size=4)

SEP = "\n\n"


def _ref_paragraph_dedup(texts: list[str]):
    """Straight-line reference: global first occurrence (min (doc,
    pos)) survives per non-whitespace paragraph WITH count > 1; all
    whitespace-only paragraphs are kept."""
    paras = {i: t.split(SEP) for i, t in enumerate(texts)}
    occs: dict[str, list[tuple[int, int]]] = {}
    for d in sorted(paras):
        for p, txt in enumerate(paras[d]):
            if txt.strip() != "":
                occs.setdefault(txt, []).append((d, p))
    drop = {
        (d, p)
        for txt, o in occs.items()
        if len(o) > 1
        for (d, p) in o
        if (d, p) != min(o)
    }
    out = {}
    for d, ps in paras.items():
        kept = [t for p, t in enumerate(ps) if (d, p) not in drop]
        out[d] = (len(ps), sum(1 for p in range(len(ps)) if (d, p) in drop),
                  SEP.join(kept))
    return out


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(corpus=_corpus)
def test_paragraph_dedup_matches_reference(spark, corpus):
    from lovdata_pipeline_spark.operators.dedup import remove_duplicate_paragraphs

    texts = [SEP.join(ps) for ps in corpus]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_paras, r.n_dropped, r.text)
        for r in remove_duplicate_paragraphs(docs).collect()
    }
    assert got == _ref_paragraph_dedup(texts)


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(corpus=_corpus, seed=st.integers(min_value=0, max_value=3))
@pytest.mark.slow_ladder
def test_paragraph_dedup_partition_independent(spark, corpus, seed):
    """The winner rule is a global min — the result must not depend on
    how the input is partitioned or ordered."""
    from lovdata_pipeline_spark.operators.dedup import remove_duplicate_paragraphs

    texts = [SEP.join(ps) for ps in corpus]
    rows = [(i, t) for i, t in enumerate(texts)]
    base = spark.createDataFrame(rows, "doc_id long, text string")
    shuffled = spark.createDataFrame(
        list(reversed(rows)), "doc_id long, text string"
    ).repartition(seed + 1)
    a = sorted(map(tuple, remove_duplicate_paragraphs(base).collect()))
    b = sorted(map(tuple, remove_duplicate_paragraphs(shuffled).collect()))
    assert a == b


# --- pack_token_sequences: equal-length runs ------------------------------

# lengths drawn from a tiny set with 0 and exact-seq_len multiples
# plants runs of EQUAL document lengths and boundary-exact documents
_len = st.sampled_from([0, 1, 2, 4])
_lens = st.lists(_len, min_size=1, max_size=6)

SEQ_LEN = 4


def _ref_pack(ids_lens: list[tuple[int, int]], seq_len: int):
    out = {}
    tok = 0
    for d, n in sorted(ids_lens):
        seq_start = tok // seq_len
        seq_end = (tok + n - 1) // seq_len if n > 0 else seq_start
        out[d] = (
            n,
            tok,
            seq_start,
            seq_end,
            (seq_end - seq_start + 1) if n > 0 else 0,
            tok % seq_len,
        )
        tok += n
    return out


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(lens=_lens, seed=st.integers(min_value=0, max_value=3))
@pytest.mark.slow_ladder
def test_pack_token_sequences_matches_reference(spark, lens, seed):
    """The virtual token stream is ordered by doc_id alone — equal
    lengths (including runs of zeros) must not perturb any document's
    offsets, and the result must be independent of input order and
    partitioning."""
    from lovdata_pipeline_spark.operators.packing import pack_token_sequences

    ids_lens = [(i * 7 % 13, n) for i, n in enumerate(lens)]
    # doc ids unique: re-key collisions deterministically
    seen, uniq = set(), []
    for d, n in ids_lens:
        while d in seen:
            d += 13
        seen.add(d)
        uniq.append((d, n))
    rows = list(reversed(uniq)) if seed % 2 else list(uniq)
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long").repartition(
        seed + 1
    )
    got = {
        r.doc_id: (
            r.n_tokens, r.tok_start, r.seq_start, r.seq_end,
            r.n_seqs, r.offset_in_seq,
        )
        for r in pack_token_sequences(df, SEQ_LEN).collect()
    }
    assert got == _ref_pack(uniq, SEQ_LEN)
