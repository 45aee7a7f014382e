"""Property-based chunker invariants (hypothesis).

Whatever document shape arrives, the chunker must never crash on valid
XML, never emit an over-max chunk from the split paths, keep positional
ids dense, and stay deterministic.
"""

from hypothesis import given, settings, strategies as st

from lovdata_pipeline_spark.chunking.chunker import chunk_document, chunk_xml
from lovdata_pipeline_spark.config import ChunkParams
from lovdata_pipeline_spark.functions.tokens import count_tokens, hard_token_split

PARAMS = ChunkParams(target_tokens=40, max_tokens=120, min_tokens=15, overlap_ratio=0.15)

# XML-safe text: letters/digits/space/punctuation that needs no escaping
_text = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyzæøå .,!?0123456789"),
    min_size=0,
    max_size=400,
)
_texts = st.lists(_text, min_size=0, max_size=6)


def _standard_doc(ledd_texts, title):
    ledds = "".join(
        f'<article class="legalP" id="l-{i}">{t}</article>'
        for i, t in enumerate(ledd_texts)
    )
    return (
        f'<html><body><main class="documentBody"><h1>{title}</h1>'
        f'<section class="section"><h2>Kap</h2>'
        f'<article class="legalArticle" id="p-1">'
        f'<h2 class="legalArticleHeader"><span class="legalArticleValue">§ 1</span></h2>'
        f"{ledds}</article></section></main></body></html>"
    )


def _simple_doc(ledd_texts, title):
    ledds = "".join(
        f'<article class="legalP" id="l-{i}">{t}</article>'
        for i, t in enumerate(ledd_texts)
    )
    return (
        f'<html><body><main class="documentBody"><h1>{title}</h1>'
        f"{ledds}</main></body></html>"
    )


@settings(max_examples=60, deadline=None)
@given(texts=_texts, title=_text, simple=st.booleans())
def test_chunker_invariants(texts, title, simple):
    xml = (_simple_doc if simple else _standard_doc)(texts, title)
    rows = chunk_document(xml, "doc", "ds", "h", PARAMS)

    # positional ids dense and ordered
    assert [r["chunk_pos"] for r in rows] == list(range(len(rows)))
    assert [r["chunk_id"] for r in rows] == [f"doc_chunk_{i}" for i in range(len(rows))]

    for r in rows:
        # token_count consistent with content only for unmerged, unsplit
        # chunks; but it must always be positive and present
        assert r["token_count"] is not None and r["token_count"] >= 0
        assert r["split_reason"] == "none"

    # determinism
    rows2 = chunk_document(xml, "doc", "ds", "h", PARAMS)
    assert rows == rows2


@settings(max_examples=60, deadline=None)
@given(texts=_texts, title=_text)
def test_merge_never_exceeds_max_when_inputs_fit(texts, title):
    # if every ledd fits under max on its own, the merge fold keeps every
    # output chunk ≤ max too (the reference's flush rule guarantees this
    # only heuristically — pin the practical invariant for fitting inputs)
    fitting = [t for t in texts if 0 < count_tokens(t.strip()) <= PARAMS.min_tokens]
    xml = _simple_doc(fitting, title)
    chunks, _ = chunk_xml(xml, PARAMS)
    for c in chunks:
        assert c.tokens <= PARAMS.max_tokens


@settings(max_examples=100, deadline=None)
@given(text=_text, max_tokens=st.integers(min_value=1, max_value=50))
def test_hard_token_split_budget(text, max_tokens):
    parts = hard_token_split(text, max_tokens)
    for p in parts:
        assert count_tokens(p) <= max_tokens
    # no content invented
    joined = "".join(parts).replace(" ", "")
    assert all(ch in text for ch in set(joined))
