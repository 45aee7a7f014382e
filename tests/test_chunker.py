"""Chunker parity pins — mirrors the reference's behavioral contract
(reference: tests/unit/lovdata_chunker_test.py; pins listed in SURVEY.md §5)."""

import pytest

from lovdata_pipeline_spark.chunking.chunker import chunk_document, chunk_xml
from lovdata_pipeline_spark.chunking.xmlutil import XmlParseError
from lovdata_pipeline_spark.config import ChunkParams

from tests import fixtures

PARAMS = ChunkParams(target_tokens=100, max_tokens=500, min_tokens=300, overlap_ratio=0.15)


class TestStandardLaw:
    def test_small_ledds_merge_into_one(self):
        chunks, dropped = chunk_xml(fixtures.standard_law(), PARAMS)
        assert len(chunks) == 1  # two sub-min ledds merge
        c = chunks[0]
        assert c.paragraph_ref == "§ 1"
        assert c.paragraph_title == "Formål"
        assert c.ledd_number == 1
        assert c.document_title == "Testlov"
        assert "første ledd" in c.text.lower()
        assert "andre ledd" in c.text.lower()
        assert c.merged is True
        assert c.merged_with == ["paragraf-1-ledd-2"]
        assert not dropped

    def test_hierarchical_context(self):
        chunks, _ = chunk_xml(fixtures.standard_law(), PARAMS)
        for c in chunks:
            assert c.document_title == "Testlov"
            assert c.section_heading == "Kapittel 1. Innledning"
            assert "Kapittel 1. Innledning" in c.chapter_path

    def test_token_counts_valid(self):
        chunks, _ = chunk_xml(fixtures.standard_law(), PARAMS)
        for c in chunks:
            assert 0 < c.tokens <= PARAMS.max_tokens


class TestChangeLaw:
    def test_groups_legalp(self):
        chunks, _ = chunk_xml(fixtures.change_law(), ChunkParams(200, 500, 300, 0.15))
        assert len(chunks) >= 1
        assert chunks[0].sid.startswith("section-")
        assert "akvakultur" in chunks[0].text

    def test_grouped_chunks_have_doc_title(self):
        chunks, _ = chunk_xml(fixtures.change_law(), PARAMS)
        for c in chunks:
            assert c.document_title == "Endringslov"


class TestSimpleLaw:
    def test_merge_and_metadata(self):
        chunks, _ = chunk_xml(fixtures.simple_law(), PARAMS)
        assert 1 <= len(chunks) <= 2
        for c in chunks:
            assert c.document_title == "Enkel lov"
            assert c.ledd_number is not None
        if len(chunks) == 1:
            assert chunks[0].merged

    def test_empty_law_zero_chunks(self):
        chunks, _ = chunk_xml(fixtures.empty_law(), PARAMS)
        assert chunks == []

    def test_empty_body_zero_chunks(self):
        chunks, _ = chunk_xml(fixtures.empty_body(), PARAMS)
        assert chunks == []


class TestLists:
    def test_list_markers_and_continuation(self):
        chunks, _ = chunk_xml(fixtures.law_with_list(), PARAMS)
        assert chunks
        text = chunks[0].text
        assert "a) foretak som driver virksomhet" in text
        assert "b) personer som arbeider" in text
        assert "fortsettelse etter listen" in text.lower()

    def test_no_title_gives_none(self):
        chunks, _ = chunk_xml(fixtures.law_no_title(), PARAMS)
        assert chunks
        assert chunks[0].paragraph_title is None

    def test_cross_refs_extracted(self):
        chunks, _ = chunk_xml(fixtures.law_with_crossrefs(), PARAMS)
        assert chunks
        assert chunks[0].cross_refs == ["/lov/2020/§5", "/lov/2018-06-15-40/§2"]


class TestOversizeSplitting:
    def test_split_into_multiple_below_max(self):
        chunks, _ = chunk_xml(fixtures.oversize_law(100), PARAMS)
        assert len(chunks) > 1
        for c in chunks:
            assert c.tokens <= PARAMS.max_tokens

    def test_overlap_repeats_sentences(self):
        params = ChunkParams(target_tokens=50, max_tokens=500, min_tokens=10, overlap_ratio=0.2)
        chunks, _ = chunk_xml(fixtures.oversize_law(60), params)
        assert len(chunks) > 2
        # consecutive chunks share at least one sentence (15-20% overlap)
        first = chunks[0].text.split(". ")
        second = chunks[1].text.split(". ")
        assert set(s.strip(".") for s in first) & set(s.strip(".") for s in second)

    def test_split_preserves_paragraph_metadata(self):
        # every split chunk keeps the parent paragraph's ref/title/ledd
        # (lovdata_chunker_test.py:342-378)
        chunks, _ = chunk_xml(fixtures.oversize_law(100), PARAMS)
        assert len(chunks) > 1
        for c in chunks:
            assert c.paragraph_ref == "§ 1"
            assert c.ledd_number == 1
            assert c.document_title == "Lang lov"

    def test_chunk_at_exact_max_included(self):
        # a ledd exactly at max_tokens is kept whole, not split
        # (lovdata_chunker_test.py:521-571: the <= vs < behavior)
        from lovdata_pipeline_spark.functions.tokens import count_tokens

        params = ChunkParams(target_tokens=50, max_tokens=100, min_tokens=5, overlap_ratio=0.15)
        sent = "Dette er en testsetning. "
        text = sent
        while count_tokens((text + sent).strip()) <= params.max_tokens:
            text += sent
        text = text.strip()
        assert count_tokens(text) <= params.max_tokens
        body = f"""    <main class="documentBody" id="dokument">
        <h1>Test</h1>
        <section class="section">
            <article class="legalArticle" id="para-1">
                <h2 class="legalArticleHeader"><span class="legalArticleValue">&#167; 1</span></h2>
                <article class="legalP" id="para-1-ledd-1">{text}</article>
            </article>
        </section>
    </main>"""
        chunks, dropped = chunk_xml(fixtures.ENVELOPE.format(title="Max", body=body), params)
        assert len(chunks) >= 1
        assert not dropped
        for c in chunks:
            assert c.tokens <= params.max_tokens

    def test_tiny_max_drops_oversize_list_parts(self):
        params = ChunkParams(target_tokens=10, max_tokens=20, min_tokens=5, overlap_ratio=0.15)
        chunks, dropped = chunk_xml(fixtures.law_with_list(), params)
        # the 3-item list part exceeds 20 tokens → dropped with a record
        assert dropped, "over-max list part should be recorded as dropped"


class TestProjection:
    def test_positional_ids_and_coalesced_heading(self):
        rows = chunk_document(
            fixtures.standard_law(), "doc1", "ds", "hash1", PARAMS
        )
        assert [r["chunk_id"] for r in rows] == [f"doc1_chunk_{i}" for i in range(len(rows))]
        assert rows[0]["section_heading"] == "Kapittel 1. Innledning"
        assert rows[0]["source_hash"] == "hash1"
        assert rows[0]["split_reason"] == "none"
        assert rows[0]["absolute_address"] == "/lov/2024/§1/ledd1"

    def test_simple_law_heading_falls_back_to_doc_title(self):
        rows = chunk_document(fixtures.simple_law(), "d", "ds", "h", PARAMS)
        assert rows[0]["section_heading"] == "Enkel lov"

    def test_malformed_raises(self):
        with pytest.raises(XmlParseError):
            chunk_document(fixtures.malformed(), "bad", "ds", "h", PARAMS)
