"""CLI search modes: vector (reference-promised), keyword (BM25),
hybrid (RRF) — all three drive a real chunk store built by the
pipeline and print the same JSON shape."""

from __future__ import annotations

import argparse
import json

import pytest

from lovdata_pipeline_spark.cli import cmd_search
from lovdata_pipeline_spark.config import ChunkParams, PipelineConfig
from lovdata_pipeline_spark.pipeline import run_pipeline
from lovdata_pipeline_spark.schemas import DOCUMENTS_SCHEMA
from lovdata_pipeline_spark.sources.chunk_store import ChunkStore
from lovdata_pipeline_spark.sources.state_store import StateStore
from tests import fixtures

CFG = PipelineConfig(chunk=ChunkParams(10, 500, 300, 0.15), embedding_dims=8)


@pytest.fixture(scope="module")
def store_path(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli_search")
    store = ChunkStore(spark, tmp / "chunks", n_buckets=4)
    state = StateStore(spark, tmp / "state")
    docs = spark.createDataFrame(
        [
            ("d1", "ds", "p1", fixtures.simple_law(), "h1", "added"),
            ("d2", "ds", "p2", fixtures.standard_law(), "h2", "added"),
        ],
        DOCUMENTS_SCHEMA,
    )
    run_pipeline(docs, store, state, CFG, now="t1")
    assert store.count() > 0
    return str(tmp / "chunks")


def _run(store_path: str, mode: str, query: str, capsys) -> dict:
    args = argparse.Namespace(store=store_path, query=query, k=3, mode=mode)
    assert cmd_search(args) == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


@pytest.mark.parametrize("mode", ["vector", "keyword", "hybrid"])
def test_search_modes_return_results(spark, store_path, mode, capsys):
    out = _run(store_path, mode, "lov om testing", capsys)
    results = out["results"]
    assert results, mode
    for r in results:
        assert set(r) == {"chunk_id", "document_id", "score", "section_heading", "content"}
    scores = [r["score"] for r in results]
    assert scores == sorted(scores, reverse=True)


@pytest.mark.parametrize("mode", ["keyword", "hybrid"])
def test_whitespace_query_degrades_cleanly(spark, store_path, mode, capsys):
    """r3 ADVICE: a whitespace-only query must not escape as a
    bm25_topk ValueError. Keyword mode mirrors the empty-store answer
    ({"results": []}); hybrid falls back to its vector arm."""
    out = _run(store_path, mode, "   ", capsys)
    if mode == "keyword":
        assert out["results"] == []
    else:
        assert out["results"]  # vector arm still ranks


def test_keyword_mode_ranks_matching_chunk_first(spark, store_path, capsys):
    """A query term that appears in the corpus must surface a chunk
    actually containing it at rank 1 (BM25 is content-grounded where the
    mock-embedding vector mode is hash-random). "enkel" appears bare
    (whitespace tokenization keeps punctuation glued, so "lov." ≠ "lov")
    and only in the simple-law document."""
    out = _run(store_path, "keyword", "enkel", capsys)
    top = out["results"][0]
    assert "enkel" in top["content"].lower()
    assert top["document_id"] == "d1"
