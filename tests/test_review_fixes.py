"""Regression tests for the round-1 code-review findings."""

import datetime as dt

from pyspark.sql import functions as F

from lovdata_pipeline_spark.config import ChunkParams, PipelineConfig
from lovdata_pipeline_spark.operators.asof import asof_join
from lovdata_pipeline_spark.operators.incremental import filter_datasets
from lovdata_pipeline_spark.pipeline import run_pipeline
from lovdata_pipeline_spark.schemas import DOCUMENTS_SCHEMA
from lovdata_pipeline_spark.sources.chunk_store import ChunkStore
from lovdata_pipeline_spark.sources.state_store import StateStore

from tests import fixtures

CFG = PipelineConfig(chunk=ChunkParams(100, 500, 300, 0.15), embedding_dims=8)


def test_reprocess_to_zero_chunks_deletes_stale_chunks(spark, tmp_path):
    store = ChunkStore(spark, tmp_path / "chunks", n_buckets=4)
    state = StateStore(spark, tmp_path / "state")
    r1 = run_pipeline(
        spark.createDataFrame(
            [("d1", "ds", "p", fixtures.simple_law(), "h1", "added")], DOCUMENTS_SCHEMA
        ),
        store, state, CFG, now="t1",
    )
    assert r1.processed == 1 and store.count() > 0
    # same doc modified to an obsolete/empty law: parses, zero chunks
    r2 = run_pipeline(
        spark.createDataFrame(
            [("d1", "ds", "p", fixtures.empty_law(), "h2", "modified")], DOCUMENTS_SCHEMA
        ),
        store, state, CFG, now="t2",
    )
    assert r2.processed == 1
    assert store.chunks_for_document("d1").count() == 0  # stale chunks gone
    assert {r.hash for r in state.processed().collect()} == {"h2"}


def test_asof_null_in_carried_column_not_backfilled(spark):
    left = spark.createDataFrame(
        [(1, 7, dt.datetime(2024, 1, 1, 3))], "id long, k long, t timestamp"
    )
    right = spark.createDataFrame(
        [
            (7, dt.datetime(2024, 1, 1, 1), 5.0, "a"),
            (7, dt.datetime(2024, 1, 1, 2), None, "b"),  # matching row has NULL price
        ],
        "k long, t timestamp, price double, note string",
    )
    row = asof_join(
        left, right, on="k", left_time="t", right_time="t", right_cols=["price", "note"]
    ).first()
    assert row.note_asof == "b"
    assert row.price_asof is None  # must NOT borrow 5.0 from the older row


def test_filter_datasets_literal_underscore_and_null_passthrough(spark):
    df = spark.createDataFrame(
        [
            ("d1", "lov_2024", "p", "h", "added"),
            ("d2", "lovX2024", "p", "h", "added"),
            ("d3", None, "p", "h", "removed"),
        ],
        "doc_id string, dataset_name string, relative_path string, source_hash string, status string",
    )
    got = {r.doc_id for r in filter_datasets(df, "lov_2024*").collect()}
    assert got == {"d1", "d3"}  # '_' literal; NULL (removed) passes through


def test_embedding_near_dup_with_string_ids(spark):
    from lovdata_pipeline_spark.operators.dedup import embedding_near_duplicates

    rows = [
        ("doc_a_chunk_0", [1.0, 0.0, 0.0, 0.0]),
        ("doc_b_chunk_0", [1.0, 0.001, 0.0, 0.0]),
        ("doc_c_chunk_0", [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "chunk_id string, embedding array<float>")
    pairs = embedding_near_duplicates(df, threshold=0.99, id_col="chunk_id").collect()
    assert len(pairs) == 1
    assert {pairs[0].doc_a, pairs[0].doc_b} == {"doc_a_chunk_0", "doc_b_chunk_0"}


def test_corpus_reader_relative_path_and_metachars(spark, tmp_path, monkeypatch):
    from lovdata_pipeline_spark.sources.xml_corpus import read_xml_corpus

    root = tmp_path / "corp+us (v2)"
    ds = root / "my_dataset"
    ds.mkdir(parents=True)
    (ds / "doc-1.xml").write_text(fixtures.simple_law(), encoding="utf-8")
    # relative path form
    monkeypatch.chdir(tmp_path)
    row = read_xml_corpus(spark, "corp+us (v2)").first()
    assert row.doc_id == "doc-1"
    assert row.dataset_name == "my_dataset"
    assert row.relative_path == "my_dataset/doc-1.xml"


def test_streaming_batch_reader_parity(spark, tmp_path):
    from lovdata_pipeline_spark.sources.xml_corpus import read_xml_corpus
    from lovdata_pipeline_spark.streaming.incremental import stream_xml_corpus

    root = tmp_path / "corpus"
    nested = root / "ds1" / "sub"
    nested.mkdir(parents=True)
    (nested / "deep.xml").write_text(fixtures.simple_law(), encoding="utf-8")
    batch = read_xml_corpus(spark, str(root)).select(
        "doc_id", "dataset_name", "relative_path"
    ).first()
    stream = stream_xml_corpus(spark, str(root))
    q = (
        stream.select("doc_id", "dataset_name", "relative_path")
        .writeStream.format("memory")
        .queryName("parity_check")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    srow = spark.sql("SELECT * FROM parity_check").first()
    assert (srow.doc_id, srow.dataset_name, srow.relative_path) == (
        batch.doc_id,
        batch.dataset_name,
        batch.relative_path,
    )
    assert batch.dataset_name == "ds1" and batch.relative_path == "ds1/sub/deep.xml"
