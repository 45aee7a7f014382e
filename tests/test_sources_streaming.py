"""XML corpus source, manifest diff, JSONL round-trip, enrichment, and
Structured Streaming (AvailableNow) tests."""

import pytest

from pyspark.sql import functions as F

from lovdata_pipeline_spark.config import ChunkParams
from lovdata_pipeline_spark.sources.jsonl import (
    flatten_metadata,
    read_jsonl,
    unflatten_metadata,
    write_jsonl,
)
from lovdata_pipeline_spark.sources.xml_corpus import manifest_diff, read_xml_corpus

from tests import fixtures


@pytest.fixture
def corpus_dir(tmp_path):
    ds = tmp_path / "corpus" / "gjeldende-lover"
    ds.mkdir(parents=True)
    (ds / "lov-2024-01-01-1.xml").write_text(fixtures.standard_law(), encoding="utf-8")
    (ds / "lov-2024-02-02-2.xml").write_text(fixtures.simple_law(), encoding="utf-8")
    ds2 = tmp_path / "corpus" / "opphevede-lover"
    ds2.mkdir(parents=True)
    (ds2 / "lov-1999-03-03-3.xml").write_text(fixtures.change_law(), encoding="utf-8")
    return str(tmp_path / "corpus")


class TestXmlCorpus:
    def test_scan_assigns_ids_datasets_hashes(self, spark, corpus_dir):
        df = read_xml_corpus(spark, corpus_dir)
        rows = {r.doc_id: r for r in df.collect()}
        assert set(rows) == {"lov-2024-01-01-1", "lov-2024-02-02-2", "lov-1999-03-03-3"}
        assert rows["lov-2024-01-01-1"].dataset_name == "gjeldende-lover"
        assert rows["lov-1999-03-03-3"].dataset_name == "opphevede-lover"
        assert len(rows["lov-2024-01-01-1"].source_hash) == 64
        assert "<h1>Testlov</h1>" in rows["lov-2024-01-01-1"].xml

    def test_manifest_diff_statuses(self, spark, corpus_dir):
        cur = read_xml_corpus(spark, corpus_dir)
        prev = cur.filter(F.col("doc_id") != "lov-2024-02-02-2").withColumn(
            "source_hash",
            F.when(F.col("doc_id") == "lov-2024-01-01-1", F.lit("oldhash")).otherwise(
                F.col("source_hash")
            ),
        ).unionByName(
            spark.createDataFrame(
                [("ghost-doc", "gjeldende-lover", "gjeldende-lover/ghost.xml", "h", "x", "added")],
                cur.schema,
            ).select(cur.columns)
        )
        diff = {r.doc_id: r.status for r in manifest_diff(cur, prev).collect()}
        assert diff["lov-2024-01-01-1"] == "modified"
        assert diff["lov-2024-02-02-2"] == "added"
        assert diff["lov-1999-03-03-3"] == "unchanged"
        assert diff["ghost-doc"] == "removed"


class TestJsonl:
    def test_round_trip_with_flatten(self, spark, tmp_path):
        from lovdata_pipeline_spark.chunking import chunk_documents_df
        from lovdata_pipeline_spark.embedding import embed_chunks_df
        from lovdata_pipeline_spark.schemas import DOCUMENTS_SCHEMA

        docs = spark.createDataFrame(
            [("d1", "ds", "p", fixtures.law_with_crossrefs(), "h1", "added")],
            DOCUMENTS_SCHEMA,
        )
        enriched = embed_chunks_df(
            chunk_documents_df(docs, ChunkParams(100, 500, 10, 0.15)), dims=8
        )
        path = str(tmp_path / "jsonl")
        write_jsonl(enriched, path)
        back = read_jsonl(spark, path).cache()  # cache: Spark disallows
        # querying only the corrupt-record column from raw JSON
        assert back.filter("_corrupt_record IS NOT NULL").count() == 0
        orig = enriched.orderBy("chunk_id").collect()
        got = back.drop("_corrupt_record").orderBy("chunk_id").collect()
        assert [r.chunk_id for r in got] == [r.chunk_id for r in orig]
        assert got[0].cross_refs == orig[0].cross_refs

        # chroma-style flatten → unflatten round-trips arrays
        flat = flatten_metadata(enriched)
        frow = flat.first()
        assert isinstance(frow.cross_refs, str) and "," in frow.cross_refs
        restored = unflatten_metadata(flat).first()
        assert restored.cross_refs == orig[0].cross_refs

    def test_corrupt_lines_are_isolated(self, spark, tmp_path):
        p = tmp_path / "store" / "source_hash=h1"
        p.mkdir(parents=True)
        (p / "part-0.json").write_text(
            '{"chunk_id": "c1", "document_id": "d1", "chunk_pos": 0}\n'
            "THIS IS NOT JSON\n"
            '{"chunk_id": "c2", "document_id": "d1", "chunk_pos": 1}\n'
        )
        df = read_jsonl(spark, str(tmp_path / "store")).cache()
        assert df.filter("_corrupt_record IS NULL").count() == 2
        assert df.filter("_corrupt_record IS NOT NULL").count() == 1


class TestEnrichment:
    def test_enricher_chain(self, spark):
        from lovdata_pipeline_spark.chunking import chunk_documents_df
        from lovdata_pipeline_spark.operators.enrichment import enrich
        from lovdata_pipeline_spark.schemas import DOCUMENTS_SCHEMA

        docs = spark.createDataFrame(
            [
                ("lov-2020-05-05-7", "ds", "p", fixtures.law_with_crossrefs(), "h1", "added"),
                ("lov-2021-06-06-8", "ds", "p", fixtures.change_law(), "h2", "added"),
            ],
            DOCUMENTS_SCHEMA,
        )
        chunks = chunk_documents_df(docs, ChunkParams(100, 500, 10, 0.15))
        out = enrich(chunks.filter("error IS NULL"))
        rows = {r.document_id: r for r in out.collect()}
        r1 = rows["lov-2020-05-05-7"]
        assert r1.law_date == "2020-05-05"
        # href refs are normalized to the text-regex spelling (leading
        # '/' stripped) before the distinct-union, so the same statute
        # arriving via href AND text counts once (r10)
        assert "lov/2020/§5" in r1.law_references
        assert "/lov/2020/§5" not in r1.law_references
        assert r1.n_references >= 2
        assert rows["lov-2021-06-06-8"].is_amendment is True
        assert r1.is_amendment is False
        # location_info: address passthrough + normalized § citation
        assert r1.location_address == r1.absolute_address
        assert r1.paragraph_citation == "§ 1"  # parsed from 'paragraf-1'/§-ref

    def test_broken_enricher_is_skipped(self, spark):
        from lovdata_pipeline_spark.operators.enrichment import enrich

        df = spark.createDataFrame([(1,)], "a int")

        def bad(d):
            return {"x": F.col("missing_column") + 1}

        def good(d):
            return {"y": F.col("a") * 2}

        out = enrich(df, [("bad", bad), ("good", good)])
        assert out.columns == ["a", "y"]
        assert out.first().y == 2


class TestStreaming:
    def test_available_now_chunk_pipeline(self, spark, tmp_path, corpus_dir):
        from lovdata_pipeline_spark.streaming.incremental import (
            run_streaming_chunk_pipeline,
        )

        batches = []

        def sink(df, batch_id):
            batches.append(df.filter("error IS NULL").count())

        q = run_streaming_chunk_pipeline(
            spark,
            corpus_dir,
            str(tmp_path / "ckpt"),
            sink,
            ChunkParams(100, 500, 300, 0.15),
        )
        q.awaitTermination(120)
        assert sum(batches) > 0

        # restart with same checkpoint: nothing new → no new chunk rows
        batches2 = []

        def sink2(df, batch_id):
            batches2.append(df.count())

        q2 = run_streaming_chunk_pipeline(
            spark, corpus_dir, str(tmp_path / "ckpt"), sink2,
            ChunkParams(100, 500, 300, 0.15),
        )
        q2.awaitTermination(120)
        assert sum(batches2) == 0

    def test_windowed_counts_available_now(self, spark, tmp_path):
        import pandas as pd

        from lovdata_pipeline_spark.streaming.windows import windowed_counts

        src = tmp_path / "events_stream"
        src.mkdir()
        pd.DataFrame(
            {
                "ts": pd.to_datetime(
                    ["2024-01-01 00:05:00", "2024-01-01 00:55:00", "2024-01-01 01:05:00"]
                ),
                "event_type": ["click", "click", "view"],
                "value": [1.0, 2.0, 3.0],
            }
        ).to_parquet(src / "p0.parquet", coerce_timestamps="us")
        stream = spark.readStream.schema(
            "ts timestamp, event_type string, value double"
        ).parquet(str(src))
        agg = windowed_counts(stream, "1 hour", "2 hours")
        q = (
            agg.writeStream.format("memory")
            .queryName("win_counts")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt_w"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM win_counts ORDER BY window_start, event_type").collect()
        assert len(rows) == 2
        assert rows[0].n == 2 and rows[0].event_type == "click"
        assert rows[1].n == 1 and rows[1].event_type == "view"

    def test_streaming_decontamination_available_now(self, spark, tmp_path):
        """Row-local decontamination over a document stream must keep
        exactly what the batch anti-join form keeps — the streaming
        operator is a pure scan-local filter, so it composes with
        AvailableNow + checkpoint like any stateless projection."""
        import pandas as pd

        from lovdata_pipeline_spark.operators.decontam import (
            benchmark_ngram_set,
            decontaminate,
            decontaminate_rowlocal,
        )

        texts = {
            1: "alpha beta gamma delta",
            2: "epsilon zeta eta theta",
            3: "alpha beta gamma iota",   # shares 3-gram with bench
            4: "kappa lam mu nu",
        }
        src = tmp_path / "docs_stream"
        src.mkdir()
        pd.DataFrame(
            {"doc_id": list(texts), "text": list(texts.values())}
        ).to_parquet(src / "p0.parquet")
        bench = spark.createDataFrame(
            [(0, "alpha beta gamma zeta")], "doc_id long, text string"
        )
        bench_set = benchmark_ngram_set(bench, n=3)

        stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
        clean = decontaminate_rowlocal(stream, bench_set, n=3)
        q = (
            clean.writeStream.format("memory")
            .queryName("decontam_stream")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_dc"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {r.doc_id for r in spark.sql("SELECT doc_id FROM decontam_stream").collect()}
        batch_docs = spark.createDataFrame(
            list(texts.items()), "doc_id long, text string"
        )
        want = {r.doc_id for r in decontaminate(batch_docs, bench, n=3).collect()}
        assert got == want == {2, 4}

    def test_streaming_exact_substring_decontamination(self, spark, tmp_path):
        """The exact-substring row-local filter must also compose with
        AvailableNow: survivors equal the batch join form's complement."""
        import pandas as pd

        from lovdata_pipeline_spark.operators.decontam import (
            exact_contamination_rowlocal,
        )

        texts = {
            1: "the secret benchmark answer is forty two exactly",
            2: "completely unrelated text with other words",
            3: "prefix the secret benchmark answer is forty two exactly suffix",
        }
        src = tmp_path / "docs_stream_exact"
        src.mkdir()
        pd.DataFrame(
            {"doc_id": list(texts), "text": list(texts.values())}
        ).to_parquet(src / "p0.parquet")

        stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
        clean = exact_contamination_rowlocal(
            stream, ["the secret benchmark answer is forty two exactly"]
        )
        q = (
            clean.writeStream.format("memory")
            .queryName("exact_decontam_stream")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_exact"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r.doc_id
            for r in spark.sql("SELECT doc_id FROM exact_decontam_stream").collect()
        }
        assert got == {2}

    def test_interval_join_available_now(self, spark, tmp_path):
        import pandas as pd

        from lovdata_pipeline_spark.streaming.windows import interval_join

        lsrc = tmp_path / "purchases_stream"
        rsrc = tmp_path / "clicks_stream"
        lsrc.mkdir(), rsrc.mkdir()
        pd.DataFrame(
            {
                "ts": pd.to_datetime(["2024-01-01 01:00:00", "2024-01-01 02:00:00"]),
                "user_id": [1, 2],
                "amount": [9.5, 3.0],
            }
        ).to_parquet(lsrc / "p0.parquet", coerce_timestamps="us")
        pd.DataFrame(
            {
                # user 1: one click inside the 30-min lookback, one outside;
                # user 3: click with no purchase at all
                "ts": pd.to_datetime(
                    ["2024-01-01 00:40:00", "2024-01-01 00:10:00", "2024-01-01 00:50:00"]
                ),
                "user_id": [1, 1, 3],
                "click_id": [100, 101, 102],
            }
        ).to_parquet(rsrc / "p0.parquet", coerce_timestamps="us")
        purchases = spark.readStream.schema(
            "ts timestamp, user_id long, amount double"
        ).parquet(str(lsrc))
        clicks = spark.readStream.schema(
            "ts timestamp, user_id long, click_id long"
        ).parquet(str(rsrc))
        joined = interval_join(purchases, clicks, lookback="30 minutes")
        q = (
            joined.writeStream.format("memory")
            .queryName("ij")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_ij"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT user_id, click_id FROM ij ORDER BY user_id").collect()
        assert [(r.user_id, r.click_id) for r in rows] == [(1, 100)]


class TestStreamingQualityGate:
    def test_streaming_gopher_gate_equals_batch(self, spark, tmp_path):
        """The Gopher gate is a pure scan-local column expression, so it
        composes with a document stream exactly like the row-local
        decontamination filters: AvailableNow survivors equal the batch
        gate's survivors (r6 — the streaming face of the quality
        family)."""
        import pandas as pd

        from lovdata_pipeline_spark.operators.textstats import (
            gopher_pass_col,
            gopher_quality,
        )

        good = (
            "the quick brown fox jumps over the lazy dog and keeps going "
        ) * 5  # 60 words, has stopwords, sane lengths
        texts = {
            1: good,
            2: "short junk",                      # fails word-count rule
            3: good + " " + good,                 # still passes
            4: "- bullet\n- bullet\n- bullet",    # bullets + too short
        }
        src = tmp_path / "docs_q_stream"
        src.mkdir()
        pd.DataFrame(
            {"doc_id": list(texts), "text": list(texts.values())}
        ).to_parquet(src / "p0.parquet")

        stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
        gated = stream.filter(gopher_pass_col("text"))
        q = (
            gated.writeStream.format("memory")
            .queryName("gopher_stream")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_gq"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {r.doc_id for r in spark.sql("SELECT doc_id FROM gopher_stream").collect()}
        batch = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
        want = {
            r.doc_id
            for r in gopher_quality(batch).filter("gopher_pass").collect()
        }
        assert got == want == {1, 3}


class TestStreamingTokenCounts:
    @pytest.mark.slow_ladder
    def test_available_now_equals_batch_counts(self, spark, tmp_path):
        """The stateful vocabulary counter's final update per token must
        equal the batch explode+count over the same files — and the ''
        phantom token must not appear (shared _clean_split tokenize)."""
        import pandas as pd

        from pyspark.sql import functions as F

        from lovdata_pipeline_spark.streaming.windows import (
            streaming_token_counts,
        )

        src = tmp_path / "docs_tok_stream"
        src.mkdir()
        texts = {1: "aa bb aa\n", 2: "bb cc\n", 3: "aa\n"}
        pd.DataFrame(
            {"doc_id": list(texts), "text": list(texts.values())}
        ).to_parquet(src / "p0.parquet")

        stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
        counts = streaming_token_counts(stream, timeout_minutes=60)
        q = (
            counts.writeStream.format("memory")
            .queryName("tok_stream")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_tok"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql(
            "SELECT token, max(n_occurrences) AS n FROM tok_stream GROUP BY token"
        ).collect()
        got = {r.token: r.n for r in rows}
        assert got == {"aa": 3, "bb": 2, "cc": 1}
        assert "" not in got

    def test_state_machine_timeout_removes(self):
        """Direct unit drive of the update fn: counts accumulate across
        batches; the timeout branch drops state without emitting."""
        import pandas as pd

        from lovdata_pipeline_spark.streaming.windows import (
            _token_counts_update,
        )

        class FakeState:
            def __init__(self):
                self.exists = False
                self.hasTimedOut = False
                self._v = None
                self.removed = False

            @property
            def get(self):
                return self._v

            def update(self, v):
                self._v = v
                self.exists = True

            def setTimeoutDuration(self, ms):
                self.timeout_ms = ms

            def remove(self):
                self.removed = True
                self.exists = False

        fn = _token_counts_update(30)
        st = FakeState()
        out = list(fn(("aa",), [pd.DataFrame({"token": ["aa"] * 3})], st))
        assert st.get == (3,) and out[0]["n_occurrences"].iloc[0] == 3
        out = list(fn(("aa",), [pd.DataFrame({"token": ["aa"] * 2})], st))
        assert st.get == (5,) and out[0]["n_occurrences"].iloc[0] == 5
        assert st.timeout_ms == 30 * 60 * 1000
        st.hasTimedOut = True
        assert list(fn(("aa",), [], st)) == [] and st.removed
