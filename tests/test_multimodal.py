"""Multimodal binary-column plumbing: schema, Arrow batching, and
partition independence of the stubbed decode/resize/audio operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from lovdata_pipeline_spark.operators import multimodal


def _blobs(spark, n=20, parts=1):
    return (
        spark.range(n)
        .repartition(parts)
        .select(
            F.col("id").alias("doc_id"),
            F.encode(F.concat(F.lit("payload-"), F.col("id")), "utf-8").alias(
                "payload"
            ),
        )
    )


class TestMultimodal:
    def test_resize_round_trip_schema(self, spark):
        out = multimodal.resize_images(_blobs(spark), 64, 32).orderBy("doc_id")
        rows = out.collect()
        assert out.schema == multimodal.RESIZED_SCHEMA
        assert len(rows) == 20
        for r in rows:
            assert (r.width, r.height) == (64, 32)
            assert r.payload[:2] == bytes([64, 32])

    def test_audio_features_deterministic(self, spark):
        rows = (
            multimodal.extract_audio_features(_blobs(spark))
            .orderBy("doc_id")
            .collect()
        )
        for r in rows:
            n = len(f"payload-{r.doc_id}".encode())
            rate = 8000 * (1 + n % 6)
            assert r.sample_rate == rate
            assert abs(r.duration_s - n / rate) < 1e-12

    def test_partition_independence(self, spark):
        one = multimodal.extract_features(_blobs(spark, parts=1)).orderBy("doc_id")
        many = multimodal.extract_features(_blobs(spark, parts=7)).orderBy("doc_id")
        assert [tuple(r) for r in one.collect()] == [tuple(r) for r in many.collect()]
