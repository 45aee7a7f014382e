"""Bench line for bitext_margin_mine's LSH pre-bucketing (r8 VERDICT
Next #3's evidence): time the exact |S|×|T| path vs the bucketed path
at sf0.1 (~2k vectors, fixed overhead dominates) and the generated sf1
(~20k vectors, where the quadratic cosine pass surfaces — the steepest
r8 ladder entry at alpha 0.76). Also reports how many exact-mined pairs
the bucketed path recovers at each point (recall is a data property —
the synthetic embeddings are uniform-random, the worst case for SRP; on
clustered corpora the pytest pin shows exact recovery). Medians of
--reps noop materializations, merged into BENCH_AUX.json (builder-owned
— the driver overwrites BENCH_LOCAL.json every round) under
"bitext_bucketed_compare".

Usage: python tools/bitext_compare.py [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

POINTS = [
    ("sf0.1", "/root/testdata/sf0.1", 16),
    ("sf1", os.path.join(REPO, ".scale", "sf1"), 64),
]


def _split(spark, sf_dir):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    langed = emb.join(
        docs.select(F.col("doc_id").alias("vec_id"), "lang"), "vec_id"
    )
    src = langed.filter(F.col("lang") == "en").select(
        F.col("vec_id").alias("src_id"), "embedding"
    )
    tgt = langed.filter(F.col("lang") == "zh").select(
        F.col("vec_id").alias("tgt_id"), "embedding"
    )
    return src, tgt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from lovdata_pipeline_spark.operators.similarity import bitext_margin_mine
    from lovdata_pipeline_spark.session import get_spark

    spark = get_spark("bitext-compare")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    result = {
        "note": (
            "bucketed is approximate (SRP recall = data property; "
            "uniform-random synthetic vectors are the worst case — "
            "clustered corpora recover exact, pinned in tests); "
            "buckets scales with N to hold bucket size, n_probe_bits=1"
        )
    }
    for label, sf_dir, buckets in POINTS:
        src, tgt = _split(spark, sf_dir)
        n_s, n_t = src.count(), tgt.count()

        def measure(**kw):
            samples = []
            for _ in range(args.reps):
                t0 = time.time()
                bitext_margin_mine(src, tgt, k=4, threshold=1.0, **kw).write.format(
                    "noop"
                ).mode("overwrite").save()
                samples.append(time.time() - t0)
                spark.catalog.clearCache()
            samples.sort()
            return round(samples[len(samples) // 2], 3)

        exact_t = measure()
        bucket_t = measure(buckets=buckets)
        exact_pairs = {
            (r.src_id, r.tgt_id)
            for r in bitext_margin_mine(src, tgt, k=4, threshold=1.0).collect()
        }
        bucket_pairs = {
            (r.src_id, r.tgt_id)
            for r in bitext_margin_mine(
                src, tgt, k=4, threshold=1.0, buckets=buckets
            ).collect()
        }
        spark.catalog.clearCache()
        result[label] = {
            "n_src": n_s,
            "n_tgt": n_t,
            "exact_sec": exact_t,
            "bucketed_sec": bucket_t,
            "speedup": round(exact_t / bucket_t, 2),
            "exact_pairs": len(exact_pairs),
            "bucketed_pairs": len(bucket_pairs),
            "recovered": len(exact_pairs & bucket_pairs),
        }
        print(label, json.dumps(result[label]), flush=True)
    spark.stop()
    bench_path = os.path.join(REPO, "BENCH_AUX.json")
    bench = json.load(open(bench_path)) if os.path.exists(bench_path) else {}
    bench["bitext_bucketed_compare"] = result
    from tools.gitinfo import atomic_json_dump

    atomic_json_dump(bench, bench_path, indent=2)


if __name__ == "__main__":
    main()
