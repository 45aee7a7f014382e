"""Bench line for graph.knn_edges candidate stages (r7 VERDICT Next
#2's evidence): time blocked (exact, O(N²/B)) vs ivf (sublinear
probing) candidate generation at two corpus sizes — sf0.1 (2 000
vectors, where fixed overhead dominates and blocked wins) and the
generated sf1 (20 000 vectors, where the quadratic term surfaces and
ivf wins) — medians of --reps noop materializations, merged into
BENCH_AUX.json under "knn_candidates_compare" (builder-owned — the
driver overwrites BENCH_LOCAL.json every round).

Usage: python tools/knn_compare.py [--reps 3]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from lovdata_pipeline_spark.operators.graph import knn_edges
    from lovdata_pipeline_spark.session import get_spark

    spark = get_spark("knn-compare")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    result = {
        "note": (
            "ivf is approximate (recall = data property; see "
            "operators/graph.py); n_cells scales with N to hold cell "
            "size, n_probe=4"
        )
    }
    for label, sf_dir, n_cells in POINTS:
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        n = emb.count()

        def measure(**kw):
            samples = []
            for _ in range(args.reps):
                t0 = time.time()
                knn_edges(emb, k=3, **kw).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.time() - t0)
            samples.sort()
            return round(samples[len(samples) // 2], 3)

        blocked = measure()
        ivf = measure(candidates="ivf", n_cells=n_cells, n_probe=4)
        result[label] = {
            "n_vectors": n,
            "blocked_sec": blocked,
            "ivf_sec": ivf,
            "speedup": round(blocked / ivf, 2),
        }
        print(label, json.dumps(result[label]), flush=True)

    # incremental story (r9): a daily batch needs edges AGAINST the
    # indexed corpus — with a persisted index it probes its own cells
    # and partition-prunes the rest; without one, the alternative is a
    # full in-memory ivf rebuild. Measured at the larger point only
    # (where the difference is the point).
    import tempfile
    import time as _t

    from lovdata_pipeline_spark.operators.graph import knn_write_ivf_index

    label, sf_dir, n_cells = POINTS[-1]
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    # 1% "daily batch" (r10 VERDICT Next #8 — the r9 5% batch at 20k
    # vectors was session-cost-dominated; 1% is the realistic recrawl
    # ratio and lets the pruning term show)
    batch = emb.filter((emb.vec_id % 100) == 0)
    idx = tempfile.mkdtemp(prefix="knn_idx_bench_")
    t0 = _t.time()
    knn_write_ivf_index(emb, idx, n_cells=n_cells)
    write_sec = round(_t.time() - t0, 3)

    def med(fn):
        s = []
        for _ in range(args.reps):
            t0 = _t.time()
            fn().write.format("noop").mode("overwrite").save()
            s.append(_t.time() - t0)
        s.sort()
        return round(s[len(s) // 2], 3)

    via_index = med(
        lambda: knn_edges(batch, k=3, candidates="ivf", n_probe=4, index_path=idx)
    )
    full_rebuild = med(
        lambda: knn_edges(emb, k=3, candidates="ivf", n_cells=n_cells, n_probe=4)
    )

    # the pruning claim with a NUMBER (r10 VERDICT Next #8): execute the
    # exact physical plan instance of one batch build and read the
    # parquet scan metrics — files actually opened on the index path vs
    # files the index holds. The plan string carries the
    # PartitionFilters assert; the metrics carry the count.
    import glob as _glob

    edges = knn_edges(batch, k=3, candidates="ivf", n_probe=4, index_path=idx)
    qe = edges._jdf.queryExecution()
    qe.executedPlan().execute().count()  # run THIS plan instance
    scanned = 0
    leaves = qe.executedPlan().collectLeaves()
    for i in range(leaves.size()):
        node = leaves.apply(i)
        try:
            m = node.metrics()
            if m.contains("numFiles") and "knn_idx_bench_" in node.toString():
                scanned += int(m.apply("numFiles").value())
        except Exception:
            pass  # non-scan leaves carry no numFiles metric
    total_files = len(_glob.glob(os.path.join(idx, "cell=*", "*.parquet")))
    plan_str = qe.executedPlan().toString()

    result["incremental"] = {
        "note": (
            "edges for a 5% daily batch against the indexed corpus: "
            "index-path subset build (probes partition-prune the index) "
            "vs the no-index alternative — a full in-memory ivf rebuild; "
            "index write cost amortizes over every later batch"
        ),
        "sf": label,
        "n_corpus": n,
        "n_batch": batch.count(),
        "index_write_sec": write_sec,
        "batch_via_index_sec": via_index,
        "full_ivf_rebuild_sec": full_rebuild,
        "speedup": round(full_rebuild / via_index, 2),
        "index_files_total": total_files,
        "index_files_scanned": scanned,
        "partition_filters_in_plan": "PartitionFilters" in plan_str,
    }
    print("incremental", json.dumps(result["incremental"]), flush=True)
    spark.stop()
    bench_path = os.path.join(REPO, "BENCH_AUX.json")
    bench = json.load(open(bench_path)) if os.path.exists(bench_path) else {}
    bench["knn_candidates_compare"] = result
    with open(bench_path, "w") as fh:
        json.dump(bench, fh, indent=2)


if __name__ == "__main__":
    main()
