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

    # the pruning claim with a NUMBER (r10 VERDICT Next #8): the index
    # scan's PartitionFilters is `cell IN (probed)` (asserted below from
    # the plan string), so the files the scan lists are exactly the
    # probed cells' directories — count them against the index total.
    # (Reading the numFiles SQL metric directly is AQE-wrapped and
    # plan-instance-fragile; the probed-cell set is the same evidence.)
    import glob as _glob
    import json as _json

    from pyspark.sql import functions as F
    from lovdata_pipeline_spark.operators.graph import _probe_cells

    edges = knn_edges(batch, k=3, candidates="ivf", n_probe=4, index_path=idx)
    plan_str = edges._jdf.queryExecution().executedPlan().toString()
    # fail loud, not just record: a pruning regression (e.g. a cast on
    # the cell column defeating pushdown) must abort the tool rather
    # than write partition_filters_in_plan: false into the permanent
    # evidence with exit 0 (r10 review)
    # RuntimeError, not a bare assert: asserts are stripped under
    # `python -O`, which would silently drop this fail-loud evidence
    # gate in optimized runs (r10 ADVICE)
    if "PartitionFilters" not in plan_str:
        raise RuntimeError(
            "index scan lost its PartitionFilters — partition pruning "
            "regressed; refusing to record scale evidence:\n" + plan_str[:2000]
        )
    params = _json.load(open(os.path.join(idx, "_ivf_params.json")))
    v = batch.select(
        F.col("vec_id").alias("vid"),
        F.col("embedding").cast("array<double>").alias("vv"),
    )
    probed = sorted(
        r.cell
        for r in _probe_cells(v, params["centroids"], 4).select("cell").distinct().collect()
    )
    scanned = sum(
        len(_glob.glob(os.path.join(idx, f"cell={c}", "*.parquet"))) for c in probed
    )
    total_files = len(_glob.glob(os.path.join(idx, "cell=*", "*.parquet")))

    # pruning is per-BATCH-UNION: on the uniform-random synthetic
    # corpus a 200-vector batch's 4-probe union covers all 64 cells
    # (a data property — real embedding batches cluster), so also
    # record the union at smaller batches, where the geometry's
    # pruning is visible as a file count, not just a plan assert
    # the 200-vector entry IS the measured batch — reuse its probed set
    union_sweep = {"200": {"cells_probed": len(probed), "files_scanned": scanned}}
    for bsz, flt in (
        (1, emb.vec_id == 0),
        (10, emb.vec_id % 2000 == 0),
    ):
        bv = emb.filter(flt).select(
            F.col("vec_id").alias("vid"),
            F.col("embedding").cast("array<double>").alias("vv"),
        )
        cells = sorted(
            r.cell
            for r in _probe_cells(bv, params["centroids"], 4)
            .select("cell").distinct().collect()
        )
        union_sweep[str(bsz)] = {
            "cells_probed": len(cells),
            "files_scanned": sum(
                len(_glob.glob(os.path.join(idx, f"cell={c}", "*.parquet")))
                for c in cells
            ),
        }

    # the CLUSTERED daily batch (r10 VERDICT Next #5): the 64/64-cell
    # probe union at batch=200 above is a property of the uniform-
    # random synthetic corpus, not of the index — real recrawl batches
    # cluster. tools/scaleup.py now generates a deterministic
    # locality-clustered batch (300 vectors near 3 corpus anchors,
    # ≈5° spread); measure its probe union, the files the scan
    # admits, and the wall-time at the HEADLINE batch size.
    cb_path = os.path.join(sf_dir, "daily_batch_clustered.parquet")
    if not os.path.exists(cb_path):
        raise RuntimeError(
            f"{cb_path} missing — regenerate the sf1 corpus with "
            "`python tools/scaleup.py` (it now writes the clustered batch)"
        )
    cbatch = spark.read.parquet(cb_path)
    cb_n = cbatch.count()
    cbv = cbatch.select(
        F.col("vec_id").alias("vid"),
        F.col("embedding").cast("array<double>").alias("vv"),
    )
    cb_probed = sorted(
        r.cell
        for r in _probe_cells(cbv, params["centroids"], 4)
        .select("cell").distinct().collect()
    )
    cb_scanned = sum(
        len(_glob.glob(os.path.join(idx, f"cell={c}", "*.parquet")))
        for c in cb_probed
    )
    cb_plan = knn_edges(
        cbatch, k=3, candidates="ivf", n_probe=4, index_path=idx
    )._jdf.queryExecution().executedPlan().toString()
    if "PartitionFilters" not in cb_plan:
        raise RuntimeError(
            "clustered-batch index scan lost its PartitionFilters:\n"
            + cb_plan[:2000]
        )
    cb_via_index = med(
        lambda: knn_edges(cbatch, k=3, candidates="ivf", n_probe=4, index_path=idx)
    )
    result["incremental_clustered"] = {
        "note": (
            "locality-clustered daily batch (tools/scaleup.py: 300 "
            "vectors near 3 corpus anchors — the shape real recrawl "
            "batches have) against the same persisted index: the probe "
            "union is a small fraction of the index AT the headline "
            "batch size, so file-level pruning — not just the avoided "
            "rebuild — carries the speedup. Compare full_ivf_rebuild_sec "
            "in the 'incremental' block."
        ),
        "n_batch": cb_n,
        "n_cells_probed": len(cb_probed),
        "n_cells_total": n_cells,
        "index_files_scanned": cb_scanned,
        "index_files_total": total_files,
        "probed_cells": [int(c) for c in cb_probed],
        "batch_via_index_sec": cb_via_index,
        "full_ivf_rebuild_sec": full_rebuild,
        "speedup_vs_rebuild": round(full_rebuild / cb_via_index, 2),
        "partition_filters_in_plan": True,
    }
    print("incremental_clustered", json.dumps(result["incremental_clustered"]), flush=True)

    result["incremental"] = {
        "note": (
            "edges for a 1% daily batch against the indexed corpus "
            "(r10 — the r9 5% batch at 20k vectors was session-cost-"
            "dominated): index-path subset build (probes partition-"
            "prune the index) vs the no-index alternative — a full "
            "in-memory ivf rebuild; index write cost amortizes over "
            "every later batch. index_files_scanned counts the probed "
            "cells' part files — the exact listing the plan's "
            "PartitionFilters (asserted) admits. On THIS uniform-"
            "random corpus a 200-vector batch's probe union covers "
            "all 64 cells (data property — real batches cluster); "
            "probe_union_by_batch_size shows the pruning the geometry "
            "delivers as the batch shrinks/localizes."
        ),
        "probe_union_by_batch_size": union_sweep,
        "n_cells_probed": len(probed),
        "n_cells_total": n_cells,
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
        "probed_cells": [int(c) for c in probed],
    }
    print("incremental", json.dumps(result["incremental"]), flush=True)
    spark.stop()
    bench_path = os.path.join(REPO, "BENCH_AUX.json")
    bench = json.load(open(bench_path)) if os.path.exists(bench_path) else {}
    bench["knn_candidates_compare"] = result
    from tools.gitinfo import atomic_json_dump

    atomic_json_dump(bench, bench_path, indent=2)


if __name__ == "__main__":
    main()
