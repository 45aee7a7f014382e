"""`lg rank`: the graph family's CLI face — k-NN graph build, edge
persistence, PageRank ranking, and re-ranking from saved edges without
a rebuild (r7 VERDICT Next #7)."""

from __future__ import annotations

import json
import math

import pytest

from lovdata_pipeline_spark.cli import main


@pytest.fixture()
def emb_parquet(spark, tmp_path):
    # a dense hub cluster (0-9) plus satellites: central nodes collect
    # more in-links, so pagerank must rank a hub node first
    rows = []
    for i in range(10):
        rows.append((i, [1.0, 0.001 * i, 0.0]))
    for i in range(10, 18):
        rows.append((i, [math.cos(0.7 * i), math.sin(0.7 * i), 0.5]))
    p = tmp_path / "emb"
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).write.parquet(str(p))
    return str(p)


def test_rank_build_persist_rerank(spark, emb_parquet, tmp_path, capsys):
    edges = str(tmp_path / "edges")
    rc = main(
        ["rank", "--input", emb_parquet, "-k", "3",
         "--edges-output", edges, "--top", "5"]
    )
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert lines[0] == {"edges": edges, "status": "written"}
    first = lines[1:]
    assert len(first) == 5
    assert all(r["rank_q"] > 0 for r in first)
    # re-rank from the SAVED edges (no --input, different damping):
    # same node set reachable, deterministic output
    rc = main(["rank", "--edges", edges, "--damping-pct", "70", "--top", "5"])
    assert rc == 0
    second = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(second) == 5
    # identical settings from saved edges reproduce the build-run ranks
    rc = main(["rank", "--edges", edges, "--top", "5"])
    assert rc == 0
    third = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert third == first
    # saved edge list is the knn_edges schema
    cols = set(spark.read.parquet(edges).columns)
    assert {"src", "dst", "score", "rk"} <= cols


def test_rank_ivf_candidates_path(emb_parquet, capsys):
    rc = main(
        ["rank", "--input", emb_parquet, "-k", "2", "--candidates", "ivf",
         "--cells", "4", "--probe", "4", "--top", "3"]
    )
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 3 and all(l["rank_q"] > 0 for l in lines)


def test_rank_requires_input_or_edges(capsys):
    assert main(["rank", "--top", "3"]) == 2


@pytest.mark.slow_ladder
def test_rank_via_persisted_graph_index(spark, emb_parquet, tmp_path, capsys):
    """`lg index --graph` + `lg rank --index-path` (r9): building from the
    persisted unit-sphere geometry ranks the same top nodes as the
    in-memory ivf build — no re-quantization per rank run."""
    idx = str(tmp_path / "graph_idx")
    rc = main(
        ["index", "--input", emb_parquet, "--output", idx,
         "--cells", "4", "--graph"]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_cells"] == 4 and sum(summary["rows_per_cell"].values()) == 18

    rc = main(
        ["rank", "--input", emb_parquet, "-k", "3", "--candidates", "ivf",
         "--probe", "4", "--index-path", idx, "--top", "5"]
    )
    assert rc == 0
    via_idx = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    rc = main(
        ["rank", "--input", emb_parquet, "-k", "3", "--candidates", "ivf",
         "--cells", "4", "--probe", "4", "--top", "5"]
    )
    assert rc == 0
    in_mem = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert via_idx == in_mem
