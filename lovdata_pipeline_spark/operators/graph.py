"""Graph centrality over document/embedding similarity graphs.

Curation pipelines use graph structure on top of the near-dup /
similarity machinery: a k-NN graph over the embedding space, then a
centrality score to pick *representative* documents (central nodes) or
flag isolated outliers — the "select by graph importance" step of
SemDeDup-style cluster curation, and the natural consumer of the
citation edges the enrichment chain extracts (reference:
``domain/parsers/lovdata_chunker.py`` cross-ref hrefs — each ``href``
is a directed edge in a law-citation graph).

``pagerank_quantized`` runs the classic power iteration in EXACT
integer arithmetic (micro-units of 10⁻¹²) so the result is
bit-reproducible under any partitioning AND replayable by a plain SQL
engine: ranks are int64, per-edge contributions use integer division,
and the damping mix is ``(15·base + 85·inbound) div 100``. Mass lost
to floor division is deterministic and identical in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lovdata_pipeline_spark.operators.sampling import top_k_per_group
from lovdata_pipeline_spark.operators.similarity import _as_double, _dot, _norm

#: rank mass fixed-point scale: ranks are integers in units of 10⁻¹².
RANK_SCALE = 10**12


def knn_edges(
    vectors: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Directed k-NN graph over an embedding table: (src, dst, score,
    rk) — each node's edges point to its k most cosine-similar OTHER
    nodes (self excluded BEFORE ranking, so a tie at score 1.0 cannot
    displace a real neighbor).

    This is the exact builder: the scored frame is a broadcast
    crossJoin (one side must fit executors), and the per-source top-k
    routes through the two-phase ``top_k_per_group``. At corpus scale
    swap the scored frame for the LSH- or IVF-bucketed candidate join
    (``similarity.hyperplane_lsh_bucket`` / ``ivf_topk``) — the ranking
    and everything downstream (pagerank) is unchanged.

    Zero-norm vectors are excluded from both sides (cosine undefined;
    ANSI-mode division). Scores are rounded to 6 dp with ties broken
    on dst id — deterministic edges, hence deterministic pagerank.
    """
    a = (
        vectors.select(F.col(id_col).alias("src"), _as_double(F.col(vec_col)).alias("av"))
        .withColumn("an", _norm(F.col("av")))
        .filter(F.col("an") > 0)
    )
    b = (
        vectors.select(F.col(id_col).alias("dst"), _as_double(F.col(vec_col)).alias("bv"))
        .withColumn("bn", _norm(F.col("bv")))
        .filter(F.col("bn") > 0)
    )
    scored = (
        F.broadcast(a)
        .crossJoin(b)
        .filter(F.col("src") != F.col("dst"))
        .select(
            "src",
            "dst",
            F.round(
                _dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")), 6
            ).alias("score"),
        )
    )
    return top_k_per_group(scored, k, "src", "score", "dst")


def pagerank_quantized(
    edges: DataFrame,
    damping_pct: int = 85,
    n_iter: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list → (node, rank_q)
    where rank_q is the rank in integer micro-units (RANK_SCALE = 1.0).

    Update rule (exact integer arithmetic, positive operands so ``div``
    truncation is engine-independent)::

        contrib(u)  = rank(u) div outdeg(u)          per out-edge
        rank'(v)    = ((100-d)·base + d·Σ_in contrib) div 100
        base        = RANK_SCALE div N               (uniform init)

    Plan shape per iteration: one equi-join of the (pre-partitioned,
    persisted) edge+outdegree table with the rank table on ``src``, one
    hash aggregate keyed on ``dst``, one left join back to the node
    set. Nothing driver-side scales with the graph — each round's rank
    table is ``localCheckpoint``-ed (the connected-components
    discipline) so the logical plan stays constant-size at any
    iteration count; on a real cluster configure ``setCheckpointDir``
    and swap reliable ``checkpoint`` for executor-loss recovery.

    Dangling nodes (no out-edges) simply do not contribute — the
    classic "mass leak" simplification; with every node carrying
    out-edges (the k-NN graph guarantees k) no mass leaks beyond the
    deterministic ``div`` floors. Overflow bound: total mass is at most
    N·base ≤ RANK_SCALE, so any node's inbound sum is ≤ 10¹² and the
    damping product ≤ 85·10¹² ≪ 2^63.
    """
    e_sym = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    nodes = (
        e_sym.select(F.col("_s").alias("node"))
        .unionByName(e_sym.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_q", F.lit(0).cast("long"))
    base = RANK_SCALE // n
    outdeg = e_sym.groupBy("_s").agg(F.count(F.lit(1)).alias("odeg"))
    ew = (
        e_sym.join(outdeg, "_s")
        .repartition(F.col("_s"))
        .persist()
    )
    ew.count()  # materialize once; reused every iteration
    try:
        ranks = nodes.withColumn("rank_q", F.lit(base).cast("long"))
        for _ in range(n_iter):
            inbound = (
                ew.join(ranks, ew["_s"] == ranks["node"])
                .select(
                    F.col("_d").alias("node"),
                    F.expr("rank_q div odeg").alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("s"))
            )
            ranks = (
                nodes.join(inbound, "node", "left")
                .select(
                    "node",
                    # L-suffixed literals: the bare int product
                    # (100-d)·base overflows int32 under ANSI mode
                    F.expr(
                        f"CAST((({100 - damping_pct}L * {base}L) + "
                        f"{damping_pct}L * coalesce(s, 0L)) div 100L AS LONG)"
                    ).alias("rank_q"),
                )
                .localCheckpoint()
            )
    finally:
        ew.unpersist()
    return ranks
