"""Bloom-prefilter join — the membership sketch applied to shuffle
reduction.

At 100 TB the dominant cost of a selective fact ⋈ dim join is
shuffling fact rows that can never match. A Bloom filter built from
the dim side's join keys (``ceil(m/63)`` BIGINT words — broadcast-
sized by construction) cuts the fact side BEFORE its shuffle:

- **no false negatives ever** — the exact join downstream sees every
  matching row, so the composition is lossless (pinned in tests and
  graded against the plain-join oracle);
- **false positives only waste shuffle**, at the classic
  ``(1 − e^{−kn/m})^k`` rate — and because the hash family is the
  repo's fixed salted 60-bit md5 (``BLOOM_SALT``), even the false
  positives are deterministic and replay bit-for-bit in SQL, so the
  graded row certifies the PREFILTER itself (kept counts), not just
  the join result.

Spark's adaptive runtime bloom pushdown
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) covers simple
shapes opportunistically; this operator makes the technique EXPLICIT
and composable — the filter is a frame like every other sketch in the
family (CMS/HLL/Bloom/HDR): persistable, mergeable via ``bit_or``,
buildable once per day and applied to every fact batch.

Execution shape: k broadcast hash joins of the fact side against the
word table (≤ m/63 rows each) — fully lazy, whole-stage-codegen
predicates, no driver collect; then the exact equi-join on the
surviving rows. At 1000 executors the only thing that moves for a
pruned row is its k probe lookups against a broadcast table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lovdata_pipeline_spark.operators.dedup import portable_token_hash
from lovdata_pipeline_spark.operators.sketches import BLOOM_SALT


def bloom_from_keys(
    keys: DataFrame, key_col: str, m_bits: int = 4096, k: int = 3
) -> DataFrame:
    """(word_idx, bits) Bloom filter over the DISTINCT values of
    ``key_col`` — ``bloom_build`` generalized from corpus tokens to
    join keys. Keys cast to string so one filter family serves integer
    and string join keys (the build and every probe must spell the key
    identically). The aggregate's key space is ceil(m/63) words, so
    every partition collapses map-side and the shuffle moves words,
    not keys; 63-bit lanes keep the ``<<`` replay exact in both
    engines (the sketches.py convention)."""
    probes = (
        keys.select(F.col(key_col).cast("string").alias("_k"))
        .where(F.col("_k").isNotNull())
        .distinct()
        .select(
            "_k", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("r")
        )
        .select(
            F.pmod(
                portable_token_hash(
                    F.concat(
                        F.col("r").cast("string"),
                        F.lit(f":{BLOOM_SALT}:"),
                        F.col("_k"),
                    )
                ),
                F.lit(m_bits),
            ).alias("pos")
        )
    )
    return (
        probes.select(
            F.expr("pos div 63").cast("int").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 63) AS INT))"
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_prefilter(
    left: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int,
    k: int,
) -> DataFrame:
    """Rows of ``left`` whose key passes the filter (all k bits set) —
    the pre-shuffle cut. NULL keys never pass (a NULL equi-join key
    cannot match, and the membership predicate must not let one ride
    a null comparison through the WHERE). k broadcast joins against
    the ≤ m/63-row word table, one per probe; the kept predicate and
    the probe arithmetic stay inside whole-stage codegen."""
    out = left
    keep = F.col(key_col).isNotNull()
    temp: list[str] = []
    for r in range(k):
        p, w, m, b = f"_bp{r}", f"_bw{r}", f"_bm{r}", f"_bb{r}"
        temp += [p, w, m, b]
        out = (
            out.withColumn(
                p,
                F.pmod(
                    portable_token_hash(
                        F.concat(
                            F.lit(f"{r}:{BLOOM_SALT}:"),
                            F.col(key_col).cast("string"),
                        )
                    ),
                    F.lit(m_bits),
                ),
            )
            .withColumn(w, F.expr(f"CAST({p} div 63 AS INT)"))
            .withColumn(
                m,
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pmod({p}, 63) AS INT))"),
            )
            .join(
                F.broadcast(
                    bloom.select(
                        F.col("word_idx").alias(w), F.col("bits").alias(b)
                    )
                ),
                w,
                "left",
            )
        )
        keep = keep & (
            F.coalesce(F.col(b), F.lit(0)).bitwiseAND(F.col(m)) == F.col(m)
        )
    return out.where(keep).drop(*temp)


def bloom_prefilter_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """``left ⋈ right ON on``, with the left side bloom-pruned before
    the join shuffle. Result rows are EXACTLY the plain equi-join's
    (no false negatives; the exact join removes the deterministic
    false positives) — the prefilter changes cost, never semantics."""
    flt = bloom_from_keys(right, on, m_bits=m_bits, k=k)
    kept = bloom_prefilter(left, on, flt, m_bits=m_bits, k=k)
    return kept.join(right, on)
