"""Corpus-level distributional statistics: Zipf law fit and collocation
(PMI) extraction.

Two standing corpus-health monitors a training-data pipeline runs per
ingest wave, next to ``textstats.vocab_drift`` (KL) and the perplexity
buckets:

- ``zipf_slope``: the log-log slope of the token frequency-rank curve
  per source. Natural-language corpora track Zipf's law (slope ≈ -1);
  machine-generated or template-heavy sources bend the curve, so a
  per-source slope far from -1 flags a source whose token distribution
  is off before any model sees it (Piantadosi 2014's corpus-QA usage).
- ``collocation_pmi``: top adjacent-bigram collocations by pointwise
  mutual information (Church & Hanks 1990) — the standard multiword-
  expression extractor (tokenizer seeding, boilerplate phrase
  discovery).

Determinism discipline (both feed driver-graded rows): all counting is
integer; logs are taken on exactly-representable integer-valued doubles
and immediately quantized (Zipf) or combined in one fixed expression
tree (PMI), so Spark and DuckDB produce bit-identical doubles before
the final 6-dp round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lovdata_pipeline_spark.operators import textstats
from lovdata_pipeline_spark.operators.sampling import top_k_per_group

#: fixed-point scale for the quantized log coordinates of the Zipf fit.
#: At 6 dp and the _MAX_TOP_R=100 rank window, every normal-equation
#: term stays inside int64 even for frequencies up to 2^53:
#: x ≤ ln(100)·10⁶ ≈ 4.6e6, y ≤ ln(2^53)·10⁶ ≈ 3.7e7, so
#: n·Σxy ≤ 100·(100·1.7e14) = 1.7e18 and Σx·Σy ≤ 4.6e8·3.7e9 ≈ 1.7e18,
#: both < 2^63 ≈ 9.2e18.
_LOG_SCALE = 1_000_000

#: hard ceiling on the per-group rank window so the int64 normal-
#: equation cross terms above cannot overflow.
_MAX_TOP_R = 100


def zipf_slope(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    top_r: int = 100,
) -> DataFrame:
    """Per-group Zipf slope: OLS slope of ln(freq) on ln(rank) over the
    ``top_r`` most frequent tokens of each group → (group, n_terms,
    zipf_slope).

    Plan shape (100-TB honest): one scan explodes tokens (the text
    column itself never shuffles — only (group, term) pairs), a hash
    aggregate builds the per-group term frequencies, and the rank
    window routes through the two-phase ``top_k_per_group`` (≤ top_r·P
    survivors per group — no one-task-per-vocabulary funnel). The
    regression then runs on ≤ top_r rows per group.

    Determinism: rank and frequency are integers, so ``ln`` sees the
    identical double in any engine; both coordinates are quantized to
    6-dp int64 micro-units, the normal-equation sums are exact integer
    arithmetic (bounds proven at ``_LOG_SCALE``), and the final slope
    divides two exactly-computed int64s in one double op — bit-equal
    on Spark and DuckDB before the 6-dp round.
    """
    if top_r > _MAX_TOP_R:
        raise ValueError(
            f"zipf_slope: top_r > {_MAX_TOP_R} would overflow the int64 "
            "normal-equation bounds; raise _LOG_SCALE math first"
        )
    tok = docs.select(
        F.col(group_col), F.explode(textstats._words(text_col)).alias("term")
    )
    tf = tok.groupBy(group_col, "term").agg(F.count(F.lit(1)).alias("freq"))
    ranked = top_k_per_group(tf, top_r, group_col, "freq", "term")
    q = F.lit(float(_LOG_SCALE))
    # floor, not round: floor on a positive double is engine-identical
    # with no rounding tie mode to match (the same floor(x·10^s)
    # quantization the PCA / classifier fixed-point paths use)
    pts = ranked.select(
        F.col(group_col),
        F.floor(F.log(F.col("rk").cast("double")) * q).cast("long").alias("x"),
        F.floor(F.log(F.col("freq").cast("double")) * q).cast("long").alias("y"),
    )
    agg = pts.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n_terms") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_terms") * F.col("sxx") - F.col("sx") * F.col("sx")
    return agg.select(
        F.col(group_col),
        F.col("n_terms"),
        F.when(
            den > 0, F.round(num.cast("double") / den.cast("double"), 6)
        ).alias("zipf_slope"),
    )


def collocation_pmi(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-k adjacent-bigram collocations by PMI → (w1, w2, n_pair,
    pmi), PMI = ln( p(w1 w2) / (p(w1)·p(w2)) ) with bigram probability
    over the bigram total and unigram probabilities over the token
    total.

    Plan shape (single scan, r10): each row explodes ONE tagged entry
    array — its unigrams (kind=0, w2 NULL) concatenated with its
    adjacent bigrams (kind=1, from zip_with) — into ONE hash aggregate
    keyed (kind, w1, w2); the unigram and bigram tables are filters
    over that vocabulary-bounded aggregate, so Spark's ReusedExchange
    executes the corpus scan + partial aggregation once (the previous
    two-branch form documented "one scan" but its two independent
    explode branches each re-read and re-tokenized the corpus — r10
    review). The two scalar totals ride 1-row broadcast crossJoins; the
    unigram re-attach is a plain equi-join per side (vocabulary-sized,
    AQE picks broadcast when it fits). ``min_count`` prunes the bigram
    table BEFORE the joins, and the final top-k is Spark's TakeOrdered
    (per-partition top-k + k-row driver merge — no full sort).

    Determinism: all counts are exact int64 < 2^53, cast to double and
    combined in ONE fixed expression tree — ln((cb/Tb) / ((c1/Tu)·
    (c2/Tu))) — identical on any engine; 6-dp round; ties break on
    (w1, w2).
    """
    _ENTRY_T = "array<struct<kind:int,w1:string,w2:string>>"
    toks = docs.select(textstats._words(text_col).alias("w"))
    entries = toks.select(
        F.explode(
            F.concat(
                F.transform(
                    "w",
                    lambda t: F.struct(
                        F.lit(0).alias("kind"), t.alias("w1"),
                        F.lit(None).cast("string").alias("w2"),
                    ),
                ).cast(_ENTRY_T),
                F.when(F.size("w") < 2, F.array().cast(_ENTRY_T)).otherwise(
                    F.zip_with(
                        F.slice("w", 1, F.greatest(F.size("w") - 1, F.lit(1))),
                        F.slice("w", 2, F.greatest(F.size("w") - 1, F.lit(1))),
                        lambda a, b: F.struct(
                            F.lit(1).alias("kind"), a.alias("w1"), b.alias("w2")
                        ),
                    ).cast(_ENTRY_T)
                ),
            )
        ).alias("p")
    )
    counts = entries.groupBy("p.kind", "p.w1", "p.w2").agg(
        F.count(F.lit(1)).alias("c")
    )
    uni = counts.filter(F.col("kind") == 0).select(
        F.col("w1").alias("term"), F.col("c").alias("cu")
    )
    big = counts.filter(F.col("kind") == 1).select(
        "w1", "w2", F.col("c").alias("cb")
    )
    tot_u = uni.agg(F.sum("cu").alias("tu"))
    tot_b = big.agg(F.sum("cb").alias("tb"))
    cand = big.filter(F.col("cb") >= min_count)
    joined = (
        cand.join(uni.select(F.col("term").alias("w1"), F.col("cu").alias("c1")), "w1")
        .join(uni.select(F.col("term").alias("w2"), F.col("cu").alias("c2")), "w2")
        .crossJoin(F.broadcast(tot_u))
        .crossJoin(F.broadcast(tot_b))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    pmi = F.round(
        F.log(
            (d("cb") / d("tb")) / ((d("c1") / d("tu")) * (d("c2") / d("tu")))
        ),
        6,
    )
    return (
        joined.select(
            "w1", "w2", F.col("cb").alias("n_pair"), pmi.alias("pmi")
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(k)
    )
