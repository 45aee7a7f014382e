"""Generate an sf1-scale synthetic corpus for the scale-ladder bench.

The driver ships sf0.001/0.01/0.1 only; the ladder (SCALING.md) needs a
third decade to measure per-query scaling exponents. This generator
does NOT copy or replicate driver rows (replication would plant a
pathological duplicate structure — every fingerprint group 10×, every
near-dup pair count ~100×, poisoning exactly the queries the ladder
audits). Instead it regenerates the same statistical shape the driver
data exhibits, measured from sf0.1:

documents (50 000 rows = 10× sf0.1):
  * text: 10–100 words (uniform), drawn uniformly from the same
    30-token vocabulary; ~5 % of docs carry one planted 'dup' token
    (250/5 000 at sf0.1); 80 exact-duplicate text pairs planted
    proportionally (8 groups / 5 000 at sf0.1). The benchmark slice
    (doc_id % 97 == 0, the decontamination queries' split) draws from
    a disjoint UPPERCASED copy of the vocabulary so the decontam gate
    at sf1 excises genuine leaks instead of the whole corpus (r10).
  * lang ∈ {en de fr zh es}, source ∈ src0..src19, n_chars = len(text).

embeddings (20 000 rows = 10× sf0.1): 64-dim UNIT float vectors
  (hash-uniform components, normalized — sf0.1 vectors are unit-norm),
  label ∈ 0..9.

events (1 000 000 rows = 10× sf0.1, added r9 so the ladder can audit
  the events/streaming family at a third decade):
  * ts uniform over 30 days of Jan 2024 (microseconds, TIMESTAMP_NTZ —
    the driver files' naive-timestamp semantics, so DuckDB's epoch()/
    date_trunc see identical wall times), user_id ∈ 0..14 999 (10×
    sf0.1's 1 500 users at the same ~67 events/user), event_type
    uniform over view/click/purchase/signup/error, value ~ U[0,100]
    to 2 dp, props = '{"k": N}' with N ∈ 0..99.

relational family (added late r9 so q1/q3/q5 get their third decade —
  every table family the engine queries is now laddered): customer
  150 k / supplier 10 k / part 200 k / orders 1.5 M / lineitem ~6 M
  (1–7 lines per order, mean 4 — the sf0.1 mean), all value
  distributions matched to the driver shapes (acctbal U[−1000, 10000),
  orderdate uniform 1995-01-01..2001-08-01 with shipdate = orderdate +
  1..96 days, the q3-relevant joint structure; statuses/priorities/
  segments/flags uniform over the driver's domains). region and nation
  are FIXED dimensions (5 regions / 25 nations, regionkey = i mod 5) —
  regenerated identical, not scaled.

Everything derives from xxhash64 of the row id — deterministic,
generated entirely JVM-side from ``spark.range`` (no driver loops, no
Python rows), so regenerating yields identical parquet values.

Usage: python tools/scaleup.py [out_dir]  (default /root/repo/.scale/sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lovdata_pipeline_spark.session import get_spark  # noqa: E402

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]

N_DOCS = 50_000
N_VECS = 20_000
N_EVENTS = 1_000_000
N_USERS = 15_000
DIM = 64


def _h(*cols):
    return F.xxhash64(*cols)


def write_documents(spark, path: str) -> None:
    base = spark.range(N_DOCS).withColumnRenamed("id", "doc_id")
    # 80 planted exact-duplicate pairs: ids ≡ 624 (mod 625) reuse the
    # previous id's text — proportional to sf0.1's 8 groups per 5 000
    eff = F.when(
        F.pmod(F.col("doc_id"), F.lit(625)) == 624, F.col("doc_id") - 1
    ).otherwise(F.col("doc_id"))
    n_words = (F.pmod(_h(eff, F.lit("nw")), F.lit(91)) + 10).cast("int")
    # the decontamination queries' benchmark slice (queries._bench_split:
    # doc_id % 97 == 0) draws from a DISJOINT vocabulary — the same 30
    # tokens uppercased, so every length/frequency statistic matches but
    # no 3-gram can cross the split. Without this the 515 bench docs'
    # 3-grams saturate the shared 30-token 3-gram space and the
    # decontamination gate annihilates all 49,484 train docs, making the
    # sf1 pretraining_pipeline hash-match vacuous (0 == 0 — r10 VERDICT
    # Next #4; the r9 sweep measured it). Keyed on eff OR doc_id: eff
    # keeps planted duplicate pairs exact copies, and a train doc whose
    # planted twin IS a bench doc carries eval vocab and is correctly
    # excised by the gate — the realistic leak shape (first such doc:
    # 49,374, in the generated corpus). The doc_id side of the OR closes
    # the converse hole (r10 review): a TWIN landing in the bench slice
    # (doc_id % 625 == 624 ∧ doc_id % 97 == 0, first at 54,999 — beyond
    # the current 50,000 docs, so today's bytes are unchanged) would
    # otherwise draw TRAIN vocabulary and re-saturate the gate at any
    # larger regeneration. Such a twin draws eval vocab and simply
    # ceases to be a planted duplicate — pair counts are derived from
    # the data by both engines, never from a fixed constant.
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    evocab = F.array(*[F.lit(w.upper()) for w in VOCAB])
    vsel = F.when(
        (F.pmod(eff, F.lit(97)) == 0) | (F.pmod(F.col("doc_id"), F.lit(97)) == 0),
        evocab,
    ).otherwise(vocab)
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda j: F.element_at(
            vsel, (F.pmod(_h(eff, j, F.lit("tok")), F.lit(len(VOCAB))) + 1).cast("int")
        ),
    )
    text = F.concat_ws(" ", words)
    # ~5 % of docs append one 'dup' token (250/5 000 at sf0.1)
    text = F.when(
        F.pmod(_h(eff, F.lit("dup")), F.lit(20)) == 0,
        F.concat(text, F.lit(" dup")),
    ).otherwise(text)
    lang = F.element_at(
        F.array(*[F.lit(x) for x in ("en", "de", "fr", "zh", "es")]),
        (F.pmod(_h(F.col("doc_id"), F.lit("lang")), F.lit(5)) + 1).cast("int"),
    )
    source = F.concat(
        F.lit("src"), F.pmod(_h(F.col("doc_id"), F.lit("src")), F.lit(20))
    )
    out = base.select(
        "doc_id",
        text.alias("text"),
        lang.alias("lang"),
        source.alias("source"),
    ).withColumn("n_chars", F.length("text"))
    out.repartition(32).write.mode("overwrite").parquet(path)


def write_embeddings(spark, path: str) -> None:
    base = spark.range(N_VECS).withColumnRenamed("id", "vec_id")
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            F.pmod(_h(F.col("vec_id"), j, F.lit("emb")), F.lit(2_000_001))
            / F.lit(1_000_000.0)
            - F.lit(1.0)
        ),
    )
    # bind the raw array once and normalize against a single norm fold —
    # putting the aggregate inside the per-element transform lambda
    # would re-run the O(DIM) fold per element (the interpreted-lambda
    # lesson this round fixed repo-wide; see SCALING.md)
    def _unit(r):
        # the norm gets its own binding level: referencing the fold
        # expression from the inner lambda would still re-run it per
        # element even with r bound
        return F.element_at(
            F.transform(
                F.array(F.sqrt(F.aggregate(r, F.lit(0.0), lambda s, y: s + y * y))),
                lambda nrm: F.transform(r, lambda x: (x / nrm).cast("float")),
            ),
            1,
        )

    out = base.select(
        "vec_id",
        F.element_at(F.transform(F.array(raw), _unit), 1).alias("embedding"),
        F.pmod(_h(F.col("vec_id"), F.lit("label")), F.lit(10))
        .cast("int")
        .alias("label"),
    )
    out.repartition(16).write.mode("overwrite").parquet(path)


def write_events(spark, path: str) -> None:
    base = spark.range(N_EVENTS).withColumnRenamed("id", "event_id")
    span_us = 30 * 24 * 3600 * 1_000_000  # 30 days of microseconds
    t0_us = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC
    ts = F.timestamp_micros(
        F.lit(t0_us) + F.pmod(_h(F.col("event_id"), F.lit("ts")), F.lit(span_us))
    ).cast("timestamp_ntz")  # NTZ: the driver files' naive semantics
    etypes = F.array(
        *[F.lit(x) for x in ("view", "click", "purchase", "signup", "error")]
    )
    out = base.select(
        "event_id",
        ts.alias("ts"),
        F.pmod(_h(F.col("event_id"), F.lit("user")), F.lit(N_USERS)).alias("user_id"),
        F.element_at(
            etypes,
            (F.pmod(_h(F.col("event_id"), F.lit("et")), F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(_h(F.col("event_id"), F.lit("val")), F.lit(10_001)) / F.lit(100.0))
        .alias("value"),
        F.concat(
            F.lit('{"k": '),
            F.pmod(_h(F.col("event_id"), F.lit("pk")), F.lit(100)).cast("string"),
            F.lit("}"),
        ).alias("props"),
    )
    out.repartition(32).write.mode("overwrite").parquet(path)


def write_clustered_batch(spark, out_dir: str, n_batch: int = 300) -> None:
    """A locality-CLUSTERED daily batch (r10 VERDICT Next #5): real
    recrawl batches cluster around a few topics, so their probe union
    covers a small fraction of the IVF index — the uniform-random 1%
    batch's 64/64-cell union is an artifact of the synthetic corpus,
    not of the index design. Batch vectors are drawn near 3 anchor
    vectors from the corpus (vec_id 0/7/13): unit-normalized
    anchor + 0.02·U[-1,1]^64 perturbations (≈5° angular spread —
    tight topical clusters; on this uniform-random corpus the 2nd-4th
    nearest centroids are near-equidistant, so looser spreads inflate
    the probe union far faster than they would on clustered corpora), ids offset by 10M so they never collide
    with corpus ids. Deterministic (xxhash64 of the row id), written
    next to the sf1 tables as daily_batch_clustered.parquet."""
    emb = spark.read.parquet(os.path.join(out_dir, "embeddings.parquet"))
    anchors = {
        r.vec_id: list(r.embedding)
        for r in emb.filter(F.col("vec_id").isin(0, 7, 13)).collect()
    }
    anchor_arr = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in anchors[k]])
            for k in sorted(anchors)
        ]
    )
    base = spark.range(n_batch).withColumnRenamed("id", "bid")
    anchor = F.element_at(anchor_arr, (F.pmod(F.col("bid"), F.lit(3)) + 1).cast("int"))
    perturbed = F.zip_with(
        anchor,
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda a, j: a
        + F.lit(0.02)
        * (
            F.pmod(_h(F.col("bid"), j, F.lit("pert")), F.lit(2_000_001))
            / F.lit(1_000_000.0)
            - F.lit(1.0)
        ),
    )

    def _unit(r):
        return F.element_at(
            F.transform(
                F.array(F.sqrt(F.aggregate(r, F.lit(0.0), lambda s, y: s + y * y))),
                lambda nrm: F.transform(r, lambda x: (x / nrm).cast("float")),
            ),
            1,
        )

    out = base.select(
        (F.col("bid") + F.lit(10_000_000)).alias("vec_id"),
        F.element_at(F.transform(F.array(perturbed), _unit), 1).alias("embedding"),
        F.pmod(_h(F.col("bid"), F.lit("blabel")), F.lit(10)).cast("int").alias("label"),
    )
    out.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "daily_batch_clustered.parquet")
    )


N_CUST = 150_000
N_SUPP = 10_000
N_PART = 200_000
N_ORDERS = 1_500_000

#: 1995-01-01 .. 2001-08-01 = 2404 days (the driver's o_orderdate span)
_ORDERDATE_EPOCH = 788_918_400  # 1995-01-01 00:00:00 UTC
_ORDERDATE_DAYS = 2404


def write_relational(spark, out_dir: str) -> None:
    """customer/supplier/part/orders/lineitem at 10× sf0.1, plus the
    fixed region/nation dimensions — shapes measured from the driver
    data (see module docstring)."""

    def elem(arr_vals, h):
        arr = F.array(*[F.lit(x) for x in arr_vals])
        return F.element_at(arr, (F.pmod(h, F.lit(len(arr_vals))) + 1).cast("int"))

    # fixed dims
    regions = [(0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
               (4, "MIDDLE EAST")]
    spark.createDataFrame(regions, "r_regionkey long, r_name string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "region.parquet"))
    nations = [(i, f"NATION_{i}", i % 5) for i in range(25)]
    spark.createDataFrame(
        nations, "n_nationkey long, n_name string, n_regionkey long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "nation.parquet")
    )

    cust = spark.range(N_CUST).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.col("id")).alias("c_name"),
        F.pmod(_h(F.col("id"), F.lit("cn")), F.lit(25)).cast("int").alias("c_nationkey"),
        (F.round(F.pmod(_h(F.col("id"), F.lit("cb")), F.lit(1_100_000)) / 100.0, 2)
         - 1000.0).alias("c_acctbal"),
        elem(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
             _h(F.col("id"), F.lit("cm"))).alias("c_mktsegment"),
    )
    cust.repartition(8).write.mode("overwrite").parquet(
        os.path.join(out_dir, "customer.parquet")
    )

    supp = spark.range(N_SUPP).select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.col("id")).alias("s_name"),
        F.pmod(_h(F.col("id"), F.lit("sn")), F.lit(25)).cast("int").alias("s_nationkey"),
        (F.round(F.pmod(_h(F.col("id"), F.lit("sb")), F.lit(1_100_000)) / 100.0, 2)
         - 1000.0).alias("s_acctbal"),
    )
    supp.repartition(4).write.mode("overwrite").parquet(
        os.path.join(out_dir, "supplier.parquet")
    )

    part = spark.range(N_PART).select(
        F.col("id").alias("p_partkey"),
        F.concat(
            elem(["blue", "cold", "hot", "large", "new", "old", "red", "small"],
                 _h(F.col("id"), F.lit("pa"))),
            F.lit(" "),
            elem(["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod",
                  "widget"], _h(F.col("id"), F.lit("pn"))),
        ).alias("p_name"),
        F.concat(F.lit("Brand#"),
                 F.pmod(_h(F.col("id"), F.lit("pb")), F.lit(25))).alias("p_brand"),
        elem(["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"],
             _h(F.col("id"), F.lit("pt"))).alias("p_type"),
        (F.pmod(_h(F.col("id"), F.lit("ps")), F.lit(50)) + 1).cast("int").alias("p_size"),
        (F.lit(900.0) + F.round(
            F.pmod(_h(F.col("id"), F.lit("pr")), F.lit(1000)) / 10.0, 1
        )).alias("p_retailprice"),
    )
    part.repartition(8).write.mode("overwrite").parquet(
        os.path.join(out_dir, "part.parquet")
    )

    odate_days = F.pmod(_h(F.col("o_orderkey"), F.lit("od")), F.lit(_ORDERDATE_DAYS))
    orders = spark.range(N_ORDERS).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(_h(F.col("id"), F.lit("oc")), F.lit(N_CUST)).alias("o_custkey"),
        elem(["O", "P", "F"], _h(F.col("id"), F.lit("os"))).alias("o_orderstatus"),
        (F.round(F.pmod(_h(F.col("id"), F.lit("op")), F.lit(49_900_000)) / 100.0, 2)
         + 1000.0).alias("o_totalprice"),
        elem(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
             _h(F.col("id"), F.lit("oy"))).alias("o_orderpriority"),
    )
    orders = orders.withColumn(
        "o_orderdate",
        F.timestamp_seconds(F.lit(_ORDERDATE_EPOCH) + odate_days * 86400)
        .cast("timestamp_ntz"),
    ).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    )
    orders.repartition(16).write.mode("overwrite").parquet(
        os.path.join(out_dir, "orders.parquet")
    )

    # lineitem derives from orders so shipdate stays AFTER its order's
    # date (the q3 joint structure): 1..7 lines per order (mean 4 — the
    # sf0.1 mean), EXCEPT ~1/54 of orders carry no lines at all — the
    # driver data has 2,764/150,000 lineless orders at sf0.1 (1.84%),
    # and without them the anti-join family is vacuous at sf1 (r10
    # sweep finding: anti_join_changed matched 0 == 0 rows). explode
    # drops the empty array, so lineless orders simply emit no rows.
    o = spark.read.parquet(os.path.join(out_dir, "orders.parquet")).select(
        "o_orderkey", "o_orderdate"
    )
    n_lines = (F.pmod(_h(F.col("o_orderkey"), F.lit("nl")), F.lit(7)) + 1).cast("int")
    lineless = F.pmod(_h(F.col("o_orderkey"), F.lit("nl0")), F.lit(54)) == 0
    # sequence(1, 0) counts DOWN to [1, 0] — emit an explicit empty
    # array for lineless orders instead (explode drops it)
    ln = F.explode(
        F.when(lineless, F.array().cast("array<int>")).otherwise(
            F.sequence(F.lit(1), n_lines)
        )
    ).alias("l_linenumber")
    li = o.select(F.col("o_orderkey").alias("l_orderkey"), "o_orderdate", ln)
    hl = lambda tag: _h(F.col("l_orderkey"), F.col("l_linenumber"), F.lit(tag))
    li = li.select(
        "l_orderkey",
        F.pmod(hl("lp"), F.lit(N_PART)).alias("l_partkey"),
        F.pmod(hl("ls"), F.lit(N_SUPP)).alias("l_suppkey"),
        F.col("l_linenumber").cast("int"),
        (F.pmod(hl("lq"), F.lit(50)) + 1).cast("double").alias("l_quantity"),
        (F.lit(900.0) + F.round(F.pmod(hl("le"), F.lit(10_410_000)) / 100.0, 2))
        .alias("l_extendedprice"),
        (F.pmod(hl("ld"), F.lit(11)) / F.lit(100.0)).alias("l_discount"),
        (F.pmod(hl("lt"), F.lit(9)) / F.lit(100.0)).alias("l_tax"),
        elem(["A", "N", "R"], hl("lr")).alias("l_returnflag"),
        elem(["F", "O"], hl("ll")).alias("l_linestatus"),
        (F.col("o_orderdate")
         + F.make_interval(days=(F.pmod(hl("lh"), F.lit(96)) + 1).cast("int")))
        .cast("timestamp_ntz").alias("l_shipdate"),
    )
    li.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "lineitem.parquet")
    )


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("scaleup-sf1")
    write_documents(spark, os.path.join(out_dir, "documents.parquet"))
    write_embeddings(spark, os.path.join(out_dir, "embeddings.parquet"))
    write_clustered_batch(spark, out_dir)
    write_events(spark, os.path.join(out_dir, "events.parquet"))
    write_relational(spark, out_dir)
    counts = {
        t: spark.read.parquet(os.path.join(out_dir, f"{t}.parquet")).count()
        for t in ("documents", "embeddings", "events", "customer", "supplier",
                  "part", "orders", "lineitem", "nation", "region")
    }
    print(f"sf1 written to {out_dir}: " + " ".join(f"{t}={n}" for t, n in counts.items()))
    spark.stop()


if __name__ == "__main__":
    main()
