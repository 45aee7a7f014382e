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
    proportionally (8 groups / 5 000 at sf0.1).
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
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda j: F.element_at(
            vocab, (F.pmod(_h(eff, j, F.lit("tok")), F.lit(len(VOCAB))) + 1).cast("int")
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


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("scaleup-sf1")
    write_documents(spark, os.path.join(out_dir, "documents.parquet"))
    write_embeddings(spark, os.path.join(out_dir, "embeddings.parquet"))
    write_events(spark, os.path.join(out_dir, "events.parquet"))
    d = spark.read.parquet(os.path.join(out_dir, "documents.parquet"))
    e = spark.read.parquet(os.path.join(out_dir, "embeddings.parquet"))
    v = spark.read.parquet(os.path.join(out_dir, "events.parquet"))
    print(
        f"sf1 written to {out_dir}: documents={d.count()} "
        f"embeddings={e.count()} events={v.count()}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
