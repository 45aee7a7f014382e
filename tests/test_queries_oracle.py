"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01)."""

import math

import duckdb
import pytest

from lovdata_pipeline_spark.oracles import ORACLES
from lovdata_pipeline_spark.queries import QUERIES, TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _norm(v):
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, pd.Timestamp) or hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def canon(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(_norm(v) for v in rec) for rec in df[cols].itertuples(index=False)),
        key=repr,
    )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    want = ddb.execute(ORACLES[name]).df()
    assert len(got) == len(want), f"rowcount {len(got)} vs {len(want)}"
    assert sorted(map(str.lower, got.columns)) == sorted(map(str.lower, want.columns))
    assert canon(got) == canon(want)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize(
    "name",
    [
        "dedup_exact_groups",
        "dedup_vocab_fingerprint_groups",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_embedding_cosine",
    ],
)
def test_dedup_queries_are_nonvacuous(spark, name):
    """A dedup detector that returns nothing would 'pass' any 0-row oracle;
    pin that each finds the planted duplicates (r1 verdict: vacuous greens)."""
    assert QUERIES[name](spark, SF_DIR).count() > 0


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_grading_window_leaves_no_query_unattested():
    """The external driver grades only the FIRST 50 registry entries.
    Invariant (the r2 verdict's criterion, encoded): every registry query
    must be (a) inside the graded window, (b) hash-green in a prior
    round's CORRECTNESS file, or (c) an exact twin (same function object
    / same output pinned by test) of a query satisfying (a) or (b).
    A reorder that silently orphans a never-graded query fails here."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    graded_green = set()
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        for name, row in json.load(open(path)).items():
            if row.get("hash_match") or row.get("rows_match"):
                graded_green.add(name)

    names = list(QUERIES)
    window = names[:50]
    window_fns = {QUERIES[n] for n in window}
    # output-identical twins not sharing a function object, pinned by the
    # named tests:
    TWINS = {
        # test_blocked_embedding_dedup_matches_broadcast + graded default
        # routes through the same blocked plan (queries.py)
        "dedup_embedding_cosine_blocked": "dedup_embedding_cosine",
    }
    orphans = []
    for name in names:
        if name in window or name in graded_green:
            continue
        if QUERIES[name] in window_fns:  # registry alias of a windowed fn
            continue
        if TWINS.get(name) in window or TWINS.get(name) in graded_green:
            continue
        orphans.append(name)
    assert not orphans, f"never-graded queries outside the window: {orphans}"


def test_graded_envelope_stays_single_chunk():
    """The chunk/embed/enrich pipeline oracles derive their SQL from the
    proof that the graded envelope yields exactly ONE chunk per document
    (every corpus text under max_tokens=500, single legalP, content
    round-trips). Probe that precondition directly against the corpus the
    driver grades (sf0.01) so a future testdata regeneration with longer
    or XML-special documents fails HERE with an explanation, not as an
    opaque oracle hash mismatch."""
    import duckdb

    from lovdata_pipeline_spark.functions.tokens import count_tokens

    rows = duckdb.sql(
        "SELECT text FROM '/root/testdata/sf0.01/documents.parquet'"
    ).fetchall()
    assert rows
    for (text,) in rows:
        assert count_tokens(text) <= 500, "doc over max_tokens: oracle's 1-chunk proof void"
        assert text == text.strip(), "surrounding whitespace: content round-trip void"
        assert not any(c in text for c in "<>&"), "XML specials: envelope escape void"


def test_curation_report_invariants(spark):
    """Gates can only cut: every per-source pass/flag count is bounded
    by n_docs, and the report covers exactly the train-side sources."""
    from lovdata_pipeline_spark.queries import curation_report_by_source

    rows = curation_report_by_source(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        for c in ("n_gopher_pass", "n_quality_pass", "n_exact_dup", "n_contaminated"):
            assert 0 <= r[c] <= r.n_docs, (r.source, c)
        assert r.n_tokens >= r.n_docs  # every doc has >= 1 token in testdata
