"""Whitespace-edge differential gate (r6): every text-bearing graded
query runs Spark-vs-DuckDB on a corpus whose documents end with
newlines, start with spaces, and mix tabs/CRLF — the shapes real files
have, which the driver's sf corpora do not exercise.

Motivation: Spark's ``trim`` strips SPACES only and ``F.split`` keeps
trailing empty strings, so a ``\\n``-terminated document used to grow a
phantom empty token (+1 token count, a phantom n-gram, a '' unigram in
every vocabulary). DuckDB's trim/string_split_regex behave identically,
so the wart was cross-engine-consistent and invisible to the sf-corpus
diffcheck — this gate pins BOTH that the phantom is gone and that every
fix landed on both engines at once.
"""

from __future__ import annotations

import duckdb
import pytest

from lovdata_pipeline_spark.oracles import ORACLES
from lovdata_pipeline_spark.queries import QUERIES

# every graded query whose Spark side AND oracle reference only the
# documents table (auto-discovered in conftest-free form: a query that
# errors on the one-table corpus is skipped, so the list below is the
# hand-pinned core that MUST run; discovery adds the rest)
TEXT_QUERIES = [
    "text_gopher_quality",
    "text_repetition_signals",
    "tfidf_keywords_by_source",
    "bpe_pair_stats",
    "bpe_learned_merges",
    "bpe_token_counts",
    "text_bigram_surprisal",
    "text_unigram_surprisal",
    "importance_score_documents",
    "mixture_plan_by_source",
    "token_length_band_documents",
    "perplexity_buckets_by_source",
    "dedup_exact_groups",
    "hash_split_documents",
    "text_language_id",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_components",
    "text_fingerprints",
    "text_quality",
    "text_repetition",
    "vocab_drift_by_source",
    # epoch_mix_documents is excluded: its mixing rule parses the sf
    # corpus's srcN source names (corpus-coupled by design)
    "training_order_documents",
    "length_bucketed_batches_documents",
    "pack_sequences_documents",
    "pack_emit_sequences",
    "sequence_manifest_documents",
    "paragraph_dedup_documents",
    "boilerplate_strip_documents",
    "exact_contamination_documents",
    "decontaminate_benchmark_overlap",
    "decontaminate_clean_set",
    "text_quality_classifier",
    "weighted_sample_documents",
    "curation_pipeline",
    "curation_report_by_source",
]

_TEXTS = [
    (0, "the quick brown fox\n", "web"),                  # trailing newline
    (1, "  leading spaces here\n\n", "web"),              # leading ws + trailing blank line
    (2, "tabs\there\tand words\r\n", "web"),              # tabs + CRLF
    (3, "plain middle document no edges", "books"),
    (4, "multi\nline\ndoc\nwith lines\n", "books"),
    (5, "the the the repeated tokens the\n", "books"),
    (6, "\n\nonly after blanks\n", "news"),
    (7, "single\n", "news"),
    (8, "a b a b a b\n", "news"),
    (9, "ends with spaces   ", "news"),
]
# mirror the driver corpus schema: doc_id, text, lang, source, n_chars
DOCS = [(i, t, "en", s, len(t)) for i, t, s in _TEXTS]


@pytest.fixture(scope="module")
def edge_sf_dir(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("edge_sf")
    spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(p / "documents.parquet"))
    return str(p)


@pytest.fixture(scope="module")
def edge_con(edge_sf_dir):
    con = duckdb.connect()
    # Spark writes a directory of part files; DuckDB needs the glob
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM '{edge_sf_dir}/documents.parquet/*.parquet'"
    )
    return con


def _canon(df):
    cols = sorted(df.columns)
    out = []
    for rec in df[cols].itertuples(index=False):
        out.append(tuple(str(v) for v in rec))
    return sorted(out)


@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_edge_corpus_parity(spark, edge_sf_dir, edge_con, name):
    sdf = QUERIES[name](spark, edge_sf_dir).toPandas()
    odf = edge_con.execute(ORACLES[name]).df()
    assert sorted(map(str.lower, sdf.columns)) == sorted(
        map(str.lower, odf.columns)
    )
    assert _canon(sdf) == _canon(odf), name


def test_no_phantom_tokens_on_trailing_newline(spark):
    """token_count_col must not count a phantom token for the trailing
    newline, and the unigram vocabulary must not contain ''."""
    from pyspark.sql import functions as F

    from lovdata_pipeline_spark.operators.textstats import (
        _words,
        token_count_col,
    )

    docs = spark.createDataFrame(
        [(1, "two words\n"), (2, "  lead\ttab\r\n"), (3, "x")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", token_count_col("text").alias("n")
        ).collect()
    }
    assert got == {1: 2, 2: 2, 3: 1}
    vocab = {
        r.w
        for r in docs.select(
            F.explode(_words("text")).alias("w")
        ).collect()
    }
    assert "" not in vocab


def test_no_phantom_tokens_on_vertical_tab(spark):
    """Java regex \\s matches \\x0B (vertical tab); _WS_SET must too,
    or a \\x0B-terminated doc is btrim-kept but split-consumed — the
    phantom '' token class (r7 ADVICE)."""
    from pyspark.sql import functions as F

    from lovdata_pipeline_spark.operators.textstats import (
        _words,
        token_count_col,
    )

    docs = spark.createDataFrame(
        [(1, "two words\x0b"), (2, "\x0bmid\x0bsplit\x0b"), (3, "\x0b\x0b")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", token_count_col("text").alias("n")
        ).collect()
    }
    assert got == {1: 2, 2: 2, 3: 0}
    vocab = {
        r.w
        for r in docs.select(F.explode(_words("text")).alias("w")).collect()
    }
    assert "" not in vocab
    assert vocab == {"two", "words", "mid", "split"}
