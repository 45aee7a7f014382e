"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()``   — every implemented operator from SURVEY.md §2 plus the
                  training-data extensions, as (spark, sf_dir) callables.
``oracle_sql()``— DuckDB equivalents for EVERY query as of r6: the
                  engine-specific sketch aggregates (agg_approx_stats)
                  emit a tolerance-band verdict whose oracle asserts the
                  bands, so even sketches hash-check as real pass/fail.
                  Includes the chunk/embed/enrich pipelines, both ANN
                  scale paths, and the LLM-curation/retrieval operators
                  (r5 added the sequence emitter, Gopher gate, DSIR
                  scoring, training-order shuffle, epoch mixing,
                  exact-substring decontam, cluster-balanced sampling,
                  the per-source curation report, TF-IDF keywords, BPE
                  pair stats, the RANGE-frame rolling window, k-NN label
                  transfer, the per-domain quota cap, and weighted
                  sampling w/o replacement; r6 adds cross-document
                  paragraph dedup with text reassembly, per-source
                  boilerplate line stripping, hard-negative mining,
                  mixture planning, the percentile length band, the
                  vocabulary-drift monitor, Gopher repetition filters,
                  CCNet perplexity buckets, distributed PCA +
                  reduce-then-rerank retrieval, and hash-graded BPE
                  tokenizer training; late r6 adds span-level
                  decontamination surgery, SQ8 scalar-quantized ANN,
                  and the per-column data-expectations gate; r7 adds
                  the first driver-graded STREAMING row
                  (streaming_vocab_counts: AvailableNow drain through
                  the stateful heavy-hitters counter vs the batch
                  explode+count), the compression-band report over
                  literal-pinned zlib fixtures, quality-preferring
                  canonical dedup survivors, the persisted
                  partition-pruned IVF index, and distributed
                  logistic-regression classifier training replayed
                  bit-for-bit by a 3-iteration SQL chain; r8 adds
                  interpolated TRIGRAM Kneser-Ney, the persisted HLL
                  register store's cross-day merge, the stream-stream
                  interval join — the fourth graded streaming row —
                  the k-NN graph's sublinear IVF candidate path graded
                  end-to-end, and the Bloom membership filter with its
                  deterministic false positives graded).

All implementations live in ``lovdata_pipeline_spark`` (queries.py is
the registry; oracles.py the SQL).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lovdata_pipeline_spark.oracles import ORACLES
from lovdata_pipeline_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q3-shaped join+agg+top-k at sf0.001."""
    return QUERIES["q3_top_unshipped"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
