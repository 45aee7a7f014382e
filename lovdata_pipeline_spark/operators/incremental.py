"""Incremental change detection — the engine's defining batch contract.

Each run processes only documents whose content hash changed since the
recorded state, plus cleans up removed ones (reference:
pipeline_orchestrator.py:214-278, rationale state.py:1-14). Expressed
as plain optimized joins:

  changed  = manifest WHERE status IN (added, modified)
  to_do    = changed ANTI JOIN processed_state ON (doc_id, hash)   -- op 5
  removed  = manifest WHERE status = removed                        -- op 4

The processed-state side is one row per document — tiny relative to the
corpus — so Catalyst broadcasts it and the anti-join never shuffles the
manifest. This ordering (filter before chunk/embed) is the pipeline-level
"pushdown" the reference hand-rolls: never re-embed unchanged documents
(docs/GUIDE.md:479-496).
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from lovdata_pipeline_spark.schemas import MANIFEST_SCHEMA

CHANGED_STATUSES = ("added", "modified")


def flatten_sync_state(spark: SparkSession, state_json_path: str | Path) -> DataFrame:
    """Flatten lovlig's nested state.json into a manifest DataFrame.

    Input shape (reference: lovlig.py:70-106):
    ``{"raw_datasets": {dataset.tar.bz2: {"files": {rel: {sha256, status}}}}}``
    Dataset dir name strips the archive suffix; doc_id is the file stem
    (lovlig.py:87-95).
    """
    raw = json.loads(Path(state_json_path).read_text())
    rows = []
    for archive, ds in (raw.get("raw_datasets") or {}).items():
        dataset = archive.removesuffix(".tar.bz2")
        for rel_path, meta in (ds.get("files") or {}).items():
            rows.append(
                (
                    Path(rel_path).stem,
                    dataset,
                    rel_path,
                    meta.get("sha256", ""),
                    meta.get("status", "added"),
                )
            )
    return spark.createDataFrame(rows, MANIFEST_SCHEMA)


def filter_datasets(manifest: DataFrame, pattern: str) -> DataFrame:
    """Wildcard dataset selection (op 8; reference settings.py:94-97).

    fnmatch-style: ``*`` = any run, ``?`` = one char; LIKE's own
    metacharacters (``%``/``_``) in the pattern are escaped so they match
    literally. Rows with NULL dataset_name (removed docs, whose dataset
    the diff cannot recover) pass through — cleanup must not be silently
    skipped by a dataset filter.

    On a ``dataset_name``-partitioned layout this predicate becomes
    partition pruning — non-matching datasets are never listed.
    """
    if pattern in ("*", "", None):
        return manifest
    like = (
        pattern.replace("\\", "\\\\")
        .replace("%", r"\%")
        .replace("_", r"\_")
        .replace("*", "%")
        .replace("?", "_")
    )
    col = F.col("dataset_name")
    return manifest.filter(col.isNull() | col.like(like))


def identify_changed(
    manifest: DataFrame,
    processed_state: DataFrame,
    force: bool = False,
    limit: int | None = None,
) -> DataFrame:
    """Documents to (re)process this run (ops 4-7).

    ``processed_state``: (doc_id, hash) of successfully processed docs.
    force bypasses the anti-join (op 6); limit is a deterministic head-n
    by doc_id for testing (op 7 — the reference's list slice is input-
    ordered; we order by key so the result is partition-independent).
    """
    if force:
        # Force takes ALL non-removed files, not just changed ones
        # (pipeline_orchestrator.py:249-256 uses get_all_files).
        changed = manifest.filter(F.col("status") != "removed")
    else:
        changed = manifest.filter(F.col("status").isin(*CHANGED_STATUSES))
        state = processed_state.select(
            "doc_id", F.col("hash").alias("source_hash")
        )
        changed = changed.join(
            F.broadcast(state), ["doc_id", "source_hash"], "left_anti"
        )
    if limit is not None:
        changed = changed.orderBy("doc_id").limit(limit)
    return changed


def identify_removed(manifest: DataFrame) -> DataFrame:
    """Documents flagged removed upstream (op 4; lovlig.py:122-123)."""
    return manifest.filter(F.col("status") == "removed")
