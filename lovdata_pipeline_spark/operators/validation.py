"""State ↔ store consistency validation (op 31).

Two set differences between the state table's doc ids and the chunk
store's distinct document ids (reference:
domain/services/validation_service.py:43-65): consistent iff both are
empty. Expressed as two left-anti joins; both sides are one row per
document, so this never touches chunk payloads.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class ValidationResult:
    in_state_not_store: list[str]
    in_store_not_state: list[str]

    @property
    def consistent(self) -> bool:
        return not self.in_state_not_store and not self.in_store_not_state


def validation_report(state_ids: DataFrame, store_ids: DataFrame) -> DataFrame:
    """One row per inconsistency: (doc_id, problem).

    problem ∈ {'missing_in_store', 'missing_in_state'} — the two
    directions the reference reports (validation_service.py:43-65).
    """
    a = state_ids.select("doc_id").distinct()
    b = store_ids.selectExpr("document_id AS doc_id").distinct()
    missing_in_store = a.join(b, "doc_id", "left_anti").select(
        "doc_id", F.lit("missing_in_store").alias("problem")
    )
    missing_in_state = b.join(a, "doc_id", "left_anti").select(
        "doc_id", F.lit("missing_in_state").alias("problem")
    )
    return missing_in_store.unionByName(missing_in_state)


def validate(state_ids: DataFrame, store_ids: DataFrame) -> ValidationResult:
    report = validation_report(state_ids, store_ids).collect()
    return ValidationResult(
        in_state_not_store=sorted(r.doc_id for r in report if r.problem == "missing_in_store"),
        in_store_not_state=sorted(r.doc_id for r in report if r.problem == "missing_in_state"),
    )


#: exact-mode column cap: each exact countDistinct adds an Expand
#: branch (pre-shuffle rows × |cols|); past this many columns the gate
#: refuses to build the plan unless approx mode is chosen.
EXPECTATIONS_EXACT_COL_CAP = 32


def expectations_report(
    df: DataFrame, cols: list[str], approx: bool = False
) -> DataFrame:
    """Per-column data-expectation stats — the Deequ-style ingest gate a
    100-TB pipeline runs before anything downstream trusts a table:
    one row per checked column with (col_name, n_rows, n_nulls,
    null_frac, n_distinct, unique_nonnull). ``unique_nonnull`` is the
    primary-key contract (no NULLs and fully distinct); callers assert
    on it for id columns and on ``null_frac`` budgets for the rest.

    Plan shape: ONE aggregate over one scan (count + per-column null
    sums + per-column countDistinct), then the single result row
    unpivots to per-column rows inside the plan (explode of a struct
    array — no driver round trip). The multi-countDistinct Expand
    multiplies pre-shuffle rows by |cols|: fine for the handful of
    contract columns this gate is for, so exact mode REFUSES more than
    ``EXPECTATIONS_EXACT_COL_CAP`` columns (a 500-column audit would
    silently build a 500-way Expand). Audit EVERY column of a wide
    table with ``approx=True`` instead: one HLL sketch per column
    (``approx_count_distinct``), no Expand — and ``unique_nonnull``
    then needs the exact row count only on columns whose ESTIMATE is
    within HLL error of n_rows, so the wide pass stays one scan and the
    pk contract is re-checked exactly by the caller on the id column
    (the ``lg validate --pk`` path always uses exact mode). Approx mode
    is not hash-graded: HLL estimates are not cross-engine-stable.

    null_frac is the UNROUNDED ratio of two exact integers —
    bit-identical in every IEEE engine (same discipline as
    ``ngram_overlap_flags.overlap_frac``).
    """
    if not approx and len(cols) > EXPECTATIONS_EXACT_COL_CAP:
        raise ValueError(
            f"expectations_report: {len(cols)} columns exceeds the exact-"
            f"mode cap ({EXPECTATIONS_EXACT_COL_CAP}); pass approx=True "
            "for a wide-table audit (one HLL sketch per column, no Expand)"
        )
    distinct_of = (
        (lambda c: F.approx_count_distinct(F.col(c)))
        if approx
        else (lambda c: F.countDistinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        # coalesce: sum over an EMPTY table is NULL, which would cascade
        # into NULL null_frac / unique_nonnull for the degenerate input
        aggs.append(
            F.coalesce(F.sum(F.col(c).isNull().cast("long")), F.lit(0)).alias(
                f"_nulls_{c}"
            )
        )
        aggs.append(distinct_of(c).alias(f"_dist_{c}"))
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_rows").alias("n_rows"),
                F.col(f"_nulls_{c}").alias("n_nulls"),
                (F.col(f"_nulls_{c}") / F.greatest(F.col("_rows"), F.lit(1))).alias(
                    "null_frac"
                ),
                F.col(f"_dist_{c}").alias("n_distinct"),
                (
                    (F.col(f"_nulls_{c}") == 0)
                    & (F.col(f"_dist_{c}") == F.col("_rows"))
                ).alias("unique_nonnull"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(per_col).alias("s")).select("s.*")
