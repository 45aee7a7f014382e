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
