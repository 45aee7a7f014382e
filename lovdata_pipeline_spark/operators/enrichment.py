"""Metadata enrichment: ordered plugin chain with per-enricher failure
isolation (op 21; reference:
domain/services/metadata_enrichment_service.py:54-302 — registered but
never wired into the live pipeline there; first-class here).

Each enricher is a column-producing function over the chunks DataFrame.
JVM-expressible enrichers are plain ``withColumn`` chains (document
info, hierarchy depth, reference extraction, amendment flag); failure
isolation means an enricher producing bad values yields nulls for the
affected rows, never a job failure — the reference's log-and-continue
per enricher (metadata_enrichment_service.py:124-139).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F

# An enricher maps the chunks DataFrame to {column_name: Column}.
Enricher = Callable[[DataFrame], dict[str, Column]]

# Norwegian statute reference, the reference's regex fallback
# (metadata_enrichment_service.py:219-260): lov/YYYY-MM-DD-N plus an
# optional §-part.
_LAW_REF = r"(lov/\d{4}-\d{2}-\d{2}-\d+(?:/[^\s,.;]+)?)"
# dok-id style date (document_info enricher, :162-165)
_DOKID_DATE = r"(\d{4}-\d{2}-\d{2})"


def document_info(df: DataFrame) -> dict[str, Column]:
    """Title/short-title/date extraction from document-level fields."""
    return {
        "enriched_title": F.coalesce(F.col("document_title"), F.col("section_heading")),
        "law_date": F.regexp_extract(F.col("document_id"), _DOKID_DATE, 1),
    }


def location_info(df: DataFrame) -> dict[str, Column]:
    """Location/citation fields (metadata_enrichment_service.py:173-195):
    the address column (already URL-coalesced by the op-20 projection)
    plus a normalized '§ N' citation parsed from the structural
    paragraph ref / chunk id."""
    para = F.regexp_extract(
        F.coalesce(F.col("paragraph_ref"), F.col("chunk_id")),
        r"(?:paragraf-|§\s*)(\d+[a-z]?)",
        1,
    )
    return {
        "location_address": F.col("absolute_address"),
        "paragraph_citation": F.when(para != "", F.concat(F.lit("§ "), para)),
    }


def hierarchy_info(df: DataFrame) -> dict[str, Column]:
    """Depth = dash count in the structural address (the reference counts
    '-' in chunk_id, metadata_enrichment_service.py:231-236) + chapter
    depth from the context path."""
    return {
        "hierarchy_depth": (
            F.length("absolute_address")
            - F.length(F.regexp_replace("absolute_address", "/", ""))
        ).cast("int"),
        "chapter_depth": F.size(F.coalesce(F.col("chapter_path"), F.array())).cast("int"),
    }


def references_info(df: DataFrame) -> dict[str, Column]:
    """Cross-reference extraction with regex fallback over content: union
    of href-derived refs (chunker) and lov/-pattern matches in the text
    (op 19's stricter variant), deduplicated."""
    text_refs = F.regexp_extract_all(F.coalesce(F.col("content"), F.lit("")), F.lit(_LAW_REF), 1)
    # normalize the href form to the text-regex form (strip the leading
    # '/') BEFORE the distinct-union — '/lov/2020-06-19-44' and
    # 'lov/2020-06-19-44' are the same statute, and without this the
    # "deduplicated" union double-counted it (r10 review)
    href_refs = F.transform(
        F.filter(
            F.coalesce(F.col("cross_refs"), F.array()),
            lambda r: r.startswith("/lov/") | r.startswith("lov/"),
        ),
        lambda r: F.regexp_replace(r, "^/", ""),
    )
    return {
        "law_references": F.array_distinct(F.array_union(href_refs, text_refs)),
        "n_references": F.size(F.array_distinct(F.array_union(href_refs, text_refs))).cast("int"),
    }


def section_context(df: DataFrame) -> dict[str, Column]:
    """is_amendment flag: change-law markers in the content
    (metadata_enrichment_service.py:283-302)."""
    content = F.lower(F.coalesce(F.col("content"), F.lit("")))
    return {
        "is_amendment": content.contains("skal lyde")
        | content.contains("gjøres følgende endringer")
        | content.contains("oppheves"),
    }


DEFAULT_ENRICHERS: list[tuple[str, Enricher]] = [
    ("document_info", document_info),
    ("location_info", location_info),
    ("hierarchy_info", hierarchy_info),
    ("references_info", references_info),
    ("section_context", section_context),
]


def enrich(df: DataFrame, enrichers: list[tuple[str, Enricher]] | None = None) -> DataFrame:
    """Apply the ordered enricher chain. An enricher that fails to *bind*
    (missing column, bad expression) is skipped wholesale — the chain
    continues, matching the reference's per-enricher isolation; row-level
    expression failures already yield SQL nulls."""
    import logging

    out = df
    for name, enricher in enrichers or DEFAULT_ENRICHERS:
        try:
            candidate = out.withColumns(enricher(out))
            candidate.schema  # force analysis so binding errors surface here
        except Exception as exc:
            # log-and-continue, matching the reference's per-enricher
            # isolation (metadata_enrichment_service.py:124-139) — a
            # silently skipped enricher surfaces as missing columns far
            # downstream, so name it here (r10 review)
            logging.getLogger(__name__).warning("enricher %s skipped: %s", name, exc)
            continue  # skip this enricher, keep the chain going
        out = candidate
    return out
