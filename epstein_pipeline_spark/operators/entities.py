"""P9: regex entity extractors.

Reference: ``/root/reference/src/epstein_pipeline/processors/entities.py:34-63``
ships seven compiled patterns (PHONE, EMAIL_ADDR, ACCOUNT, ADDRESS,
CASE_NUMBER, FLIGHT_ID, FINANCIAL_AMOUNT) applied with ``finditer``
per document (entities.py:369-384); matches become the entity table
every downstream join uses.

Spark restatement: one pass over the corpus — per document an array of
(entity_type, matches[]) structs built with ``regexp_extract_all``
(JVM, codegen), exploded twice into the long-form
(doc_id, entity_type, value) table. The text is scanned once per
pattern inside a single projection; no Python touches the hot path.

The patterns are re-expressed with inline ``(?i)`` flags so the same
string works in Java regex (Spark) and RE2 (DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# mirrors REGEX_EXTRACTORS (entities.py:34-63); dict order = reference
# iteration order
ENTITY_PATTERNS: dict[str, str] = {
    "PHONE": r"\b(?:\+?1[-.\s]?)?\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4}\b",
    "EMAIL_ADDR": r"\b[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}\b",
    "ACCOUNT": r"(?i)\b(?:account|acct|a/c)[\s#:]*\d{4,}\b",
    "ADDRESS": (
        r"\b\d{1,5}\s+(?:[A-Z][a-z]+\s+){1,3}"
        r"(?:Street|St|Avenue|Ave|Road|Rd|Boulevard|Blvd|Drive|Dr|Lane|Ln|Court|Ct|Place|Pl)\b"
    ),
    "CASE_NUMBER": r"(?i)\b(?:Case|No\.|Docket|Cause)\s*(?:#|No\.?)?\s*\d[\d\-A-Z:/ ]{3,20}\b",
    "FLIGHT_ID": r"(?i)\b(?:N\d{1,5}[A-Z]{1,2}|(?:Flight|Flt)\s*#?\s*\d{1,6})\b",
    "FINANCIAL_AMOUNT": (
        r"(?i)\$\s?\d{1,3}(?:,\d{3})*(?:\.\d{2})?\b"
        r"|\b\d{1,3}(?:,\d{3})*(?:\.\d{2})?\s*(?:dollars?|USD)\b"
    ),
}


def entity_entries_expr(text_col: Column | str) -> Column:
    """array<struct<entity_type, values:array<string>>> — all seven
    extractors evaluated in ONE projection over the text column."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.array(
        *[
            F.struct(
                F.lit(etype).alias("entity_type"),
                F.regexp_extract_all(c, F.lit(pat), F.lit(0)).alias("values"),
            )
            for etype, pat in ENTITY_PATTERNS.items()
        ]
    )


def extract_entities(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, entity_type, value) — one row per match, reference
    finditer order within a document (non-overlapping, left-to-right).
    All matches are kept: the reference's (type, value, start) dedup
    key never collapses distinct finditer hits of one pattern."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), entity_entries_expr(text_col).alias("_e"))
        .select("doc_id", F.explode("_e").alias("e"))
        .select("doc_id", F.col("e.entity_type").alias("entity_type"),
                F.explode("e.values").alias("value"))
    )
