"""PII masking — the redaction pass web-text curation runs before
training (Dolma masks EMAIL_ADDRESS / PHONE_NUMBER / IP_ADDRESS with
``|||TYPE|||`` sentinels; C4's line filters drop rather than mask).

The reference EXTRACTS these entities into a table for investigation
(``src/epstein_pipeline/processors/entities.py:34-63`` — that side is
`operators/entities.py`); a training-data pipeline must additionally
REWRITE the text. This operator shares the reference's EMAIL/PHONE
patterns (single source of truth) and adds the SSN/IPv4 shapes the
reference corpus never needed.

Scale shape: a chain of four ``regexp_replace`` calls — pure JVM
scalar expressions inside one whole-stage-codegen projection, zero
exchanges, per-doc cost linear in text length. Counts are taken per
pattern on the ORIGINAL text (order-independent, cross-engine
deterministic); masking applies in ``PII_PATTERNS`` order so an
address inside an email local part is consumed by the email mask
first (the sentinels contain no digits, so masks never cascade).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from epstein_pipeline_spark.operators.entities import ENTITY_PATTERNS

# dict order = masking order: most-specific first (emails may embed
# digit runs; SSN's 3-2-4 shape and IPv4's dotted quads must be
# consumed before the looser phone pattern sees them)
PII_PATTERNS: dict[str, str] = {
    "EMAIL_ADDRESS": ENTITY_PATTERNS["EMAIL_ADDR"],
    "SSN": r"\b\d{3}-\d{2}-\d{4}\b",
    "IP_ADDRESS": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    # masking-grade variant of ENTITY_PATTERNS["PHONE"]: the shared
    # extraction pattern's leading \b sits before \(? so it can never
    # consume an opening paren ("(212) 555-0187" extracts as
    # "212) 555-0187" — fine for the entity table, but a mask would
    # leave a stray "(" in the rewritten text); prefixing \(?\b fixes
    # redaction without changing which numbers match
    "PHONE_NUMBER": r"\(?\b(?:\+?1[-.\s]?)?\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4}\b",
}


def mask_token(pii_type: str) -> str:
    """The Dolma-convention sentinel, e.g. ``|||EMAIL_ADDRESS|||``."""
    return f"|||{pii_type}|||"


def redact_pii_expr(
    text_col: Column | str, types: list[str] | None = None
) -> Column:
    """Text with every PII match replaced by its type sentinel."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for pii_type, pat in PII_PATTERNS.items():
        if types is None or pii_type in types:
            c = F.regexp_replace(c, pat, mask_token(pii_type))
    return c


def pii_count_expr(text_col: Column | str, pii_type: str) -> Column:
    """Match count for one PII type on the ORIGINAL text."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS[pii_type]), F.lit(0)))


def redact_pii(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    types: list[str] | None = None,
) -> DataFrame:
    """Input rows with ``text_col`` rewritten to the redacted text,
    plus per-type ``n_<type>`` counts and an ``any_pii`` flag."""
    selected = [t for t in PII_PATTERNS if types is None or t in types]
    out = docs
    for t in selected:
        out = out.withColumn(f"n_{t.lower()}", pii_count_expr(text_col, t))
    total = sum((F.col(f"n_{t.lower()}") for t in selected), F.lit(0))
    return out.withColumn("any_pii", total > 0).withColumn(
        text_col, redact_pii_expr(text_col, types)
    )
