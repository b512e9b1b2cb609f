"""OCR fallback-chain selection (reference processors/ocr.py:789-827).

The reference walks a backend chain per document and:

1. skips candidates with empty/whitespace-only text (ocr.py:794,806);
2. ACCEPTS the FIRST candidate whose confidence >= threshold and stops
   (ocr.py:796-799);
3. otherwise keeps the best-confidence non-empty candidate seen so far
   (strict ``>`` — the EARLIEST wins ties, ocr.py:805-807);
4. a selection that never crossed the threshold is flagged low
   confidence; per-page confidences below threshold yield a 1-indexed
   low-confidence page list (ocr.py:817-827).

Spark restatement: the multi-backend extract results live in ONE
``array<struct<backend, text, confidence>>`` column in chain order, and
the whole accept rule is array expressions (filter / get / aggregate
argmax) — pure JVM, no shuffle, no UDF; at 100 TB this is a map-only
pass over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def select_ocr_result(
    df: DataFrame,
    candidates_col: str = "candidates",
    threshold: float = 0.6,
) -> DataFrame:
    """Add (ocr_backend, ocr_text, ocr_confidence, low_confidence).

    ``candidates_col``: array<struct<backend:string, text:string,
    confidence:double>> in CHAIN ORDER. A document whose candidates are
    all empty-text gets ocr_text='' and NULL backend/confidence
    (reference md_text='' / ocr_confidence=None, ocr.py:829-830).

    NULL-confidence semantics (pinned by the ocr_chain_select oracle):
    a candidate reporting no confidence can never cross the threshold,
    ranks below every real-confidence candidate in the best-so-far
    fallback, and — when it still ends up chosen — the selection is
    flagged ``low_confidence`` (missing confidence counts as low; the
    reference only ever keeps such a result as a below-threshold
    candidate, ocr.py:805-807).
    """
    elem_type = df.schema[candidates_col].dataType.elementType
    cands = F.col(candidates_col)
    nonempty = F.filter(
        cands, lambda c: c["text"].isNotNull() & (F.trim(c["text"]) != "")
    )
    accepted = F.filter(nonempty, lambda c: c["confidence"] >= F.lit(threshold))
    first_ok = F.get(accepted, 0)  # NULL when nothing crossed the threshold
    # null-safe best: `c.conf > acc.conf` is NULL when either side is
    # NULL, and F.when(NULL, ...) falls through — a NULL-confidence
    # candidate that seeded the accumulator could never be displaced.
    # coalesce(conf, -inf) ranks NULL confidence below every real one,
    # matching the oracle's ORDER BY conf DESC NULLS LAST.
    neg_inf = F.lit(float("-inf"))
    best = F.aggregate(
        nonempty,
        F.lit(None).cast(elem_type),
        lambda acc, c: F.when(
            acc.isNull()
            | (F.coalesce(c["confidence"], neg_inf) > F.coalesce(acc["confidence"], neg_inf)),
            c,
        ).otherwise(acc),
    )
    chosen = F.coalesce(first_ok, best)
    return (
        df.withColumn("_chosen", chosen)
        .withColumn("ocr_backend", F.col("_chosen")["backend"])
        .withColumn("ocr_text", F.coalesce(F.col("_chosen")["text"], F.lit("")))
        .withColumn("ocr_confidence", F.col("_chosen")["confidence"])
        .withColumn(
            "low_confidence",
            F.col("_chosen").isNotNull()
            & (F.coalesce(F.col("_chosen")["confidence"], neg_inf) < F.lit(threshold)),
        )
        .drop("_chosen")
    )


def low_conf_pages_expr(page_confs: Column, threshold: float) -> Column:
    """1-indexed page numbers whose confidence is below threshold
    (reference ocr.py:817-822: ``i + 1 for i, conf in enumerate(...)
    if conf < confidence_threshold``)."""
    return F.filter(
        F.transform(
            page_confs,
            lambda c, i: F.when(c < F.lit(threshold), i + F.lit(1)),
        ),
        lambda x: x.isNotNull(),
    )
