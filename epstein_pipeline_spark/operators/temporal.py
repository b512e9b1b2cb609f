"""A12: temporal-event dedup with the word-overlap gate.

Reference: ``processors/temporal_extractor.py:282-323`` — two events
are duplicates iff same date, same event_type, and >80% word overlap
between descriptions (overlap = |words_a ∩ words_b| / max(|a|, |b|),
lowercased whitespace split); the higher-confidence event survives.

Distributed restatement: the reference walks events in list order
(greedy first-seen); order-dependence doesn't distribute, so the
Spark operator uses the order-free equivalent — an event is dropped
iff some event in its (date, event_type) group overlaps >0.8 and
dominates it on (confidence, then lower id as the deterministic
tie-break). For transitively-overlapping groups this keeps exactly
the argmax-confidence member, which is what the reference's greedy
loop converges to for its chunk-overlap use case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_events(
    events: DataFrame,
    id_col: str = "event_id",
    date_col: str = "date",
    type_col: str = "event_type",
    desc_col: str = "description",
    conf_col: str = "confidence",
    overlap_threshold: float = 0.8,
) -> DataFrame:
    """Drop dominated near-duplicate events; returns the survivors
    with the input schema."""
    toks = F.array_distinct(F.split(F.lower(F.col(desc_col)), r"\s+"))
    slim = events.select(
        F.col(id_col).alias("_id"),
        F.col(date_col).alias("_d"),
        F.col(type_col).alias("_t"),
        F.col(conf_col).alias("_c"),
        toks.alias("_w"),
    )
    a, b = slim.alias("a"), slim.alias("b")
    overlap = F.size(F.array_intersect(F.col("a._w"), F.col("b._w"))) / F.greatest(
        F.size(F.col("a._w")), F.size(F.col("b._w"))
    )
    dominated = (
        a.join(b, (F.col("a._d") == F.col("b._d")) & (F.col("a._t") == F.col("b._t")))
        .filter(F.col("a._id") != F.col("b._id"))
        .filter((F.size(F.col("a._w")) > 0) & (F.size(F.col("b._w")) > 0))
        .filter(overlap > overlap_threshold)
        .filter(
            (F.col("b._c") > F.col("a._c"))
            | ((F.col("b._c") == F.col("a._c")) & (F.col("b._id") < F.col("a._id")))
        )
        .select(F.col("a._id").alias(id_col))
        .distinct()
    )
    return events.join(dominated, id_col, "left_anti")
