"""A12: temporal-event dedup with the word-overlap gate.

Reference: ``processors/temporal_extractor.py:282-323`` — two events
are duplicates iff same date, same event_type, and >80% word overlap
between descriptions (overlap = |words_a ∩ words_b| / max(|a|, |b|),
lowercased whitespace split); the higher-confidence event survives
(strictly higher replaces; ties keep the earlier one).

Distributed restatement: the reference walks the event list greedily,
comparing each event against the KEPT list only — a chain A~B~C
(A!~C) with descending confidence keeps {A, C}, not just {A}, so a
"dominated by anyone in the group" rule is NOT equivalent. But the
greedy only ever compares within one (date, event_type) group, and
those groups are small (chunk-overlap artifacts), so the faithful
translation is ``applyInPandas`` per group running the reference
greedy verbatim over the group sorted by event id (the reference's
list order is its input order; a distributed engine needs a
deterministic stand-in, and ascending id is the natural one).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def py_greedy_dedup(
    events: Iterable[tuple],
    overlap_threshold: float = 0.8,
) -> list[int]:
    """Reference greedy (temporal_extractor.py:294-322) over one
    (date, event_type) group. ``events``: (event_id, description,
    confidence) in processing order. Returns surviving event_ids."""
    kept: list[tuple[int, set, float]] = []  # (id, words, confidence)
    for eid, desc, conf in events:
        words = set((desc or "").lower().split())
        is_dup = False
        for i, (kid, kwords, kconf) in enumerate(kept):
            if words and kwords:
                overlap = len(words & kwords) / max(len(words), len(kwords))
                if overlap > overlap_threshold:
                    if conf > kconf:
                        kept.pop(i)
                        kept.append((eid, words, conf))
                    is_dup = True
                    break
        if not is_dup:
            kept.append((eid, words, conf))
    return [k[0] for k in kept]


def dedup_events(
    events: DataFrame,
    id_col: str = "event_id",
    date_col: str = "date",
    type_col: str = "event_type",
    desc_col: str = "description",
    conf_col: str = "confidence",
    overlap_threshold: float = 0.8,
) -> DataFrame:
    """Drop near-duplicate events; returns survivors with the input
    schema. Groups are (date, event_type); within a group the
    reference greedy runs over events sorted by ascending id."""
    slim = events.select(
        F.col(date_col).alias("_d"),
        F.col(type_col).alias("_t"),
        F.col(id_col).alias("_id"),
        F.col(desc_col).alias("_desc"),
        F.col(conf_col).alias("_c"),
    )
    id_type = dict(events.dtypes)[id_col]

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id")
        keep = py_greedy_dedup(
            zip(pdf["_id"], pdf["_desc"], pdf["_c"]), overlap_threshold
        )
        return pdf[pdf["_id"].isin(keep)][["_id"]]

    survivors = slim.groupBy("_d", "_t").applyInPandas(
        run_group, schema=f"_id {id_type}"
    )
    return events.join(
        survivors.select(F.col("_id").alias(id_col)), id_col, "left_semi"
    )
