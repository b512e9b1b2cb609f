"""Candidate-pair union with first-pass-wins semantics.

Reference: Deduplicator.find_duplicates merges exact | minhash |
semantic passes, keeping the FIRST pass's (method, score) for a pair
seen by several passes (processors/dedup.py:138-171, ``seen_pairs``).

A naive dropDuplicates loses that ordering guarantee; we rank by an
explicit pass priority (SURVEY.md U1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PASS_PRIORITY = {
    "exact": 0,
    "bates": 1,
    "title_fuzzy": 2,
    "minhash": 3,
    "simhash": 4,
    "semantic": 5,
    "lcs": 6,
}


def canonicalize_pairs(pairs: DataFrame) -> DataFrame:
    """Enforce url1 < url2 (reference dedup.py:146,262,281,310)."""
    return pairs.select(
        F.least("url1", "url2").alias("url1"),
        F.greatest("url1", "url2").alias("url2"),
        *[c for c in pairs.columns if c not in ("url1", "url2")],
    ).filter(F.col("url1") != F.col("url2"))


def union_first_wins(*passes: DataFrame) -> DataFrame:
    """Union pass outputs; first-pass-wins per (url1, url2)."""
    prio = F.create_map(*[F.lit(x) for kv in PASS_PRIORITY.items() for x in kv])
    unioned = None
    for p in passes:
        unioned = p if unioned is None else unioned.unionByName(p)
    assert unioned is not None
    # unmapped method strings rank LAST (nulls would sort first
    # ascending and silently outrank 'exact')
    ranked = unioned.withColumn("_prio", F.coalesce(prio[F.col("method")], F.lit(99)))
    w = Window.partitionBy("url1", "url2").orderBy("_prio", F.desc("score"))
    return (
        ranked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_prio", "_rn")
    )
