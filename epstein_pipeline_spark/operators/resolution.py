"""J6: entity-resolution scoring pass (fixed-weight Fellegi–Sunter).

Reference: ``processors/entity_resolution.py:180-238`` configures
Splink with JaroWinkler comparison tiers — name [0.95, 0.88, 0.7],
first/last name [0.95, 0.88], aliases [0.88], exact category —
blocking on name_lower / last_name, match-probability threshold 0.85
(config.py:129), then clusters pairwise predictions.

Spark restatement: EM weight *training* is scoped out (SURVEY §2); the
comparison-vector → match-probability machinery is not. Each tier
carries a FIXED log2-Bayes-factor weight; the pair score is

    logit2 = prior + sum(tier weights),  p = 2^logit2 / (1 + 2^logit2)

pairs with p >= threshold feed the existing connected-components
operator for clustering. JaroWinkler here is bit-identical to
DuckDB's ``jaro_winkler_similarity`` (property-tested), so the whole
score is expressible as an ANSI-SQL oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# (column, [tier-threshold...]) per entity_resolution.py:211-233;
# weights[i] = log2 Bayes factor for "jw >= tiers[i]" (first tier that
# fires wins, like Splink's ordered comparison levels); last entry =
# the else/non-match weight
FS_COMPARISONS: dict[str, tuple[list[float], list[float]]] = {
    "name": ([0.95, 0.88, 0.70], [8.0, 5.0, 2.0, -4.0]),
    "first_name": ([0.95, 0.88], [4.0, 2.0, -2.0]),
    "last_name": ([0.95, 0.88], [4.0, 2.0, -2.0]),
    "aliases": ([0.88], [3.0, -1.0]),
}
FS_CATEGORY_WEIGHTS = (1.0, -1.0)  # exact match / mismatch
FS_PRIOR_LOGIT2 = -6.0  # log2 prior odds two blocked records match
DEFAULT_THRESHOLD = 0.85  # reference config.py:129


def py_jaro_winkler(s1: str, s2: str, p: float = 0.1, boost: float = 0.7) -> float:
    """Jaro–Winkler similarity, bit-identical to DuckDB's
    ``jaro_winkler_similarity`` (0.0 if either side is empty; standard
    prefix scale 0.1 over <=4 chars, applied when jaro > 0.7)."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    md = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - md), min(l2, i + md + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (matches / l1 + matches / l2 + (matches - t) / matches) / 3
    if j > boost:
        pl = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            pl += 1
        j += pl * p * (1 - j)
    return j


@F.pandas_udf(T.DoubleType())
def jw_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
    return pd.Series(
        [py_jaro_winkler(a or "", b or "") for a, b in zip(s1, s2)], dtype="float64"
    )


def _tier_weight(jw: Column, tiers: list[float], weights: list[float]) -> Column:
    expr = F.lit(weights[-1])
    for thr, w in zip(reversed(tiers), reversed(weights[:-1])):
        expr = F.when(jw >= F.lit(thr), F.lit(w)).otherwise(expr)
    return expr


def score_person_pairs(
    persons: DataFrame,
    id_col: str = "pid",
    threshold: float = DEFAULT_THRESHOLD,
) -> DataFrame:
    """Blocked comparison + fixed-weight FS score.

    persons: (pid, name, first_name, last_name, aliases, category),
    all lowercase. Blocking (reference blocking_rules): equal
    first_name OR equal last_name; comparison vector on the union.
    Returns (pid1, pid2, match_probability) for p >= threshold.
    """
    cols = [id_col, "name", "first_name", "last_name", "aliases", "category"]
    p = persons.select(*cols)
    a = p.select([F.col(c).alias(f"{c}1") for c in cols])
    b = p.select([F.col(c).alias(f"{c}2") for c in cols])
    blocked = (
        a.join(b, F.col("first_name1") == F.col("first_name2"))
        .unionByName(a.join(b, F.col("last_name1") == F.col("last_name2")))
        .filter(F.col(f"{id_col}1") < F.col(f"{id_col}2"))
        .dropDuplicates([f"{id_col}1", f"{id_col}2"])
    )
    score = F.lit(FS_PRIOR_LOGIT2)
    for col, (tiers, weights) in FS_COMPARISONS.items():
        # round(jw, 6) on BOTH engines so tier boundaries are immune to
        # last-ulp float differences
        jw = F.round(jw_udf(F.col(f"{col}1"), F.col(f"{col}2")), 6)
        score = score + _tier_weight(jw, tiers, weights)
    score = score + F.when(
        F.col("category1") == F.col("category2"), F.lit(FS_CATEGORY_WEIGHTS[0])
    ).otherwise(F.lit(FS_CATEGORY_WEIGHTS[1]))
    prob = F.pow(F.lit(2.0), score) / (F.lit(1.0) + F.pow(F.lit(2.0), score))
    return (
        blocked.withColumn("match_probability", F.round(prob, 6))
        .filter(F.col("match_probability") >= threshold)
        .select(
            F.col(f"{id_col}1").alias("pid1"),
            F.col(f"{id_col}2").alias("pid2"),
            "match_probability",
        )
    )


def resolve_persons(
    persons: DataFrame, id_col: str = "pid", threshold: float = DEFAULT_THRESHOLD
) -> DataFrame:
    """Full pass: score -> threshold -> connected components.
    Returns (pid, canonical_id) with canonical_id = min pid in the
    matched cluster (reference clusters pairwise predictions at the
    same threshold, entity_resolution.py:236-238)."""
    from epstein_pipeline_spark.operators.cc import connected_components

    pairs = score_person_pairs(persons, id_col, threshold).select(
        F.col("pid1").cast("string").alias("url1"),
        F.col("pid2").cast("string").alias("url2"),
    )
    nodes = persons.select(F.col(id_col).cast("string").alias("url"))
    return connected_components(pairs, nodes=nodes).select(
        F.col("url").alias(id_col), F.col("cluster_id").alias("canonical_id")
    )
