"""Blocked fuzzy-title join (SURVEY.md J3).

Reference: processors/dedup.py:296-324 — block documents by the first
word of the lowercased title, then all-pairs fuzz.ratio >= 0.90 within
each block, score = the ratio. Spark restatement: blocked pair
generation through ``guarded_block_pairs`` (one shuffle; oversized
blocks — a hot first token at web scale — degrade to O(n) chain+star
candidates instead of a quadratic task, the splink_max_pairs analog),
then the InDel-ratio predicate. A cheap JVM ``levenshtein`` bound
prunes candidates before the exact InDel kernel: indel >= lev, so
``1 - lev/(la+lb) < threshold`` already implies rejection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from epstein_pipeline_spark.config import DEFAULT_CONFIG
from epstein_pipeline_spark.functions.fuzzy import indel_ratio_udf
from epstein_pipeline_spark.functions.text import normalize_text_expr
from epstein_pipeline_spark.operators.pairs import guarded_block_pairs


def title_fuzzy_pairs(
    df: DataFrame,
    id_col: str = "id",
    title_col: str = "title",
    threshold: float = 0.90,
    block_cap: int = DEFAULT_CONFIG.fuzzy_block_cap,
) -> DataFrame:
    """(url1, url2, score, method='title_fuzzy') for near-identical
    titles in the same first-word block. Score = rapidfuzz
    ``fuzz.ratio`` semantics (InDel ratio ``2*LCS/(la+lb)``,
    processors/dedup.py:313), threshold 0.90 (config dedup_threshold)."""
    t = df.select(
        F.col(id_col).alias("_id"),
        normalize_text_expr(title_col).alias("_title"),
    ).withColumn("_block", F.split("_title", " ")[0])
    pairs = guarded_block_pairs(t, "_block", ["_id", "_title"], block_cap)
    t1, t2 = F.col("a._title"), F.col("b._title")
    # exact prune: InDel distance >= Levenshtein distance, so the JVM
    # levenshtein bound can only over-keep, never drop a true match
    lev_bound = F.when(
        F.length(t1) + F.length(t2) == 0, F.lit(1.0)
    ).otherwise(1.0 - F.levenshtein(t1, t2) / (F.length(t1) + F.length(t2)))
    return (
        pairs.filter(lev_bound >= threshold)
        .withColumn("score", F.round(indel_ratio_udf(t1, t2), 6))
        .filter(F.col("score") >= threshold)
        .select(
            F.col("a._id").alias("url1"),
            F.col("b._id").alias("url2"),
            "score",
            F.lit("title_fuzzy").alias("method"),
        )
    )
