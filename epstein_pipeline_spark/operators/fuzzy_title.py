"""Blocked fuzzy-title join (SURVEY.md J3).

Reference: processors/dedup.py:296-324 — block documents by the first
word of the lowercased title, then all-pairs fuzz.ratio >= 0.90 within
each block, score = the ratio. Spark restatement: equi-join on the
block key + a levenshtein-ratio theta predicate; block key is the
shuffle partition key, which Catalyst handles (AQE splits hot blocks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from epstein_pipeline_spark.functions.fuzzy import levenshtein_ratio_expr
from epstein_pipeline_spark.functions.text import normalize_text_expr


def title_fuzzy_pairs(
    df: DataFrame,
    id_col: str = "id",
    title_col: str = "title",
    threshold: float = 0.90,
) -> DataFrame:
    """(url1, url2, score, method='title_fuzzy') for near-identical
    titles in the same first-word block."""
    t = df.select(
        F.col(id_col).alias("_id"),
        normalize_text_expr(title_col).alias("_title"),
    ).withColumn("_block", F.split("_title", " ")[0])
    a, b = t.alias("a"), t.alias("b")
    ratio = levenshtein_ratio_expr(F.col("a._title"), F.col("b._title"))
    return (
        a.join(b, "_block")
        .filter(F.col("a._id") < F.col("b._id"))
        .withColumn("score", F.round(ratio, 6))
        .filter(F.col("score") >= threshold)
        .select(
            F.col("a._id").alias("url1"),
            F.col("b._id").alias("url2"),
            "score",
            F.lit("title_fuzzy").alias("method"),
        )
    )
