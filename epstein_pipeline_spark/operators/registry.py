"""Person-registry linking (SURVEY.md J7).

Reference: person substring scan over document text
(processors/person_linker.py:52-59), exact-dict-then-fuzzy lookup
(models/registry.py:66-93), confidence tiers
(processors/confidence.py:54-119).

Spark restatement: the registry (persons + exploded aliases) is a
small dimension — broadcast join with a ``contains`` predicate; the
fuzzy tier is an exact fuzz.token_sort_ratio rescue (InDel over
token-sorted strings, confidence.py:98) for mentions that missed
exact containment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from epstein_pipeline_spark.functions.fuzzy import token_sort_ratio_expr
from epstein_pipeline_spark.functions.text import normalize_text_expr


def explode_registry(persons: DataFrame) -> DataFrame:
    """(person_id, name_variant) — canonical name + aliases, normalized."""
    base = persons.select(F.col("id").alias("person_id"), F.col("name").alias("variant"))
    aliases = persons.select(
        F.col("id").alias("person_id"), F.explode_outer("aliases").alias("variant")
    ).filter(F.col("variant").isNotNull())
    return (
        base.unionByName(aliases)
        .withColumn("variant", normalize_text_expr("variant"))
        .filter(F.length("variant") > 0)
        .distinct()
    )


def link_persons(docs: DataFrame, persons: DataFrame, id_col: str = "id", text_col: str = "text") -> DataFrame:
    """(doc_id, person_id, variant, confidence=1.0) substring hits via
    broadcast join (the m:n document_persons table, neon_schema.py:86-92)."""
    reg = explode_registry(persons)
    d = docs.select(F.col(id_col).alias("doc_id"), normalize_text_expr(text_col).alias("_norm"))
    return (
        d.join(F.broadcast(reg), F.col("_norm").contains(F.col("variant")))
        .select("doc_id", "person_id", "variant", F.lit(1.0).alias("confidence"))
        .dropDuplicates(["doc_id", "person_id"])
    )


def fuzzy_match_mentions(
    mentions: DataFrame, persons: DataFrame, threshold: float = 0.85
) -> DataFrame:
    """Best fuzzy registry match per mention string (W2 argmax):
    exact fuzz.token_sort_ratio >= threshold, highest wins
    (confidence.py:98-105)."""
    from pyspark.sql import Window

    from epstein_pipeline_spark.functions.fuzzy import token_sort_expr

    reg = explode_registry(persons)
    m = mentions.select(F.col("mention"), normalize_text_expr("mention").alias("_m"))
    # JVM levenshtein upper bound prunes BEFORE the Python InDel DP:
    # indel_dist >= lev, so 1 - lev/(la+lb) >= indel_ratio — pairs the
    # bound already puts below threshold (the vast majority in a
    # first-char block) never reach the pandas UDF. Exactness
    # preserved; same prune the title-fuzzy path uses.
    ts_m = token_sort_expr(F.col("_m"))
    ts_v = token_sort_expr(F.col("variant"))
    # both-empty guard: the division is NULL at length 0+0 and the
    # filter would drop the pair, while the exact InDel ratio defines
    # empty-vs-empty as 1.0 (same guard title_fuzzy_pairs applies)
    len_sum = F.length(ts_m) + F.length(ts_v)
    lev_bound = F.when(len_sum == 0, F.lit(1.0)).otherwise(
        F.lit(1.0) - F.levenshtein(ts_m, ts_v) / len_sum
    )
    lev_ok = lev_bound >= F.lit(threshold)
    scored = (
        m.join(F.broadcast(reg), F.substring(F.col("_m"), 1, 1) == F.substring(F.col("variant"), 1, 1))
        .filter(lev_ok)
        .withColumn("score", F.round(token_sort_ratio_expr(F.col("_m"), F.col("variant")), 6))
        .filter(F.col("score") >= threshold)
    )
    w = Window.partitionBy("mention").orderBy(F.desc("score"), "person_id")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("mention", "person_id", "variant", "score")
    )
