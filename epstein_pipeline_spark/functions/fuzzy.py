"""Fuzzy string ratio columns.

Reference uses rapidfuzz ``fuzz.ratio`` (Levenshtein-based,
/root/reference/src/epstein_pipeline/processors/dedup.py:313) and
``fuzz.token_sort_ratio`` (processors/confidence.py:98). Spark's
built-in ``levenshtein`` covers both JVM-side:

    fuzz.ratio(a, b)/100  ~= 1 - lev(a,b) / max(len) ... but rapidfuzz
    uses the InDel (LCS-style) ratio 1 - dist/(len(a)+len(b)). We use
    the substitution-counting Levenshtein normalization, documented as
    the engine's definition; thresholds are calibrated against it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from epstein_pipeline_spark.functions.text import normalize_text_expr


def levenshtein_ratio_expr(a: Column, b: Column) -> Column:
    """1 - levenshtein/max(len); 1.0 when both empty."""
    ml = F.greatest(F.length(a), F.length(b))
    return F.when(ml == 0, F.lit(1.0)).otherwise(1.0 - F.levenshtein(a, b) / ml)


def token_sort_expr(col: Column | str) -> Column:
    """Sort whitespace tokens and rejoin (rapidfuzz token_sort prep)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(F.array_sort(F.split(normalize_text_expr(c), " ")), " ")


def token_sort_ratio_expr(a: Column, b: Column) -> Column:
    return levenshtein_ratio_expr(token_sort_expr(a), token_sort_expr(b))
