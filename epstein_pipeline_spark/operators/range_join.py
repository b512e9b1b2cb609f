"""Bates-range interval-overlap join (SURVEY.md J2).

Reference: processors/dedup.py:53-89,275-294 — parse batesRange
strings like "EFTA00123-EFTA00456" into (prefix, lo, hi), then pair
documents whose ranges overlap with equal prefixes, score 0.95. The
reference is an O(n^2) loop; here it's an equi-join on prefix plus the
interval predicate ``a.lo <= b.hi AND b.lo <= a.hi``.

Scale note: prefix is the blocking key; if one prefix dominates, add
bucketized range chunks (floor(lo/B)..floor(hi/B) exploded) as a
secondary equi key — provided as ``bates_pairs_bucketized``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BATES_RE = r"^([A-Za-z]+)(\d+)(?:\s*-\s*([A-Za-z]+)?(\d+))?$"


def parse_bates(df: DataFrame, col: str = "batesRange") -> DataFrame:
    """Add (bates_prefix, bates_lo, bates_hi); null prefix = unparsable
    (reference regex ([A-Z]+)(\\d+), dedup.py:53-78).

    Matches the reference's semantics: a dash-less single Bates number
    "EFTA00123" parses as (prefix, n, n); a second prefix, when present,
    must equal the first ("EFTA1-ABCD2" is unparsable); reversed ranges
    are normalized lo<=hi from the ORIGINAL bounds (least/greatest over
    pre-swap values — a sequential withColumn swap self-clobbers)."""
    c = F.col(col)
    prefix = F.regexp_extract(c, _BATES_RE, 1)
    prefix2 = F.regexp_extract(c, _BATES_RE, 3)
    raw_lo = F.nullif(F.regexp_extract(c, _BATES_RE, 2), F.lit("")).cast("long")
    raw_hi = F.coalesce(
        F.nullif(F.regexp_extract(c, _BATES_RE, 4), F.lit("")).cast("long"), raw_lo
    )
    ok = (prefix != "") & ((prefix2 == "") | (prefix2 == prefix))
    return df.select(
        "*",
        F.when(ok, prefix).alias("bates_prefix"),
        F.when(ok, F.least(raw_lo, raw_hi)).alias("bates_lo"),
        F.when(ok, F.greatest(raw_lo, raw_hi)).alias("bates_hi"),
    )


def bates_overlap_pairs(df: DataFrame, id_col: str = "id") -> DataFrame:
    """(url1, url2, score=0.95, method='bates') for overlapping ranges
    with equal prefixes (reference dedup.py:81-89,275-294)."""
    p = parse_bates(df).filter(F.col("bates_prefix").isNotNull()).select(
        F.col(id_col).alias("_id"), "bates_prefix", "bates_lo", "bates_hi"
    )
    a, b = p.alias("a"), p.alias("b")
    return (
        a.join(b, "bates_prefix")
        .filter(
            (F.col("a._id") < F.col("b._id"))
            & (F.col("a.bates_lo") <= F.col("b.bates_hi"))
            & (F.col("b.bates_lo") <= F.col("a.bates_hi"))
        )
        .select(
            F.col("a._id").alias("url1"),
            F.col("b._id").alias("url2"),
            F.lit(0.95).alias("score"),
            F.lit("bates").alias("method"),
        )
    )


def bates_pairs_bucketized(df: DataFrame, id_col: str = "id", bucket: int = 1000) -> DataFrame:
    """Skew-resistant variant: explode each range into its covered
    buckets of width ``bucket`` and equi-join on (prefix, bucket) so a
    single hot prefix no longer lands in one task; the overlap
    predicate and dedup run after."""
    p = parse_bates(df).filter(F.col("bates_prefix").isNotNull()).select(
        F.col(id_col).alias("_id"), "bates_prefix", "bates_lo", "bates_hi"
    )
    exploded = p.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                (F.col("bates_lo") / bucket).cast("long"),
                (F.col("bates_hi") / bucket).cast("long"),
            )
        ),
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(b, ["bates_prefix", "bucket"])
        .filter(
            (F.col("a._id") < F.col("b._id"))
            & (F.col("a.bates_lo") <= F.col("b.bates_hi"))
            & (F.col("b.bates_lo") <= F.col("a.bates_hi"))
        )
        .select(
            F.col("a._id").alias("url1"),
            F.col("b._id").alias("url2"),
            F.lit(0.95).alias("score"),
            F.lit("bates").alias("method"),
        )
        .dropDuplicates(["url1", "url2"])
    )
