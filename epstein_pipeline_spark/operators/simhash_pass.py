"""SimHash Hamming-ball pass (north_rule stage 2).

Replaces the reference's O(n^2) embedding-cosine semantic pass
(processors/dedup.py:404-464) with a scalable candidate join:
64-bit SimHash -> 4x16-bit band equi-join -> exact Hamming verify
``bit_count(xor) <= d`` JVM-side. Pigeonhole guarantees recall 1.0 for
pairs within distance d <= bands-1.

Score is reported as 1 - d/64 (a similarity in [0,1]) so downstream
ordering/threshold semantics match the other passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from epstein_pipeline_spark.config import DedupConfig
from epstein_pipeline_spark.functions.simhash import (
    hamming_distance_expr,
    make_simhash_udf,
    simhash_bands_expr,
)
from epstein_pipeline_spark.functions.text import normalize_text_expr


def simhash_signatures(
    df: DataFrame, cfg: DedupConfig, id_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """(url, simhash: long) for docs passing the length gate
    (reference dedup.py:422-423: len > 50)."""
    udf = make_simhash_udf()
    return (
        df.filter(F.length(text_col) > cfg.simhash_min_len)
        .select(F.col(id_col).alias("url"), normalize_text_expr(text_col).alias("_norm"))
        .withColumn("simhash", udf("_norm"))
        .drop("_norm")
    )


def simhash_pass(
    df: DataFrame,
    cfg: DedupConfig,
    id_col: str = "url",
    text_col: str = "text",
    sigs: DataFrame | None = None,
) -> DataFrame:
    """(url1, url2, score, method='simhash') pairs with Hamming <= d.

    Pass precomputed ``sigs`` (url, simhash) to avoid re-running the
    signature UDF (the pipeline commits signatures as a stage)."""
    if sigs is None:
        sigs = simhash_signatures(df, cfg, id_col, text_col)
    bands = sigs.select(
        "url",
        "simhash",
        F.posexplode(simhash_bands_expr("simhash", cfg.simhash_bands, cfg.simhash_bits)).alias(
            "band_i", "band_val"
        ),
    )

    # same oversized-bucket guard as the LSH pass: a 16-bit band of all
    # boilerplate-identical docs is a hot key
    sizes = bands.groupBy("band_i", "band_val").agg(F.count("*").alias("_bsz"))
    b = bands.join(sizes, ["band_i", "band_val"])
    small = b.filter(F.col("_bsz") <= cfg.band_bucket_cap)
    a1, a2 = small.alias("a"), small.alias("b")
    pairs = (
        a1.join(a2, ["band_i", "band_val"])
        .filter(F.col("a.url") < F.col("b.url"))
        .select(
            F.col("a.url").alias("url1"),
            F.col("a.simhash").alias("_h1"),
            F.col("b.url").alias("url2"),
            F.col("b.simhash").alias("_h2"),
        )
    )
    big = b.filter(F.col("_bsz") > cfg.band_bucket_cap)
    w = Window.partitionBy("band_i", "band_val").orderBy("url")
    ranked = big.withColumn("_prev", F.lag("url").over(w)).withColumn(
        "_prev_h", F.lag("simhash").over(w)
    )
    chain = ranked.filter(F.col("_prev").isNotNull()).select(
        F.col("_prev").alias("url1"),
        F.col("_prev_h").alias("_h1"),
        F.col("url").alias("url2"),
        F.col("simhash").alias("_h2"),
    )
    pairs = pairs.unionByName(chain).dropDuplicates(["url1", "url2"])

    d = hamming_distance_expr(F.col("_h1"), F.col("_h2"))
    return (
        pairs.withColumn("_d", d)
        .filter(F.col("_d") <= cfg.hamming_max)
        .select(
            "url1",
            "url2",
            (F.lit(1.0) - F.col("_d") / F.lit(float(cfg.simhash_bits))).alias("score"),
            F.lit("simhash").alias("method"),
        )
    )
