"""SimHash: UDF/python-oracle agreement, Hamming locality, banding."""

import numpy as np
from pyspark.sql import functions as F

from epstein_pipeline_spark.functions.simhash import (
    hamming_distance_expr,
    make_simhash_udf,
    py_simhash,
    simhash_bands_expr,
)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_udf_matches_python_oracle(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "completely different content about spark partitions",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    rows = df.select(make_simhash_udf()("t").alias("h")).collect()
    for t, r in zip(texts, rows):
        assert py_simhash(t) == r["h"]


def test_similar_texts_small_hamming():
    # zipfian token frequencies (natural webtext shape) give simhash
    # bits stable margins; near-exact edits stay inside the d<=3 ball
    rng = np.random.RandomState(0)
    vocab = [f"w{i}" for i in range(50)]
    tokens = [vocab[i % 50] for i in rng.zipf(1.5, 1000)]
    base = " ".join(tokens)
    edited = list(tokens)
    edited[500] = "replacement"
    edited[100], edited[101] = edited[101], edited[100]
    del edited[300]
    variant = " ".join(edited)
    assert _hamming(py_simhash(base), py_simhash(variant)) <= 3


def test_different_texts_large_hamming():
    a = " ".join(f"alpha{i}" for i in range(100))
    b = " ".join(f"omega{i*3}" for i in range(100))
    assert _hamming(py_simhash(a), py_simhash(b)) > 10


def test_band_extraction_roundtrip(spark):
    df = spark.createDataFrame([(int(-6148914691236517206),)], "h long")  # 0xAAAA.. pattern
    bands = df.select(simhash_bands_expr("h", 4, 64).alias("b")).first()["b"]
    assert len(bands) == 4
    h = np.uint64(np.int64(-6148914691236517206))
    for i, bv in enumerate(bands):
        assert bv == int((h >> np.uint64(16 * i)) & np.uint64(0xFFFF))


def test_hamming_expr(spark):
    df = spark.createDataFrame([(0b1011, 0b0010)], "a long, b long")
    assert df.select(hamming_distance_expr(F.col("a"), F.col("b")).alias("d")).first()["d"] == 2
