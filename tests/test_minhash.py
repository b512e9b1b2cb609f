"""MinHash signature properties: estimator accuracy vs exact Jaccard
(within binomial error bounds) and determinism."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from epstein_pipeline_spark.config import DedupConfig
from epstein_pipeline_spark.functions.minhash import (
    _perm_params,
    _shingle_hashes,
    _signature,
    make_minhash_udf,
    py_exact_jaccard,
    signature_jaccard_expr,
)

CFG = DedupConfig()


def _sig(text: str) -> np.ndarray:
    a, b = _perm_params(CFG.num_perm, CFG.minhash_seed)
    return _signature(_shingle_hashes(text, CFG.shingle_k), a, b)


def _est(t1: str, t2: str) -> float:
    return float((_sig(t1) == _sig(t2)).mean())


@pytest.mark.parametrize("noise_rate", [0.0, 0.01, 0.05, 0.2])
def test_estimator_tracks_exact_jaccard(noise_rate):
    rng = np.random.RandomState(3)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    base = " ".join(words[i] for i in rng.randint(0, len(words), 400))
    chars = list(base)
    for i in rng.choice(len(chars), int(len(chars) * noise_rate), replace=False):
        chars[i] = "x"
    other = "".join(chars)
    exact = py_exact_jaccard(base, other, CFG.shingle_k)
    est = _est(base, other)
    # 128-perm binomial: sigma = sqrt(J(1-J)/128) <= 0.045
    assert abs(est - exact) < 4.5 * np.sqrt(max(exact * (1 - exact), 0.01) / 128)


def test_identical_texts_estimate_one():
    assert _est("hello world of spark", "hello world of spark") == 1.0


def test_disjoint_texts_estimate_zero():
    assert _est("aaaa bbbb cccc dddd", "wxyz qrst uvmn opkl") < 0.1


def test_signature_deterministic():
    s1, s2 = _sig("some stable text content here"), _sig("some stable text content here")
    assert (s1 == s2).all()


def test_udf_matches_local(spark):
    texts = ["the quick brown fox jumps", "pack my box with five dozen jugs", ""]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    udf = make_minhash_udf(CFG.shingle_k, CFG.num_perm, CFG.minhash_seed)
    rows = df.select(udf("t").alias("sig")).collect()
    for t, r in zip(texts, rows):
        assert list(_sig(t).astype(np.int64)) == r["sig"]


def test_signature_jaccard_expr(spark):
    udf = make_minhash_udf(CFG.shingle_k, CFG.num_perm, CFG.minhash_seed)
    df = spark.createDataFrame(
        [("same text in both rows exactly", "same text in both rows exactly")], "a string, b string"
    )
    out = df.select(
        signature_jaccard_expr(udf("a"), udf("b"), CFG.num_perm).alias("j")
    ).first()["j"]
    assert out == 1.0


def test_fold61_bit_identical_to_modulo():
    """The Mersenne fold must equal % (2^61-1) for every uint64,
    including the wrap boundary cases."""
    import numpy as np

    from epstein_pipeline_spark.functions.minhash import _MERSENNE, _fold61

    rng = np.random.RandomState(9)
    y = rng.randint(0, np.iinfo(np.uint64).max, size=200_000, dtype=np.uint64)
    edge = np.array(
        [0, 1, int(_MERSENNE) - 1, int(_MERSENNE), int(_MERSENNE) + 1,
         2 * int(_MERSENNE), (1 << 64) - 1, 1 << 61, (1 << 61) + 5],
        dtype=np.uint64,
    )
    for arr in (y, edge):
        assert (_fold61(arr.copy()) == arr % _MERSENNE).all()
