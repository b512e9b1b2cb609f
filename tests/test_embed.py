"""Embedding similarity operators on the driver's embeddings table:
brute-force vs LSH-bucketed pair parity, top-k sanity."""

import pytest
from pyspark.sql import functions as F

from epstein_pipeline_spark.operators.embed_pass import (
    cosine_pairs_brute,
    cosine_pairs_rhp,
    topk_cosine,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embs(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def clustered(spark):
    """Synthetic embeddings WITH near-neighbor structure (the driver's
    table has none: max pairwise cosine ~0.48): 40 anchor directions,
    5 slightly-perturbed copies each -> within-group cosine >= ~0.97."""
    import numpy as np

    rng = np.random.RandomState(13)
    rows = []
    vid = 0
    for g in range(40):
        anchor = rng.normal(size=64)
        anchor /= np.linalg.norm(anchor)
        for _ in range(5):
            v = anchor + rng.normal(scale=0.02, size=64)
            v /= np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v], g))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.cache().count()
    return df


def test_brute_pairs_threshold(clustered):
    pairs = cosine_pairs_brute(clustered, threshold=0.95).collect()
    assert len(pairs) > 100
    assert all(r["score"] >= 0.95 for r in pairs)


def test_rhp_recalls_brute(clustered):
    brute = {(r["id1"], r["id2"]) for r in cosine_pairs_brute(clustered, 0.95).collect()}
    rhp = {
        (r["id1"], r["id2"])
        for r in cosine_pairs_rhp(clustered, 0.95, n_bits=12, n_tables=12).collect()
    }
    assert rhp <= brute  # verification is exact: no extras possible
    recall = len(rhp & brute) / len(brute)
    assert recall >= 0.9, f"RHP recall {recall:.3f}"


def test_topk_self_is_top(embs, spark):
    q = embs.filter(F.col("vec_id") == 0).first()["embedding"]
    top = topk_cosine(embs, list(q), k=5).collect()
    assert top[0]["vec_id"] == 0 and abs(top[0]["score"] - 1.0) < 1e-4
    assert len(top) == 5
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)


def test_topk_sql_matches_pandas_path(embs):
    q = embs.filter(F.col("vec_id") == 1).first()["embedding"]
    a = [(r["vec_id"]) for r in topk_cosine(embs, list(q), 10, use_pandas=True).collect()]
    b = [(r["vec_id"]) for r in topk_cosine(embs, list(q), 10, use_pandas=False).collect()]
    assert a == b
