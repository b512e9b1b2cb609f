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


def test_ivf_topk_recall_vs_brute(clustered, spark):
    """IVF probe search: recall@10 vs exact brute force on the
    clustered fixture; centroid training is deterministic."""
    import numpy as np

    from epstein_pipeline_spark.operators.embed_pass import (
        assign_ivf_cells,
        ivf_topk,
        train_ivf_centroids,
        topk_cosine,
    )

    cent = train_ivf_centroids(clustered, n_cells=16, sample_cap=500, seed=9)
    cent2 = train_ivf_centroids(clustered, n_cells=16, sample_cap=500, seed=9)
    assert np.allclose(cent, cent2)  # deterministic

    indexed = assign_ivf_cells(clustered, cent)
    indexed.cache().count()
    q = clustered.filter(F.col("vec_id") == 7).select("embedding").first()[0]
    exact = [r["vec_id"] for r in topk_cosine(clustered, list(q), k=10).collect()]
    approx = [r["vec_id"] for r in ivf_topk(indexed, cent, list(q), k=10, n_probe=4).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.9, f"IVF recall@10 {recall}"
    # probes prune: the searched subset is a strict minority of cells
    assert indexed.select("cell").distinct().count() > 4


def test_ivf_partitioned_index_prunes_files(clustered, spark, tmp_path):
    """write_ivf_index(partitionBy cell) -> probe reads touch ONLY the
    probed cells' files (execution-level proof via input_file_name),
    and the partitioned read returns the same top-k as the in-memory
    index."""
    import numpy as np

    from epstein_pipeline_spark.operators.embed_pass import (
        assign_ivf_cells,
        ivf_topk,
        read_ivf_index,
        train_ivf_centroids,
        write_ivf_index,
    )

    cent = train_ivf_centroids(clustered, n_cells=16, sample_cap=500, seed=9)
    indexed = assign_ivf_cells(clustered, cent)
    path = str(tmp_path / "ivf_index")
    write_ivf_index(indexed, path)
    store = read_ivf_index(spark, path)

    q = clustered.filter(F.col("vec_id") == 7).select("embedding").first()[0]
    qn = np.asarray(q, dtype=np.float64)
    qn /= np.linalg.norm(qn)
    n_probe = 4
    probes = [int(c) for c in (cent @ qn).argsort()[::-1][:n_probe]]

    # the physical plan prunes partitions: files actually read under
    # the probe filter all live in cell=<probe> directories
    read_files = {
        r["f"]
        for r in store.filter(F.col("cell").isin(probes))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert read_files, "probe scan read no files"
    assert all(any(f"cell={p}/" in f for p in probes) for f in read_files), (
        read_files
    )
    # and it IS a strict subset of the index's files
    all_files = {
        r["f"]
        for r in store.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert len(read_files) < len(all_files)
    # the optimized plan carries the partition filter (no full scan)
    plan = store.filter(F.col("cell").isin(probes))._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan

    # parity: partitioned-store probe == in-memory probe
    a = [r["vec_id"] for r in ivf_topk(store, cent, list(q), k=10, n_probe=n_probe).collect()]
    b = [r["vec_id"] for r in ivf_topk(indexed, cent, list(q), k=10, n_probe=n_probe).collect()]
    assert a == b


def test_append_to_ivf_index_incremental(clustered, spark, tmp_path):
    """FAISS-add pattern: new vectors append into the partitioned
    store under their trained cells; probes over the updated index
    find them, untouched cell directories gain no files, and the
    appended assignment matches assign_ivf_cells exactly."""
    import numpy as np

    from epstein_pipeline_spark.operators.embed_pass import (
        append_to_ivf_index,
        assign_ivf_cells,
        ivf_topk,
        read_ivf_index,
        train_ivf_centroids,
        write_ivf_index,
    )

    cent = train_ivf_centroids(clustered, n_cells=8, sample_cap=500, seed=9)
    base = clustered.filter(F.col("vec_id") % 5 != 0)
    delta = clustered.filter(F.col("vec_id") % 5 == 0)
    path = str(tmp_path / "ivf_inc")
    write_ivf_index(assign_ivf_cells(base, cent), path)

    import os

    def files_per_cell():
        out = {}
        for d in os.listdir(path):
            if d.startswith("cell="):
                out[d] = len([f for f in os.listdir(f"{path}/{d}") if f.endswith(".parquet")])
        return out

    before = files_per_cell()
    append_to_ivf_index(delta, cent, path)
    after = files_per_cell()
    touched = {int(r["cell"]) for r in assign_ivf_cells(delta, cent).select("cell").distinct().collect()}
    for d, n in after.items():
        cell = int(d.split("=")[1])
        if cell in touched:
            assert n > before.get(d, 0)
        else:
            assert n == before.get(d, 0)  # untouched cells gain nothing

    store = read_ivf_index(spark, path)
    assert store.count() == clustered.count()
    # a delta vector is now findable: query WITH its own embedding
    probe_vec = delta.select("embedding").first()[0]
    probe_id = delta.select("vec_id").first()[0]
    hits = ivf_topk(store, cent, probe_vec, k=3, n_probe=8).collect()
    assert probe_id in {r["vec_id"] for r in hits}
    # appended rows carry the same cell assignment as a fresh assign
    want = {r["vec_id"]: r["cell"] for r in assign_ivf_cells(delta, cent).collect()}
    got = {r["vec_id"]: r["cell"] for r in store.join(
        delta.select("vec_id"), "vec_id", "left_semi").collect()}
    assert got == want
