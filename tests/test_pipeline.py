"""End-to-end pipeline: recall >= 0.99 vs planted truth, zero false
positives, union-find label parity, kill/rerun resume."""

import pytest
from pyspark.sql import functions as F

from epstein_pipeline_spark.config import DedupConfig
from epstein_pipeline_spark.operators.cc import py_union_find
from epstein_pipeline_spark.plans.checkpoint import StageStore
from epstein_pipeline_spark.plans.pipeline import run_dedup

CFG = DedupConfig(band_bucket_cap=100)


@pytest.fixture(scope="module")
def result(spark, pages, tmp_path_factory):
    store = StageStore(tmp_path_factory.mktemp("stages"))
    res = run_dedup(spark, pages, store, CFG, use_extracted=True, lcs_check=True)
    return res, store


def test_recall_against_planted_truth(result, corpus):
    res, _ = result
    labels = {r["url"]: r["cluster_id"] for r in res.labels.collect()}
    tp = corpus.truth_pairs
    hits = sum(labels.get(a) == labels.get(b) for a, b in zip(tp["url1"], tp["url2"]))
    recall = hits / len(tp)
    assert recall >= 0.99, f"pair recall {recall:.4f} < 0.99"


def test_no_false_positives(result, corpus):
    res, _ = result
    labels = res.labels.toPandas()
    truth_urls = set(corpus.truth_clusters["url"])
    sizes = labels.groupby("cluster_id")["url"].apply(list)
    outside = [
        u for us in sizes if len(us) > 1 for u in us if u not in truth_urls
    ]
    assert outside == [], f"{len(outside)} non-duplicate urls merged into clusters"


def test_labels_match_union_find_on_same_pairs(result):
    """Given identical candidate pairs, the distributed CC must equal
    the reference's union-find exactly (BASELINE.md contract)."""
    res, _ = result
    pairs = [(r["url1"], r["url2"]) for r in res.pairs.collect()]
    want = py_union_find(pairs)
    got = {r["url"]: r["cluster_id"] for r in res.labels.collect()}
    for node, root in want.items():
        assert got[node] == root


def test_cluster_output_shape(result):
    res, _ = result
    cols = set(res.clusters.columns)
    assert cols == {"cluster_id", "url", "is_representative", "similarity", "dedup_method"}
    # exactly one representative per cluster
    bad = (
        res.clusters.groupBy("cluster_id")
        .agg(F.sum(F.col("is_representative").cast("int")).alias("n"))
        .filter(F.col("n") != 1)
        .count()
    )
    assert bad == 0


def test_resume_skips_committed_stages(spark, pages, result):
    """Kill/rerun semantics: a second run against the same store does
    zero stage work (all timings 0) and returns identical labels."""
    res, store = result
    res2 = run_dedup(spark, pages, store, CFG, use_extracted=True, lcs_check=True)
    assert all(t == 0.0 for t in res2.stage_seconds.values()), res2.stage_seconds
    a = {(r["url"], r["cluster_id"]) for r in res.labels.collect()}
    b = {(r["url"], r["cluster_id"]) for r in res2.labels.collect()}
    assert a == b


def test_partial_resume_recomputes_only_invalidated(spark, pages, result):
    res, store = result
    store.invalidate("labels")
    store.invalidate("clusters")
    res3 = run_dedup(spark, pages, store, CFG, use_extracted=True, lcs_check=True)
    zeroed = {k: v for k, v in res3.stage_seconds.items() if k not in ("labels", "clusters")}
    assert all(t == 0.0 for t in zeroed.values())
    assert res3.stage_seconds["labels"] > 0
    a = {(r["url"], r["cluster_id"]) for r in res.labels.collect()}
    b = {(r["url"], r["cluster_id"]) for r in res3.labels.collect()}
    assert a == b


def test_lineage_covers_all_stages(spark, result):
    _, store = result
    lin = store.lineage(spark)
    stages = {r["stage"] for r in lin.select("stage").distinct().collect()}
    assert {
        "extract",
        "pairs_exact",
        "signatures",
        "minhash_candidates",
        "minhash_scored",
        "pairs_simhash",
        "pairs",
        "labels",
        "clusters",
    } <= stages
