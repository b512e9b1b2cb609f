"""Connected components: distributed large-star/small-star labels must
match the reference-semantics union-find oracle exactly
(reference processors/dedup.py:183-206)."""

import numpy as np
import pytest

from epstein_pipeline_spark.operators.cc import connected_components, py_union_find


def _check(spark, edges: list[tuple[str, str]], nodes: list[str] | None = None):
    pairs = spark.createDataFrame(edges, "url1 string, url2 string")
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "url string") if nodes else None
    want = py_union_find(edges)
    if nodes:
        for n in nodes:
            want.setdefault(n, n)
    # BOTH paths of the size-gated hybrid must match the oracle:
    # local_max_edges=0 forces the distributed star loop; the default
    # takes the driver union-find fallback on these small graphs
    for local_max in (0, 1_000_000):
        got = {
            r["url"]: r["cluster_id"]
            for r in connected_components(
                pairs, nodes=nodes_df, local_max_edges=local_max
            ).collect()
        }
        assert got == want, f"local_max_edges={local_max}"


def test_simple_chain(spark):
    _check(spark, [("a", "b"), ("b", "c"), ("c", "d")])


def test_two_components_and_singletons(spark):
    _check(spark, [("a", "b"), ("x", "y")], nodes=["a", "b", "x", "y", "lonely"])


def test_star_and_cycle(spark):
    _check(spark, [("hub", "s1"), ("hub", "s2"), ("hub", "s3"), ("c1", "c2"), ("c2", "c3"), ("c3", "c1")])


def test_random_graphs_match_union_find(spark):
    rng = np.random.RandomState(11)
    for trial in range(3):
        n = 60
        nodes = [f"n{i:03d}" for i in range(n)]
        m = rng.randint(20, 80)
        edges = [
            (nodes[rng.randint(0, n)], nodes[rng.randint(0, n)]) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _check(spark, edges, nodes=nodes)


def test_long_path_converges(spark):
    # worst case for naive propagation: a 40-node path needs O(log n)
    # star rounds, not O(n)
    edges = [(f"p{i:02d}", f"p{i+1:02d}") for i in range(40)]
    _check(spark, edges)


def test_salted_cc_matches_union_find(spark):
    """salt_buckets > 1 (the north rule's hot-key salting) must not
    change labels: a mega-hub star + chain + random edges."""
    rng = np.random.RandomState(23)
    nodes = [f"m{i:03d}" for i in range(80)]
    edges = [("m000", n) for n in nodes[1:40]]  # hub skew
    edges += [(nodes[i], nodes[i + 1]) for i in range(40, 79)]  # chain
    edges += [(nodes[rng.randint(0, 80)], nodes[rng.randint(0, 80)]) for _ in range(30)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "url1 string, url2 string")
    # salt_hot_degree=5 forces the hub (degree ~40) onto the SALTED
    # path while low-degree nodes stay cold — both join branches of the
    # differentiated salt run and must agree with union-find exactly
    got = {
        r["url"]: r["cluster_id"]
        for r in connected_components(
            pairs, salt_buckets=8, salt_hot_degree=5, local_max_edges=0
        ).collect()
    }
    assert got == py_union_find(edges)
