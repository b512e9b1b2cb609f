"""Hypothesis property tests over the pure-Python twins (no Spark —
these pin the algorithmic kernels the distributed operators delegate
to, per SURVEY §5's unit-layer strategy)."""

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from epstein_pipeline_spark.functions.minhash import py_exact_jaccard
from epstein_pipeline_spark.functions.text import py_normalize_text
from epstein_pipeline_spark.operators.lcs import py_lcs_dp, py_lcs_length
from epstein_pipeline_spark.operators.resolution import py_jaro_winkler
from epstein_pipeline_spark.operators.temporal import py_greedy_dedup

text_st = st.text(alphabet="abcdef \t\n", max_size=120)


@given(text_st)
@settings(max_examples=200, deadline=None)
def test_normalize_idempotent(s):
    once = py_normalize_text(s)
    assert py_normalize_text(once) == once
    assert "  " not in once and not once.startswith(" ") and not once.endswith(" ")


@given(text_st, text_st)
@settings(max_examples=150, deadline=None)
def test_lcs_hash_binary_search_equals_dp(a, b):
    assert py_lcs_length(a, b) == py_lcs_dp(a, b)


@given(text_st, text_st)
@settings(max_examples=150, deadline=None)
def test_lcs_suffix_array_equals_dp_and_hash(a, b):
    """The literal north-rule kernel (SA by prefix doubling + Kasai
    LCP) agrees with the DP oracle AND the rolling-hash default on
    every input — including multi-byte UTF-8 (both operate on bytes,
    so byte-LCS == byte-LCS)."""
    from epstein_pipeline_spark.functions.suffixarray import py_lcs_suffix_array

    got = py_lcs_suffix_array(a, b)
    assert got == py_lcs_dp(a, b) == py_lcs_length(a, b)


@given(st.text(alphabet="ab€ñ", max_size=60), st.text(alphabet="ab€ñ", max_size=60))
@settings(max_examples=60, deadline=None)
def test_lcs_suffix_array_multibyte_parity(a, b):
    from epstein_pipeline_spark.functions.suffixarray import py_lcs_suffix_array

    assert py_lcs_suffix_array(a, b) == py_lcs_length(a, b)


@given(text_st, text_st)
@settings(max_examples=150, deadline=None)
def test_jaro_winkler_matches_duckdb_prop(a, b):
    con = duckdb.connect()
    d = con.execute("SELECT jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
    assert abs(py_jaro_winkler(a, b) - d) < 1e-9


@given(st.text(alphabet="abcd", min_size=0, max_size=60), st.text(alphabet="abcd", min_size=0, max_size=60))
@settings(max_examples=100, deadline=None)
def test_exact_jaccard_bounds_and_symmetry(a, b):
    j = py_exact_jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == py_exact_jaccard(b, a)
    if a == b:
        assert j == 1.0


@given(
    st.lists(
        st.tuples(
            st.integers(0, 50),
            st.sampled_from(["alpha beta gamma", "alpha beta delta", "omega psi chi"]),
            st.floats(0, 1, allow_nan=False),
        ),
        max_size=12,
    )
)
@settings(max_examples=100, deadline=None)
def test_greedy_dedup_invariants(rows):
    rows = [(i, d, c) for i, (_, d, c) in enumerate(rows)]  # unique ids
    kept = py_greedy_dedup(rows)
    assert set(kept) <= {r[0] for r in rows}
    # no two survivors overlap > 0.8 — valid HERE because the sampled
    # descriptions form cliques only (pairwise overlap is 1.0 or 2/3);
    # with chain-shaped data the reference greedy can legally keep
    # overlapping survivors after a replacement (break-on-first-match)
    by_id = {r[0]: r for r in rows}
    for x in kept:
        for y in kept:
            if x >= y:
                continue
            wa = set(by_id[x][1].lower().split())
            wb = set(by_id[y][1].lower().split())
            if wa and wb:
                assert len(wa & wb) / max(len(wa), len(wb)) <= 0.8
    # the global max-confidence event always survives (nothing can
    # dominate it; ties keep the earliest, which is also valid)
    if rows:
        cmax = max(c for _, _, c in rows)
        assert any(by_id[k][2] == cmax for k in kept) or not kept
