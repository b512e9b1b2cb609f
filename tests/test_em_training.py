"""EM weight training (Splink-style) for entity resolution.

Reference training sequence: entity_resolution.py:199-233 (prior from
blocked pairs at recall, u from random sampling, m via EM with
max_iterations=10 / convergence=0.001)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from epstein_pipeline_spark.operators.em_training import (
    em_train,
    estimate_prior,
    estimate_u,
    gamma_pattern_counts,
    pair_gammas,
    train_resolution_weights,
)
from epstein_pipeline_spark.operators.resolution import (
    FS_COMPARISONS,
    blocked_person_pairs,
    py_jaro_winkler,
    resolve_persons,
)

# all first names >= 5 chars: a drop-last-letter typo then stays in the
# top JaroWinkler tier (>= 0.95) for both first_name and the full name;
# a 4-char name ("lena" -> "len", jw 0.94) lands in tier 1, where the
# EM-trained model is legitimately more conservative than the fixed
# table and the planted-recovery contract would test tier calibration,
# not the training sequence
_FIRSTS = ["maria", "james", "leona", "viktor", "amara", "sofia", "ethan", "yuki",
           "nadia", "oscar", "priya", "tomas", "wendy", "ibrahim", "greta", "felix"]
_LASTS = ["okafor", "lindqvist", "tanaka", "moreau", "dasilva", "novak", "petrov",
          "khanna", "whitfield", "osei", "bergman", "castillo", "duval", "eriksen",
          "fontaine"]


def _persons(spark, n=240, twin_every=6, copy_every=10):
    """Deterministic population: pid -> (first, last) is INJECTIVE for
    n <= lcm(16, 15) = 240 (CRT indexing), so base records are unique
    identities. Planted truth: every ``twin_every``-th pid gets a typo
    twin (+1M, last letter of the last name dropped) and every
    ``copy_every``-th an exact copy (+2M). Identity of any record is
    ``pid % 1_000_000``. Twins vary the FIRST name so they block via
    the reference's last_name rule (a last-name typo never blocks
    under name_lower/last_name — reference-faithful)."""
    rows = []
    for pid in range(n):
        fn = _FIRSTS[pid % 16]
        ln = _LASTS[pid % 15]
        cat = ["legal", "finance", "press"][pid % 3]
        rows.append((pid, f"{fn} {ln}", fn, ln, f"{fn[0]}. {ln}", cat))
        if pid % twin_every == 0:
            rows.append(
                (pid + 1_000_000, f"{fn[:-1]} {ln}", fn[:-1], ln, f"{fn[0]}. {ln}", cat)
            )
        if pid % copy_every == 0:
            rows.append((pid + 2_000_000, f"{fn} {ln}", fn, ln, f"{fn[0]}. {ln}", cat))
    return spark.createDataFrame(
        rows, "pid long, name string, first_name string, last_name string, aliases string, category string"
    )


def test_gamma_patterns_match_pandas_twin(spark):
    """Spark gamma pattern counts == a driver-side py_jaro_winkler
    recount of the same blocked pairs (validates the floored-UDF tier
    classification end-to-end)."""
    p = _persons(spark, n=96)
    blocked = blocked_person_pairs(p, "pid")
    gam = gamma_pattern_counts(pair_gammas(blocked, "pid"))
    got = {
        tuple(r[f"g_{c}"] for c in [*FS_COMPARISONS, "category"]): r["n_pairs"]
        for r in gam.collect()
    }
    want: dict[tuple, int] = {}
    for r in blocked.collect():
        key = []
        for col, (tiers, _w) in FS_COMPARISONS.items():
            jw = round(py_jaro_winkler(r[f"{col}1"] or "", r[f"{col}2"] or ""), 6)
            lvl = len(tiers)
            for i, t in enumerate(tiers):
                if jw >= t:
                    lvl = i
                    break
            key.append(lvl)
        key.append(0 if r["category1"] == r["category2"] else 1)
        want[tuple(key)] = want.get(tuple(key), 0) + 1
    assert got == want


def test_em_numpy_recovers_known_params():
    """Feed EM exact expected pattern counts from known (m, u, lam);
    with u fixed at truth it must recover m and lam."""
    comparisons = {"name": ([0.95, 0.88, 0.70], [0, 0, 0, 0])}
    m_true = {"name": np.array([0.7, 0.2, 0.06, 0.04]), "category": np.array([0.9, 0.1])}
    u_true = {"name": np.array([0.01, 0.04, 0.15, 0.8]), "category": np.array([0.3, 0.7])}
    lam_true = 0.05
    n = 1_000_000
    patterns = []
    for gn in range(4):
        for gc in range(2):
            exp = n * (
                lam_true * m_true["name"][gn] * m_true["category"][gc]
                + (1 - lam_true) * u_true["name"][gn] * u_true["category"][gc]
            )
            patterns.append({"g_name": gn, "g_category": gc, "n_pairs": exp})
    m, lam, iters = em_train(
        patterns, u_true, lam0=0.2, comparisons=comparisons, max_iterations=500,
        convergence=1e-9,
    )
    # EM walks a slow near-ridge between lam and m mass; within 1%
    # absolute of the generating parameters is the recovery claim
    assert abs(lam - lam_true) < 1e-3
    assert np.abs(m["name"] - m_true["name"]).max() < 1e-2
    assert np.abs(m["category"] - m_true["category"]).max() < 1e-2


def test_estimate_u_mass_on_disagreement(spark):
    """Random pairs are overwhelmingly non-matches: u mass must sit on
    the else level for name, and every level must be > 0 (smoothed)."""
    u = estimate_u(_persons(spark, n=200), max_pairs=20_000, seed=7)
    assert u["name"].argmax() == len(FS_COMPARISONS["name"][0])
    for col, arr in u.items():
        assert (arr > 0).all() and abs(arr.sum() - 1.0) < 1e-9


def test_estimate_prior_range(spark):
    lam = estimate_prior(_persons(spark, n=240))
    assert 1e-7 <= lam <= 0.5


def test_trained_weights_separate_tiers(spark):
    tw = train_resolution_weights(_persons(spark), max_u_pairs=20_000)
    tiers, w = tw.comparisons["name"]
    assert tiers == FS_COMPARISONS["name"][0]
    assert w[0] > 0 > w[-1]  # exact-name agreement argues for, else against
    assert w[0] > w[1]  # ordered levels keep ordered strength
    assert tw.prior_logit2 < 0  # matches are rare
    assert 1 <= tw.iterations <= 10


def test_trained_resolution_recovers_planted_twins(spark):
    """resolve_persons(train=True): every planted typo twin and exact
    copy lands in its base record's cluster; no cluster mixes two
    identities (pid % 1M is the ground-truth identity)."""
    p = _persons(spark, n=240, twin_every=6, copy_every=10)
    res = {int(r["pid"]): r["canonical_id"] for r in resolve_persons(p, train=True).collect()}
    missed = [
        pid for pid in range(0, 240, 6) if res[pid] != res[pid + 1_000_000]
    ] + [pid for pid in range(0, 240, 10) if res[pid] != res[pid + 2_000_000]]
    assert missed == []
    by_cluster: dict = {}
    for pid, cid in res.items():
        by_cluster.setdefault(cid, set()).add(pid % 1_000_000)
    assert all(len(v) == 1 for v in by_cluster.values())


def test_em_train_empty_patterns_keeps_init():
    m, lam, it = em_train([], {"name": np.ones(4) / 4, "category": np.ones(2) / 2}, 0.01)
    assert it == 0 and lam == 0.01
    assert all(np.isfinite(v).all() for v in m.values())


def test_trained_resolution_on_near_unique_corpus(spark):
    """Only ONE planted identity group (pid 0 + its twin + its copy;
    pid % k == 0 always fires at 0): training on a nearly-all-unique
    corpus must merge exactly that group and invent nothing else."""
    p = _persons(spark, n=60, twin_every=10**9, copy_every=10**9)
    res = {int(r["pid"]): r["canonical_id"] for r in resolve_persons(p, train=True).collect()}
    assert len(res) == 62
    assert res[0] == res[1_000_000] == res[2_000_000]
    assert len(set(res.values())) == 60  # 59 singletons + the pid-0 group


def test_estimate_u_refuses_tiny_corpus(spark):
    p = spark.createDataFrame(
        [(1, "a b", "a", "b", "a. b", "x")],
        "pid long, name string, first_name string, last_name string, aliases string, category string",
    )
    with pytest.raises(ValueError, match="too small to train"):
        estimate_u(p, max_pairs=100)
