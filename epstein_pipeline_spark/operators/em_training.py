"""Splink-style Fellegi–Sunter weight training (EM) for J6.

Reference: ``processors/entity_resolution.py:199-233`` runs Splink's
training sequence before predicting — (1) prior
``estimate_probability_two_random_records_match`` from a blocking rule
at an assumed recall, (2) ``estimate_u_using_random_sampling`` capped
at ``splink_max_pairs`` (config.py:130), (3)
``estimate_parameters_using_expectation_maximisation`` over blocked
comparison vectors with ``max_iterations=10, em_convergence=0.001``
(entity_resolution.py:193-194).

Spark restatement (the aggregate-then-iterate shape Splink itself
uses — EM never touches per-pair rows after the first aggregation):

1. comparison (gamma) vectors are computed ONCE per blocked pair —
   the same single-shuffle ``guarded_block_pairs`` stream the scorer
   uses, with the same tier-floored JaroWinkler kernel;
2. one ``groupBy`` collapses the pair stream to distinct-pattern
   counts — at most ``prod(levels per column)`` rows (~150 for the
   reference comparison set), independent of corpus size;
3. the EM loop runs driver-side in numpy over that tiny pattern
   table: E-step pair-match responsibilities, M-step m / lambda
   re-estimates, u held fixed at the random-sampling estimate
   (Splink's default when u comes from ``estimate_u``).

At 10^12 documents the cluster work is exactly two bounded jobs
(u-sample cross pairs + blocked-pattern aggregation); iteration count
never multiplies cluster passes.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from epstein_pipeline_spark.config import DEFAULT_CONFIG
from epstein_pipeline_spark.operators.resolution import (
    FS_COMPARISONS,
    make_jw_udf,
)

# EM hyperparameters — reference entity_resolution.py:193-194
EM_MAX_ITERATIONS = 10
EM_CONVERGENCE = 0.001
# reference entity_resolution.py:204 recall=0.7 for the prior estimate
PRIOR_BLOCKING_RECALL = 0.7
# reference config.py:130 splink_max_pairs default
DEFAULT_MAX_U_PAIRS = 1_000_000

_PERSON_COLS = ["name", "first_name", "last_name", "aliases", "category"]


def _gamma_expr(jw: Column, tiers: list[float]) -> Column:
    """Ordered comparison level: first tier whose threshold fires wins
    (Splink's ordered comparison levels); ``len(tiers)`` = else."""
    expr: Column = F.lit(len(tiers))
    for i in range(len(tiers) - 1, -1, -1):
        expr = F.when(jw >= F.lit(tiers[i]), F.lit(i)).otherwise(expr)
    return expr


def pair_gammas(
    pairs: DataFrame,
    id_col: str = "pid",
    comparisons: dict[str, tuple[list[float], list[float]]] | None = None,
    include_category: bool = True,
) -> DataFrame:
    """Comparison (gamma) vector per candidate pair.

    ``pairs`` carries ``<col>1`` / ``<col>2`` payload columns (the
    ``blocked_person_pairs`` contract). One row per pair with integer
    level columns ``g_<col>`` — the SAME rounded, tier-floored
    JaroWinkler the scorer uses, so a pattern's levels are exactly the
    tiers ``score_person_pairs`` would hit.
    """
    comparisons = FS_COMPARISONS if comparisons is None else comparisons
    out = [F.col(f"{id_col}1"), F.col(f"{id_col}2")]
    for col, (tiers, _w) in comparisons.items():
        jw = F.round(make_jw_udf(tiers[-1])(F.col(f"{col}1"), F.col(f"{col}2")), 6)
        out.append(_gamma_expr(jw, tiers).cast("int").alias(f"g_{col}"))
    if include_category:
        out.append(
            F.when(F.col("category1") == F.col("category2"), F.lit(0))
            .otherwise(F.lit(1))
            .cast("int")
            .alias("g_category")
        )
    return pairs.select(*out)


def gamma_pattern_counts(gammas: DataFrame) -> DataFrame:
    """Distinct comparison-vector counts — the whole EM input.
    Bounded by prod(levels) rows regardless of corpus size."""
    g_cols = [c for c in gammas.columns if c.startswith("g_")]
    return gammas.groupBy(*g_cols).agg(F.count(F.lit(1)).alias("n_pairs"))


def _levels(
    comparisons: dict[str, tuple[list[float], list[float]]],
    include_category: bool = True,
) -> dict[str, int]:
    d = {col: len(tiers) + 1 for col, (tiers, _) in comparisons.items()}
    if include_category:
        d["category"] = 2
    return d


def estimate_u(
    persons: DataFrame,
    id_col: str = "pid",
    comparisons: dict[str, tuple[list[float], list[float]]] | None = None,
    max_pairs: int = DEFAULT_MAX_U_PAIRS,
    seed: int = 42,
    n_rows: int | None = None,
) -> dict[str, np.ndarray]:
    """u probabilities from random pairs (Splink
    ``estimate_u_using_random_sampling``, entity_resolution.py:209-211):
    at corpus scale a uniform random pair is a non-match with
    probability ~1, so the level frequency among random pairs IS u.

    A seeded sample of ``~sqrt(2*max_pairs)`` records cross-joins with
    itself — the bounded-driver-sample pattern (same trick as the IVF
    k-means sample): the cross join is O(max_pairs) rows total no
    matter the corpus size, and the sample itself is one narrow pass.
    Laplace-smoothed so no level has u=0 (a zero u would make one
    agreement level an infinite-weight oracle).

    ``n_rows`` lets a caller that already knows the table size (e.g.
    from a committed stage manifest) skip the count pass. The
    ``orderBy(_h).limit(s)`` below is NOT a corpus sort: the hash
    filter has already cut the input to ~1.25*s candidate rows, so the
    sort is bounded by the sample size at any corpus scale.
    """
    comparisons = FS_COMPARISONS if comparisons is None else comparisons
    n = persons.count() if n_rows is None else n_rows
    s = min(n, max(2, math.isqrt(2 * max_pairs) + 1))
    cols = [id_col, *_PERSON_COLS]
    # hash-ranked sampling (not sample().limit()): membership depends
    # only on (id, seed), never on partitioning or row order, so the
    # trained weights are reproducible on any cluster size — the same
    # determinism contract as the IVF k-means sample. The narrow hash
    # filter keeps ~1.25*s candidates; the orderBy that breaks the tie
    # down to exactly s sorts only those, not the corpus. 2^62 scale:
    # 2^63 overflows the JVM long literal.
    h = F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)), F.lit(1 << 62))
    thresh = int(min(1.0, 1.25 * s / max(n, 1)) * (1 << 62))
    samp = (
        persons.select(*cols)
        .withColumn("_h", h)
        .filter(F.col("_h") < F.lit(thresh))
        .orderBy("_h", id_col)
        .limit(s)
        .drop("_h")
    )
    a = samp.select(*[F.col(c).alias(f"{c}1") for c in cols])
    b = samp.select(*[F.col(c).alias(f"{c}2") for c in cols])
    pairs = a.crossJoin(b).filter(F.col(f"{id_col}1") < F.col(f"{id_col}2"))
    gam = pair_gammas(pairs, id_col, comparisons)
    lv = _levels(comparisons)
    aggs = [
        F.sum((F.col(f"g_{col}") == k).cast("long")).alias(f"{col}__{k}")
        for col, nl in lv.items()
        for k in range(nl)
    ]
    row = gam.agg(F.count(F.lit(1)).alias("__tot"), *aggs).collect()[0].asDict()
    tot = row["__tot"]
    if tot == 0:
        # 0/1-row corpus: the sums come back NULL and would silently
        # poison every weight with NaN — refuse instead
        raise ValueError(
            "estimate_u: no random pairs (persons table has < 2 rows); "
            "too small to train — use the fixed weight table"
        )
    u: dict[str, np.ndarray] = {}
    for col, nl in lv.items():
        cnt = np.array([row[f"{col}__{k}"] for k in range(nl)], dtype=np.float64)
        u[col] = (cnt + 0.5) / (tot + 0.5 * nl)
    return u


def estimate_prior(
    persons: DataFrame,
    id_col: str = "pid",
    recall: float = PRIOR_BLOCKING_RECALL,
    n_rows: int | None = None,
) -> float:
    """lambda = P(random pair matches), from the exact-name blocking
    rule at an assumed recall (Splink
    ``estimate_probability_two_random_records_match([block_on
    ("name_lower")], recall=0.7)``, entity_resolution.py:202-205):
    pairs agreeing on the full name are assumed matches and assumed to
    cover ``recall`` of all matches. Two tiny aggregates; no pair
    materialization (C(n,2) per name group is computed arithmetically).
    ``n_rows`` skips the count when the caller already knows it.
    """
    n = persons.count() if n_rows is None else n_rows
    if n < 2:
        return 1e-7
    bp = (
        persons.groupBy("name")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("bp"))
        .collect()[0]["bp"]
    ) or 0.0
    total = n * (n - 1) / 2.0
    lam = (bp / recall) / total
    return float(min(max(lam, 1e-7), 0.5))


def em_train(
    patterns: list[dict],
    u: dict[str, np.ndarray],
    lam0: float,
    comparisons: dict[str, tuple[list[float], list[float]]] | None = None,
    max_iterations: int = EM_MAX_ITERATIONS,
    convergence: float = EM_CONVERGENCE,
    include_category: bool = True,
) -> tuple[dict[str, np.ndarray], float, int]:
    """Driver-side EM over the distinct-pattern count table.

    patterns: collected ``gamma_pattern_counts`` rows (as dicts).
    E-step: responsibility w_p = lam*prod(m)/(lam*prod(m)+(1-lam)*prod(u))
    per pattern; M-step re-estimates m (per column, per level) and
    lam; u stays fixed (it came from random sampling). Stops when the
    largest m / lam change < ``convergence`` or after
    ``max_iterations`` (reference entity_resolution.py:193-194).
    Returns (m, lam, iterations_run).
    """
    comparisons = FS_COMPARISONS if comparisons is None else comparisons
    lv = _levels(comparisons, include_category)
    cols = list(lv)
    if not patterns:  # no blocked pairs at all -> keep the init params
        return (
            {c: _norm(4.0 ** -np.arange(nl, dtype=np.float64)) for c, nl in lv.items()},
            lam0,
            0,
        )
    n_p = np.array([p["n_pairs"] for p in patterns], dtype=np.float64)
    g = {c: np.array([p[f"g_{c}"] for p in patterns], dtype=np.int64) for c in cols}
    # init m concentrated on the strongest level, geometric falloff
    m = {c: _norm(4.0 ** -np.arange(nl, dtype=np.float64)) for c, nl in lv.items()}
    lam = lam0
    it = 0
    for it in range(1, max_iterations + 1):
        log_m = np.zeros(len(n_p))
        log_u = np.zeros(len(n_p))
        for c in cols:
            log_m += np.log(m[c])[g[c]]
            log_u += np.log(u[c])[g[c]]
        # E-step in log space (144 patterns — cost is irrelevant,
        # underflow is not)
        lm = math.log(lam) + log_m
        lu = math.log1p(-lam) + log_u
        w = 1.0 / (1.0 + np.exp(np.clip(lu - lm, -700, 700)))
        wm = n_p * w
        denom = wm.sum()
        new_lam = float(min(max(denom / n_p.sum(), 1e-7), 1 - 1e-7))
        delta = abs(new_lam - lam)
        new_m = {}
        for c, nl in lv.items():
            cnt = np.bincount(g[c], weights=wm, minlength=nl) + 1e-6
            mc = cnt / cnt.sum() if denom > 0 else m[c]
            delta = max(delta, float(np.abs(mc - m[c]).max()))
            new_m[c] = mc
        m, lam = new_m, new_lam
        if delta < convergence:
            break
    return m, lam, it


def _norm(v: np.ndarray) -> np.ndarray:
    return v / v.sum()


@dataclass
class TrainedWeights:
    """EM-trained Fellegi–Sunter parameters in the exact shape
    ``score_person_pairs`` consumes."""

    comparisons: dict[str, tuple[list[float], list[float]]]
    category_weights: tuple[float, float]
    prior_logit2: float
    lam: float
    iterations: int
    m: dict[str, np.ndarray] = field(repr=False, default_factory=dict)
    u: dict[str, np.ndarray] = field(repr=False, default_factory=dict)


def train_resolution_weights(
    persons: DataFrame,
    id_col: str = "pid",
    block_cap: int = DEFAULT_CONFIG.fuzzy_block_cap,
    max_u_pairs: int = DEFAULT_MAX_U_PAIRS,
    recall: float = PRIOR_BLOCKING_RECALL,
    seed: int = 42,
    weight_clip: float = 12.0,
    n_rows: int | None = None,
) -> TrainedWeights:
    """The reference's full training sequence
    (entity_resolution.py:199-233), Spark-first. ``n_rows``: pass the
    persons row count if already known (a committed stage manifest) to
    skip the one count pass; otherwise it is computed once and shared
    by the prior and u estimators.

    Tier weights come out as log2 Bayes factors ``log2(m_k/u_k)``
    (clipped to ±``weight_clip`` — a level never seen among matches
    should argue strongly, not infinitely, against a match), the prior
    as log2 odds. Deterministic for a fixed seed.
    """
    from epstein_pipeline_spark.operators.pairs import guarded_block_pairs

    # one count shared by prior + u estimation (or none at all when
    # the caller passes the committed-stage manifest's row count)
    if n_rows is None:
        n_rows = persons.count()
    lam0 = estimate_prior(persons, id_col, recall, n_rows=n_rows)
    u = estimate_u(persons, id_col, max_pairs=max_u_pairs, seed=seed, n_rows=n_rows)

    # ONE EM SESSION PER BLOCKING RULE — the reference's two sessions,
    # block_on("name_lower") then block_on("last_name")
    # (entity_resolution.py:214-229; persons are pre-lowercased here so
    # ``name`` IS name_lower). Exclusion follows Splink's actual rule:
    # a comparison is dropped from a session only when its COLUMN is
    # the session's blocking column (constant by construction — Splink
    # flags it untrainable). The name_lower session therefore trains
    # ALL FIVE comparisons — name_lower is a blocking-only column, not
    # a comparison column — and the name comparison comes out
    # concentrated on exact agreement there (every blocked pair is
    # name-equal), which is precisely Splink's estimate from that
    # session; averaging it with the last_name session's estimate is
    # what keeps exact-name agreement a strong signal. Mixing the two
    # rules' pairs in ONE session is still avoided: EM then latches
    # onto the blocking structure (observed: lam converges to the
    # blocked-rule mix fraction). Per-comparison estimates from both
    # sessions are averaged, Splink-style.
    cols = [id_col, *_PERSON_COLS]
    p = persons.select(*cols)
    m_acc: dict[str, list[np.ndarray]] = {}
    lam_acc: list[float] = []
    iters = 0
    for block_col, excluded in (("name", ()), ("last_name", ("last_name",))):
        sess_cmp = {c: v for c, v in FS_COMPARISONS.items() if c not in excluded}
        pairs = guarded_block_pairs(p, block_col, cols, block_cap).select(
            *[F.col(f"a.{c}").alias(f"{c}1") for c in cols],
            *[F.col(f"b.{c}").alias(f"{c}2") for c in cols],
        )
        patterns = [
            r.asDict()
            for r in gamma_pattern_counts(
                pair_gammas(pairs, id_col, sess_cmp)
            ).collect()
        ]
        m_s, lam_s, it_s = em_train(
            patterns, u, lam0, comparisons=sess_cmp, include_category=True
        )
        for c, arr in m_s.items():
            m_acc.setdefault(c, []).append(arr)
        lam_acc.append(lam_s)
        iters = max(iters, it_s)

    m = {c: np.mean(np.stack(arrs), axis=0) for c, arrs in m_acc.items()}
    comparisons: dict[str, tuple[list[float], list[float]]] = {}
    for col, (tiers, _fixed) in FS_COMPARISONS.items():
        w = np.clip(np.log2(m[col] / u[col]), -weight_clip, weight_clip)
        comparisons[col] = (list(tiers), [float(x) for x in w])
    cw = np.clip(np.log2(m["category"] / u["category"]), -weight_clip, weight_clip)
    # prior: the dedicated blocked-recall estimator, as in the
    # reference sequence (EM's per-session lam reflects the blocked
    # mix, not the corpus-wide match rate)
    prior_logit2 = float(math.log2(lam0 / (1 - lam0)))
    return TrainedWeights(
        comparisons=comparisons,
        category_weights=(float(cw[0]), float(cw[1])),
        prior_logit2=prior_logit2,
        lam=lam0,
        iterations=iters,
        m=m,
        u=u,
    )
