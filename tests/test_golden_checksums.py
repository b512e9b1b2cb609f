"""Golden result checksums for the rows-only (non-SQL-expressible)
dedup queries.

``minhash_dedup_planted`` / ``simhash_dedup_planted`` /
``dedup_clusters_planted`` / ``rhp_cosine_pairs`` have no DuckDB
oracle (128-perm MinHash signatures, SimHash bands, RHP-LSH
candidates, the approximate flagship clusters) — the driver records
row counts only, so a regression that SWAPS pairs at equal count was
invisible to CORRECTNESS. The corpus (synth at fixed seed + sf0.01
parquet) and the signature scheme (datasketch-parity a*h+b mod 2^61-1,
pinned — the north rule requires the reference's signature config) are
fully deterministic, so the sorted result set is stable and its sha256
can be pinned.

Pinned values regenerated via ``python scripts/golden_checksums.py``
— ONLY legitimate when a deliberate, documented change to the
signature scheme / planted corpus / query projection changes the
result set; a surprise mismatch is a correctness regression.
"""

from __future__ import annotations

import os

import pytest

from epstein_pipeline_spark.functions.checksum import result_checksum

SF = "/root/testdata/sf0.01"

GOLDEN = {
    "minhash_dedup_planted": "51b72dd8f6d8b786698c62ea5c2677f3b720f3b4847daa07da864d7c9f64e7c5",
    # simhash re-pinned 2026-08-22 (round 6) with the ROOT CAUSE of
    # the r4->r5->r6 pin failures finally proven and fixed: the old
    # float accumulator (log1p weights, BLAS dgemv) produced
    # EXACTLY-ZERO bit sums on the planted corpus (69/1438 docs had a
    # bit whose sign flipped under float summation reorder,
    # min |acc| ~ 1e-17), so the signature depended on which dgemv
    # kernel the host CPU selected — stable within a sandbox host,
    # different across rounds. functions/simhash.py now accumulates
    # exact fixed-point int64 weights (order-independent by
    # construction); this pin is a pure function of the corpus bytes
    # on any host.
    "simhash_dedup_planted": "17a473c913ee070d8c7d85034e879f08342766e2c201cb436e2dcb39fbab0503",
    "dedup_clusters_planted": "56351b1432ffa5ad5caae715a65e149acc2f9d34b27524da5136efdf5e6bcd2f",
    "rhp_cosine_pairs": "76f930c26d7e07113a1ab5e8d49d15d6cd5050a9fe0d71a9274815698505666f",
}


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_checksum(spark, name):
    if not os.path.isdir(SF):
        pytest.skip(f"{SF} not present")
    from epstein_pipeline_spark.entry_queries import QUERIES

    got = result_checksum(QUERIES[name](spark, SF))
    assert got == GOLDEN[name], (
        f"{name}: result-set checksum changed ({got} != {GOLDEN[name]}). "
        "If this follows a DELIBERATE signature-scheme/corpus/query "
        "change, regenerate via scripts/golden_checksums.py and record "
        "why; otherwise a dedup regression swapped pairs at equal count."
    )
