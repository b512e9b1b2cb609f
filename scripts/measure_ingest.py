"""Incremental-ingest evidence: fold a 1/DENOM delta into a base
store vs re-deduping the full corpus from scratch.

Usage:
  python scripts/measure_ingest.py [pages=128000] [cores=4] [denom=10] \
      [repeats=2] [--no-full] [--keep-base]

Reads the cached bench corpus (.bench_cache/pages_n<pages>_s42 — run
bench.py once to create it), splits by url hash, and prints one JSON
line with wall times + the cluster-partition equivalence check.

Round-5 protocol: the ingest leg runs ``repeats`` times (min-of-N
total + per-stage min), each repeat against a FRESH copy of the same
base store (ingest mutates the store; the copy is /dev/shm memcpy and
is excluded from the timing). The base store is built once and can be
kept (--keep-base) under /dev/shm/ingest_base_p<pages>_c<cores>_d<denom>
for cheap re-measurement while iterating; --no-full skips the full
re-dedup comparison leg (use for iteration, not for the published
BASELINE row).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from epstein_pipeline_spark.config import DedupConfig  # noqa: E402
from epstein_pipeline_spark.plans.checkpoint import StageStore  # noqa: E402
from epstein_pipeline_spark.plans.incremental import run_incremental  # noqa: E402
from epstein_pipeline_spark.plans.pipeline import run_dedup  # noqa: E402
from epstein_pipeline_spark.session import get_spark  # noqa: E402

args = [a for a in sys.argv[1:] if not a.startswith("--")]
PAGES = int(args[0]) if len(args) > 0 else 128_000
CORES = int(args[1]) if len(args) > 1 else 4
DENOM = int(args[2]) if len(args) > 2 else 10  # delta = 1/DENOM of the corpus
REPEATS = int(args[3]) if len(args) > 3 else 2
NO_FULL = "--no-full" in sys.argv
KEEP_BASE = "--keep-base" in sys.argv


def main() -> None:
    corpus = Path(__file__).resolve().parents[1] / ".bench_cache" / f"pages_n{PAGES}_s42"
    if not (corpus / "_SUCCESS").exists():
        raise SystemExit(f"run bench.py first to create {corpus}")
    spark = get_spark(
        "measure_ingest", cores=CORES, shuffle_partitions=128,
        extra_conf={"spark.local.dir": "/dev/shm/spark-bench-tmp"},
    )
    pages = spark.read.parquet(str(corpus))
    is_delta = F.pmod(F.xxhash64("url"), F.lit(DENOM)) == 0
    base, delta = pages.filter(~is_delta), pages.filter(is_delta)
    n_base, n_delta = base.count(), delta.count()
    cfg = DedupConfig()

    base_dir = Path(f"/dev/shm/ingest_base_p{PAGES}_c{CORES}_d{DENOM}")
    try:
        out = _measure(spark, pages, base, delta, cfg, base_dir, n_base, n_delta)
    finally:
        # RAM-backed store: never leak it past a crashed/interrupted
        # sitting (repeated failed runs with different params would
        # accumulate until /dev/shm ENOSPC fails later benches)
        if not KEEP_BASE:
            shutil.rmtree(base_dir, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


def _measure(spark, pages, base, delta, cfg, base_dir, n_base, n_delta) -> dict:
    t_base = None
    if not (base_dir / "clusters" / "MANIFEST.json").exists():
        shutil.rmtree(base_dir, ignore_errors=True)
        t0 = time.time()
        run_dedup(spark, base, StageStore(base_dir), cfg)
        t_base = time.time() - t0

    with tempfile.TemporaryDirectory(dir="/dev/shm") as tmp:
        # untimed warmup ingest on a scratch copy: whether the base
        # store was just built (101+ s of JVM/codegen/python-worker
        # warmup) or reused from disk decides the first timed run's
        # temperature otherwise — measured 70.0 s cold vs 56.9 s on
        # the very next identical run
        warm = f"{tmp}/warm"
        shutil.copytree(base_dir, warm)
        run_incremental(spark, delta, StageStore(warm), cfg)
        shutil.rmtree(warm, ignore_errors=True)
        runs = []
        inc = None
        for _ in range(REPEATS):
            work = f"{tmp}/inc"
            shutil.rmtree(work, ignore_errors=True)
            shutil.copytree(base_dir, work)  # untimed: ingest mutates
            t0 = time.time()
            inc = run_incremental(spark, delta, StageStore(work), cfg)
            runs.append((time.time() - t0, inc.stage_seconds))
        t_ingest = min(r[0] for r in runs)
        stage_min = {k: round(min(r[1][k] for r in runs), 2) for k in runs[0][1]}

        t_full, same = None, None
        if not NO_FULL:
            t0 = time.time()
            full = run_dedup(spark, pages, StageStore(f"{tmp}/full"), cfg)
            t_full = time.time() - t0

            # partition equivalence: same multiset of cluster sizes AND
            # same number of multi-doc groups (full frozenset compare at
            # this scale is driver-heavy; sizes + count are the cheap
            # invariant, the pytest suite pins exact equality at 400 pages)
            def sig(labels):
                rows = (
                    labels.groupBy("cluster_id").count()
                    .filter(F.col("count") >= 2)
                    .groupBy("count").agg(F.count("*").alias("n"))
                    .collect()
                )
                return sorted((r["count"], r["n"]) for r in rows)

            same = sig(full.labels) == sig(inc.labels)

    out = {
        "n_base": n_base,
        "n_delta": n_delta,
        "repeats": REPEATS,
        "seconds_ingest": round(t_ingest, 1),
        "seconds_ingest_runs": [round(r[0], 1) for r in runs],
        "ingest_stage_seconds_min": stage_min,
    }
    if t_base is not None:
        out["seconds_base"] = round(t_base, 1)
    if t_full is not None:
        out["seconds_full_rededup"] = round(t_full, 1)
        out["ingest_speedup_vs_full"] = round(t_full / t_ingest, 1)
        out["cluster_size_histogram_equal"] = same
    return out


if __name__ == "__main__":
    main()
