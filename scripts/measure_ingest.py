"""Incremental-ingest evidence: fold a 10% delta into a 90% base
store vs re-deduping the full corpus from scratch.

Usage: python scripts/measure_ingest.py [pages=128000] [cores=4]
Reads the cached bench corpus (.bench_cache/pages_n<pages>_s42 — run
bench.py once to create it), splits by url hash, and prints one JSON
line with wall times + the cluster-partition equivalence check.
"""

from __future__ import annotations

import json
import os
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

PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 128_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 4
DENOM = int(sys.argv[3]) if len(sys.argv) > 3 else 10  # delta = 1/DENOM of the corpus


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

    with tempfile.TemporaryDirectory(dir="/dev/shm") as tmp:
        cfg = DedupConfig()
        t0 = time.time()
        run_dedup(spark, base, StageStore(f"{tmp}/inc"), cfg)
        t_base = time.time() - t0
        t0 = time.time()
        inc = run_incremental(spark, delta, StageStore(f"{tmp}/inc"), cfg)
        t_ingest = time.time() - t0
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

    print(json.dumps({
        "n_base": n_base,
        "n_delta": n_delta,
        "seconds_base": round(t_base, 1),
        "seconds_ingest": round(t_ingest, 1),
        "seconds_full_rededup": round(t_full, 1),
        "ingest_speedup_vs_full": round(t_full / t_ingest, 1),
        "cluster_size_histogram_equal": same,
        "ingest_stage_seconds": {k: round(v, 2) for k, v in inc.stage_seconds.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
