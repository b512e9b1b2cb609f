"""Two-parallelism-level throughput for the INCREMENTAL line-dedup
fold (the line-level analog of the ingest scaling evidence): 32k bench
corpus split 90/10 by url hash; each level folds the base batch into a
fresh /dev/shm store (untimed), then times the 10% delta fold.

A delta fold is not idempotent work (a second fold of the same batch
takes the rerun path; a different batch_id would see the delta's lines
as already seen), so min-of-2 uses two INDEPENDENT stores per level
rather than re-running in place.

Usage:
  python scripts/measure_line_inc.py          # orchestrate, print JSON
  python scripts/measure_line_inc.py --run C  # one level (internal)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CORES_LO = int(os.environ.get("BENCH_CORES_LO", "1"))
CORES_HI = int(os.environ.get("BENCH_CORES_HI", "4"))
PAGES = int(os.environ.get("BENCH_PAGES", "32000"))
LHS_HINT = 900_000  # well under broadcast_max; keeps the fold probe-free


def run_level(cores: int, corpus_dir: str) -> None:
    from pyspark.sql import functions as F

    from epstein_pipeline_spark.operators.line_dedup import dedup_lines_incremental
    from epstein_pipeline_spark.plans.checkpoint import StageStore
    from epstein_pipeline_spark.session import get_spark

    spark = get_spark(
        f"line_inc_{cores}",
        cores=cores,
        shuffle_partitions=max(cores * 8, 8),
        extra_conf={"spark.local.dir": "/dev/shm/spark-lineinc-tmp"},
    )
    pages = spark.read.parquet(corpus_dir).select("url", "text")
    base = pages.filter(F.abs(F.xxhash64("url")) % 10 != 0)
    delta = pages.filter(F.abs(F.xxhash64("url")) % 10 == 0)
    best = None
    for i in range(2):
        root = f"/dev/shm/line_inc_store_{cores}_{i}"
        shutil.rmtree(root, ignore_errors=True)
        store = StageStore(root)
        dedup_lines_incremental(
            store, base, batch_id="base", id_col="url", delta_lhs_hint=LHS_HINT
        ).write.format("noop").mode("overwrite").save()
        t0 = time.time()
        dedup_lines_incremental(
            store, delta, batch_id="delta", id_col="url", delta_lhs_hint=LHS_HINT
        ).write.format("noop").mode("overwrite").save()
        sec = time.time() - t0
        best = sec if best is None else min(best, sec)
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"sec": round(best, 2)}))
    spark.stop()


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        run_level(int(sys.argv[2]), sys.argv[3])
        return

    import bench

    corpus_dir = bench.corpus_parquet(PAGES)
    for f in Path(corpus_dir).glob("*.parquet"):
        f.read_bytes()

    def sub(cores: int) -> float:
        out = subprocess.run(
            [sys.executable, __file__, "--run", str(cores), corpus_dir],
            capture_output=True, text=True, timeout=3600,
        )
        if out.returncode != 0:
            raise RuntimeError(out.stderr[-2000:])
        return json.loads(out.stdout.strip().splitlines()[-1])["sec"]

    hi = sub(CORES_HI)
    lo = sub(CORES_LO)
    eff = (lo / hi) / (CORES_HI / CORES_LO)
    print(json.dumps({
        "pages": PAGES, "delta_frac": 0.1,
        f"local[{CORES_LO}]_sec": lo, f"local[{CORES_HI}]_sec": hi,
        "scaling_efficiency": round(eff, 4),
    }))


if __name__ == "__main__":
    main()
