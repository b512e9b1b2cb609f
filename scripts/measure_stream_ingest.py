"""Streaming-clustering evidence: drive ``stream_cluster_ingest``
(foreachBatch(run_incremental)) over micro-batches at bench scale and
record per-batch latency from the streaming query's own progress
events, plus one same-size batch-mode ``run_incremental`` call so the
streaming overhead (checkpoint + trigger + freshness-rule resume
machinery) is isolated from the incremental-fold cost itself.

Usage: python scripts/measure_stream_ingest.py [pages=128000] [cores=4]
       [n_batches=5] (each batch = 1% of the corpus)
Reads the cached bench corpus (.bench_cache/pages_n<pages>_s42 — run
bench.py once to create it) and prints one JSON line.
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
from epstein_pipeline_spark.streaming.incremental import stream_cluster_ingest  # noqa: E402

PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 128_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 4
N_BATCHES = int(sys.argv[3]) if len(sys.argv) > 3 else 5


def main() -> None:
    corpus = Path(__file__).resolve().parents[1] / ".bench_cache" / f"pages_n{PAGES}_s42"
    if not (corpus / "_SUCCESS").exists():
        raise SystemExit(f"run bench.py first to create {corpus}")
    spark = get_spark(
        "measure_stream_ingest", cores=CORES, shuffle_partitions=128,
        extra_conf={"spark.local.dir": "/dev/shm/spark-bench-tmp"},
    )
    pages = spark.read.parquet(str(corpus))
    # percent buckets by url hash: buckets 0..N_BATCHES-1 are the
    # streaming micro-batches, bucket N_BATCHES is the batch-mode
    # comparison delta, the rest is the base corpus
    bucket = F.pmod(F.xxhash64("url"), F.lit(100))
    base = pages.filter(bucket > N_BATCHES)
    n_base = base.count()

    with tempfile.TemporaryDirectory(dir="/dev/shm") as tmp:
        cfg = DedupConfig()
        store = StageStore(f"{tmp}/store")
        t0 = time.time()
        run_dedup(spark, base, store, cfg)
        t_base = time.time() - t0

        # one file per micro-batch (maxFilesPerTrigger=1 in the
        # operator), written before the stream starts so availableNow
        # drains them all in order
        indir = f"{tmp}/stream_in"
        batch_rows = []
        for i in range(N_BATCHES):
            d = pages.filter(bucket == i).coalesce(1)
            d.write.mode("append").parquet(indir)
            batch_rows.append(d.count())

        t0 = time.time()
        q = stream_cluster_ingest(spark, indir, store, f"{tmp}/ckpt", cfg)
        q.awaitTermination()
        t_stream = time.time() - t0
        # NB: numInputRows is NOT usable here — foreachBatch re-executes
        # the source per action inside run_incremental, so the file
        # source's row metric multiplies; true batch sizes are the
        # written file sizes (availableNow processes files in mod-time
        # = write order, one per trigger via maxFilesPerTrigger=1)
        durations = [
            round(p["durationMs"]["triggerExecution"] / 1000.0, 1)
            for p in q.recentProgress
            if p["numInputRows"] > 0
        ]
        # one trigger per written file, or the zip below misattributes
        # rows to latencies (mtime ties can make availableNow batch
        # two files into one trigger on coarse-granularity filesystems)
        assert len(durations) == N_BATCHES, (
            f"expected {N_BATCHES} nonzero triggers, got {len(durations)}: {durations}"
        )
        progress = [
            {"batch_id": i, "rows": n, "seconds": s}
            for i, (n, s) in enumerate(zip(batch_rows, durations))
        ]

        # same-size delta through plain batch-mode run_incremental:
        # the streaming overhead = last streaming batch vs this
        delta_cmp = pages.filter(bucket == F.lit(N_BATCHES))
        n_cmp = delta_cmp.count()
        t0 = time.time()
        run_incremental(spark, delta_cmp, store, cfg)
        t_batch_mode = time.time() - t0

        n_labels = store.read(spark, "labels").count()

    total_ingested = sum(batch_rows) + n_cmp
    print(json.dumps({
        "n_base": n_base,
        "n_batches": N_BATCHES,
        "batch_rows": batch_rows,
        "seconds_base_dedup": round(t_base, 1),
        "stream_batches": progress,
        "seconds_stream_total": round(t_stream, 1),
        "batch_mode_rows": n_cmp,
        "seconds_batch_mode_same_size": round(t_batch_mode, 1),
        "labels_rows": n_labels,
        "labels_complete": n_labels == n_base + total_ingested,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
