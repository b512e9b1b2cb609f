"""Two-parallelism-level throughput for the round-5 web-pipeline
operators (decontaminate / repeated-span dedup / PII redaction) on
the 128k-page bench corpus — the same N-vs-4N sandbox protocol the
dedup pipeline's scaling gate uses (subprocess per level for JVM core
pinning, interleaved min-of-2 so one slow host window cannot land on
a single level).

Usage:
  python scripts/measure_web_ops.py                # orchestrate, print JSON
  python scripts/measure_web_ops.py --run C OP DIR # one timed run (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OPS = tuple(
    os.environ.get("BENCH_WEB_OPS", "pii,decontam,dup_spans,line_dedup,gopher").split(",")
)
CORES_LO = int(os.environ.get("BENCH_CORES_LO", "1"))
CORES_HI = int(os.environ.get("BENCH_CORES_HI", "4"))


def _op_df(spark, op: str, corpus_dir: str):
    from pyspark.sql import functions as F

    corpus = spark.read.parquet(corpus_dir)
    if op == "pii":
        from epstein_pipeline_spark.operators.pii import redact_pii

        return redact_pii(corpus, id_col="url", text_col="text")
    if op == "decontam":
        from epstein_pipeline_spark.operators.decontam import flag_contaminated

        # benchmark set derived deterministically from the corpus (no
        # external data): ~1/500 pages contribute a 30-token excerpt
        bench = corpus.filter(F.abs(F.xxhash64("url")) % 499 == 0).select(
            F.col("url").alias("bench_id"),
            F.concat_ws(
                " ", F.slice(F.split(F.col("text"), r"\s+"), 5, 30)
            ).alias("text"),
        )
        return flag_contaminated(
            corpus, bench, id_col="url", text_col="text", n=13,
            bench_grams_hint=10_000,
        )
    if op == "dup_spans":
        from epstein_pipeline_spark.operators.dup_spans import repeated_span_stats

        return repeated_span_stats(
            corpus, id_col="url", text_col="text", n=50, dup_grams_hint=5_000_000
        )
    if op == "line_dedup":
        from epstein_pipeline_spark.operators.line_dedup import dedup_lines

        return dedup_lines(corpus, id_col="url", text_col="text")
    if op == "gopher":
        from epstein_pipeline_spark.functions.text import gopher_gates

        return gopher_gates(corpus, id_col="url", text_col="text")
    if op == "curate":
        from epstein_pipeline_spark.plans.curate import curate_corpus

        # hints keep the composition lazy so the timed write is the
        # honest one-pass cost (no call-time probe jobs)
        return curate_corpus(
            corpus, id_col="url", text_col="text",
            removed_docs_hint=50_000, dup_hashes_hint=50_000,
        )
    raise SystemExit(f"unknown op {op}")


def run_one(cores: int, op: str, corpus_dir: str) -> None:
    from epstein_pipeline_spark.session import get_spark

    spark = get_spark(
        f"webops_{op}_{cores}",
        cores=cores,
        shuffle_partitions=max(cores * 8, 8),
        extra_conf={"spark.local.dir": "/dev/shm/spark-webops-tmp"},
    )
    try:
        df = _op_df(spark, op, corpus_dir)
        # one untimed warmup execution, then min-of-2 timed: a fresh
        # JVM's JIT/classloading tax (~1.5 s) is constant per run, so
        # cold timing would weigh 4x heavier on the short hi-level
        # runs and understate scaling (measured: pii eff 0.707 cold
        # vs ~0.85 warm at 32k pages)
        df.write.format("noop").mode("overwrite").save()
        best = None
        for _ in range(2):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            sec = time.time() - t0
            best = sec if best is None else min(best, sec)
        # rows via count() would let Catalyst prune the regex/gram
        # work for map-only ops — the noop write is the honest action;
        # the orchestrator probes rows separately (untimed)
        print(json.dumps({"sec": round(best, 2)}))
    finally:
        spark.stop()


def probe_rows(op: str, corpus_dir: str) -> int:
    from epstein_pipeline_spark.session import get_spark

    spark = get_spark(f"webops_rows_{op}", cores=CORES_HI, shuffle_partitions=32)
    try:
        return _op_df(spark, op, corpus_dir).count()
    finally:
        spark.stop()


def main() -> None:
    if len(sys.argv) >= 5 and sys.argv[1] == "--run":
        run_one(int(sys.argv[2]), sys.argv[3], sys.argv[4])
        return

    import bench  # noqa: E402  (repo-root bench.py: corpus cache)

    corpus_dir = bench.corpus_parquet(int(os.environ.get("BENCH_PAGES", "128000")))
    n_pages = int(os.environ.get("BENCH_PAGES", "128000"))

    def sub(cores: int, op: str) -> dict:
        out = subprocess.run(
            [sys.executable, __file__, "--run", str(cores), op, corpus_dir],
            capture_output=True, text=True, timeout=3600,
        )
        if out.returncode != 0:
            raise RuntimeError(f"{op}@{cores}: {out.stderr[-2000:]}")
        return json.loads(out.stdout.strip().splitlines()[-1])

    # pre-warm the page cache so the first (cold-disk) read doesn't
    # land on whichever level runs first
    for f in Path(corpus_dir).glob("*.parquet"):
        f.read_bytes()

    results: dict[str, dict] = {}
    for op in OPS:
        rows = probe_rows(op, corpus_dir)
        # each subprocess already takes its in-JVM min-of-2 after a
        # warmup execution; one subprocess per level suffices
        hi = sub(CORES_HI, op)["sec"]
        lo = sub(CORES_LO, op)["sec"]
        eff = (lo / hi) / (CORES_HI / CORES_LO)
        results[op] = {
            "rows": rows,
            f"local[{CORES_LO}]_sec": lo,
            f"local[{CORES_HI}]_sec": hi,
            "pages_per_sec_hi": round(n_pages / hi, 1),
            "scaling_efficiency": round(eff, 4),
        }
        print(json.dumps({op: results[op]}), file=sys.stderr)
    print(json.dumps({"pages": n_pages, "ops": results}))


if __name__ == "__main__":
    main()
