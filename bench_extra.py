"""Iteration benchmarks (bench.py is FROZEN for measurement; this file
holds the working measurements cited in OPTIMIZATION_r06.md).

Usage:
  python bench_extra.py headline [names...]   # per-query min-of-2 at $SPARK_GRAFT_SF_DIR
  python bench_extra.py explain <name> [out]  # .explain('formatted') for a query
  python bench_extra.py dedup <cores>         # one dedup run on the cached 128k corpus
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")
sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def headline(names: list[str]) -> None:
    from epstein_pipeline_spark.entry_queries import QUERIES
    from epstein_pipeline_spark.session import get_spark

    import bench

    bench.warm_page_cache(SF_DIR)
    spark = get_spark("bench_extra", cores=CPUS, shuffle_partitions=128)
    names = names or bench.HEADLINE
    out: dict[str, float] = {}
    for _rep in range(2):
        for name in names:
            spark.sparkContext.setJobDescription(f"headline:{name}")
            t0 = time.time()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            if name not in out or dt < out[name]:
                out[name] = dt
    print(json.dumps({"queries": out, "total": round(sum(out.values()), 3)}))
    spark.stop()


def explain(name: str, out_path: str | None) -> None:
    from epstein_pipeline_spark.entry_queries import QUERIES
    from epstein_pipeline_spark.session import get_spark

    spark = get_spark("bench_extra_explain", cores=CPUS, shuffle_partitions=128)
    df = QUERIES[name](spark, SF_DIR)
    txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    if out_path:
        Path(out_path).write_text(txt)
        print(f"wrote {out_path}")
    else:
        print(txt)
    spark.stop()


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "headline"
    if mode == "headline":
        headline(sys.argv[2:])
    elif mode == "explain":
        explain(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
    elif mode == "dedup":
        import bench

        cores = int(sys.argv[2]) if len(sys.argv) > 2 else 4
        corpus = bench.corpus_parquet(bench.BENCH_PAGES)
        t, n, stages, sh = bench.run_dedup(cores, corpus)
        print(json.dumps({"seconds": round(t, 2), "n": n,
                          "stages": {k: round(v, 2) for k, v in stages.items()},
                          "shuffle_mb": sh}))
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
