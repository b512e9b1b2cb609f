"""Salted-CC evidence at bench scale (round-2 verdict item #6).

Plants a hot-root mega-component (>=100k edges through one root — the
host-domain / boilerplate-portal skew the north rule names) plus
background components, then runs connected_components UNSALTED vs
SALTED (salt_buckets=8) on the same input, asserting label parity and
printing labels-stage wall times. Usage:

    python scripts/measure_cc_salting.py [mega_nodes] [repeats]

Defaults: 120_000 mega nodes (~180k edges in the hot component),
2 repeats per level, interleaved. One JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from epstein_pipeline_spark.operators.cc import connected_components  # noqa: E402
from epstein_pipeline_spark.session import get_spark  # noqa: E402


def build_edges(spark, mega_nodes: int, background: int):
    """One mega-component with a hot root (star to node 0 from every
    even node + a chain so the loop actually iterates) plus
    ``background`` disjoint 2-node components."""
    ids = spark.range(0, mega_nodes)
    chain = ids.filter(F.col("id") < mega_nodes - 1).select(
        F.format_string("h%07d", F.col("id")).alias("url1"),
        F.format_string("h%07d", F.col("id") + 1).alias("url2"),
    )
    star = ids.filter((F.col("id") % 2 == 0) & (F.col("id") > 0)).select(
        F.lit("h0000000").alias("url1"),
        F.format_string("h%07d", F.col("id")).alias("url2"),
    )
    bg = spark.range(0, background).select(
        F.format_string("b%07d_a", F.col("id")).alias("url1"),
        F.format_string("b%07d_b", F.col("id")).alias("url2"),
    )
    return chain.union(star).union(bg)


def main() -> None:
    mega_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("cc-salting", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    edges = build_edges(spark, mega_nodes, background=50_000)
    edges = edges.repartition(32).cache()
    n_edges = edges.count()
    hot_degree = mega_nodes // 2 + 1  # star + one chain hop

    # the salt threshold must sit BELOW the planted hub degree or the
    # "salted" legs silently take the cold path and measure nothing
    # but the broadcast-tag overhead (the original default of 500k
    # made the small-scale row a no-op — caught in review)
    hot_min = int(os.environ.get("CC_SALT_HOT_DEGREE", str(max(1000, hot_degree // 2))))
    if hot_degree < hot_min:
        raise SystemExit(
            f"planted hub degree {hot_degree} < salt_hot_degree {hot_min}: "
            "the salted run would never salt — lower CC_SALT_HOT_DEGREE"
        )

    def run(salt: int) -> tuple[float, int]:
        t0 = time.time()
        labels = connected_components(
            edges, salt_buckets=salt, salt_hot_degree=hot_min, local_max_edges=0
        )
        n = labels.count()
        return time.time() - t0, n

    # warmup (JIT + shuffle services), then interleaved repeats
    run(1)
    times: dict[int, list[float]] = {1: [], 8: []}
    for _ in range(repeats):
        for salt in (1, 8, 8, 1):
            dt, _ = run(salt)
            times[salt].append(dt)

    # parity: salted and unsalted labels identical
    l1 = connected_components(edges, salt_buckets=1, local_max_edges=0)
    l8 = connected_components(edges, salt_buckets=8, salt_hot_degree=hot_min, local_max_edges=0)
    mism = (
        l1.withColumnRenamed("cluster_id", "c1")
        .join(l8.withColumnRenamed("cluster_id", "c8"), "url", "full")
        .filter(
            F.col("c1").isNull() | F.col("c8").isNull() | (F.col("c1") != F.col("c8"))
        )
        .count()
    )
    out = {
        "mega_nodes": mega_nodes,
        "edges": n_edges,
        "hot_root_degree": hot_degree,
        "salt_hot_degree": hot_min,
        "labels_sec_unsalted": round(min(times[1]), 2),
        "labels_sec_salted8": round(min(times[8]), 2),
        "label_mismatches": mism,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
