"""Recall + false-merge measurement on the bench-scale corpus.

Synthesizes the same seeded corpus as bench.py (n_pages, seed=42,
mega_cluster_size=200), runs the full dedup pipeline, and scores
pair recall against planted truth plus false merges (predicted
clusters mixing distinct truth clusters or filler pages).

    python scripts/measure_recall.py [n_pages] [cores]
"""

import os
import sys
import tempfile
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")
sys.path.insert(0, "/root/repo")

from epstein_pipeline_spark.config import DedupConfig
from epstein_pipeline_spark.plans.checkpoint import StageStore
from epstein_pipeline_spark.plans.pipeline import run_dedup
from epstein_pipeline_spark.session import get_spark
from epstein_pipeline_spark.synth import generate_corpus, pages_to_spark

n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 64000
cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16

t0 = time.time()
spark = get_spark("recall", cores=cores, shuffle_partitions=4 * cores,
                  extra_conf={"spark.local.dir": "/dev/shm/spark-recall"})
corpus = generate_corpus(n_pages=n_pages, seed=42, mega_cluster_size=200)
pages = pages_to_spark(spark, corpus, partitions=128)

with tempfile.TemporaryDirectory(dir="/dev/shm") as tmp:
    res = run_dedup(spark, pages, StageStore(tmp), DedupConfig(), use_extracted=True, lcs_check=True)
    labels = res.labels.toPandas()

truth = corpus.truth_clusters  # (url, cluster_id) planted rows only
m = truth.merge(labels, on="url", how="left", suffixes=("_t", "_p"))

# pair recall: same-truth-cluster pairs that share a predicted label
cell = m.groupby(["cluster_id_t", "cluster_id_p"]).size()
tp = int(sum(n * (n - 1) // 2 for n in cell))
tot = int(sum(n * (n - 1) // 2 for n in truth.groupby("cluster_id").size()))

# per-class recall
tpairs = corpus.truth_pairs  # (url1, url2, class)
lab = dict(zip(labels["url"], labels["cluster_id"]))
by_class = {}
for u1, u2, cls in tpairs.itertuples(index=False):
    hit = lab.get(u1) == lab.get(u2)
    a, b = by_class.get(cls, (0, 0))
    by_class[cls] = (a + hit, b + 1)

# false merges: predicted multi-member clusters spanning >1 truth
# cluster or including filler (urls absent from truth)
t_of = dict(zip(truth["url"], truth["cluster_id"]))
from collections import defaultdict
members = defaultdict(list)
for u, c in lab.items():
    members[c].append(u)
false_merged = 0
for c, urls in members.items():
    if len(urls) < 2:
        continue
    tc = {t_of.get(u, f"filler:{u}") for u in urls}
    if len(tc) > 1:
        false_merged += 1

print({
    "n_pages": n_pages,
    "truth_pairs": tot,
    "pair_recall": round(tp / tot, 5),
    "per_class": {k: f"{a}/{b}" for k, (a, b) in sorted(by_class.items())},
    "false_merged_clusters": false_merged,
    "seconds": round(time.time() - t0, 1),
})
spark.stop()
