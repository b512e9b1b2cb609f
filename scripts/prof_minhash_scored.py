"""Profile the minhash_scored stage in isolation at a given core count.

Runs extract+signatures once (committed to a store), then times the
minhash_scored sub-steps: candidate gen + estimate, checkpoint barrier,
high/near split, exact-Jaccard verify. Usage:

    python scripts/prof_minhash_scored.py <cores> [corpus]
"""

import os
import sys
import time
from pathlib import Path

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from epstein_pipeline_spark.config import DedupConfig
from epstein_pipeline_spark.operators.lsh import band_rows, candidate_pairs_from_bands, score_candidates
from epstein_pipeline_spark.operators.verify import exact_jaccard_pairs
from epstein_pipeline_spark.plans.checkpoint import StageStore
from epstein_pipeline_spark.plans.pipeline import extract_stage
from epstein_pipeline_spark.session import get_spark

cores = int(sys.argv[1])
corpus = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.bench_cache/pages_n48000_s42"
cfg = DedupConfig()

spark = get_spark(f"prof_{cores}", cores=cores, shuffle_partitions=128,
                  extra_conf={"spark.local.dir": "/dev/shm/spark-bench-tmp"})
store_dir = f"/dev/shm/spark-prof/store_{cores}"
import shutil
shutil.rmtree(store_dir, ignore_errors=True)
store = StageStore(store_dir)

pages = spark.read.parquet(corpus)
t0 = time.time()
store.commit("extract", extract_stage(pages))
docs = store.read(spark, "extract")
print(f"extract: {time.time()-t0:.2f}s")

from epstein_pipeline_spark.functions.minhash import make_minhash_udf
from epstein_pipeline_spark.functions.simhash import make_simhash_udf
from epstein_pipeline_spark.functions.text import normalize_text_expr

t0 = time.time()
mh_udf = make_minhash_udf(cfg.shingle_k, cfg.num_perm, cfg.minhash_seed)
sh_udf = make_simhash_udf()
sigs_df = (
    docs.filter(F.length("text") > min(cfg.minhash_min_len, cfg.simhash_min_len))
    .select("url", normalize_text_expr("text").alias("_norm"), F.length("text").alias("_len"))
    .withColumn("sig", mh_udf("_norm"))
    .withColumn("simhash", sh_udf("_norm"))
    .select("url", "_len", "sig", "simhash")
)
store.commit("signatures", sigs_df)
all_sigs = store.read(spark, "signatures")
print(f"signatures: {time.time()-t0:.2f}s")

mh_sigs = all_sigs.filter(F.col("_len") > cfg.minhash_min_len).select("url", "sig")

# --- the stage under test, decomposed --------------------------------------
t0 = time.time()
cands = candidate_pairs_from_bands(band_rows(mh_sigs, cfg), cfg)
est = score_candidates(cands, mh_sigs, cfg).filter(F.col("score") >= cfg.lcs_gray_low - 0.10)
est = est.localCheckpoint(eager=True)
t_est = time.time() - t0
n_est = est.count()
print(f"est (cand+score+localCheckpoint): {t_est:.2f}s  rows={n_est}")

t0 = time.time()
high = est.filter(F.col("score") >= 0.90)
n_high = high.count()
print(f"high count: {time.time()-t0:.2f}s  rows={n_high}")

t0 = time.time()
near = est.filter(F.col("score") < 0.90)
ver = exact_jaccard_pairs(near, docs, cfg)
n_ver = ver.count()
print(f"verify (exact_jaccard near): {time.time()-t0:.2f}s  rows={n_ver}")

t0 = time.time()
out = high.unionByName(exact_jaccard_pairs(est.filter(F.col("score") < 0.90), docs, cfg))
store.commit("minhash_scored", out)
print(f"full stage write (union recompute): {time.time()-t0:.2f}s")
spark.stop()
