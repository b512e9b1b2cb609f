"""Print the golden result-set checksums pinned in
tests/test_golden_checksums.py. Run after a DELIBERATE change to the
signature scheme / planted corpus / query projection; paste the new
values into GOLDEN with a note on why they moved."""

from __future__ import annotations

import os
import sys
from pathlib import Path

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from epstein_pipeline_spark.functions.checksum import result_checksum  # noqa: E402
from epstein_pipeline_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
NAMES = [
    "minhash_dedup_planted",
    "simhash_dedup_planted",
    "dedup_clusters_planted",
    "rhp_cosine_pairs",
]


def main() -> None:
    from epstein_pipeline_spark.entry_queries import QUERIES

    spark = get_spark("golden_checksums", cores=8, shuffle_partitions=16)
    for name in NAMES:
        print(f'    "{name}": "{result_checksum(QUERIES[name](spark, SF))}",')
    spark.stop()


if __name__ == "__main__":
    main()
