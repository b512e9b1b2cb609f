"""epstein_pipeline_spark — a from-scratch PySpark-native near-duplicate
detection and clustering engine.

Re-expresses the query/data-processing capabilities of the reference
(`stonesalltheway1/Epstein-Pipeline`, single-node Python CLI) as an
idiomatic Spark DataFrame pipeline designed for 10^12-document scale:

- exact dedup: sha2-of-normalized-text hash grouping
  (reference: processors/dedup.py:242-273)
- MinHash/LSH near-dup: char-5-shingles, 128 perms, (b=16, r=8) banding
  (reference: processors/dedup.py:332-398, config.py:84-87)
- SimHash Hamming-ball near-dup: 64-bit, 4x16 band join
  (replaces the reference's O(n^2) semantic pass, dedup.py:404-464)
- suffix-array-style LCS within-cluster verification
- connected components via alternating large-star/small-star
  (reference union-find analog: processors/dedup.py:183-206)
- checkpointed, resumable stages with per-partition lineage
  (reference: state.py:15-111, processors/ocr.py:917-931)

All per-row compute is Spark SQL expressions or vectorized pandas/Arrow
UDFs — never per-row Python UDFs.
"""

from epstein_pipeline_spark.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
