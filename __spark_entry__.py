"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship end-to-end dedup clusters on sf0.001
queries()    — one entry per implemented operator (SURVEY.md §2)
oracle_sql() — DuckDB-equivalent SQL for every SQL-expressible query
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from epstein_pipeline_spark.entry_queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end dedup clusters (exact + MinHash/LSH + CC +
    representative selection) over sf0.001 documents with planted
    near-dup variants — mirrors the reference's `dedup --clusters`
    (cli.py:556-636)."""
    from epstein_pipeline_spark.entry_queries import q_dedup_clusters_planted

    return q_dedup_clusters_planted(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
