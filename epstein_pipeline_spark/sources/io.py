"""Schema-pinned sources and export sinks (SURVEY.md §2.1).

Reference mappings:
- S1 JSON dir scan (cli.py:595-611)      -> read_json_docs (PERMISSIVE
  + _corrupt_record, fixed schema — never inferSchema)
- S2 binary scan (cli.py:436)            -> read_binary_dir
- S6 JSON export (exporters/json_export) -> write_json
- S7 CSV export (cli.py:744-772)         -> write_csv_docs (fixed
  projection, arrays joined with ';', ocrText excluded)
- S10 NDJSON sink (embeddings.py:307-326)-> write_ndjson (Spark JSON
  lines IS ndjson)
- pages table                            -> read_pages (input_hint
  schema, pinned)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("date", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("summary", T.StringType(), True),
        T.StructField("personIds", T.ArrayType(T.StringType()), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField("pageCount", T.IntegerType(), True),
        T.StructField("batesRange", T.StringType(), True),
        T.StructField("ocrText", T.StringType(), True),
        T.StructField("_corrupt_record", T.StringType(), True),
    ]
)

CLUSTER_SCHEMA = T.StructType(
    [
        T.StructField("cluster_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("is_representative", T.BooleanType(), False),
        T.StructField("similarity", T.DoubleType(), True),
        T.StructField("dedup_method", T.StringType(), True),
    ]
)


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """The engine's primary input (BASELINE.json input_hint shape)."""
    return spark.read.schema(PAGES_SCHEMA).parquet(path)


def read_json_docs(spark: SparkSession, path: str) -> DataFrame:
    """Tolerant JSON document scan: schema pinned, corrupt rows
    captured instead of failing the job (the reference skips bad files
    with a warning, cli.py:604-610)."""
    return (
        spark.read.schema(DOC_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*.pdf") -> DataFrame:
    """S2: recursive binary-file scan -> (path, modificationTime,
    length, content)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
    )


def write_json(df: DataFrame, path: str) -> None:
    """S6/S10: JSON-lines export (exclude_none semantics come free —
    Spark omits null fields in JSON output by default)."""
    df.write.mode("overwrite").json(path)


def write_csv_docs(docs: DataFrame, path: str) -> None:
    """S7: fixed 11-column CSV projection; array columns joined with
    ';', ocrText excluded (cli.py:744-772)."""
    cols = ["id", "title", "date", "source", "category", "summary", "pageCount", "batesRange"]
    out = docs.select(
        *[F.col(c) for c in cols if c in docs.columns],
        F.concat_ws(";", F.col("personIds")).alias("personIds"),
        F.concat_ws(";", F.col("tags")).alias("tags"),
    )
    out.write.mode("overwrite").option("header", True).csv(path)


def write_clusters(clusters: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Cluster sink — schema mirror of the reference's
    duplicate_clusters table (exporters/neon_schema.py:146-157);
    partitioned by dedup_method for pruned reads."""
    w = clusters.write.mode("overwrite").partitionBy("dedup_method")
    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "json":
        w.json(path)
    else:
        raise ValueError(f"unsupported format: {fmt}")


def write_jdbc(df: DataFrame, url: str, table: str, batch_size: int = 500, **options) -> None:
    """S8/S9 stand-in: JDBC batch sink (the reference batches 500-row
    upserts, config.py:106). Requires a JDBC driver jar on the
    classpath — gated, not assumed, in this sandbox."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .options(**options)
        .mode("append")
        .save()
    )
