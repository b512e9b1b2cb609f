"""SparkSession factory tuned for the dedup workload.

Local mode stands in for a multi-executor cluster in the sandbox; the
configs below are the ones that matter at 1000-executor scale too:
AQE (runtime re-plan + skew-join splitting), Arrow for pandas UDF
transfer, shuffle partitions sized to cores (sandbox) / 2-3x total
cores (cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "epstein_pipeline_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores=None`` uses ``local[*]``. For the two-parallelism-level
    scaling benchmark, pass cores=8 and cores=32 explicitly.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        n = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n = cores
    if shuffle_partitions is None:
        # >= 4x max cores so local[8] and local[32] runs are
        # shuffle-bound the same way (SURVEY.md §7.3)
        shuffle_partitions = max(4 * n, 128)

    builder = (
        SparkSession.builder.master(master)
        .appName(app)
        # make local[N] mean N: size JVM internal pools (GC, JIT,
        # netty, parquet) to N, not to the machine's visible CPUs —
        # otherwise a "2-core" run borrows helper-thread time and
        # scaling measurements lie. Only effective on the process's
        # FIRST SparkContext (JVM flags are set at launch).
        # derby.stream.error.file: the embedded Derby JDBC driver
        # (test/bench sink) writes derby.log into user.dir by default —
        # keep it out of the repo working tree.
        .config(
            "spark.driver.extraJavaOptions",
            f"-XX:ActiveProcessorCount={n} "
            "-Dderby.stream.error.file=/tmp/derby.log",
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(16 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # Input-split size gates narrow-stage parallelism: a 100 MB test
        # corpus at the production default (128 MB) becomes ONE input
        # partition and every scan-shaped stage runs serial. 8 MB keeps
        # sandbox corpora spread across all cores; on a real cluster
        # with TB inputs raise this back to 128 MB via extra_conf.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_MAX_PARTITION_BYTES", str(8 * 1024 * 1024)),
        )
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
        # FileOutputCommitter v2: task outputs commit directly to the
        # destination instead of a rename-per-file job commit (~60 ms
        # per 16-file parquet write, x10 stage commits per dedup run).
        # Safe under the StageStore contract: readers only ever see a
        # snapshot AFTER its manifest publishes, so a crash mid-write
        # leaves an unpublished (invisible) partial dir either way —
        # the engine never relies on _SUCCESS or job-commit atomicity.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
