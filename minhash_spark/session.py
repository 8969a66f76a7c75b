"""SparkSession factory with the engine's scale-oriented defaults.

Tuned for the sandbox (single-JVM local[N]) but every knob is the one you'd
set on a 1000-executor cluster: AQE on (runtime shuffle-partition coalescing
+ skew-join splitting), Arrow batching for pandas UDFs (the FCDS batch
threshold `b` of the reference maps to maxRecordsPerBatch — SURVEY.md §2.1
op#9), and shuffle partitions sized to cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "minhash-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch: int = 4096,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = default_parallelism()
    master = master or os.environ.get("SPARK_MASTER", f"local[{cores}]")
    if shuffle_partitions is None:
        # 2× cores: enough tasks for AQE to coalesce down, few enough that
        # small-scale runs aren't dominated by task overhead.
        shuffle_partitions = 2 * cores

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
