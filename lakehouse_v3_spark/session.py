"""SparkSession factory.

Mirrors the session conventions the reference sets up per job
(reference: spark/jobs/uber/bronze2_to_silver.py:24-39 — Delta extension +
S3A + Hive confs), re-expressed for a plain-Spark deployment: AQE on,
UTC session timezone, Arrow enabled, shuffle partitions sized to cores.

Delta Lake / S3A / Hive are optional in this environment; the factory
gates them behind availability checks so the same code runs on a real
cluster (with the jars present) and in the local test harness.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "lakehouse_v3_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Scale notes (100 TB target):
      - AQE enabled: runtime coalescing + skew-join handling replaces
        hand-tuned shuffle partition counts on a real cluster.
      - UTC session timezone: required for cross-engine (DuckDB oracle)
        timestamp parity and mirrors the reference pinning UTC
        (reference: spark/jobs/coin/convert_to_delta.py:34).
      - Arrow: vectorized pandas interchange for the Pandas-UDF slow path.
      - ignoreCorruptFiles/ignoreMissingFiles mirrors the reference's
        tolerance confs (reference: alphavantage/transform_into_delta.py:42-43).
    """
    cpus = default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.ignoreCorruptFiles", "true")
        .config("spark.sql.files.ignoreMissingFiles", "true")
        # split small fixture files across cores (default 128m leaves a
        # 10 MB sf0.1 parquet on ONE core of local[32]); on a cluster
        # with properly sized files override via SPARK_GRAFT_MAX_PART_BYTES
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PART_BYTES", "16m"),
        )
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.streaming.schemaInference", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
