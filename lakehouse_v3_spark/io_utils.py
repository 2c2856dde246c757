"""Parquet fixture loaders for the driver-provided TPC-H-ish tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Parquet → columnar scan with pushdown/pruning.

    ``events.ts`` is physically TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects. We read it as a nanos long (legacy conf) and
    truncate to microseconds — exactly what the DuckDB oracle does when it
    coerces TIMESTAMP_NS → TIMESTAMP(µs) — keeping both engines bit-equal.
    """
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # integer `div`, not `/`: ns epoch values exceed double's 2^53
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql queries)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
