"""Batch file sources (SURVEY.md §2.1): JSON line-delimited / multiLine,
CSV, file provenance, JVM-filesystem listing, zone management."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_json_lines(spark: SparkSession, paths: list[str] | str, schema=None) -> DataFrame:
    """S2: line-delimited JSON objects, optionally an explicit path list
    (reference: coin/convert_to_delta.py:133-135 reads a driver-computed
    list of new object keys)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(paths)


def read_json_multiline(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S3: pretty-printed JSON arrays (reference:
    finance_news/bronze1_to_bronze2.py:147-151, multiLine=true)."""
    reader = spark.read.option("multiLine", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def with_source_file(df: DataFrame, col_name: str = "_src_path") -> DataFrame:
    """File provenance column (reference:
    finance_news/bronze1_to_bronze2.py:54 input_file_name) — used as the
    file-log checkpoint key."""
    return df.withColumn(col_name, F.input_file_name())


def list_keys_jvm(spark: SparkSession, path: str) -> list[str]:
    """S5: py4j escape hatch — list keys under a prefix via the JVM
    Hadoop FileSystem (reference: coin/convert_to_delta.py:62-83 lists
    s3a:// keys newer than last_key). Prefer the binaryFile listing
    source (incremental.list_files) — this exists for API parity and for
    filesystems where binaryFile's glob is awkward."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    it = fs.listFiles(jpath, True)
    keys = []
    while it.hasNext():
        keys.append(it.next().getPath().toString())
    return sorted(keys)


def create_zone(spark: SparkSession, zone: str, location: str | None = None) -> None:
    """S13: CREATE DATABASE IF NOT EXISTS <zone> [LOCATION ...]
    (reference: uber/csv_to_delta.py:89 — zones bronze2/silver/gold/
    dataaudit as catalog databases)."""
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {zone}{loc}")
