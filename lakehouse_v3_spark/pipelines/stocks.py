"""Stocks-domain pipeline: intraday OHLCV JSON lines → validated silver
with MERGE upsert.

Reference semantics (alphavantage/bronze2_to_silver.py):
  - drop source-metadata columns on ingest (transform_into_delta.py:117-120);
  - OHLCV validity: not-null ∧ >0 ∧ low≤high ∧ avg within [low,high]
    (:85-96);
  - avg_price = (high+low)/2 (:102);
  - per-symbol watermark: keep bars newer than silver's MAX(ts) per
    symbol (:175-189);
  - upsert keyed (symbol, timestamp) — late bars update in place
    (:141-152).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.joins import merge_upsert, newer_than_per_key_watermark

DROP_META_COLS = ("date_ny", "interval", "tz")


def bronze2(raw: DataFrame) -> DataFrame:
    """Typed bronze: drop collector metadata, parse the ISO timestamp."""
    df = raw.drop(*[c for c in DROP_META_COLS if c in raw.columns])
    return df.withColumn("ts", F.to_timestamp("timestamp")).drop("timestamp")


def validate_ohlcv(df: DataFrame) -> DataFrame:
    """P10 multi-predicate sanity filter."""
    ok = (
        F.col("open").isNotNull() & F.col("high").isNotNull()
        & F.col("low").isNotNull() & F.col("close").isNotNull()
        & (F.col("open") > 0) & (F.col("high") > 0)
        & (F.col("low") > 0) & (F.col("close") > 0)
        & (F.col("low") <= F.col("high"))
        & (F.col("volume") >= 0)
    )
    return df.filter(ok)


def enrich(df: DataFrame) -> DataFrame:
    return df.withColumn("avg_price", (F.col("high") + F.col("low")) / 2)


def silver_increment(bronze: DataFrame, existing_silver: DataFrame | None) -> DataFrame:
    """Validated new bars: per-symbol strictly-newer watermark, dedup on
    (symbol, ts) keeping the latest arrival."""
    cleaned = enrich(validate_ohlcv(bronze)).dropDuplicates(["symbol", "ts"])
    if existing_silver is None:
        return cleaned
    maxs = existing_silver.groupBy("symbol").agg(F.max("ts").alias("_max_ts"))
    return newer_than_per_key_watermark(cleaned, maxs, ["symbol"], "ts", "_max_ts").drop("_max_ts")


def upsert_silver(existing_silver: DataFrame | None, increment: DataFrame) -> DataFrame:
    """MERGE semantics keyed (symbol, ts): new bars insert, revised bars
    overwrite (late-data handling, the reference's alternative to
    watermark-drop)."""
    if existing_silver is None:
        return increment
    return merge_upsert(existing_silver, increment, ["symbol", "ts"])
