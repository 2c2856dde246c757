"""Coin-domain pipeline: nested JSON listings → silver.

Reference semantics (coin_bronze2_to_silver.py):
  - backtick-safe handling of dotted inferred names (:98-100) →
    flattened snake_case;
  - trim every string column (:107-109);
  - ARRAY columns flattened to CSV strings via concat_ws (:112-115);
  - latest-per-key dedup: rn=1 per id ordered by ingest ts desc
    (:117-124);
  - incremental: only rows newer than the silver MAX(ingest ts)
    (:133-149).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..ids import with_dense_id
from ..incremental import max_ts_watermark


def flatten_nested(df: DataFrame) -> DataFrame:
    """Flatten struct columns to dotted→underscore names (the reference
    keeps backticked dotted names; flattening is the parquet-friendly
    equivalent with the same leaf values)."""
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StructType):
            for sub in f.dataType.fields:
                cols.append(F.col(f"`{f.name}`.`{sub.name}`").alias(f"{f.name}_{sub.name}"))
        else:
            cols.append(F.col(f"`{f.name}`"))
    out = df.select(*cols)
    if any(isinstance(f.dataType, T.StructType) for f in out.schema.fields):
        return flatten_nested(out)  # deeper nesting (quote.usd.price)
    return out


def clean_strings_and_arrays(df: DataFrame) -> DataFrame:
    """Trim strings; concat_ws-flatten arrays (tags → 'a,b,c')."""
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StringType):
            df = df.withColumn(f.name, F.trim(F.col(f.name)))
        elif isinstance(f.dataType, T.ArrayType):
            df = df.withColumn(f.name, F.concat_ws(",", F.col(f.name)))
    return df


def latest_per_key(df: DataFrame, key: str, ts_col: str, tie_break: str) -> DataFrame:
    """W3 latest-per-key dedup."""
    w = Window.partitionBy(key).orderBy(
        F.col(ts_col).desc_nulls_last(), F.col(tie_break).desc()
    )
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def silver(bronze: DataFrame, existing_silver: DataFrame | None) -> DataFrame:
    """bronze2 → silver: incremental scope → flatten → clean →
    latest-per-key → dense ids continuing after the existing silver."""
    from ..ids import max_id_seed

    incoming = max_ts_watermark(bronze, existing_silver, "dt_record_to_bronze2")
    flat = clean_strings_and_arrays(flatten_nested(incoming))
    deduped = latest_per_key(flat, "id", "dt_record_to_bronze2", "cd_bronze_id")
    seed = max_id_seed(existing_silver, "cd_silver_id") if existing_silver is not None else 0
    out = with_dense_id(
        deduped.withColumn("dt_record_to_silver", F.current_timestamp()),
        ["cd_bronze_id", "id"],
        id_col="cd_silver_id",
        offset=seed,
    )
    front = ["cd_silver_id", "dt_record_to_silver"]
    return out.select(*front, *[c for c in out.columns if c not in front])
