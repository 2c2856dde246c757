"""Uber-domain medallion pipeline: raw CSV bookings → cleaned silver →
four gold KPI tables.

Reference semantics preserved (SURVEY.md §7.4):
  - rename-sanitize replaces spaces/parens/slashes in column names
    (uber/csv_to_delta.py:38-42);
  - dirty-null cast: "null"/"none"/"nan"/"" → NULL before DOUBLE cast
    (uber/csv_to_delta.py:45-52);
  - imputation: constant reasons ('Reason Unknown'), mean for numeric
    VTAT/CTAT, mode for Payment_Method (uber/bronze2_to_silver.py:92-112);
  - TimeZone buckets Morning [6,12] / Afternoon (12,18] / Evenings (18,∞)
    / LateNights; RushHour = [7,10] ∪ [15,18] (:119-130);
  - gold: Real_Revenue zeroes non-Completed BEFORE aggregation while
    Cancelled_Rides counts every non-Completed status
    (silver_to_gold.py:49-61).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ids import with_dense_id

DIRTY_NULLS = ("null", "none", "nan", "")


def sanitize_columns(df: DataFrame) -> DataFrame:
    """P1: make every column name parquet-safe (reference replaces
    spaces and parens; we also collapse repeats)."""
    new_names = [re.sub(r"[ ()/;{}=\n\t]+", "_", c).strip("_") for c in df.columns]
    return df.toDF(*new_names)


def dirty_null_cast(df: DataFrame, columns: list[str], to_type: str = "double") -> DataFrame:
    """P4: normalize string-nulls then cast."""
    for c in columns:
        cleaned = F.when(
            F.lower(F.trim(F.col(c).cast("string"))).isin(*DIRTY_NULLS), None
        ).otherwise(F.col(c))
        df = df.withColumn(c, cleaned.cast(to_type))
    return df


def bronze2(raw: DataFrame) -> DataFrame:
    """bronze1 CSV → bronze2: sanitize names, type the numerics, stamp
    lineage id + ingest ts, lineage columns first (reference
    uber/csv_to_delta.py:38-102)."""
    df = sanitize_columns(raw)
    numeric = [
        c
        for c in (
            "Avg_VTAT", "Avg_CTAT", "Booking_Value", "Ride_Distance",
            "Driver_Ratings", "Customer_Rating",
        )
        if c in df.columns
    ]
    df = dirty_null_cast(df, numeric)
    df = df.withColumn("dt_record_to_bronze2", F.current_timestamp())
    df = with_dense_id(df, ["Booking_ID"], id_col="cd_bronze_id")
    front = ["cd_bronze_id", "dt_record_to_bronze2"]
    return df.select(*front, *[c for c in df.columns if c not in front])


def silver(bronze: DataFrame) -> DataFrame:
    """bronze2 → silver: exact dedup on the business key, imputation
    (const/mean/mode), time features, dense silver ids."""
    df = bronze.dropDuplicates(["Booking_ID"])

    # constant imputation for reason/count columns
    const_fill = {
        c: "Reason Unknown"
        for c in ("Reason_for_cancelling_by_Customer", "Driver_Cancellation_Reason",
                  "Incomplete_Rides_Reason")
        if c in df.columns
    }
    if const_fill:
        df = df.fillna(const_fill)

    # mean imputation for numeric quality metrics (one-pass means)
    mean_cols = [c for c in ("Avg_VTAT", "Avg_CTAT") if c in df.columns]
    if mean_cols:
        means = df.select([F.mean(c).alias(c) for c in mean_cols]).collect()[0]
        df = df.fillna({c: means[c] for c in mean_cols if means[c] is not None})

    # mode imputation for Payment_Method
    if "Payment_Method" in df.columns:
        mode_row = (
            df.filter(F.col("Payment_Method").isNotNull())
            .groupBy("Payment_Method")
            .count()
            .orderBy(F.col("count").desc(), F.col("Payment_Method"))
            .limit(1)
            .collect()
        )
        if mode_row:
            df = df.fillna({"Payment_Method": mode_row[0]["Payment_Method"]})

    hr = F.hour(F.to_timestamp(F.concat_ws(" ", F.col("Date"), F.col("Time"))))
    df = (
        df.withColumn("Hour", hr)
        .withColumn(
            "TimeZone",
            F.when((hr >= 6) & (hr <= 12), "Morning")
            .when((hr > 12) & (hr <= 18), "Afternoon")
            .when(hr > 18, "Evenings")
            .otherwise("LateNights"),
        )
        .withColumn(
            "RushHour",
            F.when(((hr >= 7) & (hr <= 10)) | ((hr >= 15) & (hr <= 18)), 1).otherwise(0),
        )
    )
    df = df.withColumn("dt_record_to_silver", F.current_timestamp())
    df = with_dense_id(df, ["Booking_ID"], id_col="cd_silver_id")
    front = ["cd_silver_id", "dt_record_to_silver"]
    return df.select(*front, *[c for c in df.columns if c not in front])


def gold_booking_stats(silver_df: DataFrame) -> DataFrame:
    """Daily per-vehicle KPIs (silver_to_gold.py:44-61): Real_Revenue
    zeroed for non-Completed pre-agg; Cancelled counts every
    non-Completed status; rates derived post-agg."""
    completed = F.col("Booking_Status") == "Completed"
    prepped = silver_df.withColumn(
        "Real_Revenue", F.when(completed, F.col("Booking_Value")).otherwise(F.lit(0.0))
    )
    agg = prepped.groupBy("Date", "Vehicle_Type").agg(
        F.count(F.lit(1)).alias("Total_Bookings"),
        F.sum(F.when(completed, 1).otherwise(0)).cast("long").alias("Completed_Bookings"),
        F.sum(F.when(~completed, 1).otherwise(0)).cast("long").alias("Cancelled_Rides"),
        F.round(F.sum("Real_Revenue"), 2).alias("Total_Revenue"),
        F.round(F.avg("Ride_Distance"), 2).alias("Avg_Distance"),
    )
    return agg.withColumn(
        "Cancellation_Rate",
        F.round(F.col("Cancelled_Rides") * 100.0 / F.col("Total_Bookings"), 2),
    ).withColumn(
        "Revenue_Per_Km",
        F.round(
            F.col("Total_Revenue")
            / F.nullif(F.col("Avg_Distance") * F.col("Completed_Bookings"), F.lit(0.0)),
            2,
        ),
    )


def gold_rushhour_stats(silver_df: DataFrame) -> DataFrame:
    """Rush-hour utilisation (silver_to_gold.py:68-73)."""
    return silver_df.groupBy("Date", "TimeZone", "RushHour").agg(
        F.count(F.lit(1)).alias("Rides"),
        F.round(F.avg("Booking_Value"), 2).alias("Avg_Booking_Value"),
        F.round(F.avg("Ride_Distance"), 2).alias("Avg_Ride_Distance"),
    )


def gold_cancellation_stats(silver_df: DataFrame) -> DataFrame:
    """Cancellation breakdown by month / type / reason
    (silver_to_gold.py:79-97): LIKE-based type normalization."""
    status = F.col("Booking_Status")
    typed = silver_df.filter(status != "Completed").withColumn(
        "Cancellation_Type",
        F.when(status.like("%Customer%"), "Customer")
        .when(status == "No Driver Found", "No Driver")  # before %Driver% LIKE
        .when(status.like("%Driver%"), "Driver")
        .otherwise("Incomplete"),
    ).withColumn(
        "Reason",
        F.coalesce(
            F.col("Reason_for_cancelling_by_Customer"),
            F.col("Driver_Cancellation_Reason"),
            F.col("Incomplete_Rides_Reason"),
            F.lit("Reason Unknown"),
        ),
    )
    return typed.groupBy(
        F.date_format(F.to_date("Date"), "yyyy-MM").alias("Month"),
        "Cancellation_Type",
        "Reason",
    ).agg(F.count(F.lit(1)).alias("Cancellations"))


def gold_payment_stats(silver_df: DataFrame) -> DataFrame:
    """Payment-method stats by month (silver_to_gold.py:105-112):
    groupBy on a date_format expression."""
    return silver_df.groupBy(
        F.date_format(F.to_date("Date"), "yyyy-MM").alias("Month"),
        "Payment_Method",
    ).agg(
        F.count(F.lit(1)).alias("Bookings"),
        F.round(F.sum(F.coalesce(F.col("Booking_Value"), F.lit(0.0))), 2).alias("Volume"),
        F.round(F.avg("Booking_Value"), 2).alias("Avg_Value"),
    )
