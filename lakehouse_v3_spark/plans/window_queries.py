"""Window-function queries: dense surrogate ids (scalable), offset ids,
latest-per-key dedup, top-N per group, running aggregates, lag/lead,
sessionization.

SURVEY.md §2.5 items W1-W5 plus the parity-plus analytic windows the
reference lacks. W1/W2's reference implementation is a global-order
window (single-partition collapse, SURVEY.md §4 anti-pattern #1); here
ids come from lakehouse_v3_spark.ids.with_dense_id — range-partitioned,
per-partition windows only.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..ids import max_id_seed, with_dense_id
from ..io_utils import load
from . import register

# ---------------------------------------------------------------------------
# W1: dense surrogate ids via the scalable ids module
# ---------------------------------------------------------------------------

_W1_ORACLE = """
SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS cd_id, o_orderkey
FROM orders
"""


@register("w1_dense_ids_scalable", oracle=_W1_ORACLE)
def w1_dense_ids_scalable(spark, sf_dir):
    """Dense 1..N ids with the semantics of the reference's
    row_number-over-global-order (uber/csv_to_delta.py:61-78) but computed
    via range partition + per-partition row_number + cumulative offsets
    (ids.with_dense_id) — no single-partition window at any scale."""
    o = load(spark, sf_dir, "orders")
    return with_dense_id(o, ["o_orderkey"], id_col="cd_id").select("cd_id", "o_orderkey")


# ---------------------------------------------------------------------------
# W2: ids offset by the existing MAX(id) (deterministic business order)
# ---------------------------------------------------------------------------

_W2_ORACLE = """
SELECT (SELECT MAX(o_orderkey) FROM orders)
       + ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) AS cd_id,
       o_orderkey, o_orderdate
FROM orders
"""


@register("w2_offset_ids", oracle=_W2_ORACLE)
def w2_offset_ids(spark, sf_dir):
    """Id assignment continuing after MAX(existing id), ordered by
    business columns (reference: alphavantage/transform_into_delta.py:122-138,
    coin_bronze2_to_silver.py:159-163). Seed read is a scalar agg;
    assignment is the scalable dense-id operator."""
    o = load(spark, sf_dir, "orders")
    seed = max_id_seed(o, "o_orderkey")
    return with_dense_id(o, ["o_orderdate", "o_orderkey"], id_col="cd_id", offset=seed).select(
        "cd_id", "o_orderkey", "o_orderdate"
    )


# ---------------------------------------------------------------------------
# W3: latest-per-key dedup
# ---------------------------------------------------------------------------

_W3_ORACLE = """
SELECT user_id, event_id, ts, event_type, value
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


@register("w3_latest_per_key", oracle=_W3_ORACLE)
def w3_latest_per_key(spark, sf_dir):
    """Keep the newest row per key (reference:
    coin_bronze2_to_silver.py:117-124; desc_nulls_last tie-break variant
    finance_bronze2_to_silver.py:92-94). Partitioned window — shuffles
    once on the key, no global sort."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc_nulls_last(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# W4: top-N per group
# ---------------------------------------------------------------------------

_W4_ORACLE = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM (
  SELECT l_orderkey, l_linenumber, l_extendedprice, ROW_NUMBER() OVER (
    PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber) AS rn
  FROM lineitem
) WHERE rn <= 3
"""


@register("w4_topn_per_group", oracle=_W4_ORACLE)
def w4_topn_per_group(spark, sf_dir):
    """Top-3 rows per group (reference: 005_send_alert_hourly.py:134-147 —
    ≤5 preview rows per config). row_number ≤ N after a per-key window."""
    l = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber")
    )
    return (
        l.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


# ---------------------------------------------------------------------------
# Parity-plus: running aggregate frame
# ---------------------------------------------------------------------------

_W5_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
       SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
       AS running_spend
FROM orders
"""


@register("w5_running_total", oracle=_W5_ORACLE)
def w5_running_total(spark, sf_dir):
    """Running per-customer spend — rowsBetween frame (SURVEY.md §2.5
    'not present' row; parity-plus). Prices carry 2 decimals, so the
    accumulator is integer CENTS (a long): exact, order-independent,
    engine-identical, and far cheaper per row than the decimal(30,6)
    BigDecimal buffer this used in round 1 (the per-row running-sum
    window evaluates the accumulator once per input row, so buffer cost
    is the whole query)."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cents = F.round(F.col("o_totalprice") * 100.0, 0).cast("long")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (F.sum(cents).over(w) / 100.0).alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# Parity-plus: lag/lead inter-event gaps
# ---------------------------------------------------------------------------

_W6_ORACLE = """
SELECT user_id, event_id, ts,
       epoch_us(ts) - lag(epoch_us(ts)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
FROM events
"""


@register("w6_lag_gap", oracle=_W6_ORACLE)
def w6_lag_gap(spark, sf_dir):
    """lag() inter-event gap in exact integer microseconds (avoids
    float timestamp arithmetic). First event per user → NULL."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return e.select(
        "user_id", "event_id", "ts", (us - F.lag(us).over(w)).alias("gap_us")
    )


# ---------------------------------------------------------------------------
# Parity-plus: sessionization (gap > 30 min starts a new session)
# ---------------------------------------------------------------------------

_W7_ORACLE = """
WITH gaps AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sessions AS (
  SELECT user_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM gaps
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sessions
GROUP BY user_id, session_id
"""


@register("w7_sessionize", oracle=_W7_ORACLE)
def w7_sessionize(spark, sf_dir):
    """Sessionization: lag-gap flag + running cumsum as session id, then
    per-session aggregates. The batch analogue of streaming
    session_window (pyspark_guide 'Sessionization' pattern)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sessions = e.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum("is_new").over(cum)
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )
