"""Core relational queries: joins, grouped aggregation, conditional
aggregation, derived ratios, set ops, sorts/limits, CASE bucketing.

Covers SURVEY.md §2 items A1, A4-A9, A13, P13, P14, O1-O4, U1 and the
uber silver→gold KPI semantics (reference: spark/jobs/uber/silver_to_gold.py:49-61
— conditional revenue zeroing pre-agg, cancellation-rate ratio post-agg),
re-expressed on the TPC-H-ish fixture tables.

All double sums/means go through the decimal accumulation helpers
(plans.dsum / plans.davg) so results are order-independent and
bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io_utils import load
from ..partitioning import fan_out_scan
from . import davg, dsum, register

# ---------------------------------------------------------------------------
# Flagship: uber-gold-shaped daily KPI (A4 grouped multi-aggregate,
# A5 conditional aggregate, A6 derived ratio post-agg, A9 groupBy on expr)
# ---------------------------------------------------------------------------

_FLAGSHIP_ORACLE = """
SELECT
  strftime(o_orderdate, '%Y-%m')  AS order_month,
  o_orderpriority,
  COUNT(DISTINCT o_orderkey)      AS n_orders,
  COUNT(*)                        AS n_items,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
                                  AS revenue,
  CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F'
                THEN l_extendedprice * (1 - l_discount)
                ELSE 0.0 END AS DECIMAL(30,6))) AS DOUBLE)
                                  AS fulfilled_revenue,
  COUNT(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_orderkey END)
                                  AS fulfilled_orders,
  CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_discount)
                                  AS avg_discount,
  CAST(COUNT(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_orderkey END) AS DOUBLE)
    * 100.0 / COUNT(DISTINCT o_orderkey)
                                  AS fulfillment_rate
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""


@register("flagship_monthly_kpi", oracle=_FLAGSHIP_ORACLE)
def flagship_monthly_kpi(spark, sf_dir):
    """Monthly KPI rollup mirroring the reference's gold booking stats
    (silver_to_gold.py:53-61): grouped multi-agg + conditional revenue
    + post-agg ratio. Join shuffles on orderkey; at 100 TB both sides are
    large → sort-merge join on the natural key, AQE handles skew."""
    orders = load(spark, sf_dir, "orders")
    # fan out on the groupBy key: the per-order decimal partial agg is
    # the measured cost and the hash repartition is REUSED by the
    # groupBy below (one exchange either way, now at full parallelism;
    # no-op on a production file layout) — r13, guide §2
    lineitem = fan_out_scan(load(spark, sf_dir, "lineitem"), "l_orderkey")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # Per-order partial aggregate FIRST: o_orderkey is unique in orders and
    # every group key (month, priority, status) is an order-level attribute,
    # so collapsing lineitem to one row per order turns both
    # COUNT(DISTINCT)s of the naive plan into plain counts — no expand /
    # multi-pass distinct aggregation at the final groupBy. Decimal partial
    # sums keep the result bit-identical to the oracle's one-level SUM
    # (decimal addition is exact and associative).
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_items"),
        F.sum(disc_price.cast("decimal(30,6)")).alias("_rev"),
        F.sum(F.col("l_discount").cast("decimal(30,6)")).alias("_disc_sum"),
        F.count("l_discount").alias("_disc_cnt"),
    )
    # pre-agg shuffled on l_orderkey already; the join reuses that key, so
    # only the (smaller) orders side shuffles.
    j = per_order.join(orders, per_order.l_orderkey == orders.o_orderkey, "inner")
    is_f = F.col("o_orderstatus") == "F"
    agg = (
        j.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("_items").alias("n_items"),
            F.sum("_rev").cast("double").alias("revenue"),
            F.sum(
                F.when(is_f, F.col("_rev")).otherwise(F.lit(0).cast("decimal(30,6)"))
            )
            .cast("double")
            .alias("fulfilled_revenue"),
            F.count(F.when(is_f, F.lit(1))).alias("fulfilled_orders"),
            (F.sum("_disc_sum").cast("double") / F.sum("_disc_cnt")).alias(
                "avg_discount"
            ),
        )
        .withColumn(
            "fulfillment_rate",
            F.col("fulfilled_orders").cast("double") * 100.0 / F.col("n_orders"),
        )
    )
    return agg


# ---------------------------------------------------------------------------
# TPC-H Q1-shaped pricing summary (A4 multi-agg over filtered scan)
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)      AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
                                                              AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE)
                                                              AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_quantity)
                                                              AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_extendedprice)
                                                              AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_discount)
                                                              AS avg_disc,
  COUNT(*)                                                    AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_ORACLE)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: filter → groupBy(2) → 8 aggregates. The shipdate
    predicate is pushed to the parquet scan; partial aggregation happens
    map-side before the 6-group shuffle. The decimal aggregation is the
    measured cost (1.56 s vs 0.25 s with double sums at sf0.1 — exact
    decimal summation is the oracle contract), so when the file layout
    caps the scan at fewer tasks than the session's parallelism the
    guarded fan-out spreads it (1.95 s → 0.73 s; a no-op on a
    production layout — r13, guide §2). The fan-out key must be a
    column the query already reads (l_extendedprice: high-cardinality)
    — keying on l_orderkey would widen ReadSchema by a column shipped
    only to be hashed (guide §2.3: shuffle fewer bytes; pinned by
    test_q1_pushdown_and_pruning)."""
    l = fan_out_scan(
        load(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate") <= F.to_timestamp(F.lit("2001-09-01 00:00:00"))
        ),
        "l_extendedprice",
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity"), "sum_qty"),
        dsum(F.col("l_extendedprice"), "sum_base_price"),
        dsum(disc_price, "sum_disc_price"),
        dsum(disc_price * (1 + F.col("l_tax")), "sum_charge"),
        davg(F.col("l_quantity"), "avg_qty"),
        davg(F.col("l_extendedprice"), "avg_price"),
        davg(F.col("l_discount"), "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q3-shaped top-k revenue (join + agg + orderBy/limit; O4)
# ---------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT
  l_orderkey,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
    AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY 2 DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=_Q3_ORACLE)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dimension filter → two joins → grouped
    revenue → global top-10. Customer side is small after the segment
    filter → broadcast it; the orders⋈lineitem join shuffles on orderkey.
    Top-k is a TakeOrdered physical op — no full sort at scale."""
    cutoff = F.to_timestamp(F.lit("1998-01-01 00:00:00"))
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# TPC-H Q5-shaped multi-join (dimension broadcast chain)
# ---------------------------------------------------------------------------

_Q5_ORACLE = """
SELECT
  n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
    AS revenue
FROM customer
JOIN orders   ON c_custkey  = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


@register("q5_local_supplier_volume", oracle=_Q5_ORACLE)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-table join with a non-key equality (customer and
    supplier in the same nation). region/nation/supplier are broadcast —
    only the customer⋈orders⋈lineitem chain shuffles; Catalyst reorders
    the filters onto the scans."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    j = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return j.groupBy("n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )


# ---------------------------------------------------------------------------
# A1/A2: global scalar MAX (surrogate-key seed / watermark read)
# ---------------------------------------------------------------------------

_MAXID_ORACLE = """
SELECT
  COALESCE(MAX(o_orderkey), 0) AS max_id,
  COUNT(*)                     AS n_rows,
  MAX(o_orderdate)             AS max_ts
FROM orders
"""


@register("a1_max_id_seed", oracle=_MAXID_ORACLE)
def a1_max_id_seed(spark, sf_dir):
    """Surrogate-key seed read: COALESCE(MAX(id),0) + watermark MAX(ts)
    (reference: uber/csv_to_delta.py:61-73, coin_bronze2_to_silver.py:135-140).
    A single-row partial-agg reduction — O(scan) with no data shuffle,
    safe at any scale (only per-partition maxima move)."""
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.coalesce(F.max("o_orderkey"), F.lit(0)).alias("max_id"),
        F.count(F.lit(1)).alias("n_rows"),
        F.max("o_orderdate").alias("max_ts"),
    )


# ---------------------------------------------------------------------------
# P13: LIKE / status filters
# ---------------------------------------------------------------------------

_LIKE_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice AS totalprice
FROM orders
WHERE o_orderpriority LIKE '%URGENT%' AND o_orderstatus <> 'P'
"""


@register("p13_status_like_filter", oracle=_LIKE_ORACLE)
def p13_status_like_filter(spark, sf_dir):
    """Status equality + LIKE pattern filters (reference:
    uber/silver_to_gold.py:49-51,83-92). StringContains pushes to the
    parquet reader as a scan predicate."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").like("%URGENT%") & (F.col("o_orderstatus") != "P")
    ).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_totalprice").alias("totalprice"),
    )


# ---------------------------------------------------------------------------
# P14: CASE/WHEN time bucketing (uber TimeZone / RushHour semantics)
# ---------------------------------------------------------------------------

_BUCKET_ORACLE = """
SELECT
  CASE WHEN hour(ts) >= 6  AND hour(ts) <= 12 THEN 'Morning'
       WHEN hour(ts) >  12 AND hour(ts) <= 18 THEN 'Afternoon'
       WHEN hour(ts) >  18                    THEN 'Evenings'
       ELSE 'LateNights' END                       AS time_zone,
  CASE WHEN (hour(ts) >= 7 AND hour(ts) <= 10)
         OR (hour(ts) >= 15 AND hour(ts) <= 18) THEN 1 ELSE 0 END AS rush_hour,
  COUNT(*)                                            AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)   AS total_value,
  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(value) AS avg_value
FROM events
GROUP BY 1, 2
"""


@register("p14_time_bucket_case", oracle=_BUCKET_ORACLE)
def p14_time_bucket_case(spark, sf_dir):
    """CASE/WHEN derivation with the reference's exact bucket boundaries
    (uber/bronze2_to_silver.py:119-130: Morning [6,12], Afternoon (12,18],
    Evenings (18,∞), LateNights otherwise; RushHour = [7,10] ∪ [15,18])."""
    e = load(spark, sf_dir, "events")
    hr = F.hour("ts")
    time_zone = (
        F.when((hr >= 6) & (hr <= 12), "Morning")
        .when((hr > 12) & (hr <= 18), "Afternoon")
        .when(hr > 18, "Evenings")
        .otherwise("LateNights")
    )
    rush = F.when(((hr >= 7) & (hr <= 10)) | ((hr >= 15) & (hr <= 18)), 1).otherwise(0)
    return (
        e.select(time_zone.alias("time_zone"), rush.alias("rush_hour"), "value")
        .groupBy("time_zone", "rush_hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "total_value"),
            davg(F.col("value"), "avg_value"),
        )
    )


# ---------------------------------------------------------------------------
# O1: latest-checkpoint read (orderBy desc + limit 1)
# ---------------------------------------------------------------------------

_LATEST_ORACLE = """
SELECT event_id, ts, event_type, value
FROM events
ORDER BY ts DESC, event_id DESC
LIMIT 1
"""


@register("o1_latest_checkpoint", oracle=_LATEST_ORACLE)
def o1_latest_checkpoint(spark, sf_dir):
    """Newest-row read, the control-table pattern (reference:
    coin/convert_to_delta.py:52 — orderBy(run_at desc).limit(1)).
    Physical plan is TakeOrderedAndProject: no global sort."""
    e = load(spark, sf_dir, "events")
    return (
        e.orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(1)
        .select("event_id", "ts", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# U1: union-by-name with missing columns
# ---------------------------------------------------------------------------

_UNION_ORACLE = """
SELECT c_name AS name, c_acctbal AS acctbal, c_mktsegment AS mktsegment,
       'customer' AS side
FROM customer
UNION ALL
SELECT s_name, s_acctbal, CAST(NULL AS VARCHAR), 'supplier'
FROM supplier
"""


@register("u1_union_by_name", oracle=_UNION_ORACLE)
def u1_union_by_name(spark, sf_dir):
    """Schema-tolerant union (reference: 005_send_alert_hourly.py:112-114,
    unionByName(allowMissingColumns=True)); missing columns null-filled."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.lit("customer").alias("side"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("side"),
    )
    return c.unionByName(s, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# A13: distinct / count(DISTINCT)
# ---------------------------------------------------------------------------

_DISTINCT_ORACLE = """
SELECT
  COUNT(DISTINCT o_custkey)       AS n_customers,
  COUNT(DISTINCT o_orderpriority) AS n_priorities,
  COUNT(DISTINCT o_orderstatus)   AS n_statuses
FROM orders
"""


@register("a13_count_distinct", oracle=_DISTINCT_ORACLE)
def a13_count_distinct(spark, sf_dir):
    """Exact distinct counts (reference: 005_send_alert_hourly.py:247-248).
    Spark expands multi-distinct into an Expand + two-stage agg; for
    cardinality estimation at 100 TB prefer approx_count_distinct (HLL)."""
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


# ---------------------------------------------------------------------------
# Parity-plus: ROLLUP (not in the reference; free in Spark + DuckDB)
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("agg_rollup_subtotals", oracle=_ROLLUP_ORACLE)
def agg_rollup_subtotals(spark, sf_dir):
    """Hierarchical subtotals via ROLLUP — parity-plus beyond the
    reference's plain groupBy (SURVEY.md §2.4 'not present' row)."""
    # guarded fan-out before Expand×3 + the decimal partial agg (q1's
    # profile); keyed on the three columns the rollup already reads
    # (~300 distinct combos spread 32 partitions fine) — r13, guide §2
    l = fan_out_scan(
        load(spark, sf_dir, "lineitem"),
        "l_returnflag", "l_linestatus", "l_quantity",
    )
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("l_quantity"), "sum_qty"),
    )
