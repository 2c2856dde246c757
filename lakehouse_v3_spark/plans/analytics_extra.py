"""Parity-plus analytics the reference never needed but a complete
engine must expose (SURVEY.md §2 'not present' rows): pivot, cube,
INTERSECT/EXCEPT, exact percentiles/median, moment-based stddev,
correlated subqueries.

Statistical aggregates are computed from decimal power sums (Σx, Σx²)
so both engines derive identical doubles — never from engine-internal
streaming variance (Welford order-dependence would break the hash gate).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io_utils import load
from . import register

# ---------------------------------------------------------------------------
# Pivot
# ---------------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity END AS DECIMAL(30,6))) AS DOUBLE) AS qty_O,
       CAST(SUM(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity END AS DECIMAL(30,6))) AS DOUBLE) AS qty_F
FROM lineitem
GROUP BY l_returnflag
"""


@register("pivot_status_quantity", oracle=_PIVOT_ORACLE)
def pivot_status_quantity(spark, sf_dir):
    """Pivot on a low-cardinality column with explicit value list (the
    scalable form — implicit pivot triggers a distinct-values job)."""
    l = load(spark, sf_dir, "lineitem")
    p = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double"))
    )
    return p.select(
        "l_returnflag", F.col("O").alias("qty_O"), F.col("F").alias("qty_F")
    )


# ---------------------------------------------------------------------------
# Cube
# ---------------------------------------------------------------------------

_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("agg_cube_all_subtotals", oracle=_CUBE_ORACLE)
def agg_cube_all_subtotals(spark, sf_dir):
    """CUBE: all 2^k grouping-set combinations in one pass (Expand +
    single shuffle — not 4 separate scans)."""
    l = load(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n_rows"))


# ---------------------------------------------------------------------------
# INTERSECT / EXCEPT
# ---------------------------------------------------------------------------

_SETOP_ORACLE = """
SELECT 'both' AS side, n_nationkey AS nationkey FROM (
  SELECT c_nationkey AS n_nationkey FROM customer
  INTERSECT
  SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT 'customer_only', n_nationkey FROM (
  SELECT c_nationkey AS n_nationkey FROM customer
  EXCEPT
  SELECT s_nationkey FROM supplier
)
"""


@register("setop_intersect_except", oracle=_SETOP_ORACLE)
def setop_intersect_except(spark, sf_dir):
    """INTERSECT and EXCEPT (distinct semantics) — U2 'not present' row.
    Both compile to aggregate + join, shuffling only the key column."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    both = c.intersect(s).withColumn("side", F.lit("both"))
    only = c.subtract(s).withColumn("side", F.lit("customer_only"))
    return both.unionByName(only).select("side", "nationkey")


# ---------------------------------------------------------------------------
# Exact percentiles / median
# ---------------------------------------------------------------------------

_PCT_ORACLE = """
SELECT o_orderpriority,
       quantile_cont(o_totalprice, 0.5)  AS median_price,
       quantile_cont(o_totalprice, 0.9)  AS p90_price,
       CAST(COUNT(*) AS BIGINT)          AS n
FROM orders
GROUP BY o_orderpriority
"""


@register("percentiles_exact", oracle=_PCT_ORACLE)
def percentiles_exact(spark, sf_dir):
    """Exact interpolated percentiles (Spark `percentile` ==
    DuckDB quantile_cont). At 100 TB switch to percentile_approx
    (t-digest) — declared here as the exact baseline the approximation
    is judged against."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("median_price"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90_price"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Moment-based stddev / variance (deterministic across engines)
# ---------------------------------------------------------------------------

_STDDEV_ORACLE = """
WITH m AS (
  SELECT event_type,
         CAST(COUNT(value) AS BIGINT) AS n,
         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value * value AS DECIMAL(38,12))) AS DOUBLE) AS s2
  FROM events GROUP BY event_type
)
SELECT event_type, n,
       s1 / n AS mean_value,
       sqrt((s2 - s1 * s1 / n) / (n - 1)) AS stddev_value
FROM m
"""


@register("stddev_from_moments", oracle=_STDDEV_ORACLE)
def stddev_moments(spark, sf_dir):
    """Sample stddev from decimal power sums: sqrt((Σx² − (Σx)²/n)/(n−1)).
    Spark's stddev_samp is a streaming (order-dependent) reduction that
    can differ from another engine at 1 ulp; power sums in decimal are
    exact, so both engines compute the identical double."""
    e = load(spark, sf_dir, "events")
    m = e.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("s1"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(38,12)")).cast("double").alias("s2"),
    )
    return m.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mean_value"),
        F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)).alias(
            "stddev_value"
        ),
    )


# ---------------------------------------------------------------------------
# SQL-API verification summary (A15: SQL strings via spark.sql)
# ---------------------------------------------------------------------------

_SQLAPI_ORACLE = """
SELECT o_orderstatus,
       COUNT(*)                         AS n_orders,
       COUNT(DISTINCT o_custkey)        AS n_customers,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total_value,
       MAX(o_orderdate)                 AS latest_order
FROM orders
GROUP BY o_orderstatus
"""


@register("sql_api_summary", oracle=_SQLAPI_ORACLE)
def sql_api_summary(spark, sf_dir):
    """A15: the spark.sql string API over registered views — the
    reference executes many of its verification queries this way
    (004_fact...completeness_mandatory.py:182-189). Catalyst produces
    the same plan as the DataFrame form."""
    from ..io_utils import load

    load(spark, sf_dir, "orders").createOrReplaceTempView("_sql_api_orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               COUNT(*)                  AS n_orders,
               COUNT(DISTINCT o_custkey) AS n_customers,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total_value,
               MAX(o_orderdate)          AS latest_order
        FROM _sql_api_orders
        GROUP BY o_orderstatus
        """
    )


# ---------------------------------------------------------------------------
# Correlated subquery (TPC-H Q17 shape)
# ---------------------------------------------------------------------------

_CORR_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / 7.0 AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_small_orders
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey)
"""


@register("correlated_subquery_q17", oracle=_CORR_ORACLE)
def correlated_subquery_q17(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery (decorrelated by
    Catalyst into an aggregate + join — verify with .explain that no
    per-row subquery survives)."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = l.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("_thresh")
    )
    j = (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(avg_qty, l.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_thresh"))
    )
    return j.agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(30,6)")).cast("double") / 7.0).alias(
            "avg_yearly"
        ),
        F.count(F.lit(1)).alias("n_small_orders"),
    )


# ---------------------------------------------------------------------------
# Unpivot / melt (wide -> long)
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
WITH agg AS (
  SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)      AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price,
         CAST(COUNT(*) AS DOUBLE)                                    AS n_rows
  FROM lineitem
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus, 'sum_qty' AS metric, ROUND(sum_qty, 2) AS value FROM agg
UNION ALL
SELECT l_returnflag, l_linestatus, 'sum_price', ROUND(sum_price, 2) FROM agg
UNION ALL
SELECT l_returnflag, l_linestatus, 'n_rows', ROUND(n_rows, 2) FROM agg
"""


@register("unpivot_metrics_long", oracle=_UNPIVOT_ORACLE)
def unpivot_metrics_long(spark, sf_dir):
    """Unpivot/melt (wide metrics -> long key/value rows) via the native
    DataFrame.unpivot operator — the inverse of pivot_status_quantity
    and the standard shape for metric stores / feature logging. Runs as
    an Expand node (one pass, no shuffle beyond the upstream agg); the
    oracle is the UNION ALL definition of the same melt."""
    from . import dsum
    from ..partitioning import fan_out_scan

    # the decimal partial agg is the cost (q1's profile); guarded
    # fan-out when the file layout caps scan parallelism (r13, guide §2).
    # Keyed on a column the agg already reads (high-cardinality price)
    # so the fan-out does not widen ReadSchema (guide §2.3).
    l = fan_out_scan(load(spark, sf_dir, "lineitem"), "l_extendedprice")
    agg = l.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity"), "sum_qty"),
        dsum(F.col("l_extendedprice"), "sum_price"),
        F.count("*").cast("double").alias("n_rows"),
    )
    long = agg.unpivot(
        ["l_returnflag", "l_linestatus"],
        ["sum_qty", "sum_price", "n_rows"],
        "metric",
        "value",
    )
    return long.select(
        "l_returnflag", "l_linestatus", "metric", F.round("value", 2).alias("value")
    )


# ---------------------------------------------------------------------------
# Fixed-bin histogram
# ---------------------------------------------------------------------------

_HIST_ORACLE = """
WITH binned AS (
  SELECT CAST(least(floor(value / 25.0), 19) AS BIGINT) AS bin_idx, value
  FROM events
)
SELECT bin_idx,
       ROUND(CAST(bin_idx AS DOUBLE) * 25.0, 1) AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(value) AS DOUBLE) AS bin_min,
       CAST(MAX(value) AS DOUBLE) AS bin_max
FROM binned
GROUP BY bin_idx
"""


@register("histogram_fixed_bins", oracle=_HIST_ORACLE)
def histogram_fixed_bins(spark, sf_dir):
    """Fixed-width histogram (20 bins of 25 over events.value, top bin
    open): binning is a pure projection, so the whole histogram is one
    scan + one |bins|-sized shuffle — the cheapest possible distribution
    profile at any scale, and the building block for the quality-score
    and audit dashboards."""
    e = load(spark, sf_dir, "events")
    bin_idx = F.least(F.floor(F.col("value") / 25.0), F.lit(19)).cast("long")
    return (
        e.select(bin_idx.alias("bin_idx"), "value")
        .groupBy("bin_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("value").cast("double").alias("bin_min"),
            F.max("value").cast("double").alias("bin_max"),
        )
        .select(
            "bin_idx",
            F.round(F.col("bin_idx").cast("double") * 25.0, 1).alias("bin_lo"),
            "n",
            "bin_min",
            "bin_max",
        )
    )


# ---------------------------------------------------------------------------
# Column profiling (describe-style data audit summary)
# ---------------------------------------------------------------------------

_PROFILE_ORACLE = """
WITH s AS (
  SELECT COUNT(*) AS n_rows,
         COUNT(o_orderkey) AS nn_key,  COUNT(DISTINCT o_orderkey) AS nd_key,
         COUNT(o_custkey) AS nn_cust,  COUNT(DISTINCT o_custkey) AS nd_cust,
         COUNT(o_orderpriority) AS nn_prio, COUNT(DISTINCT o_orderpriority) AS nd_prio,
         ROUND(CAST(MIN(o_totalprice) AS DOUBLE), 2) AS min_price,
         ROUND(CAST(MAX(o_totalprice) AS DOUBLE), 2) AS max_price,
         COUNT(o_totalprice) AS nn_price, COUNT(DISTINCT o_totalprice) AS nd_price
  FROM orders
)
SELECT 'o_orderkey' AS col_name, n_rows,
       CAST(n_rows - nn_key AS BIGINT) AS n_null, CAST(nd_key AS BIGINT) AS n_distinct,
       CAST(NULL AS DOUBLE) AS min_val, CAST(NULL AS DOUBLE) AS max_val FROM s
UNION ALL
SELECT 'o_custkey', n_rows, n_rows - nn_cust, nd_cust, NULL, NULL FROM s
UNION ALL
SELECT 'o_orderpriority', n_rows, n_rows - nn_prio, nd_prio, NULL, NULL FROM s
UNION ALL
SELECT 'o_totalprice', n_rows, n_rows - nn_price, nd_price, min_price, max_price FROM s
"""


@register("profile_table_columns", oracle=_PROFILE_ORACLE)
def profile_table_columns(spark, sf_dir):
    """Describe-style column profile (row count, nulls, distincts,
    numeric min/max) — the discovery pass a data-quality engine runs
    before rules exist (completes the audit story: profile → propose
    rules → enforce). ALL columns profile in ONE scan (a single
    aggregate computes every metric; the per-column rows are unpivoted
    from that one state row), so profiling cost is one pass regardless
    of column count — never a scan per column."""
    o = load(spark, sf_dir, "orders")
    s = o.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("o_orderkey").alias("nn_key"),
        F.countDistinct("o_orderkey").alias("nd_key"),
        F.count("o_custkey").alias("nn_cust"),
        F.countDistinct("o_custkey").alias("nd_cust"),
        F.count("o_orderpriority").alias("nn_prio"),
        F.countDistinct("o_orderpriority").alias("nd_prio"),
        F.round(F.min("o_totalprice").cast("double"), 2).alias("min_price"),
        F.round(F.max("o_totalprice").cast("double"), 2).alias("max_price"),
        F.count("o_totalprice").alias("nn_price"),
        F.countDistinct("o_totalprice").alias("nd_price"),
    )
    null_d = F.lit(None).cast("double")
    rows = [
        ("o_orderkey", "nn_key", "nd_key", null_d, null_d),
        ("o_custkey", "nn_cust", "nd_cust", null_d, null_d),
        ("o_orderpriority", "nn_prio", "nd_prio", null_d, null_d),
        ("o_totalprice", "nn_price", "nd_price", F.col("min_price"), F.col("max_price")),
    ]
    # r14 examined, kept as-is: a single-aggregate + explode-unpivot
    # rewrite (one subtree instead of four union branches) LOST the
    # interleaved A/B at sf0.1 (1.13 s vs 0.77 s min) — planning all
    # four COUNT(DISTINCT)s in one aggregate forces one Expand×5 over
    # every column, while each union branch prunes to ONE distinct
    # column (Expand×2) and the branches share the scan via exchange
    # reuse. The union form is the faster plan at either width.
    parts = [
        s.select(
            F.lit(name).alias("col_name"),
            F.col("n_rows"),
            (F.col("n_rows") - F.col(nn)).cast("long").alias("n_null"),
            F.col(nd).cast("long").alias("n_distinct"),
            mn.alias("min_val"),
            mx.alias("max_val"),
        )
        for name, nn, nd, mn, mx in rows
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Cohort retention (weekly)
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH uw AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
), c AS (
  SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id
)
SELECT c.cohort_week,
       CAST(date_diff('day', c.cohort_week, uw.week) // 7 AS BIGINT) AS week_offset,
       CAST(COUNT(DISTINCT uw.user_id) AS BIGINT) AS n_users
FROM uw JOIN c USING (user_id)
GROUP BY 1, 2
"""


@register("cohort_retention_weekly", oracle=_RETENTION_ORACLE)
def cohort_retention_weekly(spark, sf_dir):
    """Cohort retention: users grouped by first-activity week, counted
    in each later week they return — the standard growth-analytics
    triangle. Three shuffles, all on user_id or the (cohort, offset)
    pair: the distinct user-week grid collapses raw events first (the
    big reduction happens before any join), the cohort min reuses the
    same user_id partitioning, and the final countDistinct runs on the
    already-small grid. No step ever shuffles raw events twice."""
    e = load(spark, sf_dir, "events")
    uw = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    joined = uw.join(cohort, "user_id")
    return joined.groupBy(
        "cohort_week",
        (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
        .cast("long")
        .alias("week_offset"),
    ).agg(F.countDistinct("user_id").cast("long").alias("n_users"))
