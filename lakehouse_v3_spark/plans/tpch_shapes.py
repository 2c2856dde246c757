"""Broader TPC-H-shaped relational coverage: EXISTS/NOT-EXISTS semi
joins, HAVING, outer-join distributions, min-per-group correlated
lookups — the optimizer paths (decorrelation, semi/anti rewrites,
aggregate-then-join) a complete engine must handle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io_utils import load
from . import dsum, register

# ---------------------------------------------------------------------------
# Q4 shape: EXISTS → left-semi join
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


@register("q4_order_priority_exists", oracle=_Q4_ORACLE)
def q4_order_priority_exists(spark, sf_dir):
    """TPC-H Q4: EXISTS subquery = left-semi join (no row multiplication,
    early termination per key). The date filter prunes the orders scan."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
    )
    l = load(spark, sf_dir, "lineitem")
    semi = o.join(
        l, (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate), "left_semi"
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# ---------------------------------------------------------------------------
# Q13 shape: left outer join + count distribution
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
"""


@register("q13_customer_distribution", oracle=_Q13_ORACLE)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: outer join with a join-side predicate (kept in the ON
    clause, not a post-filter — different semantics!) then a two-level
    count distribution."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# Q18 shape: HAVING on a grouped sum, then join back
# ---------------------------------------------------------------------------

_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 150
)
SELECT c_name, o.o_orderkey, o.o_orderdate,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS total_qty
FROM orders o
JOIN big       ON o.o_orderkey = big.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c_name, o.o_orderkey, o.o_orderdate
"""


@register("q18_large_volume_orders", oracle=_Q18_ORACLE)
def q18_large_volume_orders(spark, sf_dir):
    """TPC-H Q18: HAVING (post-aggregation filter) producing a key set
    that then drives a semi-style join. The key set is NOT force-
    broadcast: with this threshold it is a constant fraction of all
    orders (~23% — 339k keys at sf1, unbounded at 100 TB), so pinning
    it to a broadcast would grow the driver-collected build side
    linearly with the fact table and eventually OOM the driver. A plain
    shuffle join on l_orderkey reuses the Exchange the aggregate
    already produced, and AQE still demotes to broadcast at runtime
    when the filtered set is genuinely small."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    j = (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(l.alias("li"), F.col("li.l_orderkey") == o.o_orderkey)
    )
    return j.groupBy("c_name", "o_orderkey", "o_orderdate").agg(
        dsum(F.col("li.l_quantity"), "total_qty")
    )


# ---------------------------------------------------------------------------
# Q22 shape: NOT EXISTS (anti join) + scalar AVG subquery
# ---------------------------------------------------------------------------

_Q22_ORACLE = """
WITH avg_bal AS (
  SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
)
SELECT c_mktsegment,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT a FROM avg_bal)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
"""


@register("q22_global_sales_opportunity", oracle=_Q22_ORACLE)
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: scalar AVG subquery (driver-collected, the
    reference's scalar-subquery-by-collect pattern) + NOT EXISTS as a
    left-anti join.

    avg(c_acctbal): doubles summed by Spark vs DuckDB could differ at
    1 ulp, but the threshold only matters if a customer's balance sits
    within 1e-9 of it — account balances have 2 decimals, so the
    comparison is stable across engines."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(30,6)")).cast("double") / F.count("c_acctbal")).alias("a")
    ).collect()[0]["a"]
    rich = c.filter(F.col("c_acctbal") > F.lit(avg_bal))
    no_orders = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return no_orders.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        dsum(F.col("c_acctbal"), "totacctbal"),
    )


# ---------------------------------------------------------------------------
# Q2 shape: min-per-group correlated lookup (argmin join-back)
# ---------------------------------------------------------------------------

_Q2_ORACLE = """
WITH min_price AS (
  SELECT p_type, MIN(p_retailprice) AS minp
  FROM part GROUP BY p_type
)
SELECT p.p_type, p.p_partkey, p.p_name, p.p_retailprice AS price
FROM part p JOIN min_price m
  ON p.p_type = m.p_type AND p.p_retailprice = m.minp
"""


@register("q2_min_per_group_lookup", oracle=_Q2_ORACLE)
def q2_min_per_group_lookup(spark, sf_dir):
    """TPC-H Q2 core: rows achieving the per-group minimum — aggregate
    then equi-join back on (group, min). Unlike a row_number window this
    keeps ALL ties, matching the SQL subquery semantics."""
    p = load(spark, sf_dir, "part")
    m = p.groupBy(F.col("p_type").alias("_t")).agg(F.min("p_retailprice").alias("minp"))
    j = p.join(
        F.broadcast(m),
        (p.p_type == F.col("_t")) & (p.p_retailprice == F.col("minp")),
    )
    return j.select("p_type", "p_partkey", "p_name", F.col("p_retailprice").alias("price"))


# ---------------------------------------------------------------------------
# Funnel: ordered-step conversion per user (events table)
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup'   THEN ts END) AS t_signup,
         MIN(CASE WHEN event_type = 'click'    THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT
  CAST(COUNT(*) AS BIGINT)                             AS n_users,
  CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS signed_up,
  CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
            THEN 1 ELSE 0 END) AS BIGINT)              AS clicked_after_signup,
  CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
             AND t_purchase > t_click THEN 1 ELSE 0 END) AS BIGINT)
                                                       AS purchased_after_click
FROM firsts
"""


@register("funnel_ordered_steps", oracle=_FUNNEL_ORACLE)
def funnel_ordered_steps(spark, sf_dir):
    """Ordered funnel (signup → click → purchase) via conditional
    first-timestamps — one scan, one groupBy, no self-joins (the
    n-way-join funnel anti-pattern)."""
    e = load(spark, sf_dir, "events")
    first = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    per_user = e.groupBy("user_id").agg(
        first("signup").alias("t_signup"),
        first("click").alias("t_click"),
        first("purchase").alias("t_purchase"),
    )
    signed = F.col("t_signup").isNotNull()
    clicked = signed & (F.col("t_click") > F.col("t_signup"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        flag(signed).alias("signed_up"),
        flag(clicked).alias("clicked_after_signup"),
        flag(purchased).alias("purchased_after_click"),
    )
