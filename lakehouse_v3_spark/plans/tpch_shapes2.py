"""Remaining TPC-H query shapes, adapted to the driver's reduced schema
(no partsupp; no shipmode/commitdate/receiptdate columns).

Each query keeps the *optimizer shape* of its TPC-H namesake — the join
topology, subquery class (scalar / EXISTS / NOT IN / HAVING), and
aggregation pattern — re-targeted at the columns the fixtures do have.
Together with tpch_shapes.py this covers all 22 classic shapes.

Scale notes are per-query docstrings: every fact-side join runs on the
shuffle-partitioned lineitem scan with dimension sides broadcast, so the
plans survive a 100×/1000× fact scale-up unchanged.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io_utils import load
from . import dsum, register

# ---------------------------------------------------------------------------
# Q6: single-scan predicate revenue (pushdown showcase)
# ---------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))) AS DOUBLE), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=_Q6_ORACLE)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: pure scan-filter-aggregate. All four predicates reach the
    parquet reader (PushedFilters) so at 100 TB this is an embarrassingly
    parallel scan with map-side partial aggregation and a 1-row shuffle."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        F.round(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(30,6)")).cast(
                "double"
            ),
            4,
        ).alias("revenue")
    )


# ---------------------------------------------------------------------------
# Q7: bi-directional nation-pair shipping volume
# ---------------------------------------------------------------------------

_Q7_ORACLE = """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       strftime(l.l_shipdate, '%Y') AS l_year,
       ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6))) AS DOUBLE), 4) AS revenue
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey
JOIN nation nc   ON c.c_nationkey = nc.n_nationkey
JOIN nation ns   ON s.s_nationkey = ns.n_nationkey
WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
    OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY ns.n_name, nc.n_name, strftime(l.l_shipdate, '%Y')
"""


@register("q7_nation_volume_shipping", oracle=_Q7_ORACLE)
def q7_nation_volume_shipping(spark, sf_dir):
    """TPC-H Q7: 6-way star join with a disjunctive cross-dimension
    predicate. Dimensions (supplier/customer/nation) broadcast; only the
    lineitem⋈orders join shuffles. The nation-pair filter lands after the
    broadcasts, so the fact scan is pruned before the big join."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nc = n.select(F.col("n_nationkey").alias("_ck"), F.col("n_name").alias("cust_nation"))
    ns = n.select(F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation"))
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(nc), c.c_nationkey == F.col("_ck"))
        .join(F.broadcast(ns), s.s_nationkey == F.col("_sk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast("decimal(30,6)")
    return j.groupBy(
        "supp_nation", "cust_nation", F.date_format("l_shipdate", "yyyy").alias("l_year")
    ).agg(F.round(F.sum(rev).cast("double"), 4).alias("revenue"))


# ---------------------------------------------------------------------------
# Q8: market share of one supplier-nation inside one customer-region
# ---------------------------------------------------------------------------

_Q8_ORACLE = """
WITH all_orders AS (
  SELECT strftime(o.o_orderdate, '%Y') AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         ns.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
  JOIN region r   ON nc.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
  JOIN part p     ON l.l_partkey = p.p_partkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
       ROUND(CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END AS DECIMAL(30,6))) AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(30,6))) AS DOUBLE), 6) AS mkt_share
FROM all_orders GROUP BY o_year
"""


@register("q8_market_share", oracle=_Q8_ORACLE)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8: 8-way join, then a conditional-sum / total-sum ratio per
    year. Every dimension broadcasts; the only shuffles are
    lineitem⋈orders and the final tiny groupBy."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    nc = n.select(F.col("n_nationkey").alias("_ck"), F.col("n_regionkey").alias("_crk"))
    ns = n.select(F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation"))
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(p, l.l_partkey == p.p_partkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), c.c_nationkey == F.col("_ck"))
        .join(F.broadcast(r), F.col("_crk") == r.r_regionkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), s.s_nationkey == F.col("_sk"))
    )
    vol = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    nat = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    return j.groupBy(F.date_format("o_orderdate", "yyyy").alias("o_year")).agg(
        F.round(
            F.sum(nat.cast("decimal(30,6)")).cast("double")
            / F.sum(vol.cast("decimal(30,6)")).cast("double"),
            6,
        ).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# Q9: product-line profit by supplier nation and year
# ---------------------------------------------------------------------------

_Q9_ORACLE = """
SELECT ns.n_name AS nation, strftime(o.o_orderdate, '%Y') AS o_year,
       ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6))) AS DOUBLE), 4) AS sum_profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%widget%'
GROUP BY ns.n_name, strftime(o.o_orderdate, '%Y')
"""


@register("q9_product_type_profit", oracle=_Q9_ORACLE)
def q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 (profit := discounted revenue; no ps_supplycost in the
    fixtures): LIKE-filtered part dimension drives a semi-selective fact
    join, grouped by (nation, year). The part filter broadcasts, so at
    scale the lineitem scan is reduced by a broadcast hash join before
    the orders shuffle join."""
    l = load(spark, sf_dir, "lineitem")
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_nk"), F.col("n_name").alias("nation")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == F.col("_nk"))
        .join(o, l.l_orderkey == o.o_orderkey)
    )
    profit = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast("decimal(30,6)")
    return j.groupBy("nation", F.date_format("o_orderdate", "yyyy").alias("o_year")).agg(
        F.round(F.sum(profit).cast("double"), 4).alias("sum_profit")
    )


# ---------------------------------------------------------------------------
# Q10: returned-item revenue per customer (one quarter)
# ---------------------------------------------------------------------------

_Q10_ORACLE = """
SELECT c.c_custkey, c.c_name, n.n_name AS nation, c.c_acctbal,
       ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6))) AS DOUBLE), 4) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
"""


@register("q10_returned_items", oracle=_Q10_ORACLE)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10: quarter-windowed orders join return-flagged lineitems,
    grouped per customer. Both fact-side filters push to the scans; the
    customer/nation dimensions broadcast."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-04-01 00:00:00")))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_nk"), F.col("n_name").alias("nation")
    )
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == F.col("_nk"))
    )
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast("decimal(30,6)")
    return j.groupBy("c_custkey", "c_name", "nation", "c_acctbal").agg(
        F.round(F.sum(rev).cast("double"), 4).alias("revenue")
    )


# ---------------------------------------------------------------------------
# Q11: important supply values (global-fraction HAVING)
# ---------------------------------------------------------------------------

_Q11_ORACLE = """
WITH supply AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS part_value
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_5'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, ROUND(part_value, 4) AS part_value
FROM supply
WHERE part_value > (SELECT SUM(part_value) * 0.005 FROM supply)
"""


@register("q11_important_stock", oracle=_Q11_ORACLE)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape (lineitem stands in for partsupp): per-part value
    within one nation, kept only when above a fraction of the nation
    total — a scalar subquery over the same aggregate. The aggregate is
    computed once and reused; the global total is a 1-row broadcast,
    not a driver collect, so the plan is a single shuffle at any scale."""
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    supply = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(30,6)")).cast("double").alias("part_value"))
    )
    total = supply.agg((F.sum("part_value") * F.lit(0.005)).alias("_thr"))
    return (
        supply.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("_thr"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("part_value", 4).alias("part_value"),
        )
    )


# ---------------------------------------------------------------------------
# Q12: shipping-delay buckets vs order priority
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 60
            THEN 'SLOW' ELSE 'FAST' END AS ship_bucket,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
"""


@register("q12_ship_delay_priority", oracle=_Q12_ORACLE)
def q12_ship_delay_priority(spark, sf_dir):
    """TPC-H Q12 shape (ship-delay bucket replaces l_shipmode, which the
    fixtures lack): join + CASE bucketing + dual conditional counts.
    One fact shuffle; the 2-row result needs no further exchange."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    j = l.join(o, l.l_orderkey == o.o_orderkey)
    bucket = F.when(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60, "SLOW"
    ).otherwise("FAST")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy(bucket.alias("ship_bucket")).agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
    )


# ---------------------------------------------------------------------------
# Q14: promo revenue share in one month
# ---------------------------------------------------------------------------

_Q14_ORACLE = """
SELECT ROUND(
  100.0 * CAST(SUM(CAST(CASE WHEN p.p_type = 'PROMO'
                 THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END AS DECIMAL(30,6))) AS DOUBLE)
        / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6))) AS DOUBLE), 6) AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


@register("q14_promo_effect", oracle=_Q14_ORACLE)
def q14_promo_effect(spark, sf_dir):
    """TPC-H Q14: month-windowed fact scan, broadcast part join,
    conditional-sum ratio — a single-pass global aggregate."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-03-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01 00:00:00")))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = l.join(p, l.l_partkey == p.p_partkey)
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return j.agg(
        F.round(
            F.lit(100.0)
            * F.sum(promo.cast("decimal(30,6)")).cast("double")
            / F.sum(rev.cast("decimal(30,6)")).cast("double"),
            6,
        ).alias("promo_revenue")
    )


# ---------------------------------------------------------------------------
# Q15: top supplier(s) by quarterly revenue (ties kept)
# ---------------------------------------------------------------------------

_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, ROUND(r.total_revenue, 4) AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", oracle=_Q15_ORACLE)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: a reused CTE (revenue view) compared against its own
    MAX — computed once, max broadcast back, ties preserved (the window
    max-join formulation, not orderBy+limit which would drop ties)."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01 00:00:00")))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum((F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast("decimal(30,6)"))
        .cast("double")
        .alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.round("total_revenue", 4).alias("total_revenue"))
    )


# ---------------------------------------------------------------------------
# Q16: supplier counts per (brand, type, size) with NOT-IN exclusion
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 14, 23, 45, 49)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register("q16_parts_supplier_counts", oracle=_Q16_ORACLE)
def q16_parts_supplier_counts(spark, sf_dir):
    """TPC-H Q16 (lineitem stands in for partsupp): NOT IN → left-anti
    join against a broadcast exclusion set, then COUNT(DISTINCT) per
    part attribute triple. The distinct runs as a two-phase partial
    aggregate — no driver-side set building."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(1, 14, 23, 45, 49))
    )
    l = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    j = l.join(bad, l.l_suppkey == bad.s_suppkey, "left_anti").join(
        p, F.col("l_partkey") == p.p_partkey
    )
    return j.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


# ---------------------------------------------------------------------------
# Q19: disjunction of conjunctive brand/size/quantity predicates
# ---------------------------------------------------------------------------

_Q19_ORACLE = """
SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6))) AS DOUBLE), 4) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
"""


@register("q19_disjunctive_revenue", oracle=_Q19_ORACLE)
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19: OR of three conjunctive clauses spanning both join
    sides. Catalyst extracts the common part-side disjuncts below the
    broadcast join; the residual mixed predicate evaluates post-join
    inside whole-stage codegen."""
    l = load(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = l.join(p, l.l_partkey == p.p_partkey)
    clause = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= smax)
        & (F.col("l_quantity") >= qlo)
        & (F.col("l_quantity") <= qhi)
    )
    j = j.filter(
        clause("Brand#12", 5, 1, 11) | clause("Brand#23", 10, 10, 20) | clause("Brand#3", 15, 20, 30)
    )
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast("decimal(30,6)")
    return j.agg(F.round(F.sum(rev).cast("double"), 4).alias("revenue"))


# ---------------------------------------------------------------------------
# Q20: suppliers shipping above-average volume of PROMO parts
# ---------------------------------------------------------------------------

_Q20_ORACLE = """
WITH shipped AS (
  SELECT l.l_suppkey,
         CAST(SUM(CAST(l.l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS promo_qty
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_type = 'PROMO'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l.l_suppkey
)
SELECT s.s_name, n.n_name AS nation, ROUND(sh.promo_qty, 2) AS promo_qty
FROM supplier s
JOIN shipped sh ON s.s_suppkey = sh.l_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE sh.promo_qty > (SELECT AVG(promo_qty) FROM shipped)
"""


@register("q20_excess_promo_shippers", oracle=_Q20_ORACLE)
def q20_excess_promo_shippers(spark, sf_dir):
    """TPC-H Q20 shape (shipped-quantity threshold replaces the partsupp
    availqty correlate): aggregate → compare to its own scalar AVG →
    semi-select suppliers. Threshold joins as a 1-row broadcast."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    shipped = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double").alias("promo_qty"))
    )
    avg_thr = shipped.agg(F.avg("promo_qty").alias("_thr"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_nk"), F.col("n_name").alias("nation")
    )
    return (
        shipped.join(F.broadcast(avg_thr))
        .filter(F.col("promo_qty") > F.col("_thr"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == F.col("_nk"))
        .select("s_name", "nation", F.round("promo_qty", 2).alias("promo_qty"))
    )


# ---------------------------------------------------------------------------
# Q21: suppliers who shipped last on multi-supplier finished orders
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
WITH multi AS (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY l_orderkey
  HAVING COUNT(DISTINCT l_suppkey) >= 2
),
last_ship AS (
  SELECT l.l_orderkey, MAX(l.l_shipdate) AS max_ship
  FROM lineitem l JOIN multi m ON l.l_orderkey = m.l_orderkey
  GROUP BY l.l_orderkey
)
SELECT s.s_name, CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT) AS numwait
FROM lineitem l
JOIN last_ship ls ON l.l_orderkey = ls.l_orderkey AND l.l_shipdate = ls.max_ship
JOIN orders o     ON o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
JOIN supplier s   ON s.s_suppkey = l.l_suppkey
GROUP BY s.s_name
"""


@register("q21_waiting_suppliers", oracle=_Q21_ORACLE)
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (last-to-ship supplier on multi-supplier 'F'
    orders stands in for the commit/receipt-date lateness correlate —
    columns the fixtures lack). Two self-aggregations of lineitem feed
    an argmax join-back; all three lineitem passes share one scan and
    shuffle on l_orderkey, so AQE reuses the exchange."""
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    multi = (
        l.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("_ns"))
        .filter(F.col("_ns") >= 2)
        .select("l_orderkey")
    )
    last_ship = (
        l.join(multi.withColumnRenamed("l_orderkey", "_mk"), l.l_orderkey == F.col("_mk"))
        .groupBy(l.l_orderkey)
        .agg(F.max("l_shipdate").alias("max_ship"))
        .withColumnRenamed("l_orderkey", "_lk")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    blamed = l.join(
        last_ship,
        (l.l_orderkey == F.col("_lk")) & (l.l_shipdate == F.col("max_ship")),
    ).join(o, l.l_orderkey == o.o_orderkey)
    return (
        blamed.join(s, l.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct(l.l_orderkey).alias("numwait"))
    )
