"""Statistical & skew-path extras: bivariate regression from exact
moments (with a built-in ``regr_slope`` in-query audit), sketch-based
heavy hitters (``freqItems`` audited against exact counts), a
grouped-agg Pandas UDF (the third Arrow UDF shape next to scalar
pandas_udf and grouped-map applyInPandas), higher-order array functions
over the embedding column, and an explicit salted skew JOIN
(replicated-dimension form — complements ``skew_salted_hot_key_agg``
which covers the aggregation form).

All floating outputs follow the catalog conventions (plans/__init__.py):
exact decimal/integer accumulation wherever a sum crosses engines, then
identical double arithmetic on both sides, then ROUND.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ..io_utils import load
from ..operators.skew import salted_join_hot_keys
from . import register

# ---------------------------------------------------------------------------
# Bivariate regression per group, from exact decimal moments
# ---------------------------------------------------------------------------

_REGR_ORACLE = """
WITH m AS (
  SELECT event_type,
         COUNT(*)                                              AS n,
         CAST(SUM(CAST(EXTRACT(hour FROM ts) AS DECIMAL(30,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)     AS sy,
         CAST(SUM(CAST(EXTRACT(hour FROM ts) * EXTRACT(hour FROM ts) AS DECIMAL(30,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(CAST(value AS DECIMAL(15,6)) * CAST(value AS DECIMAL(15,6)) AS DECIMAL(30,6))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(EXTRACT(hour FROM ts) * CAST(value AS DECIMAL(15,6)) AS DECIMAL(30,6))) AS DOUBLE) AS sxy
  FROM events GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)                         AS slope,
       ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)       AS intercept,
       ROUND((n * sxy - sx * sy) / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_xy,
       TRUE AS builtin_ok
FROM m
"""


@register("stat_regression_per_type", oracle=_REGR_ORACLE)
def stat_regression_per_type(spark, sf_dir):
    """OLS slope/intercept and Pearson correlation of event value vs
    hour-of-day, per event type — computed from exact decimal moments
    (n, Σx, Σy, Σx², Σy², Σxy) so both engines see bit-identical sums,
    then identical IEEE double arithmetic. ``builtin_ok`` audits Spark's
    native ``regr_slope`` against the moment-derived slope (1e-9 bound);
    the oracle emits literal TRUE. One scan, one |groups|-sized shuffle —
    the moments form is exactly how a 100 TB engine computes regression
    (partial moments combine associatively across partitions)."""
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("double").alias("x"),
        F.col("value").alias("y"),
    )
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(30,6)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(30,6)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(30,6)")).cast("double").alias("sxx"),
        F.sum(
            (F.col("y").cast("decimal(15,6)") * F.col("y").cast("decimal(15,6)"))
            .cast("decimal(30,6)")
        ).cast("double").alias("syy"),
        F.sum(
            (F.col("x") * F.col("y").cast("decimal(15,6)")).cast("decimal(30,6)")
        ).cast("double").alias("sxy"),
        F.regr_slope("y", "x").alias("builtin_slope"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "event_type",
        n.cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6
        ).alias("corr_xy"),
        (F.abs(F.col("builtin_slope") - slope) < 1e-9).alias("builtin_ok"),
    )


# ---------------------------------------------------------------------------
# Heavy hitters: freqItems sketch audited against exact counts
# ---------------------------------------------------------------------------

_HH_SUPPORT = 0.1

_HH_ORACLE = f"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows, TRUE AS in_sketch
FROM events
GROUP BY event_type
HAVING COUNT(*) > {_HH_SUPPORT} * (SELECT COUNT(*) FROM events)
"""


@register("heavy_hitters_freqitems", oracle=_HH_ORACLE)
def heavy_hitters_freqitems(spark, sf_dir):
    """Approximate heavy hitters: single-pass Karp/Misra-Gries sketch
    (``df.stat.freqItems``) audited against the exact per-key counts.
    The sketch guarantees every item with frequency > support appears in
    its result, so ``in_sketch`` is provably TRUE for each row the exact
    side keeps — the oracle emits literal TRUE. At 100 TB the sketch is
    one scan with an O(1/support)-sized accumulator per partition and no
    shuffle of the key space; the exact count here is the audit, not the
    scale path."""
    e = load(spark, sf_dir, "events")
    hh = set(
        e.stat.freqItems(["event_type"], support=_HH_SUPPORT)
        .collect()[0]["event_type_freqItems"]
    )
    total = e.count()  # scalar; drives the literal threshold below
    exact = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_rows"))
    return exact.filter(F.col("n_rows") > _HH_SUPPORT * total).select(
        "event_type",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("event_type").isin(sorted(hh)).alias("in_sketch"),
    )


# ---------------------------------------------------------------------------
# Grouped-agg Pandas UDF: harmonic mean per order priority
# ---------------------------------------------------------------------------

_HMEAN_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(COUNT(*) / SUM(1.0 / CAST(o_totalprice AS DOUBLE)), 4) AS hmean_price
FROM orders
GROUP BY o_orderpriority
"""


@register("udaf_harmonic_mean", oracle=_HMEAN_ORACLE)
def udaf_harmonic_mean(spark, sf_dir):
    """Custom aggregate as a GROUPED_AGG pandas_udf (the Arrow UDAF
    shape — one pandas Series in, one scalar out per group; scalar
    pandas_udf and grouped-map applyInPandas are covered elsewhere).
    Harmonic mean of order price per priority; prices are strictly
    positive so the reciprocal sum is well-defined. ROUND(4) absorbs the
    reciprocal-summation-order ulp between engines."""

    @F.pandas_udf("double")
    def hmean(s: pd.Series) -> float:
        return float(len(s) / (1.0 / s).sum())

    # Spark disallows mixing GROUPED_AGG pandas UDFs with JVM aggregates
    # in one agg(), so the row count is a second Arrow UDAF.
    @F.pandas_udf("long")
    def pcount(s: pd.Series) -> int:
        return len(s)

    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            pcount(F.col("o_totalprice")).alias("n_orders"),
            F.round(hmean(F.col("o_totalprice")), 4).alias("hmean_price"),
        )
    )


# ---------------------------------------------------------------------------
# Higher-order array functions over the embedding column
# ---------------------------------------------------------------------------

_HOF_ORACLE = """
SELECT vec_id,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
       ROUND(CAST(list_sum(list_transform(embedding,
             x -> CAST(ROUND(ABS(CAST(x AS DOUBLE)) * 1000000) AS BIGINT))) AS DOUBLE)
             / 1000000, 6) AS l1_norm,
       ROUND(CAST(list_sum(list_transform(embedding,
             x -> CAST(ROUND(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS DOUBLE)
             / 1000000, 6) AS l2_sq
FROM embeddings
WHERE vec_id % 10 = 0
"""


@register("array_hof_embedding_stats", oracle=_HOF_ORACLE)
def array_hof_embedding_stats(spark, sf_dir):
    """Higher-order array functions — transform / filter / aggregate —
    over the 64-dim embedding column, fully JVM-side (no UDF, stays in
    codegen). Per-element quantization to integer micro-units before the
    fold makes the sums exact integers, so engine fold order (Spark
    left-fold vs DuckDB list_sum) cannot produce ulp drift. This is the
    vectorized per-row compute pattern the ANN queries build on."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    as_micro_abs = "x -> cast(round(abs(cast(x as double)) * 1000000) as bigint)"
    as_micro_sq = "x -> cast(round(cast(x as double) * cast(x as double) * 1000000) as bigint)"
    return emb.select(
        "vec_id",
        F.size(F.expr("filter(embedding, x -> x > 0)")).alias("n_pos"),
        F.round(
            F.expr(
                f"aggregate(transform(embedding, {as_micro_abs}), 0L, (a, x) -> a + x)"
            ).cast("double")
            / 1000000,
            6,
        ).alias("l1_norm"),
        F.round(
            F.expr(
                f"aggregate(transform(embedding, {as_micro_sq}), 0L, (a, x) -> a + x)"
            ).cast("double")
            / 1000000,
            6,
        ).alias("l2_sq"),
    )


# ---------------------------------------------------------------------------
# Salted skew JOIN (replicated-dimension form)
# ---------------------------------------------------------------------------

_SALTED_JOIN_ORACLE = """
SELECT p.p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
"""


@register("skew_salted_replicated_join", oracle=_SALTED_JOIN_ORACLE)
def skew_salted_replicated_join(spark, sf_dir):
    """Explicit skew-join salting: scatter the fact side across 8 salts,
    replicate the dimension side 8× so every (key, salt) bucket finds
    its match, join on (key, salt), then aggregate
    (operators/skew.py:46 salted_join_hot_keys). The result is invariant
    to the salting — the oracle is the plain join — which is the whole
    point: same answer, no straggler partition when one l_partkey is
    hot. Complements AQE's runtime skew split (session.py) for
    deterministic plans / engines without AQE."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join_hot_keys(li, part, "p_partkey", n_salts=8)
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.col("rev").cast("decimal(30,6)")).cast("double").alias("revenue"),
    )
