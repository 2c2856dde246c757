"""Cleaning / imputation / validity queries: dirty-null casts, watermark
and day-window incremental filters, multi-predicate validity, fillna
variants (constant / computed mean / mode), null-or-blank predicates.

SURVEY.md §2.2 items P4, P7-P11, P15-P17.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io_utils import load
from . import davg, register

# ---------------------------------------------------------------------------
# P4: typed cast with dirty-null normalization (+ JSON field extraction)
# ---------------------------------------------------------------------------

_P4_ORACLE = """
SELECT
  event_id,
  CAST(CASE WHEN lower(trim(json_extract_string(props, '$.k')))
              IN ('null', 'none', 'nan', '')
            THEN NULL
            ELSE json_extract_string(props, '$.k') END AS DOUBLE) AS k_val
FROM events
"""


@register("p4_dirty_null_cast", oracle=_P4_ORACLE)
def p4_dirty_null_cast(spark, sf_dir):
    """Dirty-null normalization then typed cast (reference:
    uber/csv_to_delta.py:45-52 — map "null"/"none"/"nan"/"" → NULL, cast
    DOUBLE), applied to a JSON-extracted field. Pure JVM expressions —
    whole-stage codegen, no UDF."""
    e = load(spark, sf_dir, "events")
    raw = F.get_json_object("props", "$.k")
    clean = F.when(F.lower(F.trim(raw)).isin("null", "none", "nan", ""), None).otherwise(raw)
    return e.select("event_id", clean.cast("double").alias("k_val"))


# ---------------------------------------------------------------------------
# P7/P8: incremental watermark filters (max-id / max-ts pulled to driver)
# ---------------------------------------------------------------------------

_P7_ORACLE = """
SELECT event_id, user_id, ts
FROM events
WHERE event_id > (SELECT MAX(event_id) - 500 FROM events)
"""


@register("p7_max_id_watermark", oracle=_P7_ORACLE)
def p7_max_id_watermark(spark, sf_dir):
    """Incremental id-watermark filter (reference:
    uber/bronze2_to_silver.py:46-60 — scalar agg(max)+collect, then
    filter(col > lit)). The scalar subquery collapses to one driver-side
    long; the filter pushes down to the scan."""
    e = load(spark, sf_dir, "events")
    max_id = e.agg(F.max("event_id")).collect()[0][0]
    watermark = (max_id or 0) - 500
    return e.filter(F.col("event_id") > F.lit(watermark)).select("event_id", "user_id", "ts")


# ---------------------------------------------------------------------------
# P9: day-window filter relative to the table's max timestamp
# ---------------------------------------------------------------------------

_P9_ORACLE = """
SELECT event_id, user_id, ts, event_type
FROM events
WHERE ts >= (SELECT MAX(ts) - INTERVAL 7 DAY FROM events)
"""


@register("p9_day_window_filter", oracle=_P9_ORACLE)
def p9_day_window_filter(spark, sf_dir):
    """Day-window incremental filter (reference:
    finance_bronze2_to_silver.py:136-146 uses current_date-N; here the
    anchor is MAX(ts) so the result is deterministic for the oracle)."""
    import datetime

    e = load(spark, sf_dir, "events")
    max_ts = e.agg(F.max("ts")).collect()[0][0]
    bound = max_ts - datetime.timedelta(days=7)
    return e.filter(F.col("ts") >= F.lit(bound)).select("event_id", "user_id", "ts", "event_type")


# ---------------------------------------------------------------------------
# P10: multi-predicate validity filter (OHLCV-sanity shape)
# ---------------------------------------------------------------------------

_P10_ORACLE = """
SELECT
  COUNT(*) AS n_rows,
  CAST(SUM(CASE WHEN l_quantity IS NULL OR l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)     AS bad_qty,
  CAST(SUM(CASE WHEN l_extendedprice IS NULL OR l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_price,
  CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.06 THEN 1 ELSE 0 END) AS BIGINT)       AS bad_discount,
  CAST(SUM(CASE WHEN l_tax < 0 THEN 1 ELSE 0 END) AS BIGINT)                                 AS bad_tax,
  CAST(SUM(CASE WHEN l_quantity > 0 AND l_extendedprice > 0
            AND l_discount BETWEEN 0 AND 0.06 AND l_tax >= 0
           THEN 1 ELSE 0 END) AS BIGINT)                                                AS n_valid
FROM lineitem
"""


@register("p10_validity_filter", oracle=_P10_ORACLE)
def p10_validity_filter(spark, sf_dir):
    """Chained validity predicates counted in one pass (reference:
    alphavantage/bronze2_to_silver.py:85-96 — not-null ∧ >0 ∧ bounds).
    Conditional aggregation replaces per-rule rescans — one scan total,
    the SURVEY.md §4 improvement over the reference's per-rule loop."""
    l = load(spark, sf_dir, "lineitem")
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        flag(F.col("l_quantity").isNull() | (F.col("l_quantity") <= 0)).alias("bad_qty"),
        flag(F.col("l_extendedprice").isNull() | (F.col("l_extendedprice") <= 0)).alias("bad_price"),
        flag((F.col("l_discount") < 0) | (F.col("l_discount") > 0.06)).alias("bad_discount"),
        flag(F.col("l_tax") < 0).alias("bad_tax"),
        flag(
            (F.col("l_quantity") > 0)
            & (F.col("l_extendedprice") > 0)
            & F.col("l_discount").between(0, 0.06)
            & (F.col("l_tax") >= 0)
        ).alias("n_valid"),
    )


# ---------------------------------------------------------------------------
# P11: null-or-blank violation predicate over a configured column list
# ---------------------------------------------------------------------------

_P11_ORACLE = """
SELECT
  COUNT(*) AS n_rows,
  CAST(SUM(CASE WHEN text IS NULL OR trim(text) = ''
          OR lang IS NULL OR trim(lang) = ''
          OR source IS NULL OR trim(source) = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
FROM documents
"""


@register("p11_null_or_blank_predicate", oracle=_P11_ORACLE)
def p11_null_or_blank_predicate(spark, sf_dir):
    """OR-reduced completeness predicate over a configured column list
    (reference: 002...completeness_mandatory.py:140-144; note trim()=''
    counts as violation, SURVEY.md §7.4)."""
    from functools import reduce

    d = load(spark, sf_dir, "documents")
    cols = ["text", "lang", "source"]
    pred = reduce(
        lambda a, b: a | b,
        [F.col(c).isNull() | (F.trim(F.col(c)) == "") for c in cols],
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(pred, 1).otherwise(0)).alias("n_violating"),
    )


# ---------------------------------------------------------------------------
# P15/P16/P17: fillna constant / computed mean / mode
# ---------------------------------------------------------------------------

_P15_ORACLE = """
SELECT
  event_id,
  COALESCE(CASE WHEN event_type = 'error' THEN NULL ELSE event_type END,
           'Reason Unknown') AS event_type_filled
FROM events
"""


@register("p15_fillna_constant", oracle=_P15_ORACLE)
def p15_fillna_constant(spark, sf_dir):
    """Constant imputation via fillna dict (reference:
    uber/bronze2_to_silver.py:92-99 — 'Reason Unknown' for missing
    reasons). Nulls are planted by masking 'error' rows first since the
    fixtures are fully populated."""
    e = load(spark, sf_dir, "events")
    masked = e.withColumn(
        "event_type_filled",
        F.when(F.col("event_type") == "error", None).otherwise(F.col("event_type")),
    )
    return masked.fillna({"event_type_filled": "Reason Unknown"}).select(
        "event_id", "event_type_filled"
    )


_P16_ORACLE = """
WITH masked AS (
  SELECT event_id,
         CASE WHEN value < 10 THEN NULL ELSE value END AS v
  FROM events
)
SELECT event_id,
       COALESCE(v, (SELECT CAST(SUM(CAST(v AS DECIMAL(30,6))) AS DOUBLE) / COUNT(v)
                    FROM masked)) AS value_imputed
FROM masked
"""


@register("p16_fillna_mean", oracle=_P16_ORACLE)
def p16_fillna_mean(spark, sf_dir):
    """Mean imputation: one-pass mean collect then fillna (reference:
    uber/bronze2_to_silver.py:101-108). Mean computed with decimal
    accumulation so it is bit-identical to the oracle's."""
    e = load(spark, sf_dir, "events")
    masked = e.select(
        "event_id",
        F.when(F.col("value") < 10, None).otherwise(F.col("value")).alias("v"),
    )
    mean_val = masked.agg(davg(F.col("v"), "m")).collect()[0]["m"]
    return masked.select(
        "event_id", F.coalesce(F.col("v"), F.lit(mean_val)).alias("value_imputed")
    )


_P17_ORACLE = """
WITH masked AS (
  SELECT event_id,
         CASE WHEN value < 10 THEN NULL ELSE event_type END AS et
  FROM events
),
mode_v AS (
  SELECT et FROM masked WHERE et IS NOT NULL
  GROUP BY et ORDER BY COUNT(*) DESC, et LIMIT 1
)
SELECT event_id, COALESCE(et, (SELECT et FROM mode_v)) AS event_type_imputed
FROM masked
"""


@register("p17_fillna_mode", oracle=_P17_ORACLE)
def p17_fillna_mode(spark, sf_dir):
    """Mode imputation: value-frequency top-1 then fillna (reference:
    uber/bronze2_to_silver.py:110-112 — groupBy(c).count().orderBy(desc)
    .first()). Tie-broken by value for determinism."""
    e = load(spark, sf_dir, "events")
    masked = e.select(
        "event_id",
        F.when(F.col("value") < 10, None).otherwise(F.col("event_type")).alias("et"),
    )
    mode_row = (
        masked.filter(F.col("et").isNotNull())
        .groupBy("et")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("et"))
        .limit(1)
        .collect()
    )
    mode_val = mode_row[0]["et"] if mode_row else None
    return masked.select(
        "event_id", F.coalesce(F.col("et"), F.lit(mode_val)).alias("event_type_imputed")
    )
