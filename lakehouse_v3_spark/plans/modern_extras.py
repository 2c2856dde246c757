"""Modern Spark-4 API surface the reference predates but a complete
engine should expose: VARIANT semi-structured access, Python UDTFs
(lateral table functions), native session windows, and deterministic
per-key reservoir sampling.

The reference's only semi-structured path is from_json with a declared
schema (SURVEY §2.8); VARIANT is the schema-on-read form. Its only UDF
is scalar (F1); a UDTF is the table-valued counterpart. Session windows
are explicitly 'not present' in §2.9 — this is the parity-plus native
operator next to the lag/cumsum formulation (w7_sessionize).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io_utils import load
from ..operators.dedup import md5_int
from . import register

# ---------------------------------------------------------------------------
# VARIANT: schema-on-read JSON access
# ---------------------------------------------------------------------------

_VARIANT_ORACLE = """
SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_decile,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k
FROM events
WHERE event_type = 'click'
GROUP BY 1
"""


@register("variant_json_extract", oracle=_VARIANT_ORACLE)
def variant_json_extract(spark, sf_dir):
    """Schema-on-read: parse the props JSON column to VARIANT and
    extract a typed path (no declared StructType — the from_json
    counterpart is query json_struct_parse). VARIANT keeps a binary
    parsed form, so repeated path extraction doesn't re-tokenize the
    text; at 100 TB that is the difference between one parse and one
    parse per accessed field."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        e.select(k.alias("k"))
        .groupBy((F.col("k") % 10).alias("k_decile"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("long").alias("sum_k"),
        )
    )


# ---------------------------------------------------------------------------
# Python UDTF: lateral sentence split
# ---------------------------------------------------------------------------

_UDTF_ORACLE = """
WITH parts AS (
  SELECT doc_id, string_split(text, '.') AS arr
  FROM documents WHERE doc_id < 50
)
SELECT doc_id, CAST(i AS INT) AS pos, trim(arr[CAST(i AS INT)]) AS sentence
FROM parts, UNNEST(range(1, len(arr) + 1)) AS u(i)
WHERE trim(arr[CAST(i AS INT)]) <> ''
"""


@register("udtf_sentence_split", oracle=_UDTF_ORACLE)
def udtf_sentence_split(spark, sf_dir):
    """Python UDTF (table function) exploding documents into numbered
    sentences via a LATERAL join — the UDTF surface the reference lacks
    (its only table-generating op is explode_outer). Python UDTFs run
    row-at-a-time in the Python worker, so this is deliberately bounded
    (doc_id < 50); the vectorized path for the same shape is
    split+posexplode (pure JVM) — the UDTF exists for logic that can't
    be expressed as array functions."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, sentence: string")
    class SentenceSplit:
        def eval(self, text: str):
            for i, raw in enumerate((text or "").split(".")):
                # strip SPACES only: the oracle's trim() strips ' ' (not
                # tabs/newlines), and Python's bare strip() would diverge
                # on any document with \t/\n adjacent to a '.'
                s = raw.strip(" ")
                if s:
                    yield i + 1, s

    spark.udtf.register("sentence_split_udtf", SentenceSplit)
    load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, s.pos, s.sentence
        FROM _udtf_docs d, LATERAL sentence_split_udtf(d.text) s
        """
    )


# ---------------------------------------------------------------------------
# Native session windows (gap-merged)
# ---------------------------------------------------------------------------

_SESSION_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id,
       MIN(ts)                       AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE  AS session_end,
       CAST(COUNT(*) AS BIGINT)      AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
FROM sessions
GROUP BY user_id, session_id
"""


@register("session_window_native", oracle=_SESSION_ORACLE)
def session_window_native(spark, sf_dir):
    """F.session_window (gap 30 min): sessions merge while events arrive
    within the gap; window end = last event + gap. This native operator
    is streaming-capable (state-store backed with watermark eviction) —
    the batch lag/cumsum formulation (w7_sessionize) can't run
    incrementally. The oracle reproduces the gap-merge semantics
    explicitly: a new session starts when the inter-event gap is ≥ the
    30-minute threshold (Spark extends a session only while
    event_ts < previous_ts + gap)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Deterministic per-key reservoir sample (hash-rank top-k)
# ---------------------------------------------------------------------------

_RESERVOIR_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_id,
         ROW_NUMBER() OVER (
           PARTITION BY user_id
           ORDER BY ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 1000000007,
                    event_id
         ) AS rn
  FROM events
)
SELECT user_id, event_id, CAST(rn AS BIGINT) AS pick
FROM ranked WHERE rn <= 3
"""


@register("sample_reservoir_per_key", oracle=_RESERVOIR_ORACLE)
def sample_reservoir_per_key(spark, sf_dir):
    """Fixed-size (k=3) per-user sample via hash-rank: order each user's
    events by a hash of the event id and keep the first 3 — a
    deterministic reservoir (same picks on every run/engine/partition
    layout, unlike rand()-based reservoirs, and re-runnable for audits).
    One shuffle on user_id; at scale the window can be replaced by a
    per-partition top-k heap with identical output."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        md5_int(F.col("event_id").cast("string"), mod=1000000007), F.col("event_id")
    )
    return (
        e.select("user_id", "event_id", F.row_number().over(w).alias("pick"))
        .filter(F.col("pick") <= 3)
        .select("user_id", "event_id", F.col("pick").cast("long").alias("pick"))
    )


# ---------------------------------------------------------------------------
# Grouped-map applyInPandas: per-key median (exact order statistic)
# ---------------------------------------------------------------------------

_GROUPED_MAP_ORACLE = """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       median(value)            AS median_value
FROM events
GROUP BY user_id
"""


@register("applyinpandas_group_median", oracle=_GROUPED_MAP_ORACLE)
def applyinpandas_group_median(spark, sf_dir):
    """Grouped-map applyInPandas: each user's events arrive as ONE
    pandas DataFrame (Arrow batch) and a python function returns the
    group's summary — the escape hatch for per-group logic Spark
    aggregates can't express (model fits, custom quantiles). The median
    here is an exact order statistic (sort + middle element / midpoint
    average) so pandas and DuckDB agree bit-for-bit — no summation-order
    drift. One shuffle on the grouping key; each group must fit one
    worker's memory (the documented applyInPandas contract)."""
    import pandas as pd

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        # dropna to match SQL median() NULL semantics (pandas sorts NaN
        # last, which would shift the middle index); COUNT(*) keeps nulls
        v = pdf["value"].dropna().sort_values().reset_index(drop=True)
        n = len(v)
        if n == 0:
            med = None
        elif n % 2:
            med = float(v[n // 2])
        else:
            med = float((v[n // 2 - 1] + v[n // 2]) / 2.0)
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "median_value": [med],
            }
        )

    from ..partitioning import pin_grouped_python_parallelism

    e = load(spark, sf_dir, "events")
    # pin the grouping exchange at full parallelism: AQE's byte-based
    # coalescing would funnel every group through 1-2 Python workers on
    # a small input (r13, guide §4 — the Python stage is the cost, not
    # the bytes); same single exchange, same values, wider tasks
    return (
        pin_grouped_python_parallelism(
            e.select("user_id", "value"), "user_id"
        )
        .groupBy("user_id")
        .applyInPandas(
            summarize, schema="user_id long, n_events long, median_value double"
        )
    )


# ---------------------------------------------------------------------------
# pandas API on Spark (pyspark.pandas round trip)
# ---------------------------------------------------------------------------

_PS_ORACLE = """
SELECT event_type,
       CAST(COUNT(value) AS BIGINT) AS n_events,
       ROUND(CAST(MIN(value) AS DOUBLE), 6) AS v_min,
       ROUND(CAST(MAX(value) AS DOUBLE), 6) AS v_max
FROM events
GROUP BY event_type
"""


@register("ps_pandas_api_event_stats", oracle=_PS_ORACLE)
def ps_pandas_api_event_stats(spark, sf_dir):
    """pandas API on Spark: DataFrame.pandas_api() → pandas-style
    groupby/agg → to_spark() — the compatibility layer that lets a
    pandas-fluent user drive the same distributed engine (every op here
    compiles to the identical Catalyst aggregate the native API would
    produce; nothing materializes on the driver). Outputs restricted to
    exact statistics (count/min/max) so the pandas path has zero
    float-summation-order exposure."""
    import pyspark.pandas as ps

    e = load(spark, sf_dir, "events").select("event_type", "value")
    pdf = e.pandas_api()
    g = pdf.groupby("event_type")["value"]
    stats = ps.concat(
        [
            g.count().rename("n_events"),
            g.min().rename("v_min"),
            g.max().rename("v_max"),
        ],
        axis=1,
    ).reset_index()
    sdf = stats.to_spark()
    return sdf.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.round("v_min", 6).alias("v_min"),
        F.round("v_max", 6).alias("v_max"),
    )
