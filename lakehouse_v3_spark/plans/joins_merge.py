"""Join / merge queries: left-anti new-row detection, per-key watermark
left join, MERGE upsert semantics, as-of join, range join.

SURVEY.md §2.3 items J1-J4 plus the as-of/range extensions (the
reference has no inner/semi/theta/as-of joins; the new engine exposes
them as first-class operators in operators/joins.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io_utils import load
from ..operators.joins import asof_join, merge_upsert, newer_than_per_key_watermark, range_join
from . import register

# ---------------------------------------------------------------------------
# J1: left-anti join (new-key detection)
# ---------------------------------------------------------------------------

_J1_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@register("j1_left_anti_new_keys", oracle=_J1_ORACLE)
def j1_left_anti_new_keys(spark, sf_dir):
    """Left-anti join — the reference's new-file detection (files ∖
    ingest-log, alphavantage/transform_into_delta.py:104;
    finance_news/bronze1_to_bronze2.py:53-62). Customers with no orders."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# J2: per-key watermark left join
# ---------------------------------------------------------------------------

_J2_ORACLE = """
WITH maxs AS (
  SELECT user_id, MAX(ts) AS max_click_ts
  FROM events WHERE event_type = 'click'
  GROUP BY user_id
)
SELECT e.event_id, e.user_id, e.ts
FROM events e LEFT JOIN maxs m ON e.user_id = m.user_id
WHERE e.event_type = 'purchase'
  AND (m.max_click_ts IS NULL OR e.ts > m.max_click_ts)
"""


@register("j2_per_key_watermark", oracle=_J2_ORACLE)
def j2_per_key_watermark(spark, sf_dir):
    """Per-key watermark: keep rows newer than the target's per-key MAX
    (reference: alphavantage/bronze2_to_silver.py:175-189). Purchases
    after each user's last click; users with no clicks pass through."""
    e = load(spark, sf_dir, "events")
    maxs = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.max("ts").alias("max_click_ts"))
    )
    incoming = e.filter(F.col("event_type") == "purchase")
    return newer_than_per_key_watermark(
        incoming, maxs, ["user_id"], "ts", "max_click_ts"
    ).select("event_id", "user_id", "ts")


# ---------------------------------------------------------------------------
# J4/S10: MERGE upsert (whenMatchedUpdateAll / whenNotMatchedInsertAll)
# ---------------------------------------------------------------------------

_MERGE_ORACLE = """
WITH target AS (
  SELECT event_id, user_id, value FROM events WHERE event_id % 2 = 0
),
src AS (
  SELECT event_id, user_id, value * 2 AS value FROM events WHERE value > 100
)
SELECT COALESCE(t.event_id, s.event_id)  AS event_id,
       COALESCE(s.user_id, t.user_id)    AS user_id,
       COALESCE(s.value, t.value)        AS value,
       CASE WHEN s.event_id IS NOT NULL AND t.event_id IS NOT NULL THEN 'updated'
            WHEN s.event_id IS NOT NULL THEN 'inserted'
            ELSE 'unchanged' END         AS merge_action
FROM target t FULL JOIN src s ON t.event_id = s.event_id
"""


@register("j4_merge_upsert", oracle=_MERGE_ORACLE)
def j4_merge_upsert(spark, sf_dir):
    """MERGE semantics on plain Spark: full-outer join + source-wins
    coalesce (reference: alphavantage/bronze2_to_silver.py:141-152 Delta
    MERGE; operators/joins.py merge_upsert). Shuffles both sides on the
    key once — same cost profile as Delta's join-based MERGE."""
    e = load(spark, sf_dir, "events")
    target = e.filter(F.col("event_id") % 2 == 0).select("event_id", "user_id", "value")
    source = e.filter(F.col("value") > 100).select(
        "event_id", "user_id", (F.col("value") * 2).alias("value")
    )
    return merge_upsert(target, source, ["event_id"], action_col="merge_action")


# ---------------------------------------------------------------------------
# As-of join (extension): latest prior click for each purchase
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
SELECT p.event_id, p.user_id, p.ts,
       c.ts AS asof_click_ts, c.value AS asof_click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@register("asof_join_prior_click", oracle=_ASOF_ORACLE)
def asof_join_prior_click(spark, sf_dir):
    """As-of join: for each purchase, the latest click at-or-before it
    per user (operators/joins.py asof_join — union+window, one shuffle,
    no range explosion). Oracle is DuckDB's native ASOF JOIN, an
    independent implementation of the same semantics."""
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    out = asof_join(
        purchases,
        clicks,
        by=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts", "value"],
        tie_break="ts",
        prefix="asof_click_",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_click_ts").alias("asof_click_ts"),
        F.col("asof_click_value").alias("asof_click_value"),
    )


# ---------------------------------------------------------------------------
# Range join (extension): events within 5 minutes after each error
# ---------------------------------------------------------------------------

_RANGE_ORACLE = """
SELECT a.event_id AS error_id, b.event_id AS follow_id,
       b.event_type AS follow_type
FROM (SELECT * FROM events WHERE event_type = 'error') a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 5 MINUTE
 AND b.event_id <> a.event_id
"""


@register("range_join_followups", oracle=_RANGE_ORACLE)
def range_join_followups(spark, sf_dir):
    """Range join: per user, events in the 5 minutes after each error
    (operators/joins.py range_join — bucketized equi-join, fan-out
    bounded to 2 adjacent buckets; DuckDB's IEJoin is the oracle)."""
    e = load(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", "ts"
    )
    follows = e.select(
        F.col("event_id").alias("follow_id"),
        "user_id",
        F.col("event_type").alias("follow_type"),
        F.col("ts").alias("follow_ts"),
    )
    out = range_join(
        errors,
        follows,
        by=["user_id"],
        left_ts="ts",
        right_ts="follow_ts",
        window_micros=5 * 60 * 1_000_000,
    )
    return out.filter(F.col("follow_id") != F.col("error_id")).select(
        "error_id", "follow_id", "follow_type"
    )
