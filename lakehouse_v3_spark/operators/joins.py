"""Join operators beyond plain ``df.join``: as-of join, range join,
per-key watermark filter, merge-upsert.

The reference uses only left/left_anti joins and Delta MERGE
(SURVEY.md §2.3); as-of and range joins are the scale-path extensions
Spark lacks natively, implemented as compositions of built-in ops (no
UDFs, no cross joins) so Catalyst/AQE keep optimizing them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tie_break: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same ``by`` group (inclusive,
    ASOF-join semantics). Left rows with no prior right row keep NULLs.

    Union-tag-window implementation: tag sides, union, then a running
    ``last(..., ignorenulls)`` window per key ordered by (ts, side).
    One shuffle on the ``by`` key, no range explosion, no cross join —
    the standard scalable as-of pattern (cf. pandas merge_asof, but
    distributed). At 100 TB this is shuffle-bound on ``by`` only.
    """
    ts = "_lh_ts"
    side = "_lh_side"  # right=0 sorts before left=1 at equal ts → inclusive
    payload = "_lh_payload"
    tie = "_lh_tie"

    r = right.select(
        *by,
        F.col(right_ts).alias(ts),
        (F.col(tie_break) if tie_break else F.lit(0)).alias(tie),
        F.struct(*[F.col(c) for c in right_cols]).alias(payload),
        F.lit(0).alias(side),
    )
    l = (
        left.withColumn(ts, F.col(left_ts))
        .withColumn(side, F.lit(1))
        .withColumn(tie, F.lit(None).cast(dict(r.dtypes)[tie]))
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts), F.col(side), F.col(tie).asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned.withColumn(payload, F.last(payload, ignorenulls=True).over(w))
    out = matched.filter(F.col(side) == 1)
    for c in right_cols:
        out = out.withColumn(prefix + c, F.col(payload)[c])
    return out.drop(ts, side, payload, tie, *[c for c in right.columns if c not in set(left.columns) | set(by)])


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    window_micros: int,
) -> DataFrame:
    """Pairs (l, r) in the same ``by`` group with
    ``l.ts <= r.ts < l.ts + window``. ``right``'s columns (except the
    ``by`` key, which is dropped from the output's right side) must not
    collide with ``left``'s — rename before calling.

    A naive theta-join is O(n²) per key. Scale path: bucketize both
    sides to ``window``-sized buckets, equi-join on (key, bucket) and
    (key, bucket+1), then apply the exact range predicate. The bucket
    key bounds each join's fan-out to two adjacent buckets regardless
    of total data size.
    """
    lb = left.withColumn("_lh_lb", F.expr(f"unix_micros({left_ts}) div {window_micros}"))
    rb = right.select(
        *[F.col(c).alias(f"_lh_rby_{c}") for c in by],
        *[F.col(c) for c in right.columns if c not in by],
    ).withColumn("_lh_rb", F.expr(f"unix_micros({right_ts}) div {window_micros}"))

    parts = []
    for shift in (0, 1):
        cond = [F.col(c) == F.col(f"_lh_rby_{c}") for c in by]
        cond.append(F.col("_lh_lb") + shift == F.col("_lh_rb"))
        parts.append(lb.join(rb, cond, "inner"))
    joined = parts[0].unionByName(parts[1])
    exact = joined.filter(
        (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) < F.col(left_ts) + F.expr(f"INTERVAL {window_micros} MICROSECOND"))
    )
    return exact.drop("_lh_lb", "_lh_rb", *[f"_lh_rby_{c}" for c in by])


def newer_than_per_key_watermark(
    incoming: DataFrame,
    existing_max: DataFrame,
    key: list[str],
    ts_col: str,
    max_ts_col: str,
) -> DataFrame:
    """Keep incoming rows strictly newer than the per-key max in the
    target (reference: alphavantage/bronze2_to_silver.py:175-189 —
    left join to groupBy(key).max(ts), keep isNull | newer)."""
    j = incoming.join(existing_max, on=key, how="left")
    return j.filter(F.col(max_ts_col).isNull() | (F.col(ts_col) > F.col(max_ts_col)))


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: list[str],
    action_col: str | None = None,
) -> DataFrame:
    """Plain-Spark MERGE: whenMatchedUpdateAll / whenNotMatchedInsertAll
    (reference: alphavantage/bronze2_to_silver.py:141-152 Delta MERGE).

    Full-outer join on the key; source columns win when present. On a
    Delta-enabled cluster use DeltaTable.merge instead (tables.py picks
    that automatically); this rewrite preserves the same row semantics
    for plain-parquet storage. ``source`` must be unique per key.
    """
    t = target.withColumn("_lh_t", F.lit(1)).alias("t")
    s = source.withColumn("_lh_s", F.lit(1)).alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in key]
    j = t.join(s, cond, "full_outer")
    t_exists = F.col("t._lh_t").isNotNull()
    s_exists = F.col("s._lh_s").isNotNull()
    cols = []
    for c in target.columns:
        if c in key:
            cols.append(F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c))
        elif c in source.columns:
            cols.append(F.when(s_exists, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c))
        else:
            cols.append(F.col(f"t.{c}").alias(c))
    if action_col is not None:
        cols.append(
            F.when(s_exists & t_exists, F.lit("updated"))
            .when(s_exists, F.lit("inserted"))
            .otherwise(F.lit("unchanged"))
            .alias(action_col)
        )
    return j.select(*cols)
