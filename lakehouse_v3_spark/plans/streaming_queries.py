"""Streaming-semantics queries, expressed on batch frames so the oracle
can check them (the same operators run under readStream — see
tests/test_streaming.py for the actual streaming execution with
watermarks and availableNow checkpointing).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io_utils import load
from ..streaming.ingest import windowed_event_counts
from . import register

_TUMBLING_ORACLE = """
SELECT time_bucket(INTERVAL '1 hour', ts)            AS window_start,
       event_type,
       COUNT(*)                                      AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@register("stream_tumbling_window_agg", oracle=_TUMBLING_ORACLE)
def stream_tumbling_window_agg(spark, sf_dir):
    """Tumbling 1-hour window aggregation — the F.window operator the
    streaming path uses with a watermark (streaming/ingest.py
    windowed_event_counts); on batch input watermarking is a no-op so
    the oracle can verify the bucketing + aggregate semantics."""
    e = load(spark, sf_dir, "events")
    return windowed_event_counts(e)


# Spark's sliding windows are epoch-aligned every <slide>; each event
# falls in exactly 2 one-hour windows: floor_to_30min(ts) and 30 min
# earlier. time_bucket's origin differs from 1970 by whole hours, so the
# 30-minute boundaries coincide.
_SLIDING_ORACLE = """
WITH buckets AS (
  SELECT value,
         unnest([time_bucket(INTERVAL '30 minutes', ts),
                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE])
           AS window_start
  FROM events
)
SELECT window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
FROM buckets
GROUP BY 1
"""


@register("stream_sliding_window_agg", oracle=_SLIDING_ORACLE)
def stream_sliding_window_agg(spark, sf_dir):
    """Sliding window (1 h length, 30 min slide): each event lands in 2
    overlapping windows — F.window(ts, '1 hour', '30 minutes'). The
    oracle reproduces Spark's window assignment arithmetic explicitly."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "n_events",
            "total_value",
        )
    )
