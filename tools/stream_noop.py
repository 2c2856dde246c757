"""Measure the FIXED per-invocation machinery cost of Structured
Streaming queries (r6 verdict item #6), so streaming rows in the bench
can be read as machinery + work instead of one opaque number.

Three noop shapes, each the machinery of one real catalog query with
the actual work removed (1-row source, identity transform):

  noop_basic  — one file-source stream → foreachBatch parquet sink,
                availableNow drain (the shell of
                stream_state_running_totals / stream_tws_* minus the
                stateful operator and the data);
  noop_state  — + an applyInPandasWithState identity operator (adds
                state-store machinery);
  noop_join   — TWO file-source streams → stream-stream equi+interval
                join → sink (the shell of stream_stream_interval_join);
  noop_dedup  — file-source stream → withWatermark →
                dropDuplicatesWithinWatermark → sink (the shell of
                stream_dedup_within_watermark minus the data — r8
                verdict item #5).

Each shape runs twice and reports the SECOND time (first pays one-off
session warmup, same protocol as the bench). Output: one JSON line —
merge into BASELINE.md's streaming table.

Usage:  python tools/stream_noop.py [--cpus 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _tiny_source_dir(spark, tag: str) -> str:
    d = os.path.join(tempfile.gettempdir(), f"noop_src_{tag}_{uuid.uuid4().hex}")
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, "a", 1.0)],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type", "value"
    ).coalesce(1).write.mode("overwrite").parquet(d)
    return d


def _drain(q):
    q.awaitTermination()


def _sink(df, bid):
    # distributed no-op-ish sink: same foreachBatch shape as the
    # catalog queries (write to parquet), smallest possible batch
    df.write.mode("append").format("noop").save()


def noop_basic(spark) -> float:
    src = _tiny_source_dir(spark, "basic")
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).parquet(src)
    with tempfile.TemporaryDirectory(prefix="noop_ckpt_") as ckpt:
        t = time.time()
        q = (
            stream.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        return time.time() - t


def noop_state(spark) -> float:
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def identity(key, pdfs, state):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    src = _tiny_source_dir(spark, "state")
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).parquet(src)
    out = stream.groupBy("user_id").applyInPandasWithState(
        identity,
        outputStructType="user_id long, n long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    with tempfile.TemporaryDirectory(prefix="noop_ckpt_") as ckpt:
        t = time.time()
        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        return time.time() - t


def noop_join(spark) -> float:
    from pyspark.sql import functions as F

    src_a = _tiny_source_dir(spark, "join_a")
    src_b = _tiny_source_dir(spark, "join_b")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    a = (
        spark.readStream.schema(schema)
        .parquet(src_a)
        .withWatermark("ts", "25 hours")
        .alias("a")
    )
    b = (
        spark.readStream.schema(schema)
        .parquet(src_b)
        .withWatermark("ts", "25 hours")
        .alias("b")
    )
    joined = a.join(
        b,
        F.expr(
            "a.user_id = b.user_id AND "
            "b.ts BETWEEN a.ts AND a.ts + INTERVAL 24 HOURS"
        ),
    )
    with tempfile.TemporaryDirectory(prefix="noop_ckpt_") as ckpt:
        t = time.time()
        q = (
            joined.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        return time.time() - t


def noop_dedup(spark) -> float:
    src = _tiny_source_dir(spark, "dedup")
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        .parquet(src)
        .withWatermark("ts", "1440 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    with tempfile.TemporaryDirectory(prefix="noop_ckpt_") as ckpt:
        t = time.time()
        q = (
            stream.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        return time.time() - t


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out = {}
    for name, fn in [
        ("noop_basic", noop_basic),
        ("noop_state", noop_state),
        ("noop_join", noop_join),
        ("noop_dedup", noop_dedup),
    ]:
        fn(spark)  # warmup run: session/codegen one-offs
        out[name] = round(fn(spark), 3)
    print(json.dumps({"machinery_sec": out, "cpus": int(args.cpus)}))


if __name__ == "__main__":
    main()
