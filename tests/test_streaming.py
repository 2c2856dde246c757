"""Structured Streaming tests: availableNow CSV ingest with engine
checkpoints + foreachBatch (the reference's uber bronze1→bronze2 path),
and watermarked windowed aggregation on a stream."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_v3_spark.ids import max_id_seed, with_dense_id
from lakehouse_v3_spark.streaming.ingest import (
    csv_file_stream,
    run_foreach_batch,
    windowed_event_counts,
)
from lakehouse_v3_spark.tables import TableManager


def _write_csv(path, rows):
    path.write_text("booking_id,status,value\n" + "\n".join(rows))


def test_csv_stream_ingest_incremental(spark, tmp_path):
    src = tmp_path / "bronze1"
    src.mkdir()
    _write_csv(src / "day1.csv", ["B1,Completed,10.5", "B2,Cancelled,0.0"])

    tm = TableManager(spark, str(tmp_path / "warehouse"))

    def process(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        existing = tm.read("bronze2.bookings") if tm.exists("bronze2.bookings") else None
        seed = max_id_seed(existing, "cd_bronze_id") if existing is not None else 0
        out = with_dense_id(
            batch_df.withColumn("dt_record_to_bronze2", F.current_timestamp()),
            ["booking_id"],
            id_col="cd_bronze_id",
            offset=seed,
        )
        tm.append(out, "bronze2.bookings")

    stream = csv_file_stream(spark, str(src))
    run_foreach_batch(stream, process, str(tmp_path / "ckpt"))
    t1 = tm.read("bronze2.bookings")
    assert t1.count() == 2
    assert sorted(r.cd_bronze_id for r in t1.collect()) == [1, 2]

    # re-run with no new files → engine checkpoint prevents re-ingest
    run_foreach_batch(csv_file_stream(spark, str(src)), process, str(tmp_path / "ckpt"))
    assert tm.read("bronze2.bookings").count() == 2

    # new file → only its rows ingested, ids continue past existing max
    _write_csv(src / "day2.csv", ["B3,Completed,7.0"])
    run_foreach_batch(csv_file_stream(spark, str(src)), process, str(tmp_path / "ckpt"))
    t3 = tm.read("bronze2.bookings")
    assert t3.count() == 3
    assert sorted(r.cd_bronze_id for r in t3.collect()) == [1, 2, 3]


def test_windowed_agg_on_stream(spark, tmp_path):
    # drive the watermarked windowed agg with a real stream (parquet
    # file source), draining via availableNow into a memory sink
    batch = spark.createDataFrame(
        [
            ("2024-01-01 00:10:00", "click", 1.0),
            ("2024-01-01 00:50:00", "click", 2.0),
            ("2024-01-01 01:10:00", "view", 3.0),
        ],
        "ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    src = tmp_path / "events_src"
    batch.write.parquet(str(src))

    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    agg = windowed_event_counts(stream, watermark="10 minutes", window_len="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {(str(r.window_start), r.event_type): (r.n_events, r.total_value)
            for r in spark.sql("SELECT * FROM win_counts").collect()}
    assert rows[("2024-01-01 00:00:00", "click")] == (2, 3.0)
    assert rows[("2024-01-01 01:00:00", "view")] == (1, 3.0)


def test_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicate event ids arriving in
    later micro-batches (within the watermark delay) are dropped by the
    state store — streaming dedup, which batch dropDuplicates can't do
    incrementally. Reference parity: A14/W3 dedup, streaming extension."""
    import json

    src = tmp_path / "json_in"
    src.mkdir()
    ck = tmp_path / "ck"
    out: list = []

    def write_batch(name, rows):
        (src / name).write_text("\n".join(json.dumps(r) for r in rows))

    # batch 1: e1, e2; batch 2 re-delivers e2 and adds e3
    write_batch("b1.json", [
        {"event_id": "e1", "ts": "2026-01-01T00:00:00", "v": 1},
        {"event_id": "e2", "ts": "2026-01-01T00:01:00", "v": 2},
    ])

    schema = "event_id string, ts timestamp, v long"

    def drain():
        stream = (
            spark.readStream.schema(schema).json(str(src))
            .withWatermark("ts", "1 hour")
            .dropDuplicatesWithinWatermark(["event_id"])
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, _id: out.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", str(ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    write_batch("b2.json", [
        {"event_id": "e2", "ts": "2026-01-01T00:02:00", "v": 22},  # dup, dropped
        {"event_id": "e3", "ts": "2026-01-01T00:03:00", "v": 3},
    ])
    drain()

    rows = {r["event_id"]: r["v"] for r in out}
    assert rows == {"e1": 1, "e2": 2, "e3": 3}
