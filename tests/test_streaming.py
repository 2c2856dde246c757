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
