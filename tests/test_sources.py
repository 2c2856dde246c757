"""Source-format tests: JSON lines / multiLine arrays, corrupt-file
tolerance, file provenance, JVM listing, zone creation."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from lakehouse_v3_spark.sources import (
    create_zone,
    list_keys_jvm,
    read_json_lines,
    read_json_multiline,
    with_source_file,
)


def test_json_lines_with_path_list(spark, tmp_path):
    p1, p2 = tmp_path / "a.json", tmp_path / "b.json"
    p1.write_text('{"id": 1, "q": {"usd": {"price": 9.5}}}\n{"id": 2, "q": {"usd": {"price": 1.0}}}')
    p2.write_text('{"id": 3, "q": {"usd": {"price": 2.0}}}')
    df = read_json_lines(spark, [str(p1), str(p2)])
    assert df.count() == 3
    # nested struct inference + dotted access (reference quote.usd.price)
    assert df.filter(F.col("q.usd.price") > 5).count() == 1


def test_json_multiline_array(spark, tmp_path):
    p = tmp_path / "articles.json"
    p.write_text(json.dumps([
        {"title": "A", "source": {"id": "s1", "name": "Reuters"}},
        {"title": "B", "source": {"id": "s2", "name": "AP"}},
    ], indent=2))
    df = read_json_multiline(spark, str(p))
    assert df.count() == 2
    assert {r[0] for r in df.select("source.name").collect()} == {"Reuters", "AP"}


def test_corrupt_file_tolerance(spark, tmp_path):
    # S20: session sets ignoreCorruptFiles=true (session factory) — a
    # garbage parquet in the directory must not break the scan
    good = tmp_path / "data"
    spark.range(5).write.parquet(str(good))
    (good / "corrupt.parquet").write_bytes(b"this is not parquet")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    # tolerance applies at scan time; schema inference would still trip
    # on the corrupt footer, so declare the schema (the production norm)
    assert spark.read.schema("id long").parquet(str(good)).count() == 5


def test_input_file_provenance(spark, tmp_path):
    (tmp_path / "x.json").write_text('{"id": 1}')
    (tmp_path / "y.json").write_text('{"id": 2}')
    df = with_source_file(read_json_lines(spark, str(tmp_path)))
    paths = {os.path.basename(r._src_path) for r in df.collect()}
    assert paths == {"x.json", "y.json"}


def test_jvm_listing_sorted(spark, tmp_path):
    (tmp_path / "b.csv").write_text("x")
    (tmp_path / "a.csv").write_text("x")
    sub = tmp_path / "nested"
    sub.mkdir()
    (sub / "c.csv").write_text("x")
    keys = list_keys_jvm(spark, str(tmp_path))
    names = [os.path.basename(k) for k in keys]
    assert names == sorted(names) and set(names) == {"a.csv", "b.csv", "c.csv"}


def test_create_zone_idempotent(spark):
    create_zone(spark, "bronze2_testzone")
    create_zone(spark, "bronze2_testzone")  # IF NOT EXISTS
    dbs = [r.namespace for r in spark.sql("SHOW DATABASES").collect()]
    assert "bronze2_testzone" in dbs
    spark.sql("DROP DATABASE bronze2_testzone")


def test_pyds_reader_pushdown_unit():
    """The synthetic source claims EqualTo on event_type/user_id and
    returns every other filter to Spark; read() applies claimed filters
    before rows cross the Python-JVM boundary."""
    from pyspark.sql.datasource import EqualTo, GreaterThan

    from lakehouse_v3_spark.sources.pydatasource import SyntheticEventsReader

    rdr = SyntheticEventsReader({"n_rows": "1000", "n_partitions": "4"})
    leftover = list(
        rdr.pushFilters([EqualTo(("event_type",), "click"), GreaterThan(("value",), 5.0)])
    )
    assert [type(f).__name__ for f in leftover] == ["GreaterThan"]
    assert len(rdr.pushed) == 1

    parts = rdr.partitions()
    assert len(parts) == 4 and parts[0].start == 0 and parts[-1].end == 1000
    batches = [b for p in parts for b in rdr.read(p)]
    n = sum(b.num_rows for b in batches)
    assert n == 200  # every 5th row is a click
    for b in batches:
        types = set(b.column("event_type").to_pylist())
        assert types <= {"click"}


def test_pyds_source_end_to_end(spark):
    """Full scan through the registered source: deterministic row count
    and values, partition-parallel generation."""
    from lakehouse_v3_spark.sources.pydatasource import register_synthetic_source

    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 5000)
        .option("n_partitions", 4)
        .load()
    )
    assert df.count() == 5000
    assert df.rdd.getNumPartitions() == 4
    row = df.filter("row_id = 4999").collect()[0]
    assert row.user_id == 4999 % 97
    assert row.value == ((4999 * 2654435761) % 1000) / 10.0


def test_pysink_commit_publishes_atomically(spark, tmp_path):
    """Happy path: temps become part files + _SUCCESS manifest; read-back
    round-trips; no temp residue."""
    import json as _json

    from lakehouse_v3_spark.sources.pysink import register_jsonl_sink

    register_jsonl_sink(spark)
    d = str(tmp_path / "out")
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, s string")
    df.repartition(2).write.format("jsonl_sink").option("path", d).mode("append").save()

    names = sorted(os.listdir(d))
    assert "_SUCCESS" in names
    assert all(not n.startswith(".tmp-") for n in names)
    manifest = _json.loads(open(os.path.join(d, "_SUCCESS")).read())
    assert manifest["n_rows"] == 3 and manifest["n_files"] == 2
    back = {(r.id, r.s) for r in spark.read.json(d).collect()}
    assert back == {(1, "a"), (2, "b"), (3, "c")}


def test_pysink_abort_leaves_nothing_visible(spark, tmp_path):
    """A failing task aborts the job: no part files, no _SUCCESS — the
    two-phase commit means readers never see a torn write."""
    import pytest
    from pyspark.sql import functions as F

    from lakehouse_v3_spark.sources.pysink import register_jsonl_sink

    register_jsonl_sink(spark)
    d = str(tmp_path / "out_abort")

    @F.udf("long")
    def boom(x):
        if x == 2:
            raise ValueError("injected task failure")
        return x

    df = spark.createDataFrame([(1,), (2,), (3,)], "id long").select(boom("id").alias("id"))
    with pytest.raises(Exception):
        df.repartition(3).write.format("jsonl_sink").option("path", d).mode("append").save()
    residue = [n for n in os.listdir(d)] if os.path.isdir(d) else []
    assert not any(n.startswith("part-") for n in residue)
    assert "_SUCCESS" not in residue


def test_pyds_stream_reader_batches(spark, tmp_path):
    """Streaming read of the Python data source: offsets advance by
    rows_per_batch, availableNow drains exactly n_rows across multiple
    micro-batches, values identical to the batch reader's."""
    from lakehouse_v3_spark.sources.pydatasource import register_synthetic_source

    register_synthetic_source(spark)
    seen: list = []
    batches: list = []

    def sink(df, bid):
        rows = df.collect()
        if rows:
            batches.append(len(rows))
            seen.extend(rows)

    def drain_once():
        # availableNow snapshots the next prefetched offset, so each run
        # advances one micro-batch; re-running resumes from the
        # checkpoint — which also exercises offset recovery + replay
        q = (
            spark.readStream.format("synthetic_events")
            .option("n_rows", 2500)
            .option("rows_per_batch", 1000)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "pyds_ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    for _ in range(5):
        drain_once()
        if sum(batches) >= 2500:
            break
    assert sum(batches) == 2500 and len(batches) >= 3
    by_id = {r.row_id: r for r in seen}
    assert len(by_id) == 2500  # no duplicates across batches
    r = by_id[1234]
    assert (r.user_id, r.event_type) == (1234 % 97, "signup")
    assert r.value == ((1234 * 2654435761) % 1000) / 10.0


def test_cli_list_run_explain_oracle(spark, capsys):
    """CLI surface: list filters, run prints rows, explain prints a
    plan, oracle prints SQL, unknown query exits 2."""
    from lakehouse_v3_spark.__main__ import main

    assert main(["list", "flagship"]) == 0
    out = capsys.readouterr().out
    assert "flagship_monthly_kpi" in out and "q1_pricing_summary" not in out

    assert main(["oracle", "q1_pricing_summary"]) == 0
    assert "l_returnflag" in capsys.readouterr().out

    assert main(["run", "a1_max_id_seed", "--limit", "5"], spark=spark) == 0
    assert "max_id" in capsys.readouterr().out

    assert main(["explain", "q6_forecast_revenue"], spark=spark) == 0
    assert "Physical Plan" in capsys.readouterr().out

    assert main(["oracle", "nope_not_a_query"]) == 2


def test_cli_gateway_serves_fixture_tables(spark, sf_dir, capsys):
    """`python -m lakehouse_v3_spark gateway` — the Trino-surface
    service is launchable from the CLI: binds an ephemeral port,
    registers the fixture tables, answers one SQL request."""
    import json
    import re
    import urllib.request

    import threading

    from lakehouse_v3_spark.__main__ import main

    # --once path: bind, print URL, stop cleanly
    assert main(
        ["gateway", "--port", "0", "--sf-dir", sf_dir, "--once"], spark=spark
    ) == 0
    url = re.search(
        r"listening on (http://\S+)", capsys.readouterr().out
    ).group(1)
    assert url.startswith("http://127.0.0.1:")

    # and the registered views actually answer SQL through a fresh
    # gateway on the same session (views persist on the session)
    from lakehouse_v3_spark.sql_gateway import SqlGateway

    with SqlGateway(spark, port=0) as gw:
        req = urllib.request.Request(
            gw.url + "/sql",
            data=json.dumps(
                {"sql": "SELECT COUNT(*) AS n FROM nation"}
            ).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            assert json.loads(resp.read())["rows"][0][0] == 25


def test_native_xml_source(spark, tmp_path):
    """Spark 4 native XML reader (rowTag-based) — the S-surface member
    for the one common ingest format the reference never handles."""
    f = tmp_path / "books.xml"
    f.write_text(
        "<books>"
        "<book><id>1</id><title>Distributed Systems</title><price>30.5</price></book>"
        "<book><id>2</id><title>Query Engines</title><price>42.0</price></book>"
        "</books>"
    )
    df = spark.read.format("xml").option("rowTag", "book").load(str(f))
    rows = {r.id: (r.title, float(r.price)) for r in df.collect()}
    assert rows == {1: ("Distributed Systems", 30.5), 2: ("Query Engines", 42.0)}
