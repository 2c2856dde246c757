"""Scheduled-curation scale gate (r11 verdict item #5): a 3-interval
daily catchup backfill through ScheduledDag at a real SF must converge
to EXACTLY the tables one batch curation_dag run produces over the same
data (the unit-scale form lives in tests/test_schedule.py). Emits one
JSONL row per table: {"table", "rows", "match", "sec"} plus a summary.

Usage::

    python tools/sched_gate.py --sf-dir /root/repo/testdata/sf1 \
        --out GATE_sched_sf1.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from datetime import datetime, timedelta

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

from dag_gate import _value_hash  # noqa: E402 - sibling tool helper

TABLES = (
    "curation.silver_quality",
    "curation.silver_exact",
    "curation.near_dup_pairs",
    "curation.silver_neardup",
    "curation.silver_clean",
    "curation.gold_split",
    "curation.gold_corpus",
    "curation.gold_packed",
    "curation.gold_summary",
    "curation.gold_funnel",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/testdata/sf1")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lakehouse_v3_spark.orchestrate import Schedule, ScheduledDag
    from lakehouse_v3_spark.pipelines import curation as C
    from lakehouse_v3_spark.pipelines.dags import scheduled_curation_dag
    from lakehouse_v3_spark.session import get_spark
    from lakehouse_v3_spark.tables import TableManager

    spark = get_spark(app_name="sched-gate")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    hi = docs.agg(F.max("doc_id")).collect()[0][0]
    a, b = hi // 3, 2 * hi // 3
    days = [
        ("2024-05-01", docs.filter(F.col("doc_id") <= a)),
        ("2024-05-02", docs.filter((F.col("doc_id") > a) & (F.col("doc_id") <= b))),
        ("2024-05-03", docs.filter(F.col("doc_id") > b)),
    ]
    landing = tempfile.mkdtemp(prefix="sched_gate_land_")
    flat = tempfile.mkdtemp(prefix="sched_gate_flat_")
    for day, df in days:
        ddir = os.path.join(landing, f"date={day}")
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(ddir, "stage")
        )
        part = next(
            fn for fn in os.listdir(os.path.join(ddir, "stage"))
            if fn.endswith(".parquet")
        )
        os.replace(
            os.path.join(ddir, "stage", part), os.path.join(ddir, "docs.parquet")
        )
        shutil.rmtree(os.path.join(ddir, "stage"))
        shutil.copy(
            os.path.join(ddir, "docs.parquet"),
            os.path.join(flat, f"{day}.parquet"),
        )

    # batch reference: one plain curation_dag pass over the flat zone
    wh_b = tempfile.mkdtemp(prefix="sched_gate_wh_b_")
    tm_b = TableManager(spark, wh_b, backend="parquet")
    t0 = time.monotonic()
    rep_b = C.curation_dag(spark, flat, tm_b, retries=0).run()
    assert rep_b.ok, rep_b.states()
    t_batch = time.monotonic() - t0

    # scheduled backfill: daily schedule, catchup over 3 closed days
    wh_s = tempfile.mkdtemp(prefix="sched_gate_wh_s_")
    tm_s = TableManager(spark, wh_s, backend="parquet")
    sd = ScheduledDag(
        scheduled_curation_dag(spark, landing, tm_s),
        Schedule(start=datetime(2024, 5, 1), interval=timedelta(days=1)),
        state_dir=tempfile.mkdtemp(prefix="sched_gate_state_"),
    )
    t0 = time.monotonic()
    out_runs = sd.tick(datetime(2024, 5, 4, 6, 0))
    t_sched = time.monotonic() - t0
    assert [lg for lg, _ in out_runs] == [
        datetime(2024, 5, 1), datetime(2024, 5, 2), datetime(2024, 5, 3)
    ]
    assert all(rep.ok for _, rep in out_runs), [
        rep.states() for _, rep in out_runs
    ]
    for lg, rep in out_runs:
        r = rep.tasks["ingest"].result
        assert r["mode"] == "incremental", (lg, r)
        day = lg.date().isoformat()
        assert r["files_read"] == [
            os.path.join(landing, f"date={day}", "docs.parquet")
        ], (lg, r)

    n_match = 0
    with open(args.out, "a") as out:
        for table in TABLES:
            t0 = time.monotonic()
            got = _value_hash(tm_s.read(table))
            want = _value_hash(tm_b.read(table))
            ok = got == want
            n_match += ok
            row = {
                "table": table,
                "rows": got[0],
                "expected_rows": want[0],
                "match": ok,
                "sec": round(time.monotonic() - t0, 2),
            }
            out.write(json.dumps(row) + "\n")
            out.flush()
            print(row, file=sys.stderr)
        out.write(
            json.dumps(
                {
                    "table": "_summary",
                    "sf": args.sf_dir,
                    "intervals": 3,
                    "sched_wall_sec": round(t_sched, 1),
                    "batch_wall_sec": round(t_batch, 1),
                    "n_tables": len(TABLES),
                    "n_match": n_match,
                }
            )
            + "\n"
        )
    for p in (landing, flat, wh_b, wh_s):
        shutil.rmtree(p, ignore_errors=True)
    print(f"# {n_match}/{len(TABLES)} tables match", file=sys.stderr)
    sys.exit(0 if n_match == len(TABLES) else 1)


if __name__ == "__main__":
    main()
