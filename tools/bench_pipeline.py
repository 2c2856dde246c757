"""E2E wall measurement of the composed curation DAG (r10 verdict item
#5): the per-query bench cannot see cross-stage materialization costs —
the DAG writes its silver/gold/state tables per tick — and the round-11
incremental work needs a bootstrap-vs-tick number.

Builds a landing zone from ``<sf_dir>/documents.parquet`` split into
monotone doc_id slices (the watermark contract), runs
``curation_dag`` tick by tick into a fresh warehouse, and prints ONE
JSON line::

    {"metric": "curation_dag_e2e", "sf": ..., "unit": "sec",
     "ticks": [{"name": "bootstrap", "total": s, "tasks": {task: s}},
               {"name": "incremental", ...},
               {"name": "empty", ...}],
     "value": <bootstrap total>}

- tick 0 ("bootstrap"): the first ``1 - batch_frac`` of the corpus —
  incremental-from-empty, i.e. the full-recompute cost;
- tick 1 ("incremental"): the remaining ``batch_frac`` — the steady-
  state daily-tick cost the round-11 rework targets (heavy stages are
  batch-scoped, so this should track the batch, not the corpus);
- tick 2 ("empty"): no new files — the zero-Spark-job Skip.

Usage::

    python tools/bench_pipeline.py [--sf-dir /root/repo/testdata/sf1]
        [--batch-frac 0.1] [--embed]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/testdata/sf1")
    ap.add_argument("--batch-frac", type=float, default=0.1)
    ap.add_argument("--embed", action="store_true",
                    help="compose the embedding-side stages too")
    ap.add_argument("--keep", action="store_true",
                    help="keep the scratch warehouse/landing dirs")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lakehouse_v3_spark.pipelines import curation as C
    from lakehouse_v3_spark.session import get_spark
    from lakehouse_v3_spark.tables import TableManager

    spark = get_spark(app_name="bench_pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    hi = docs.agg(F.max("doc_id")).collect()[0][0]
    cut = int(hi * (1.0 - args.batch_frac))
    landing = tempfile.mkdtemp(prefix="bench_cur_land_")
    wh = tempfile.mkdtemp(prefix="bench_cur_wh_")
    tm = TableManager(spark, wh, backend="parquet")
    emb = (
        spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
        if args.embed
        else None
    )

    def land(name, df):
        df.write.mode("overwrite").parquet(os.path.join(landing, name))

    ticks = []
    plan = [
        ("bootstrap", docs.filter(F.col("doc_id") <= cut)),
        ("incremental", docs.filter(F.col("doc_id") > cut)),
        ("empty", None),
    ]
    for name, sl in plan:
        if sl is not None:
            land(f"batch_{name}", sl)
        dag = C.curation_dag(spark, landing, tm, retries=0, embeddings=emb)
        t0 = time.monotonic()
        rep = dag.run()
        total = time.monotonic() - t0
        assert rep.ok, rep.states()
        ticks.append(
            {
                "name": name,
                "total": round(total, 3),
                "states": rep.states(),
                "tasks": {
                    n: round(t.seconds, 3) for n, t in rep.tasks.items()
                },
                "ingest": rep.tasks["ingest"].result,
            }
        )
        print(f"# tick {name}: {total:.1f}s {rep.states()}", file=sys.stderr)

    if not args.keep:
        shutil.rmtree(landing, ignore_errors=True)
        shutil.rmtree(wh, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "curation_dag_e2e",
                "sf": args.sf_dir,
                "unit": "sec",
                "embed": bool(args.embed),
                "batch_frac": args.batch_frac,
                "ticks": ticks,
                "value": ticks[0]["total"],
            },
            default=str,
        )
    )


if __name__ == "__main__":
    main()
