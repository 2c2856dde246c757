"""Resumable oracle-parity gate at an arbitrary SF dir.

Runs every declared query's Spark side AND its DuckDB oracle at
--sf-dir, compares rows/schema/value-hash exactly like the driver gate,
and appends one JSON line per query to --out. Re-running skips queries
already recorded (resume after an interrupted run). Oracles get a
per-query timeout (DuckDB is interrupted from a watchdog thread) —
a handful of deliberately-expensive oracle formulations (recursive-CTE
transitive closure, all-pairs list_reduce cosine) are exact but
superlinear, so at sf1+ they time out and are recorded as
oracle_timeout rather than blocking the gate; the Spark side still runs
and its row count is recorded.

Usage:
  python tools/sf_gate.py --sf-dir /root/repo/testdata/sf1 \
      --out /tmp/sf1_gate.jsonl [--oracle-timeout 180] [--only substr[,substr...]]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)


def run_oracle_with_timeout(oracle, sf_dir: str, timeout: float,
                            max_temp: str | None = None):
    """DuckDB oracle with a watchdog: returns (df, timed_out).

    ``oracle`` is either a SQL string or a QueryDef.sf_oracle callable
    ``(con, sf_dir) -> pandas.DataFrame`` (iterative/multi-statement
    oracles, e.g. looped connected-components label propagation); the
    watchdog interrupts the shared connection either way."""
    import duckdb

    con = duckdb.connect()
    if max_temp:
        # cap DuckDB spill so an intractable oracle errors cleanly
        # instead of filling the shared disk (observed: the sf5
        # full-funnel chain exhausted the device before its timeout)
        con.execute(f"SET max_temp_directory_size='{max_temp}'")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    # Re-firing watchdog (r5 advisory): duckdb's interrupt() only
    # cancels an IN-FLIGHT statement, so a one-shot Timer whose fire
    # lands between two statements of a multi-statement callable oracle
    # (looped label propagation, Lloyd iterations) was silently lost
    # and the oracle ran unbounded. After the deadline this thread
    # interrupts every 0.5 s until the worker acknowledges, so the next
    # statement to start is killed even if the previous fire missed.
    deadline = time.monotonic() + timeout
    stop = threading.Event()

    def _watchdog():
        while not stop.wait(0.5):
            if time.monotonic() >= deadline:
                try:
                    con.interrupt()
                except Exception:
                    return

    wd = threading.Thread(target=_watchdog, daemon=True)
    wd.start()
    try:
        if callable(oracle):
            return oracle(con, sf_dir), False
        return con.execute(oracle).fetchdf(), False
    except duckdb.InterruptException:
        return None, True
    except Exception as exc:
        if "INTERRUPT" in str(exc).upper():
            return None, True
        raise
    finally:
        stop.set()
        wd.join(timeout=2)
        con.close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--oracle-timeout", type=float, default=180.0)
    ap.add_argument(
        "--max-temp-size", default="",
        help="cap DuckDB temp spill (e.g. 40GiB); oracle errors cleanly "
             "past it instead of exhausting the disk",
    )
    ap.add_argument("--only", default="")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            done = {json.loads(line)["name"] for line in f if line.strip()}

    from lakehouse_v3_spark.oracle_harness import compare_frames
    from lakehouse_v3_spark.plans import load_all
    from lakehouse_v3_spark.session import get_spark

    # SPARK_GRAFT_MASTER=spark://... runs the gate against a real
    # multi-process standalone cluster (round-4 evidence runs)
    spark = get_spark(
        app_name="sf-gate",
        master=os.environ.get("SPARK_GRAFT_MASTER", f"local[{args.cpus}]"),
        shuffle_partitions=int(args.cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    # --only: comma-separated substrings (r9) — any match selects the
    # query; a single substring behaves exactly as before
    only = [s for s in args.only.split(",") if s]
    with open(args.out, "a") as out:
        for name in sorted(registry):
            if name in done or (only and not any(s in name for s in only)):
                continue
            qd = registry[name]
            rec: dict = {"name": name}
            t0 = time.monotonic()
            try:
                spdf = qd.fn(spark, args.sf_dir).toPandas()
                rec["spark_rows"] = len(spdf)
                rec["spark_sec"] = round(time.monotonic() - t0, 2)
            except Exception as exc:
                rec["error"] = f"spark: {str(exc)[:300]}"
                out.write(json.dumps(rec) + "\n")
                out.flush()
                continue
            oracle = qd.sf_oracle or qd.oracle
            if oracle is None:
                rec["status"] = "rows_only"
            else:
                if qd.sf_oracle is not None:
                    rec["sf_oracle"] = True
                t1 = time.monotonic()
                try:
                    odf, timed_out = run_oracle_with_timeout(
                        oracle, args.sf_dir, args.oracle_timeout,
                        max_temp=args.max_temp_size or None,
                    )
                except Exception as exc:
                    rec["error"] = f"oracle: {str(exc)[:300]}"
                    out.write(json.dumps(rec) + "\n")
                    out.flush()
                    continue
                rec["oracle_sec"] = round(time.monotonic() - t1, 2)
                if timed_out:
                    rec["status"] = "oracle_timeout"
                else:
                    errs = compare_frames(spdf, odf, rtol=qd.rtol)
                    rec["status"] = "match" if not errs else "MISMATCH"
                    if errs:
                        rec["errors"] = [str(e)[:200] for e in errs[:3]]
            out.write(json.dumps(rec) + "\n")
            out.flush()
            print(name, rec.get("status"), rec.get("spark_sec"), flush=True)


if __name__ == "__main__":
    main()
