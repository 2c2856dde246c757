"""CLI: the engine's spark-submit-equivalent entry point.

The reference is operated as per-job spark-submit scripts
(airflow/dags/*.py wiring in /root/reference); this engine's user
surface is the query catalog + pipelines, so the CLI exposes them
directly:

    python -m lakehouse_v3_spark list [substr]
    python -m lakehouse_v3_spark run <query> [--sf-dir D] [--limit N]
    python -m lakehouse_v3_spark explain <query> [--sf-dir D]
    python -m lakehouse_v3_spark oracle <query>

Session config comes from session.get_spark (AQE, UTC, Arrow); the
scale knobs stay env-driven (SPARK_GRAFT_CPUS, SPARK_GRAFT_MASTER,
SPARK_GRAFT_MAX_PART_BYTES) so the same invocation works on a laptop
and a cluster edge node.
"""

from __future__ import annotations

import argparse
import os
import sys

# env-driven like bench.py, so the same invocation works on a laptop and
# a cluster edge node; the literal is only the harness-local fallback
DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="lakehouse_v3_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="list declared queries (optionally filtered)")
    lp.add_argument("substr", nargs="?", default="")

    rp = sub.add_parser("run", help="run a catalog query and print rows")
    rp.add_argument("query")
    rp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    rp.add_argument("--limit", type=int, default=20)

    ep = sub.add_parser("explain", help="print the formatted physical plan")
    ep.add_argument("query")
    ep.add_argument("--sf-dir", default=DEFAULT_SF_DIR)

    op = sub.add_parser("oracle", help="print the DuckDB oracle SQL")
    op.add_argument("query")

    gp = sub.add_parser(
        "gateway",
        help="serve the HTTP SQL gateway over the fixture tables "
        "(the reference's Trino surface)",
    )
    gp.add_argument("--host", default="127.0.0.1")
    gp.add_argument("--port", type=int, default=8780)
    gp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    gp.add_argument("--row-cap", type=int, default=10_000)
    gp.add_argument("--token", default=None)
    gp.add_argument(
        "--statement-timeout-ms", type=int, default=None
    )
    gp.add_argument(
        "--once",
        action="store_true",
        help="bind and exit immediately (smoke/CI)",
    )

    sp = sub.add_parser(
        "schedule-uber",
        help="run one scheduler tick of the uber medallion DAG "
        "(cron-invokable; durable .last_run state makes each tick "
        "resume where the last left off)",
    )
    sp.add_argument("--raw-dir", required=True, help="landing-zone csv dir")
    sp.add_argument("--warehouse", required=True)
    sp.add_argument(
        "--state-dir", default=None,
        help="scheduler state dir (default <warehouse>/_scheduler)",
    )
    sp.add_argument("--start", required=True, help="ISO schedule start")
    sp.add_argument(
        "--interval", default="@daily",
        help="@hourly/@daily/@weekly, 'M H * * *', 'M H * * D', or "
        "an integer number of seconds",
    )
    sp.add_argument("--no-catchup", action="store_true")
    sp.add_argument(
        "--now", default=None, help="ISO clock override (default: wall clock)"
    )
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    """Entry point. ``spark`` is injectable for tests; when None a
    session is created (and left running — JVM teardown isn't worth the
    wait for a CLI process about to exit)."""
    from .plans import load_all

    args = _build_parser().parse_args(argv)
    reg = load_all()

    if args.cmd == "list":
        for name in sorted(reg):
            if args.substr in name:
                doc = (reg[name].doc or "").strip().split("\n")[0]
                print(f"{name:42s} {doc[:90]}")
        return 0

    if args.cmd == "gateway":
        if spark is None:  # pragma: no cover - exercised via injected spark
            from .session import get_spark

            spark = get_spark(app_name="lakehouse-sql-gateway")
        from .io_utils import TABLES, load
        from .sql_gateway import SqlGateway

        for t in TABLES:
            try:
                load(spark, args.sf_dir, t).createOrReplaceTempView(t)
            except Exception:  # missing fixture table: serve the rest
                pass
        gw = SqlGateway(
            spark,
            host=args.host,
            port=args.port,
            row_cap=args.row_cap,
            token=args.token,
            statement_timeout_ms=args.statement_timeout_ms,
        ).start()
        print(f"sql gateway listening on {gw.url}", flush=True)
        if args.once:
            gw.stop()
            return 0
        try:  # pragma: no cover - interactive serve loop
            import time as _time

            while True:
                _time.sleep(3600)
        except KeyboardInterrupt:
            gw.stop()
        return 0

    if args.cmd == "schedule-uber":
        import json as _json
        from datetime import datetime, timedelta

        from .orchestrate import Schedule, ScheduledDag
        from .pipelines.dags import scheduled_uber_dag
        from .tables import TableManager

        if spark is None:  # pragma: no cover - exercised via injected spark
            from .session import get_spark

            spark = get_spark(app_name="lakehouse-scheduler")
        interval = (
            timedelta(seconds=int(args.interval))
            if args.interval.lstrip("-").isdigit()
            else args.interval
        )
        tm = TableManager(spark, args.warehouse)
        sd = ScheduledDag(
            scheduled_uber_dag(spark, args.raw_dir, tm),
            Schedule(
                start=datetime.fromisoformat(args.start),
                interval=interval,
                catchup=not args.no_catchup,
            ),
            state_dir=args.state_dir or f"{args.warehouse}/_scheduler",
        )
        now = (
            datetime.fromisoformat(args.now)
            if args.now
            else datetime.now()
        )
        for logical, report in sd.tick(now):
            print(
                _json.dumps(
                    {
                        "logical_date": logical.isoformat(),
                        "ok": report.ok,
                        "states": report.states(),
                    }
                )
            )
        return 0

    if args.cmd == "oracle":
        qd = reg.get(args.query)
        if qd is None:
            print(f"unknown query: {args.query}", file=sys.stderr)
            return 2
        print(qd.oracle or "-- no oracle (rows-only check)")
        return 0

    qd = reg.get(args.query)
    if qd is None:
        print(f"unknown query: {args.query}", file=sys.stderr)
        return 2

    if spark is None:  # pragma: no cover - exercised via injected spark
        from .session import get_spark

        spark = get_spark(app_name=f"lakehouse-cli-{args.cmd}")

    df = qd.fn(spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
