"""Reference-shaped DAG factories on the minimal orchestrator
(:mod:`lakehouse_v3_spark.orchestrate`).

Two graphs mirror the reference's Airflow wiring:

- :func:`uber_dag` — the linear medallion chain ``ingest >>
  csv_to_delta >> bronze2_to_silver >> silver_to_gold``
  (airflow/dags/uber_dag.py:29-98, default_args retries=10/1min,
  max_active_runs=1). Ingest discovers NEW csv files against a
  processed-file log (binaryFile listing ∖ log, the reference's
  incremental contract) and raises :class:`~..orchestrate.Skip` when
  there is nothing new — downstream layers then skip too, which is the
  Airflow behavior of the reference's isEmpty() short-circuit.
- :func:`audit_dag` — the fan-out/fan-in audit graph
  ``001 >> 002_completeness >> 004_fact_completeness`` ∥
  ``001 >> 002_validity >> 004_fact_validity`` with both 004s joining
  into ``005_send_alert`` (airflow/dags/001_004_dataaudit.py:149-153).

Tasks communicate ONLY through warehouse tables (each task re-reads
its upstream layer), exactly like the reference's spark-submit jobs
communicate through Delta tables — this is what makes every task, and
therefore every DAG re-run, idempotent: bronze append is guarded by
the file log, every later layer is a deterministic overwrite of a
derived table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..audit.config import (
    completeness_rules_from_df,
    completeness_rules_to_df,
    validity_rules_from_df,
    validity_rules_to_df,
)
from ..audit.engine import run_completeness_rules, run_validity_rules
from ..audit.facts import explode_results_to_fact, latest_run_failures
from ..audit.alerting import failure_report, send_alert
from ..incremental import FileLogCheckpoint, list_files
from ..orchestrate import Dag, Skip
from ..tables import TableManager
from . import uber
from .maintenance import maintain_task

# append-only bronze grows one file-set per run (the reference VACUUMs
# this zone itself, uber/drop_dup.py:96-101); the derived layers are
# atomic-swap overwrites, listed so maintain also sweeps their stray
# temp dirs
_UBER_MAINTAINED = (
    "uber.bronze1",
    "uber.bronze2",
    "uber.silver",
)

_AUDIT_MAINTAINED = (
    "audit.config_completeness",
    "audit.config_validity",
    "audit.dim_completeness",
    "audit.dim_validity",
    "audit.fact_completeness",
    "audit.fact_validity",
)


# ---------------------------------------------------------------------------
# UBER: ingest >> csv_to_delta >> bronze2_to_silver >> silver_to_gold
# ---------------------------------------------------------------------------

def uber_dag(
    spark,
    raw_dir: str,
    tm: TableManager,
    retries: int = 2,
    retry_delay: float = 0.0,
) -> Dag:
    """Build the uber medallion DAG. ``raw_dir`` holds the landing-zone
    csv files; tables land in ``tm``'s warehouse as
    ``uber.bronze1/bronze2/silver`` and four ``uber.gold_*`` KPI
    tables (reference job files: uber/csv_to_delta.py,
    uber/bronze2_to_silver.py, uber/silver_to_gold.py)."""

    def ingest(ctx):
        log = FileLogCheckpoint(tm, "uber_csv")
        listing = list_files(spark, raw_dir, suffix=".csv")
        new = log.new_files(listing).select("path")
        paths = [r.path for r in new.collect()]  # file NAMES, not data
        if not paths:
            raise Skip("no new csv files under " + raw_dir)
        raw = (
            spark.read.option("header", "true")
            .csv(paths)
            .withColumn("_ingest_file", F.input_file_name())
        )
        tm.append(raw, "uber.bronze1")
        log.record(new)
        return {"new_files": len(paths)}

    def csv_to_delta(ctx):
        raw = tm.read("uber.bronze1").drop("_ingest_file")
        tm.overwrite(uber.bronze2(raw), "uber.bronze2")

    def bronze2_to_silver(ctx):
        tm.overwrite(uber.silver(tm.read("uber.bronze2")), "uber.silver")

    def silver_to_gold(ctx):
        sv = tm.read("uber.silver")
        tm.overwrite(uber.gold_booking_stats(sv), "uber.gold_booking_stats")
        tm.overwrite(uber.gold_rushhour_stats(sv), "uber.gold_rushhour_stats")
        tm.overwrite(
            uber.gold_cancellation_stats(sv), "uber.gold_cancellation_stats"
        )
        tm.overwrite(uber.gold_payment_stats(sv), "uber.gold_payment_stats")

    dag = Dag("uber", lock_dir=tm.warehouse_dir)
    dag.task("ingest", ingest, retries=retries, retry_delay=retry_delay)
    dag.task("csv_to_delta", csv_to_delta, upstream=("ingest",),
             retries=retries, retry_delay=retry_delay)
    dag.task("bronze2_to_silver", bronze2_to_silver,
             upstream=("csv_to_delta",), retries=retries,
             retry_delay=retry_delay)
    dag.task("silver_to_gold", silver_to_gold,
             upstream=("bronze2_to_silver",), retries=retries,
             retry_delay=retry_delay)
    # maintenance rides every run (none_failed: a no-new-files Skip
    # upstream must not cascade) and self-skips under the file bound
    dag.task("maintain", maintain_task(tm, _UBER_MAINTAINED),
             upstream=("silver_to_gold",), retries=retries,
             retry_delay=retry_delay, trigger_rule="none_failed")
    return dag


def _interval_csv_files(raw_dir: str, start, end, suffix: str = ".csv") -> list[str]:
    """Hive-style landing-zone partition pruning (r8 verdict item #2).
    The reference's collectors land files under ``date=YYYY-MM-DD``
    keys (airflow/tasks/uber/ingestion.py:147-166); ONE shallow
    directory listing selects only the date= dirs that can overlap
    ``[start, end)``, so a scheduled tick never OPENS a data file
    outside its own interval — the fix for the per-tick full-landing-
    zone rescan (at 100× an hourly schedule was 24 full scans of the
    zone per day; now it's 24 listings plus each day's files once).

    Conservative rules (pruning is an optimization — it may read MORE
    than the interval, never less): flat ``*.csv`` directly under
    ``raw_dir`` carry no partition info and are always kept, and so is
    any ``date=`` dir whose key does NOT parse as a date (a misnamed
    partition must degrade to "read and let the timestamp filter
    decide", not silently vanish from every tick — r9 review). Keys
    are compared as PARSED dates, so non-zero-padded keys
    (``date=2024-5-1``) prune correctly rather than never matching.
    A row misfiled under a parseable key OUTSIDE its own day is the
    one case pruning cannot see — that is the collector's partition
    contract (identical to Hive/Delta partition-column semantics).
    """
    import os as _os
    from datetime import date as _date, timedelta as _td

    lo = start.date()
    hi = (end - _td(microseconds=1)).date()
    files: list[str] = []

    def _key_date(key: str):
        try:
            y, m, d = key.split("-")
            return _date(int(y), int(m), int(d))
        except (ValueError, TypeError):
            return None

    for e in sorted(_os.scandir(raw_dir), key=lambda e: e.name):
        if e.is_dir() and e.name.startswith("date="):
            kd = _key_date(e.name[len("date="):])
            if kd is None or lo <= kd <= hi:
                files.extend(
                    f"{e.path}/{fn}"
                    for fn in sorted(_os.listdir(e.path))
                    if fn.endswith(suffix)
                )
        elif e.name.endswith(suffix):
            files.append(e.path)
    return files


def scheduled_uber_dag(
    spark,
    raw_dir: str,
    tm: TableManager,
    retries: int = 0,
    retry_delay: float = 0.0,
) -> Dag:
    """Interval-scoped uber medallion DAG for :class:`~..orchestrate.
    ScheduledDag`: the ingest task selects ONLY the rows whose event
    timestamp (``Date`` + ``Time``) falls inside
    ``[ctx['data_interval_start'], ctx['data_interval_end'])`` — the Airflow pattern where each dag
    run processes its own data interval via the ``data_interval_*``
    template variables (reference airflow/dags/uber_dag.py:23-54:
    ``schedule_interval`` + ``catchup`` drive one logical date per
    run). The slice is MERGE-upserted into bronze1 keyed on
    ``Booking_ID`` (S10), so a crashed-and-replayed interval is
    idempotent — re-running a tick after a crash before the
    ``.last_run`` pointer advanced cannot double-count rows. Downstream
    layers recompute from full bronze1 exactly like :func:`uber_dag`,
    so a catchup backfill over N closed intervals converges to the
    same silver/gold tables as one batch run over all the data.

    Scan shape per tick (r8 verdict item #2): the landing zone is
    partition-pruned by :func:`_interval_csv_files` (date= dirs, the
    reference collectors' layout) so only the interval's files are
    opened, and the pre-merge pass is ONE aggregation over those files
    computing both the interval row count (the emptiness probe) and
    the unparseable-timestamp count — not the old two full scans
    (flat read + count). Rows whose Date/Time fail to_timestamp can
    belong to NO interval; they are surfaced in the result dict /
    Skip message instead of silently vanishing from bronze1 (r8
    advisory).

    An interval with no matching rows raises Skip (the reference's
    isEmpty() short-circuit, P18) and leaves every table untouched.
    """

    def ingest(ctx):
        start = ctx["data_interval_start"]
        end = ctx["data_interval_end"]
        paths = _interval_csv_files(raw_dir, start, end)
        if not paths:
            # common steady-state case (no files landed for this
            # interval): Skip on the LISTING alone — zero Spark jobs,
            # zero files opened
            raise Skip(f"no landing files for interval [{start}, {end})")
        raw = (
            spark.read.option("header", "true")
            .csv(paths)
            .withColumn("_ingest_file", F.input_file_name())
        )
        # slice at TIMESTAMP granularity (Date + Time) so sub-daily
        # schedules (@hourly, N-second intervals — all offered by the
        # schedule-uber CLI) select their own slice instead of
        # degenerating to empty intra-day windows (r8 review); falls
        # back to the Date column when the feed carries no Time.
        # try_to_timestamp, not to_timestamp: one malformed feed row
        # must become a COUNTED null (surfaced below), not an ANSI
        # cast error that kills the whole tick.
        if "Time" in raw.columns:
            ev_ts = F.try_to_timestamp(
                F.concat_ws(" ", F.col("Date"), F.col("Time"))
            )
        else:
            ev_ts = F.try_to_timestamp(F.col("Date"))
        in_interval = (ev_ts >= F.lit(start)) & (ev_ts < F.lit(end))
        # one pass over ONLY the interval's files: emptiness +
        # unparseable count together (an isEmpty probe would still
        # leave the mandatory unparseable count as a second job)
        stats = raw.agg(
            F.count(F.when(in_interval, 1)).alias("n"),
            F.count(F.when(ev_ts.isNull(), 1)).alias("unparsed"),
        ).first()
        n, unparsed = int(stats["n"]), int(stats["unparsed"])
        if n == 0:
            raise Skip(
                f"no rows in interval [{start}, {end}) "
                f"({unparsed} unparseable-timestamp rows excluded)"
            )
        tm.merge(raw.filter(in_interval), "uber.bronze1", key=["Booking_ID"])
        return {
            "interval_rows": n,
            "unparsed_rows": unparsed,
            "files_read": sorted(paths),
        }

    def csv_to_delta(ctx):
        raw = tm.read("uber.bronze1").drop("_ingest_file")
        tm.overwrite(uber.bronze2(raw), "uber.bronze2")

    def bronze2_to_silver(ctx):
        tm.overwrite(uber.silver(tm.read("uber.bronze2")), "uber.silver")

    def silver_to_gold(ctx):
        sv = tm.read("uber.silver")
        tm.overwrite(uber.gold_booking_stats(sv), "uber.gold_booking_stats")
        tm.overwrite(uber.gold_rushhour_stats(sv), "uber.gold_rushhour_stats")
        tm.overwrite(
            uber.gold_cancellation_stats(sv), "uber.gold_cancellation_stats"
        )
        tm.overwrite(uber.gold_payment_stats(sv), "uber.gold_payment_stats")

    dag = Dag("uber_scheduled", lock_dir=tm.warehouse_dir)
    dag.task("ingest", ingest, retries=retries, retry_delay=retry_delay)
    dag.task("csv_to_delta", csv_to_delta, upstream=("ingest",),
             retries=retries, retry_delay=retry_delay)
    dag.task("bronze2_to_silver", bronze2_to_silver,
             upstream=("csv_to_delta",), retries=retries,
             retry_delay=retry_delay)
    dag.task("silver_to_gold", silver_to_gold,
             upstream=("bronze2_to_silver",), retries=retries,
             retry_delay=retry_delay)
    # same maintenance discipline as the unscheduled DAG: a backfill
    # of N intervals appends N file-sets to bronze1; maintain bounds it
    dag.task("maintain", maintain_task(tm, _UBER_MAINTAINED),
             upstream=("silver_to_gold",), retries=retries,
             retry_delay=retry_delay, trigger_rule="none_failed")
    return dag


# ---------------------------------------------------------------------------
# AUDIT: 001 >> (002c >> 004c) ∥ (002v >> 004v) >> 005
# ---------------------------------------------------------------------------

def audit_dag(
    spark,
    tables,
    completeness_rules,
    validity_rules,
    tm: TableManager,
    transport,
    recipients: tuple[str, ...] = ("ops@example.com",),
    retries: int = 2,
) -> Dag:
    """Build the data-audit DAG over in-memory ``tables``
    (name → DataFrame). 001 persists the rule config to control
    tables; each 002 re-reads its config table and evaluates its rule
    family; each 004 explodes results into the violated-PK fact table;
    005 fan-ins both facts into one alert (skips itself when there are
    no failures, like the reference's "No failed audits to send")."""

    def load_config(ctx):
        tm.overwrite(
            completeness_rules_to_df(spark, completeness_rules),
            "audit.config_completeness",
        )
        tm.overwrite(
            validity_rules_to_df(spark, validity_rules),
            "audit.config_validity",
        )

    def dim_completeness(ctx):
        rules = completeness_rules_from_df(tm.read("audit.config_completeness"))
        tm.overwrite(
            run_completeness_rules(spark, tables, rules),
            "audit.dim_completeness",
        )

    def dim_validity(ctx):
        rules = validity_rules_from_df(tm.read("audit.config_validity"))
        tm.overwrite(
            run_validity_rules(spark, tables, rules), "audit.dim_validity"
        )

    def fact_completeness(ctx):
        tm.overwrite(
            explode_results_to_fact(tm.read("audit.dim_completeness")),
            "audit.fact_completeness",
        )

    def fact_validity(ctx):
        tm.overwrite(
            explode_results_to_fact(tm.read("audit.dim_validity")),
            "audit.fact_validity",
        )

    def send_alert_hourly(ctx):
        # latest run PER FACT TABLE, then union: the two 002 branches
        # stamp their own dt_checked_at, so a global MAX would silently
        # drop whichever branch finished first
        fact = latest_run_failures(
            tm.read("audit.fact_completeness")
        ).unionByName(
            latest_run_failures(tm.read("audit.fact_validity")),
            allowMissingColumns=True,
        )
        report = failure_report(fact)
        return send_alert(report, transport=transport, recipients=recipients)

    dag = Dag("dataaudit", lock_dir=tm.warehouse_dir)
    dag.task("001_load_config", load_config, retries=retries)
    dag.task("002_completeness", dim_completeness,
             upstream=("001_load_config",), retries=retries)
    dag.task("002_validity", dim_validity,
             upstream=("001_load_config",), retries=retries)
    dag.task("004_fact_completeness", fact_completeness,
             upstream=("002_completeness",), retries=retries)
    dag.task("004_fact_validity", fact_validity,
             upstream=("002_validity",), retries=retries)
    dag.task("005_send_alert_hourly", send_alert_hourly,
             upstream=("004_fact_completeness", "004_fact_validity"),
             retries=retries)
    # result tables are rewritten per run; maintain sweeps their stray
    # temp dirs and bounds any backend that accumulates (none_failed:
    # an alert-less Skip in 005 is independent — maintain keys on the
    # 004 facts only)
    dag.task("maintain", maintain_task(tm, _AUDIT_MAINTAINED),
             upstream=("004_fact_completeness", "004_fact_validity"),
             retries=retries, trigger_rule="none_failed")
    return dag


# ---------------------------------------------------------------------------
# CURATION: the LLM-curation medallion under the calendar (r10 item #4)
# ---------------------------------------------------------------------------

def scheduled_curation_dag(
    spark,
    landing_dir: str,
    tm: TableManager,
    retries: int = 0,
    retry_delay: float = 0.0,
    embeddings=None,
) -> Dag:
    """Interval-scoped curation DAG for :class:`~..orchestrate.
    ScheduledDag` — :func:`~.curation.curation_dag` with
    ``interval_scoped=True``: landing files are partition-pruned to the
    run's data interval by the ``date=`` dir rule (ONE shallow listing
    per tick), the file-log anti-join keeps crashed-interval replays
    idempotent, and every tick below ingest runs the batch-scoped
    incremental bodies — so a catchup backfill over N closed intervals
    converges to the same silver/gold tables as one batch run over all
    the data (tests/test_schedule.py pins the equality and the
    per-interval files_read discipline)."""
    from .curation import curation_dag

    return curation_dag(
        spark,
        landing_dir,
        tm,
        retries=retries,
        retry_delay=retry_delay,
        embeddings=embeddings,
        interval_scoped=True,
    )
