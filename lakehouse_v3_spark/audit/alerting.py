"""Failed-audit report assembly (reference: 005_send_alert_hourly.py +
email_html_generator.py, minus the SMTP side effect — the report is
returned as a DataFrame + rendered HTML string; delivery is the
caller's concern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PREVIEW_ROWS = 5  # reference: ≤5 preview rows per config (005:134-147)


def failure_report(fact_failures: DataFrame) -> DataFrame:
    """Per-rule failure summary with a ≤5-PK preview, mirroring the
    reference's email body grouping (005:112-147): top-N per group via a
    partitioned window (W4), distinct rule dimensions, counts."""
    w = Window.partitionBy("rule_id").orderBy(F.coalesce("violated_pk", F.lit("")))
    preview = (
        fact_failures.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PREVIEW_ROWS)
        .groupBy("rule_id")
        .agg(F.sort_array(F.collect_list("violated_pk")).alias("pk_preview"))
    )
    summary = fact_failures.groupBy(
        "rule_id", "table_name", "audit_kind", "rule_text", "ds_audit_result"
    ).agg(
        F.max("n_violated").alias("n_violated"),
        F.max("dt_checked_at").alias("dt_checked_at"),
    )
    return summary.join(preview, on="rule_id", how="left").orderBy("rule_id")


def render_html(report_rows: list) -> str:
    """Minimal HTML table render of the failure report (the reference
    builds a styled HTML email, email_html_generator.py:4-127; layout is
    cosmetic — content parity is the rule rows)."""
    head = (
        "<html><body><h3>Data audit failures</h3><table border='1'>"
        "<tr><th>rule</th><th>table</th><th>kind</th><th>result</th>"
        "<th>violations</th><th>pk preview</th><th>checked at</th></tr>"
    )
    body = "".join(
        "<tr>"
        f"<td>{r['rule_id']}</td><td>{r['table_name']}</td><td>{r['audit_kind']}</td>"
        f"<td>{r['ds_audit_result']}</td><td>{r['n_violated']}</td>"
        f"<td>{', '.join(r['pk_preview'] or [])}</td><td>{r['dt_checked_at']}</td>"
        "</tr>"
        for r in report_rows
    )
    return head + body + "</table></body></html>"
