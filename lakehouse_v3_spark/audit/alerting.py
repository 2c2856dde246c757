"""Failed-audit report assembly + pluggable alert delivery (reference:
005_send_alert_hourly.py + email_html_generator.py). The report is a
DataFrame + rendered HTML; delivery goes through a transport callable so
tests record the message instead of talking SMTP — the reference
hard-codes gmail SMTP_SSL inside the job
(005_send_alert_hourly.py:224-311), which is untestable and leaks
credentials into code.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime
from typing import Callable

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


@dataclass(frozen=True)
class AlertMessage:
    """Everything a delivery channel needs, assembled engine-side:
    subject (reference 005:252 counts-in-subject convention), inline HTML
    preview body, and the full report as an HTML attachment
    (005:276-290)."""

    subject: str
    recipients: tuple[str, ...]
    html_body: str
    attachment_name: str
    attachment_bytes: bytes


def send_alert(
    report: DataFrame,
    transport: Callable[[AlertMessage], None],
    recipients: tuple[str, ...],
    now: datetime | None = None,
) -> AlertMessage | None:
    """S18 alert delivery. Mirrors the reference's send flow
    (005_send_alert_hourly.py:224-311): skip silently when there are no
    failures, subject = rule/table/violation counts + timestamp, body =
    capped per-rule preview, attachment = full HTML report. The
    ``transport`` callable does the actual I/O (SmtpTransport for real
    mail, a recording stub in tests) — the report is per-rule summary
    rows, already tiny, so the collect here is bounded by rule count,
    never data size."""
    rows = [r.asDict() for r in report.collect()]
    if not rows:  # reference: "No failed audits to send - skipping email"
        return None
    now = now or datetime.now()
    n_rules = len({r["rule_id"] for r in rows})
    n_tables = len({r["table_name"] for r in rows})
    n_viol = sum(int(r["n_violated"] or 0) for r in rows)
    html = render_html(rows)
    stamp = now.strftime("%Y%m%d_%H%M%S")
    msg = AlertMessage(
        subject=(
            f"Data Quality Alert - {n_rules} Rule(s), {n_tables} Table(s), "
            f"{n_viol} Violation(s) - {now.strftime('%Y-%m-%d %H:%M')}"
        ),
        recipients=tuple(recipients),
        html_body=html,
        attachment_name=f"data_quality_alert_{stamp}.html",
        attachment_bytes=html.encode("utf-8"),
    )
    transport(msg)
    return msg


class SmtpTransport:
    """Real SMTP delivery (smtplib SMTP_SSL, reference 005:297-301), kept
    out of the engine path so no test or pipeline ever needs network.
    Credentials come from the caller/environment — never hard-coded."""

    def __init__(self, host: str, port: int, sender: str, password: str):
        self.host, self.port, self.sender, self.password = host, port, sender, password

    def __call__(self, msg: AlertMessage) -> None:  # pragma: no cover - network
        import smtplib
        from email.mime.base import MIMEBase
        from email.mime.multipart import MIMEMultipart
        from email.mime.text import MIMEText
        from email import encoders

        mime = MIMEMultipart("alternative")
        mime["Subject"] = msg.subject
        mime["From"] = self.sender
        mime["To"] = ", ".join(msg.recipients)
        mime.attach(MIMEText(msg.html_body, "html"))
        part = MIMEBase("application", "octet-stream")
        part.set_payload(msg.attachment_bytes)
        encoders.encode_base64(part)
        part.add_header(
            "Content-Disposition", f"attachment; filename= {msg.attachment_name}"
        )
        mime.attach(part)
        with smtplib.SMTP_SSL(self.host, self.port) as server:
            server.login(self.sender, self.password)
            server.sendmail(self.sender, list(msg.recipients), mime.as_string())
