"""Notification sink (reference parity: S12,
``services/notifier/email.py:100-149`` + digest rendering
``airflow/dags/jobs_etl_daily.py:1192-1509``).

Renders the daily digest (run counts + top-25 jobs) as text + HTML and
sends via SMTP. Spark's role ends at the bounded top-k collect
(``report.daily_digest``); rendering/sending is driver-side by nature.
Send failures are swallowed like the reference's (notify task never fails
the pipeline); ``dry_run`` skips the network entirely.
"""

from __future__ import annotations

import html as _html
import smtplib
from dataclasses import dataclass
from email.mime.multipart import MIMEMultipart
from email.mime.text import MIMEText


@dataclass
class SmtpConfig:
    host: str = "localhost"
    port: int = 25
    sender: str = "jobspark@localhost"
    recipients: tuple[str, ...] = ()
    username: str | None = None
    password: str | None = None
    use_tls: bool = False


def render_digest(stats: dict, top_jobs: list) -> tuple[str, str]:
    """(text, html) bodies. ``top_jobs`` are Rows from report.daily_digest
    (hash_key, job_title_std, rank_score, ... whatever the fact carries)."""
    lines = ["jobspark daily digest", ""]
    for k, v in stats.items():
        lines.append(f"- {k}: {v}")
    lines.append("")
    lines.append("Top jobs:")
    rows_html = []
    for i, r in enumerate(top_jobs, 1):
        d = r.asDict() if hasattr(r, "asDict") else dict(r)
        title = d.get("job_title_std") or d.get("hash_key", "?")
        score = d.get("rank_score")
        src = d.get("source", "")
        lines.append(f"{i:2d}. {title} [{src}] score={score}")
        rows_html.append(
            "<tr><td>{}</td><td>{}</td><td>{}</td><td>{}</td></tr>".format(
                i, _html.escape(str(title)), _html.escape(str(src)), score
            )
        )
    text = "\n".join(lines)
    html_body = (
        "<h2>jobspark daily digest</h2><ul>"
        + "".join(f"<li>{_html.escape(str(k))}: {_html.escape(str(v))}</li>" for k, v in stats.items())
        + "</ul><table border='1'><tr><th>#</th><th>title</th><th>source</th><th>score</th></tr>"
        + "".join(rows_html)
        + "</table>"
    )
    return text, html_body


def send_message(
    subject: str,
    text: str,
    html_body: str | None = None,
    config: SmtpConfig | None = None,
    dry_run: bool = True,
) -> dict:
    """Generic text(+HTML) send — the reference's standalone notifier CLI
    surface (``services/notifier/main.py:32-55``). Returns {'sent': bool,
    'error': ...}; errors are captured, never raised (email failure does
    not fail the task)."""
    result = {"sent": False, "subject": subject, "error": None}
    if dry_run or config is None or not config.recipients:
        result["rendered_text"] = text
        return result
    try:
        msg = MIMEMultipart("alternative")
        msg["Subject"] = subject
        msg["From"] = config.sender
        msg["To"] = ", ".join(config.recipients)
        msg.attach(MIMEText(text, "plain"))
        if html_body is not None:
            msg.attach(MIMEText(html_body, "html"))
        with smtplib.SMTP(config.host, config.port, timeout=30) as smtp:
            if config.use_tls:
                smtp.starttls()
            if config.username:
                smtp.login(config.username, config.password or "")
            smtp.sendmail(config.sender, list(config.recipients), msg.as_string())
        result["sent"] = True
    except Exception as e:  # swallow like the reference
        result["error"] = str(e)
    return result


def send_digest(
    subject: str,
    stats: dict,
    top_jobs: list,
    config: SmtpConfig | None = None,
    dry_run: bool = True,
) -> dict:
    """Render the daily digest + send via ``send_message``."""
    text, html_body = render_digest(stats, top_jobs)
    result = send_message(subject, text, html_body, config=config, dry_run=dry_run)
    result["n_top"] = len(top_jobs)
    return result
