"""Notification side-channel (SURVEY §2.2 K6) — the run-summary email.

The reference sends SMTP mail inline at the end of each ingest run
(cv.py:148-169, cv-api.py:210-231), conditional on new rows
(cv-api.py:245-247). In the engine this is strictly OUTSIDE the query
core: a post-action callback for batch jobs and a
``StreamingQueryListener`` for streams. Transport is pluggable so tests
capture messages instead of talking to an SMTP server; the real
transport uses only stdlib ``smtplib``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from ..config import EngineConfig


@dataclass(frozen=True)
class RunSummary:
    """What the reference put in the mail body (cv-api.py:217-222):
    job name, row counts, and a human message."""

    job: str
    new_records: int
    total_records: int
    message: str = ""


def format_summary(s: RunSummary) -> str:
    """The reference's body shape: counts + dashboard pointer."""
    lines = [
        f"Job: {s.job}",
        f"New records: {s.new_records}",
        f"Total records: {s.total_records}",
    ]
    if s.message:
        lines.append(s.message)
    return "\n".join(lines)


def smtp_transport(cfg: EngineConfig) -> Callable[[str, str], None]:
    """Live transport (subject, body) → SMTP send; stdlib only."""

    def send(subject: str, body: str) -> None:
        import smtplib
        from email.message import EmailMessage

        msg = EmailMessage()
        msg["Subject"] = subject
        msg["From"] = cfg.email_from
        msg["To"] = cfg.email_to
        msg.set_content(body)
        with smtplib.SMTP(cfg.smtp_server, cfg.smtp_port) as s:
            s.starttls()
            if cfg.email_password:
                s.login(cfg.email_from, cfg.email_password)
            s.send_message(msg)

    return send


class Notifier:
    """Post-action notification hook.

    ``notify_if_new`` reproduces the reference's conditional send —
    mail only when the load actually added rows (cv-api.py:245-247).
    """

    def __init__(self, transport: Callable[[str, str], None]):
        self._send = transport

    def notify(self, summary: RunSummary) -> None:
        self._send(f"[{summary.job}] run summary", format_summary(summary))

    def notify_if_new(self, summary: RunSummary) -> bool:
        if summary.new_records > 0:
            self.notify(summary)
            return True
        return False


def streaming_listener(notifier: Notifier, job: str):
    """StreamingQueryListener that mails per-batch row counts — the
    streaming analogue of the post-run mail (K5's numInputRows metric).
    Attach with ``spark.streams.addListener(...)``."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _Listener(StreamingQueryListener):
        def onQueryStarted(self, event) -> None:
            pass

        def onQueryProgress(self, event) -> None:
            n = event.progress.numInputRows
            notifier.notify_if_new(
                RunSummary(job=job, new_records=n, total_records=-1,
                           message=f"batch {event.progress.batchId}")
            )

        def onQueryIdle(self, event) -> None:
            pass

        def onQueryTerminated(self, event) -> None:
            pass

    return _Listener()
