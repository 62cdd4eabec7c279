"""Failure alerting for pipeline runs — the reference's
``email_on_failure`` (mabna_tables_create.py:21-30: Airflow
default_args mail the maintainer on task failure) as a pluggable
hook.

An *alerter* is any ``Callable[[RunResult], None]``. The pipeline
invokes it once per FAILED table, after retries are exhausted and the
RunResult is recorded — alerting is observability, so a broken alerter
can never break the run (exceptions are swallowed at the call site,
G5's fault-isolation rule).

Two transports ship:

- :func:`file_alerter` — one JSON line per failure appended to a local
  file. The sandbox-real transport (no SMTP egress here) and the
  production-sane default: greppable, durable, and consumable by any
  log shipper.
- :func:`email_alerter` — the reference-shaped transport: builds an
  RFC-5322 message per failure and hands it to smtplib. The SMTP
  session is injectable (``transport=``) so tests exercise the full
  message build + send path without network; the default transport
  opens a real ``smtplib.SMTP`` connection when egress exists.

``compose_alerters`` fans one failure out to several sinks.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from .pipeline import RunResult


def file_alerter(path: str) -> "Callable[[RunResult], None]":
    """Alerter appending one JSON line per failed table to ``path``:
    ``{"table", "error", "attempts"}`` — the machine face of the
    reference's failure email."""

    def _alert(result: "RunResult") -> None:
        with open(path, "a", encoding="utf-8") as fh:
            fh.write(
                json.dumps(
                    {
                        "table": result.table,
                        "error": result.error,
                        "attempts": result.attempts,
                    }
                )
                + "\n"
            )

    return _alert


def format_failure_email(
    result: "RunResult", sender: str, recipients: "list[str]"
) -> str:
    """The RFC-5322 text of one failure alert — subject names the
    table (the Airflow failure-email convention the reference relies
    on), body carries error + attempts. Split out so tests and custom
    transports share the exact message build."""
    body = (
        f"Pipeline table load FAILED after {result.attempts} attempt(s).\n"
        f"\n"
        f"table:    {result.table}\n"
        f"error:    {result.error}\n"
        f"attempts: {result.attempts}\n"
    )
    return (
        f"From: {sender}\r\n"
        f"To: {', '.join(recipients)}\r\n"
        f"Subject: [pipeline] FAILED: {result.table}\r\n"
        f"\r\n"
        f"{body}"
    )


def email_alerter(
    smtp_host: str,
    sender: str,
    recipients: "list[str]",
    smtp_port: int = 25,
    transport: "Callable[[str, int, str, list[str], str], None] | None" = None,
) -> "Callable[[RunResult], None]":
    """Alerter mailing one message per failed table — the reference's
    ``email_on_failure`` shape (mabna_tables_create.py:25). ``transport``
    receives ``(host, port, sender, recipients, message)``; the default
    opens ``smtplib.SMTP(host, port)`` and calls ``sendmail`` (requires
    egress — inject a transport in egress-less environments; this
    sandbox has none, so tests pin the message build through a fake)."""
    if not recipients:
        raise ValueError("email_alerter: recipients must be non-empty")

    def _default_transport(
        host: str, port: int, from_: str, to: "list[str]", msg: str
    ) -> None:  # pragma: no cover — no SMTP egress in the sandbox
        import smtplib

        with smtplib.SMTP(host, port) as smtp:
            smtp.sendmail(from_, to, msg.encode("utf-8"))

    send = transport or _default_transport

    def _alert(result: "RunResult") -> None:
        msg = format_failure_email(result, sender, recipients)
        send(smtp_host, smtp_port, sender, list(recipients), msg)

    return _alert


def compose_alerters(
    *alerters: "Callable[[RunResult], None]",
) -> "Callable[[RunResult], None]":
    """One alerter fanning a failure out to every given sink, in
    order. Each sink is isolated: one sink raising does not stop the
    others (the pipeline additionally isolates the composite)."""
    import contextlib

    def _alert(result: "RunResult") -> None:
        for fn in alerters:
            with contextlib.suppress(Exception):
                fn(result)

    return _alert
