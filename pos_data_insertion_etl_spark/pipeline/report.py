"""Run-report / notification sink (O13 parity).

The reference renders an HTML email from the run-metrics dict and POSTs
it to a Logic App (/root/reference/email_sender.py:23-93), with the
subject chosen by success/failure (email_sender.py:71). Here the render
is a pure function and the transport is a pluggable callable, so tests
(and air-gapped deployments) can capture reports without a network; wire
`send_report(metrics, sink=requests_post)` in production.
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import datetime, timezone

METRIC_LABELS = {
    "file_name": "File name",
    "error_message": "Error message",
    "total_time_seconds": "Total time (s)",
    "total_rows_processed": "Rows processed",
    "total_data_processed_mb": "Data processed (MB)",
}


def render_run_report(metrics: dict) -> dict:
    """Render {subject, html} from a FIXTURES.md A8 metrics dict."""
    failed = bool(metrics.get("is_file_failed"))
    subject = (
        "POS Daily ETL - FAILURE" if failed else "POS Daily ETL - SUCCESS"
    )
    ts = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S UTC")
    rows = "".join(
        f"<tr><td>{label}</td><td>{metrics.get(key, '')}</td></tr>"
        for key, label in METRIC_LABELS.items()
    )
    html = (
        f"<html><body><h3>{subject}</h3>"
        f"<p>Generated at {ts}</p>"
        f"<table border='1'>{rows}</table>"
        "</body></html>"
    )
    return {"subject": subject, "html": html}


def send_report(
    metrics: dict, sink: Callable[[dict], None] | None = None
) -> dict:
    """Render and dispatch; returns the rendered payload either way."""
    payload = render_run_report(metrics)
    if sink is not None:
        sink(payload)
    return payload
