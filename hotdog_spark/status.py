"""Status HTTP server — M2 parity (reference: src/status.rs:23-40,
launched from src/main.rs:120-122 when `global.status` is configured).

The reference serves a banner at `/` and an empty JSON map at `/stats`
(its stats wiring was never finished).  Here `/stats` actually reports:
the active streaming queries, their last progress (rows/sec, batch
durations) and the last observed pipeline metrics — everything the
reference's statsd counters carry, pull-model instead of push.

Runs on a daemon thread with the stdlib http.server: no Spark jobs, no
extra dependencies, safe to leave running for the life of the driver.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

BANNER = b"hotdog status server"


def _named_observed(observed: dict | None) -> dict | None:
    """Observed metrics arrive as Rows (name-preserving) from the typed
    progress object, but json.dumps would flatten a Row to a bare value
    list — convert to plain dicts first.  A raw list (JSON-path input)
    gets names re-attached for the observation we know the shape of."""
    from hotdog_spark.metrics import PIPELINE_METRICS

    if not observed:
        return observed
    out = {}
    for name, values in observed.items():
        if hasattr(values, "asDict"):
            out[name] = values.asDict()
        elif name == "hotdog_pipeline" and isinstance(values, list):
            out[name] = dict(zip(PIPELINE_METRICS, values))
        else:
            out[name] = values
    return out


def _stats_payload(spark, emitter=None) -> dict:
    queries = []
    for q in spark.streams.active:
        lp = q.lastProgress
        row = {
            "id": str(q.id),
            "name": q.name,
            "isActive": q.isActive,
        }
        if lp:
            row.update(
                batchId=lp.get("batchId"),
                processedRowsPerSecond=lp.get("processedRowsPerSecond"),
                inputRowsPerSecond=lp.get("inputRowsPerSecond"),
                observedMetrics=_named_observed(lp.get("observedMetrics")),
            )
        queries.append(row)
    payload = {"queries": queries, "connections": len(queries)}
    if emitter is not None:
        payload["counters"] = dict(emitter.last)
    return payload


def start_status_server(spark, address: str = "127.0.0.1", port: int = 0, emitter=None):
    """Start the server; returns (server, bound_port).  port=0 picks an
    ephemeral port (tests); the reference default is :8585
    (README.adoc:104-110)."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802  (stdlib naming)
            if self.path == "/":
                body = BANNER
                ctype = "text/plain"
            elif self.path == "/stats":
                body = json.dumps(_stats_payload(spark, emitter)).encode()
                ctype = "application/json"
            else:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # silence request logging
            pass

    server = ThreadingHTTPServer((address, port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, server.server_address[1]
