"""Observability: the reference's statsd metric surface re-expressed as
Spark observed metrics + a StreamingQueryListener.

Metric parity (reference: src/status.rs:42-71, full list README.adoc:469-516):

| reference metric              | here                                    |
|-------------------------------|-----------------------------------------|
| hotdog.lines                  | observed `lines_received`               |
| hotdog.error.log_parse        | observed `parse_errors`                 |
| hotdog.error.merge_target_not_json | observed `merge_aborted`           |
| hotdog.kafka.submitted        | observed `routed` (+ sink progress numRowsWritten) |
| hotdog.kafka.producer.sent (timer) | `durationMs.addBatch` per micro-batch (+ `batch.<phase>` timers for every durationMs entry) |
| hotdog.error.topic_parse_failed | compile-time impossible (static templates) → 0 |
| hotdog.error.full_internal_queue / internal_push_failed | structurally 0 — Spark backpressures instead of shedding (SURVEY §2.5 K2) |
| hotdog.connections            | no connections in Spark — mapped to active streaming queries |
| processing rate               | StreamingQueryProgress.processedRowsPerSecond |

Emission is statsd line protocol over UDP (plain socket, no deps),
disabled unless an address is configured — mirroring the optional
`global.metrics.statsd` block (src/settings.rs:143-146).
"""

from __future__ import annotations

import json
import socket

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

PREFIX = "hotdog"

# Column order of with_pipeline_observer's observation — the progress JSON
# serializes observed metrics as a bare value list, so consumers re-attach
# names from here.
PIPELINE_METRICS = (
    "lines_received",
    "parse_errors",
    "routed",
    "dropped_by_rules",
    "merge_aborted",
)


def with_pipeline_observer(df: DataFrame, name: str = "hotdog_pipeline") -> DataFrame:
    """Attach the reference's counters as observed metrics on a routed
    (topic/payload/matched_rule/merge_aborted) DataFrame produced with
    keep_dropped=True.

    Observed metrics ride the existing job — zero extra passes — and reach
    the listener via QueryProgress.observedMetrics in streaming or
    Observation in batch.
    """
    return df.observe(
        name,
        F.count(F.lit(1)).alias("lines_received"),
        F.count(F.when(F.col("format").isNull(), 1)).alias("parse_errors"),
        F.count(F.when(F.col("topic").isNotNull(), 1)).alias("routed"),
        F.count(
            F.when(F.col("topic").isNull() & F.col("matched_rule").isNotNull(), 1)
        ).alias("dropped_by_rules"),
        F.count(F.when(F.col("merge_aborted"), 1)).alias("merge_aborted"),
    )


class StatsdEmitter:
    """Minimal statsd-line-protocol UDP emitter (counter/gauge/timer)."""

    def __init__(self, address: str | None):
        self.address: tuple[str, int] | None
        if address:
            host, _, port = address.partition(":")
            self.address = (host, int(port or 8125))
            self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        else:
            self.address = None
            self.sock = None
        self.last: dict[str, float] = {}

    def counter(self, name: str, value: float) -> None:
        self._send(f"{PREFIX}.{name}:{int(value)}|c")
        self.last[name] = value

    def gauge(self, name: str, value: float) -> None:
        self._send(f"{PREFIX}.{name}:{value}|g")
        self.last[name] = value

    def timer(self, name: str, ms: float) -> None:
        """Statsd timer (milliseconds) — dipstick's timer line shape, the
        form the reference emits for hotdog.kafka.producer.sent
        (src/sink/kafka.rs:133-154)."""
        self._send(f"{PREFIX}.{name}:{int(ms)}|ms")
        self.last[name] = ms

    def _send(self, line: str) -> None:
        if self.address and self.sock:
            try:
                self.sock.sendto(line.encode(), self.address)
            except OSError:
                pass  # metrics must never take down the pipeline


class HotdogQueryListener(StreamingQueryListener):
    """Forwards observed metrics + throughput to statsd per micro-batch —
    the analog of the reference's per-event dipstick counters, but batched
    (src/main.rs:113-118 uses a queued async scope for the same reason)."""

    def __init__(self, emitter: StatsdEmitter, observation_name: str = "hotdog_pipeline"):
        self.emitter = emitter
        self.observation_name = observation_name
        self.progress_log: list[dict] = []

    def onQueryStarted(self, event) -> None:
        self.emitter.gauge("connections", 1)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        row = json.loads(p.json) if isinstance(p.json, str) else {}
        self.progress_log.append(row)
        self.emitter.gauge("processed_rows_per_second", row.get("processedRowsPerSecond") or 0)
        # Timers (reference parity: hotdog.kafka.producer.sent is a timer
        # around the Kafka write, src/sink/kafka.rs:133-154).  addBatch is
        # the sink-write phase of the micro-batch → that exact metric; the
        # remaining durationMs phases emit under batch.<phase> so operators
        # can see where micro-batch time goes.
        durations = row.get("durationMs") or {}
        if "addBatch" in durations:
            self.emitter.timer("kafka.producer.sent", durations["addBatch"] or 0)
        for phase, ms in durations.items():
            self.emitter.timer(f"batch.{phase}", ms or 0)
        # The typed accessor gives named Rows; the JSON form loses names
        # (observed metrics serialize as bare value lists).
        observed = (p.observedMetrics or {}).get(self.observation_name)
        if observed is not None:
            for key, value in observed.asDict().items():
                self.emitter.counter(key, value or 0)

    def onQueryTerminated(self, event) -> None:
        self.emitter.gauge("connections", 0)

    def onQueryIdle(self, event) -> None:  # pragma: no cover
        pass
