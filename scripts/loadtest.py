"""End-to-end TCP load validation against the reference envelope.

The reference's implied operating envelope is >= 100,000 syslog messages
per run (scripts/generate-stdout.rb:5-15 generates 100k JSON lines;
tsung.xml:13-16 drives up to 100k sessions).  This script proves the
Spark engine sustains that volume END TO END with ZERO dropped rows —
stronger than the reference, which sheds load on a full internal queue
(src/sink/kafka.rs:45, README.adoc:198-202):

    4 sender connections (mirroring generate-stdout.rb's 4-way parallel
    send) push N RFC 5424 JSON-payload lines over plain TCP into the
    custom syslog DataSource → parse → rule cascade → routed stream →
    sink.  We wait until the sink has seen EXACTLY N rows and report the
    end-to-end rate plus the per-batch processedRowsPerSecond samples.

    python scripts/loadtest.py [n_messages] [port] [sink] [mode]

``mode`` is ``bulk`` (default — 4 persistent connections) or
``arrival``: the tsung envelope shape (tsung.xml:13-16), N short-lived
sessions opened at SPARK_GRAFT_ARRIVAL_RATE connections/second
(default 100), one message per connection — exercising accept-loop
churn instead of steady-stream throughput.

``sink`` is ``memory`` (default — counting sink) or ``parquet``: the
reference's real path ends in Kafka/Parquet
(/root/reference/src/sink/parquet.rs:238-290), so the parquet mode
drives ``typed_parquet_foreach_batch`` with a DECLARED schema for the
routed topic — every payload decodes through the schema into typed
parquet files, and the received count is read back from the files
themselves (plus the count of written parquet files).

Prints ONE JSON line: {"metric": "...", "value": <rows/s>,
"sent": N, "received": N, "dropped": 0, ...}
"""

from __future__ import annotations

import json
import os
import random
import socket
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _send(host: str, port: int, lines: list[str]) -> None:
    with socket.create_connection((host, port), timeout=30) as s:
        payload = ("\n".join(lines) + "\n").encode()
        s.sendall(payload)


def _send_arrival(host: str, port: int, lines: list[str], rate: int) -> dict:
    """tsung-shaped ramped-arrival sender (tsung.xml:13-16: arrival
    rate of short-lived sessions, one message each): open ``rate`` NEW
    connections per second, each sending ONE line then closing — the
    accept-loop churn pattern the 4-persistent-connection bulk mode
    never exercises (sources/syslog_tcp.py:58).  Connections are
    dispatched from a thread pool on a 10-tick/s schedule; returns
    arrival stats (achieved conn/s, connect failures)."""
    from concurrent.futures import ThreadPoolExecutor

    failures = [0]
    lock = threading.Lock()

    def one(line: str) -> None:
        try:
            with socket.create_connection((host, port), timeout=30) as s:
                s.sendall((line + "\n").encode())
        except OSError:
            with lock:
                failures[0] += 1

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=min(256, rate * 4)) as pool:
        per_tick = rate / 10.0
        carry = 0.0
        i = 0
        tick = 0
        while i < len(lines):
            carry += per_tick
            take = int(carry)
            carry -= take
            for _ in range(min(take, len(lines) - i)):
                pool.submit(one, lines[i])
                i += 1
            tick += 1
            sleep_until = t0 + tick / 10.0
            delay = sleep_until - time.time()
            if delay > 0:
                time.sleep(delay)
    dt = time.time() - t0
    return {
        "connections": len(lines),
        "target_rate_per_s": rate,
        "achieved_rate_per_s": round(len(lines) / dt, 1),
        "connect_failures": failures[0],
        "ramp_seconds": round(dt, 2),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    port = int(sys.argv[2]) if len(sys.argv) > 2 else random.randint(20000, 40000)
    sink = sys.argv[3] if len(sys.argv) > 3 else "memory"
    mode = sys.argv[4] if len(sys.argv) > 4 else "bulk"
    arrival_rate = int(os.environ.get("SPARK_GRAFT_ARRIVAL_RATE", "100"))
    host = "127.0.0.1"

    import glob
    import shutil
    import tempfile

    from pyspark.sql import SparkSession

    from hotdog_spark.config import load, load_dict
    from hotdog_spark.sources.syslog_tcp import syslog_stream
    from hotdog_spark.streaming.runner import build_routed_stream

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("hotdog-loadtest")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    settings = load(os.path.join(REPO, "tests", "configs", "canonical.yml"))
    src = syslog_stream(spark, host=host, port=port, buffer=str(max(n * 2, 200_000)))
    routed = build_routed_stream(src, settings)

    out_dir = None
    if sink == "parquet":
        # the reference's real sink path: declared per-topic schema →
        # typed parquet (src/sink/parquet.rs:171-230).  The loadtest
        # payloads route to topic `test` with the cascade's merged JSON,
        # so declare that exact shape.
        from hotdog_spark.streaming.sinks import typed_parquet_foreach_batch

        typed_settings = load_dict(
            {
                "global": {"listen": {"port": 1}},
                "rules": [],
                "schemas": [
                    {
                        "topic": "test",
                        "fields": {
                            "i": {"type": "long"},
                            "meta": {
                                "type": "struct",
                                "fields": {
                                    "topic": {"type": "string"},
                                    "hotdog": {
                                        "type": "struct",
                                        "fields": {"version": {"type": "string"}},
                                    },
                                },
                            },
                        },
                    }
                ],
            },
            environ={},
        )
        out_dir = tempfile.mkdtemp(prefix="hotdog_loadtest_pq_")
        ckpt = tempfile.mkdtemp(prefix="hotdog_loadtest_ck_")
        q = (
            routed.writeStream.foreachBatch(
                typed_parquet_foreach_batch(typed_settings, out_dir)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

        def count_received() -> int:
            try:
                return spark.read.parquet(f"{out_dir}/topic=test").count()
            except Exception:
                return 0  # no files yet
    else:
        q = (
            routed.writeStream.format("memory")
            .queryName("loadtest_sink")
            .outputMode("append")
            .start()
        )

        def count_received() -> int:
            return spark.sql(
                "SELECT COUNT(*) AS c FROM loadtest_sink"
            ).collect()[0].c

    # Give the listener a beat to bind, then blast N lines over 4
    # parallel connections (generate-stdout.rb parity).
    time.sleep(3)
    lines = [
        (
            f"<13>1 2024-01-01T00:00:{i % 60:02d}.000Z loadgen hotdog - - - "
            + json.dumps({"meta": {"topic": "test"}, "i": i})
        )
        for i in range(n)
    ]
    arrival_stats = None
    t0 = time.time()
    if mode == "arrival":
        arrival_stats = _send_arrival(host, port, lines, arrival_rate)
    else:
        senders = []
        for part in range(4):
            chunk = lines[part::4]
            th = threading.Thread(target=_send, args=(host, port, chunk))
            th.start()
            senders.append(th)
        for th in senders:
            th.join()
    sent_s = time.time() - t0

    # Drain: wait until the sink has exactly n rows (the canonical config
    # routes every parsed line; nothing is dropped on the happy path).
    rates: list[float] = []
    received = 0
    deadline = time.time() + 600
    while time.time() < deadline:
        received = count_received()
        lp = q.lastProgress
        if lp and lp.get("processedRowsPerSecond"):
            rates.append(lp["processedRowsPerSecond"])
        if received >= n:
            break
        time.sleep(2)
    total_s = time.time() - t0
    q.stop()

    payload = {
        "metric": (
            "tcp_e2e_typed_parquet_messages_per_second"
            if sink == "parquet"
            else "tcp_e2e_messages_per_second"
        ),
        "value": round(n / total_s, 1),
        "unit": "rows/sec",
        "sent": n,
        "received": received,
        "dropped": n - received,
        "send_seconds": round(sent_s, 2),
        "e2e_seconds": round(total_s, 2),
        "batch_rates_sample": [round(r, 1) for r in rates[-5:]],
    }
    if arrival_stats is not None:
        payload["metric"] = "tcp_arrival_e2e_messages_per_second"
        payload["arrival"] = arrival_stats
    if out_dir is not None:
        payload["parquet_files_written"] = len(
            glob.glob(f"{out_dir}/topic=test/*.parquet")
        )
        payload["decode_failed"] = 0 if received == n else None
        shutil.rmtree(out_dir, ignore_errors=True)
    print(json.dumps(payload))
    spark.stop()
    sys.exit(0 if received == n else 1)


if __name__ == "__main__":
    main()
