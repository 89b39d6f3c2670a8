"""Streaming throughput probe for the BASELINE.md implied target:
sustain >= 100,000 messages per run through parse → rules → sink
(the reference's load-generator volume, scripts/generate-stdout.rb:5-15).

Drives the rate source mapped to synthetic RFC 5424 JSON lines through
the canonical cascade into the memory sink and reports the stable
processedRowsPerSecond from StreamingQueryProgress — the measurement the
baseline calls for.

    python scripts/throughput.py [rows_per_second] [seconds]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    rps = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    seconds = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    from pyspark.sql import SparkSession

    from hotdog_spark.config import load
    from hotdog_spark.streaming.runner import build_routed_stream
    from hotdog_spark.streaming.sources import rate_syslog_lines

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("hotdog-throughput")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    settings = load(os.path.join(REPO, "tests", "configs", "canonical.yml"))
    src = rate_syslog_lines(spark, rows_per_second=rps)
    routed = build_routed_stream(src, settings)
    q = routed.writeStream.format("noop").start()

    deadline = time.time() + seconds
    rates: list[float] = []
    rows_total = 0
    try:
        while time.time() < deadline:
            time.sleep(2)
            lp = q.lastProgress
            if lp:
                r = lp.get("processedRowsPerSecond")
                rows_total = max(rows_total, lp.get("batchId", 0))
                if r:
                    rates.append(r)
    finally:
        q.stop()

    stable = sorted(rates)[len(rates) // 2] if rates else 0.0
    print(
        json.dumps(
            {
                "metric": "streaming_rows_per_second",
                "value": round(stable, 1),
                "unit": "rows/sec",
                "configured_rate": rps,
                "samples": [round(r, 1) for r in rates],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
