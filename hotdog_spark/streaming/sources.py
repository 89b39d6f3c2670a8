"""Streaming sources for raw syslog lines.

Parity map (reference → Spark):

* S1 TCP plaintext listener (src/serve/plain.rs, src/serve/mod.rs:73-173)
  → dev-mode ``socket`` source, or — the production path — a syslog→Kafka
  bridge in front of the ``kafka`` source (per-partition ordering,
  replayable offsets, real backpressure; strictly stronger delivery than
  the reference's drop-on-full queue, SURVEY §2.5 K2).
* S2 TLS listener (src/serve/tls.rs) → terminate TLS outside Spark
  (stunnel/LB/Kafka TLS); no Spark-native TLS socket source exists.
* S3 line framing (src/connection.rs:85) → built into socket/text/kafka
  sources (record = line / message).
* S4 file scan (src/rules.rs:16-57) → ``text`` file-directory stream
  (also the easiest integration-test source).
* Load generator (scripts/generate-stdout.rb) → ``rate`` source mapped to
  synthetic RFC 5424 lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def socket_lines(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Dev-mode TCP line source (column ``value``).  Not fault-tolerant —
    use kafka_lines in production."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


def file_lines(spark: SparkSession, path: str) -> DataFrame:
    """Line-delimited text files appearing under ``path``."""
    return spark.readStream.format("text").load(path).withColumnRenamed("value", "value")


def kafka_lines(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    conf: dict[str, str] | None = None,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka source → one row per message (column ``value``), with the
    librdkafka-style conf passthrough the reference documents
    (README.adoc:204-211): every ``conf`` key is forwarded as a
    ``kafka.``-prefixed option.  ``max_offsets_per_trigger`` is the
    backpressure knob replacing the reference's drop-on-full buffer."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in (conf or {}).items():
        reader = reader.option(f"kafka.{k}", v)
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load().select(F.col("value").cast("string").alias("value"))


def rate_syslog_lines(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Synthetic RFC 5424 JSON-payload lines at a fixed rate — the analog
    of the reference's tsung/Ruby load generators (tsung.xml:19-31,
    scripts/generate-stdout.rb:12-24)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    return rate.select(
        F.concat(
            F.lit("<13>1 "),
            F.date_format("timestamp", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"),
            F.lit(" loadgen hotdog - - - "),
            F.to_json(
                F.struct(
                    F.struct(F.lit("test").alias("topic")).alias("meta"),
                    F.col("value").alias("i"),
                )
            ),
        ).alias("value")
    )


def parquet_replay(
    spark: SparkSession,
    path: str,
    schema,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Replay an existing parquet dataset as a stream — the backfill
    path: reprocess historical data through the SAME streaming pipeline
    (cascade, stateful ops, sinks) instead of maintaining a separate
    batch variant.

    ``maxFilesPerTrigger`` is the replay throttle: micro-batches advance
    file-by-file, so stateful operators observe realistic increments and
    a backfill can't overwhelm the sink.  The file source requires an
    explicit schema (streaming scans don't infer).
    """
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
