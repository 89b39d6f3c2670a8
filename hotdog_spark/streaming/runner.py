"""Streaming pipeline runner: wire source → parse → cascade → sink with
triggers, metrics and graceful shutdown.

This is the daemon-mode lifecycle of the reference (src/main.rs:34-154 +
src/serve/mod.rs:73-173) collapsed into Structured Streaming terms: the
YAML settings pick the source and sink, the compiled cascade is the
dataflow, the micro-batch trigger is the flush timer, and query.stop() is
the SIGINT drain (src/serve/mod.rs:124-134).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from hotdog_spark.config import Settings
from hotdog_spark.functions.syslog import parse_syslog_df
from hotdog_spark.metrics import (
    HotdogQueryListener,
    StatsdEmitter,
    with_pipeline_observer,
)
from hotdog_spark.plans.compiler import apply_cascade
from hotdog_spark.streaming import sinks, sources


def build_routed_stream(
    raw: DataFrame, settings: Settings, merge_mode: str = "exact"
) -> DataFrame:
    """Raw line stream → routed (topic, payload) stream with the metric
    observer attached.  Unparsed lines are kept through the observer (so
    parse_errors counts them) then dropped before the sink."""
    parsed = parse_syslog_df(raw, drop_unparsed=False)
    routed = apply_cascade(
        parsed.filter(F.col("format").isNotNull()),
        settings,
        keep_dropped=True,
        merge_mode=merge_mode,
    )
    unparsed = parsed.filter(F.col("format").isNull()).select(
        *[F.col(c) for c in parsed.columns],
        F.lit(None).cast("string").alias("topic"),
        F.lit(None).cast("string").alias("payload"),
        F.lit(None).cast("int").alias("matched_rule"),
        F.lit(False).alias("merge_aborted"),
    )
    observed = with_pipeline_observer(routed.unionByName(unparsed))
    return observed.filter(F.col("topic").isNotNull())


def start_pipeline(
    spark: SparkSession,
    settings: Settings,
    source: DataFrame,
    checkpoint_dir: str,
    merge_mode: str = "exact",
    install_listener: bool = True,
) -> StreamingQuery:
    """Start the configured sink over the routed stream.

    Trigger = parquet flush_ms when the parquet sink is configured
    (the micro-batch interval IS the reference's timer flush,
    src/sink/parquet.rs:101-113); kafka runs with the default as-fast-
    as-possible micro-batches (the reference relays unbuffered)."""
    if install_listener:
        statsd_addr = (settings.global_.metrics or {}).get("statsd")
        listener = HotdogQueryListener(StatsdEmitter(statsd_addr))
        spark.streams.addListener(listener)

    routed = build_routed_stream(source, settings, merge_mode=merge_mode)

    g = settings.global_
    if g.parquet is not None:
        flush_s = max(1, g.parquet.flush_ms // 1000)
        writer = sinks.parquet_writer(
            routed, g.parquet, checkpoint=f"{checkpoint_dir}/parquet"
        ).trigger(processingTime=f"{flush_s} seconds")
        if settings.schemas:
            writer = (
                routed.writeStream.foreachBatch(
                    sinks.typed_parquet_foreach_batch(settings, g.parquet.url)
                )
                .option("checkpointLocation", f"{checkpoint_dir}/parquet")
                .trigger(processingTime=f"{flush_s} seconds")
            )
        return writer.start()
    if g.kafka is not None:
        return sinks.kafka_writer(
            routed, g.kafka, checkpoint=f"{checkpoint_dir}/kafka"
        ).start()
    # default for dev: in-memory sink
    return sinks.memory_sink(routed, "hotdog_routed")


def windowed_counts_stream(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    width: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time tumbling counts with a watermark: rows later than
    ``watermark`` behind the max seen event time are dropped and their
    window state evicted — the bounded-state streaming form of
    operators.windows.tumbling_counts (the reference has no event time at
    all, SURVEY §2.8; this is the extension a real pipeline needs)."""
    from pyspark.sql import functions as F2

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F2.window(F2.col(ts_col), width).alias("w"), F2.col(key_col))
        .agg(F2.count(F2.lit(1)).alias("n"))
        .select(
            F2.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            key_col,
            "n",
        )
    )


def graceful_stop(query: StreamingQuery, timeout_s: int = 60) -> None:
    """Drain and stop — the SIGINT final-flush analog
    (src/sink/parquet.rs:226-229): stop() lets the in-flight micro-batch
    finish, so nothing buffered is lost."""
    query.processAllAvailable()
    query.stop()
    query.awaitTermination(timeout_s)


def run_from_config(
    spark: SparkSession,
    settings: Settings,
    checkpoint_dir: str,
    source_kind: str = "socket",
    **source_opts,
) -> StreamingQuery:
    """Config-driven end-to-end launch, mirroring `hotdog -c config.yml`."""
    if source_kind == "syslog":
        # The native listener source (S1/S2): honors global.listen.tls +
        # cert/key exactly like the reference's server selection
        # (src/main.rs:139-154).
        from hotdog_spark.sources.syslog_tcp import syslog_stream

        listen = settings.global_.listen
        opts = {
            "host": source_opts.get("host", listen.address),
            "port": int(source_opts.get("port", listen.port)),
        }
        if getattr(listen, "tls", None):
            opts.update(
                tls="true",
                cert=listen.tls.get("cert", ""),
                key=listen.tls.get("key", ""),
            )
        src = syslog_stream(spark, **opts)
    elif source_kind == "socket":
        src = sources.socket_lines(
            spark,
            source_opts.get("host", settings.global_.listen.address),
            int(source_opts.get("port", settings.global_.listen.port)),
        )
    elif source_kind == "file":
        src = sources.file_lines(spark, source_opts["path"])
    elif source_kind == "kafka":
        src = sources.kafka_lines(spark, **source_opts)
    elif source_kind == "rate":
        src = sources.rate_syslog_lines(spark, int(source_opts.get("rows_per_second", 1000)))
    else:
        raise ValueError(f"unknown source kind: {source_kind}")
    return start_pipeline(spark, settings, src, checkpoint_dir)
