"""Streaming sinks: Kafka with per-row topic routing, Parquet with
per-topic partitioning + declared-schema decoding.

Parity map (reference → Spark):

* K1 Kafka sink (src/sink/kafka.rs:107-198) → stock kafka writeStream;
  the routed ``topic`` column does per-row routing natively; ``conf`` map
  forwarded as ``kafka.*`` options (librdkafka passthrough parity).
  Delivery: at-least-once with checkpointing — strictly stronger than the
  reference's fire-and-forget produce tasks.
* Q1-Q3 Parquet sink buffering/flush (src/sink/parquet.rs:101-170) →
  micro-batch trigger(processingTime=flush_ms) IS the timer flush;
  ``maxRecordsPerFile`` approximates the size-threshold flush;
  partitionBy("topic") gives the per-destination file layout
  (<url>/topic=<t>/part-*.parquet vs the reference's <dest>/<uuid>).
* Q5 schema choice (src/sink/parquet.rs:171-230): topics with a declared
  schema are decoded via from_json before writing (typed parquet);
  undeclared topics fall back to per-batch inference in foreachBatch —
  improving on the reference's infer-from-first-line (we sample the whole
  batch).
* Q4 final flush on shutdown → query.stop() drains the in-flight batch;
  see runner.graceful_stop.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter, StreamingQuery

from hotdog_spark.config import KafkaConfig, ParquetConfig, Settings
from hotdog_spark.plans.schema import sink_schema_to_struct


def kafka_options(
    kafka: KafkaConfig, checkpoint: str, environ: dict[str, str] | None = None
) -> dict[str, str]:
    """The option map for the Kafka sink: checkpoint + every config
    ``conf`` key forwarded as ``kafka.<key>`` (librdkafka passthrough
    parity, README.adoc:204-211), then the reference's runtime env
    overrides (src/sink/kafka.rs:72-84): KAFKA_BROKER →
    bootstrap.servers, SASL_SCRAM_USERNAME/PASSWORD → sasl.username /
    sasl.password."""
    env = os.environ if environ is None else environ
    opts = {"checkpointLocation": checkpoint}
    for k, v in kafka.conf.items():
        opts[f"kafka.{k}"] = v
    if env.get("KAFKA_BROKER"):
        opts["kafka.bootstrap.servers"] = env["KAFKA_BROKER"]
    if env.get("SASL_SCRAM_USERNAME"):
        opts["kafka.sasl.username"] = env["SASL_SCRAM_USERNAME"]
    if env.get("SASL_SCRAM_PASSWORD"):
        opts["kafka.sasl.password"] = env["SASL_SCRAM_PASSWORD"]
    return opts


def parquet_url(parquet: ParquetConfig, environ: dict[str, str] | None = None) -> str:
    """The parquet output URL, with the reference's env fallback: a
    missing/empty config url requires S3_OUTPUT_URL
    (src/sink/parquet.rs:304-311)."""
    env = os.environ if environ is None else environ
    if parquet.url:
        return parquet.url
    url = env.get("S3_OUTPUT_URL")
    if not url:
        raise ValueError(
            "There is no url: defined for the parquet sink and no "
            "S3_OUTPUT_URL in the environment!"
        )
    return url


def kafka_writer(
    routed: DataFrame,
    kafka: KafkaConfig,
    checkpoint: str,
) -> DataStreamWriter:
    """Routed (topic, payload) stream → Kafka writer (not yet started).

    Records with a null topic have already been filtered by the cascade;
    the default topic (kafka.topic in the config) catches rows routed to
    the empty string (failed dynamic-topic render)."""
    out = routed.select(
        F.col("payload").cast("string").alias("value"),
        F.when(F.col("topic") == "", F.lit(kafka.topic)).otherwise(F.col("topic")).alias("topic"),
    )
    writer = out.writeStream.format("kafka")
    for k, v in kafka_options(kafka, checkpoint).items():
        writer = writer.option(k, v)
    return writer


def parquet_writer(
    routed: DataFrame,
    parquet: ParquetConfig,
    checkpoint: str,
    max_records_per_file: int | None = None,
) -> DataStreamWriter:
    """Raw-payload Parquet sink: partitionBy(topic), timer-flush via the
    caller's trigger.  For declared-schema topics use
    ``typed_parquet_foreach_batch`` instead."""
    writer = (
        routed.select("topic", "payload")
        .writeStream.format("parquet")
        .option("path", parquet_url(parquet))
        .option("checkpointLocation", checkpoint)
        .partitionBy("topic")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    return writer


def typed_parquet_foreach_batch(
    settings: Settings, base_path: str, infer_undeclared: bool = True
):
    """foreachBatch function implementing the reference's per-destination
    schema choice (src/sink/parquet.rs:171-230): declared topics decode
    through their schema into typed parquet; undeclared topics get a
    per-batch *inferred* schema (``spark.read.json`` over the whole batch
    — strictly better than the reference's infer-from-first-line, which
    drops the buffer when line 1 is unrepresentative).  Payloads that are
    not JSON objects fall back to raw (topic, payload) parquet, mirroring
    the reference's behavior of dropping undecodable buffers — except
    nothing is dropped here.

    The per-topic loop is driver-side but touches only topic *names*
    (collected from the batch's distinct set — bounded by the config's
    routing fan-out, same cardinality the reference keeps one buffer per
    destination for)."""
    declared = {s.topic: sink_schema_to_struct(s) for s in settings.schemas}

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        try:
            for topic, schema in declared.items():
                typed = (
                    batch_df.filter(F.col("topic") == topic)
                    .select(F.from_json("payload", schema).alias("r"))
                    .select("r.*")
                )
                typed.write.mode("append").parquet(f"{base_path}/topic={topic}")
            rest = batch_df
            for topic in declared:
                rest = rest.filter(F.col("topic") != topic)
            if infer_undeclared:
                rest = rest.persist()
                topics = [r.topic for r in rest.select("topic").distinct().collect()]
                for topic in topics:
                    payloads = rest.filter(F.col("topic") == topic).select("payload")
                    jsonish = payloads.filter(F.col("payload").startswith("{"))
                    raw = payloads.filter(~F.col("payload").startswith("{"))
                    if jsonish.limit(1).count() > 0:
                        inferred = spark.read.json(
                            jsonish.rdd.map(lambda r: r.payload)
                        )
                        inferred.write.mode("append").parquet(
                            f"{base_path}/topic={topic}"
                        )
                    if raw.limit(1).count() > 0:
                        raw.write.mode("append").parquet(f"{base_path}/raw/topic={topic}")
                rest.unpersist()
            else:
                (
                    rest.select("topic", "payload")
                    .write.mode("append")
                    .partitionBy("topic")
                    .parquet(f"{base_path}/raw")
                )
        finally:
            batch_df.unpersist()

    return write_batch


def memory_sink(routed: DataFrame, name: str) -> StreamingQuery:
    """In-memory table sink for tests/debugging."""
    return (
        routed.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )


def upsert_parquet_sink(
    routed: DataFrame,
    path: str,
    keys: list[str],
    ts_col: str,
    tiebreak_col: str,
    checkpoint: str,
):
    """Materialize a change stream into a keyed current-state parquet
    table (streaming upsert / log compaction): per micro-batch, reduce
    the batch to its latest row per key, merge with the existing table,
    and atomically swap the result in via a staging directory + Hadoop
    FileSystem rename.

    This is the streaming twin of ``operators.temporal.latest_snapshot``
    — the dimension-table materialization the reference's topic router
    feeds but cannot build.  The staging swap is atomic on HDFS/local
    filesystems; on object stores, rename is copy-based — production
    deployments there should use a table format with MERGE INTO
    (Delta/Iceberg) behind the same per-batch reduction.
    """
    from hotdog_spark.operators.temporal import latest_snapshot

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_latest = latest_snapshot(batch_df, keys, ts_col, tiebreak_col)
        jvm = spark.sparkContext._jvm
        jsc = spark.sparkContext._jsc
        hadoop_conf = jsc.hadoopConfiguration()
        fs_path = jvm.org.apache.hadoop.fs.Path(path)
        fs = fs_path.getFileSystem(hadoop_conf)
        if fs.exists(fs_path):
            existing = spark.read.parquet(path)
            merged = latest_snapshot(
                existing.unionByName(batch_latest), keys, ts_col, tiebreak_col
            )
        else:
            merged = batch_latest
        staging = path.rstrip("/") + ".staging"
        merged.write.mode("overwrite").parquet(staging)
        staging_path = jvm.org.apache.hadoop.fs.Path(staging)
        fs.delete(fs_path, True)
        fs.rename(staging_path, fs_path)

    return (
        routed.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
