"""Streaming runtime tests: file source → cascade → sinks, metrics
listener, graceful stop.  (Kafka needs a broker, so its writer is built
but not started.)"""

import os
import time

import pytest
from pyspark.sql import functions as F

from hotdog_spark.config import load, load_dict
from hotdog_spark.metrics import HotdogQueryListener, StatsdEmitter
from hotdog_spark.pipeline import process_raw_lines
from hotdog_spark.streaming import sinks, sources
from hotdog_spark.streaming.runner import (
    build_routed_stream,
    graceful_stop,
    start_pipeline,
)

CONFIGS = os.path.join(os.path.dirname(__file__), "configs")

LINES = [
    "<13>1 2020-04-18T15:16:09.956153-07:00 coconut tyler - - - hello world",
    '<13>1 2020-04-18T15:16:09.956153-07:00 coconut tyler - - - {"meta":{"topic":"dyn-topic"},"i":1}',
    "<13>1 2020-04-18T15:16:09.956153-07:00 coconut tyler - - - just some text",
    "complete garbage that is not syslog",
]


@pytest.fixture()
def canonical():
    return load(os.path.join(CONFIGS, "canonical.yml"))


def write_lines(tmp_path, name="batch0.txt"):
    d = tmp_path / "in"
    d.mkdir(exist_ok=True)
    (d / name).write_text("\n".join(LINES) + "\n")
    return str(d)


def test_file_stream_matches_batch(spark, tmp_path, canonical):
    """The streaming pipeline over a file source produces exactly the
    batch pipeline's routed records (unified model)."""
    in_dir = write_lines(tmp_path)
    raw = sources.file_lines(spark, in_dir)
    assert raw.isStreaming
    routed = build_routed_stream(raw, canonical)
    q = sinks.memory_sink(routed, "t_file_stream")
    try:
        q.processAllAvailable()
        got = {
            (r.topic, r.payload)
            for r in spark.sql("SELECT topic, payload FROM t_file_stream").collect()
        }
    finally:
        q.stop()
    batch_df = spark.createDataFrame([(l,) for l in LINES], "value string")
    expected = {
        (r.topic, r.payload)
        for r in process_raw_lines(batch_df, canonical).select("topic", "payload").collect()
    }
    assert got == expected
    assert ("dyn-topic",) == tuple({t for t, _ in got if t == "dyn-topic"})
    assert len(got) == 3  # garbage line dropped


def test_parquet_sink_partitioned_by_topic(spark, tmp_path, canonical):
    in_dir = write_lines(tmp_path)
    out_dir = str(tmp_path / "out")
    settings = load_dict(
        {
            "global": {
                "listen": {"port": 1},
                "parquet": {"url": out_dir, "flush_ms": 1000},
            },
            "rules": [
                {
                    "regex": ".*",
                    "field": "msg",
                    "actions": [{"type": "forward", "topic": "logs"}],
                }
            ],
        },
        environ={},
    )
    raw = sources.file_lines(spark, in_dir)
    q = start_pipeline(
        spark,
        settings,
        raw,
        checkpoint_dir=str(tmp_path / "ckpt"),
        install_listener=False,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = spark.read.parquet(out_dir)
    assert back.count() == 3  # garbage dropped
    assert set(back.select("topic").distinct().toPandas()["topic"]) == {"logs"}


def test_typed_foreach_batch_decodes_declared_schema(spark, tmp_path):
    """Declared-schema topics land as typed parquet (from_json decode)."""
    out_dir = str(tmp_path / "typed")
    settings = load_dict(
        {
            "global": {"listen": {"port": 1}},
            "rules": [],
            "schemas": [
                {
                    "topic": "t1",
                    "fields": {
                        "i": {"type": "long"},
                        "meta": {"type": "struct", "fields": {"topic": {"type": "string"}}},
                    },
                }
            ],
        },
        environ={},
    )
    batch = spark.createDataFrame(
        [
            ("t1", '{"i": 1, "meta": {"topic": "t1"}}'),
            ("t1", '{"i": 2, "meta": {"topic": "t1"}}'),
            ("other", '{"x": true}'),
        ],
        "topic string, payload string",
    )
    sinks.typed_parquet_foreach_batch(settings, out_dir)(batch, 0)
    typed = spark.read.parquet(f"{out_dir}/topic=t1")
    assert {r.i for r in typed.collect()} == {1, 2}
    assert dict(typed.dtypes)["i"] == "bigint"
    # undeclared JSON topic: schema inferred per batch -> typed too
    other = spark.read.parquet(f"{out_dir}/topic=other")
    assert dict(other.dtypes)["x"] == "boolean"
    assert [r.x for r in other.collect()] == [True]


def test_foreach_batch_infers_undeclared_and_keeps_raw(spark, tmp_path):
    """Undeclared topics: JSON payloads get whole-batch schema inference
    (vs the reference's first-line inference, src/sink/parquet.rs:186-221);
    non-JSON payloads survive as raw parquet instead of being dropped."""
    out_dir = str(tmp_path / "inferred")
    settings = load_dict(
        {"global": {"listen": {"port": 1}}, "rules": []}, environ={}
    )
    batch = spark.createDataFrame(
        [
            ("dyn", '{"a": 1}'),
            ("dyn", '{"a": 2, "b": "x"}'),   # line-2-only field must survive
            ("junk", "not json at all"),
        ],
        "topic string, payload string",
    )
    sinks.typed_parquet_foreach_batch(settings, out_dir)(batch, 0)
    dyn = spark.read.parquet(f"{out_dir}/topic=dyn")
    assert dict(dyn.dtypes) == {"a": "bigint", "b": "string"}
    assert {(r.a, r.b) for r in dyn.collect()} == {(1, None), (2, "x")}
    raw = spark.read.parquet(f"{out_dir}/raw/topic=junk")
    assert [r.payload for r in raw.collect()] == ["not json at all"]


def test_foreach_batch_diverts_undecodable_declared_payloads(spark, tmp_path):
    """A declared-topic payload that fails from_json must NOT become an
    all-null typed row: it diverts to the raw path and is counted."""
    out_dir = str(tmp_path / "typed_divert")
    settings = load_dict(
        {
            "global": {"listen": {"port": 1}},
            "rules": [],
            "schemas": [{"topic": "t1", "fields": {"i": {"type": "long"}}}],
        },
        environ={},
    )
    batch = spark.createDataFrame(
        [
            ("t1", '{"i": 1}'),
            ("t1", "{broken json"),
            ("t1", "plainly not json"),
        ],
        "topic string, payload string",
    )
    emitter = StatsdEmitter(None)
    fn = sinks.typed_parquet_foreach_batch(settings, out_dir, emitter=emitter)
    fn(batch, 0)
    typed = spark.read.parquet(f"{out_dir}/topic=t1")
    assert [r.i for r in typed.collect()] == [1]   # no all-null rows
    raw = spark.read.parquet(f"{out_dir}/raw/topic=t1")
    assert {r.payload for r in raw.collect()} == {"{broken json", "plainly not json"}
    assert fn.last_decode_failed == 2
    assert emitter.last.get("parquet.decode_failed") == 2


def test_upsert_swap_is_crash_safe(spark, tmp_path):
    """The rename-aside swap: simulate dying between the two renames
    (live gone, .old present) and assert the next batch recovers the
    previous state instead of silently starting from empty."""
    from hotdog_spark.streaming.sinks import upsert_batch_fn

    path = str(tmp_path / "state")
    fn = upsert_batch_fn(path, ["k"], "ts", "tb")
    b1 = spark.createDataFrame([(1, 10, 1, "a"), (2, 10, 1, "b")],
                               "k long, ts long, tb long, v string")
    fn(b1, 0)
    assert {(r.k, r.v) for r in spark.read.parquet(path).collect()} == {(1, "a"), (2, "b")}
    # simulate the crash window: live renamed aside, new never landed
    os.rename(path, path + ".old")
    b2 = spark.createDataFrame([(2, 20, 1, "b2"), (3, 10, 1, "c")],
                               "k long, ts long, tb long, v string")
    fn(b2, 1)
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "b2"), (3, "c")}   # k=1 survived the crash
    assert not os.path.exists(path + ".old")
    assert not os.path.exists(path + ".staging")


def test_kafka_writer_options(spark, canonical, tmp_path):
    """Kafka sink config: conf passthrough and per-row topic routing are
    wired (not started — no broker in this environment)."""
    settings = load_dict(
        {
            "global": {
                "listen": {"port": 1},
                "kafka": {
                    "conf": {
                        "bootstrap.servers": "127.0.0.1:9092",
                        "security.protocol": "PLAINTEXT",
                    },
                    "topic": "fallback",
                },
            },
            "rules": [
                {"regex": ".*", "field": "msg",
                 "actions": [{"type": "forward", "topic": "t"}]}
            ],
        },
        environ={},
    )
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .selectExpr("'t' AS topic", "CAST(value AS STRING) AS payload")
    )
    # the writer builds without a broker; its option map carries the conf
    sinks.kafka_writer(stream, settings.global_.kafka, checkpoint=str(tmp_path / "ck"))
    opts = sinks.kafka_options(settings.global_.kafka, str(tmp_path / "ck"))
    assert opts["kafka.bootstrap.servers"] == "127.0.0.1:9092"
    assert opts["kafka.security.protocol"] == "PLAINTEXT"
    assert opts["checkpointLocation"] == str(tmp_path / "ck")


def test_fake_kafka_batch_contract(spark, tmp_path):
    """The produce contract on a plain batch (src/sink/kafka.rs:129-154
    parity): per-row topic routing, ''-topic → default-topic fallback,
    value = payload string, KEYLESS records, per-topic submitted
    counters.  kafka_records is the SAME projection kafka_writer feeds
    format('kafka'), so this pins the real sink's record shape too."""
    from hotdog_spark.config import KafkaConfig

    class RecordingEmitter:
        def __init__(self):
            self.counters = {}

        def counter(self, name, n):
            self.counters[name] = self.counters.get(name, 0) + n

    batch = spark.createDataFrame(
        [("t1", "hello"), ("t2", "world"), ("", "orphan"), ("t1", "again")],
        "topic string, payload string",
    )
    # the shared projection is keyless and two-column by construction
    rec = sinks.kafka_records(batch, "fallback")
    assert rec.columns == ["value", "topic"]

    kc = KafkaConfig(topic="fallback")
    em = RecordingEmitter()
    log = str(tmp_path / "broker")
    fn = sinks.fake_kafka_batch_fn(log, kc.topic, emitter=em)
    fn(batch, 0)

    produced = spark.read.option("basePath", log).schema("value string, topic string").json(log)
    rows = {(r.topic, r.value) for r in produced.collect()}
    assert rows == {
        ("t1", "hello"), ("t1", "again"), ("t2", "world"), ("fallback", "orphan")
    }
    # keyless: the broker log carries value only (topic is the partition)
    assert set(produced.columns) == {"topic", "value"}
    assert em.counters == {
        "kafka.submitted.t1": 2,
        "kafka.submitted.t2": 1,
        "kafka.submitted.fallback": 1,
    }
    # at-least-once: a replayed batch re-appends (duplicate, never lost)
    fn(batch, 0)
    assert spark.read.option("basePath", log).schema("value string, topic string").json(log).count() == 8


def test_fake_kafka_sink_streaming_e2e(spark, tmp_path):
    """End-to-end streaming produce through the fake broker: rate source
    → routed (topic, payload) → foreachBatch produce → per-topic append
    logs, with checkpointing."""
    from hotdog_spark.config import KafkaConfig

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "50").load()
        .selectExpr(
            "CASE WHEN value % 3 = 0 THEN 'logs' "
            "WHEN value % 3 = 1 THEN 'metrics' ELSE '' END AS topic",
            "CONCAT('m', CAST(value AS STRING)) AS payload",
        )
    )
    kc = KafkaConfig(topic="fallback")
    log = str(tmp_path / "broker")
    q = sinks.fake_kafka_sink(
        stream, kc, checkpoint=str(tmp_path / "ck"), log_dir=log
    ).start()
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            q.processAllAvailable()
            if os.path.exists(log) and len(
                spark.read.option("basePath", log).schema("value string, topic string").json(log).take(10)
            ) >= 6:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    produced = spark.read.option("basePath", log).schema("value string, topic string").json(log)
    by_topic = {r.topic: r.cnt for r in
                produced.groupBy("topic").agg(F.count("*").alias("cnt")).collect()}
    assert set(by_topic) <= {"logs", "metrics", "fallback"}
    assert "logs" in by_topic and "fallback" in by_topic  # '' fell back
    # every value is a payload string of the expected shape
    assert all(r.value.startswith("m") for r in produced.take(20))


def test_rate_source_generates_parseable_lines(spark, canonical):
    src = sources.rate_syslog_lines(spark, rows_per_second=10)
    routed = build_routed_stream(src, canonical)
    q = sinks.memory_sink(routed, "t_rate")
    try:
        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) c FROM t_rate").collect()[0].c
            if n > 0:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert n > 0
    topics = {
        r.topic for r in spark.sql("SELECT DISTINCT topic FROM t_rate").collect()
    }
    assert topics == {"test"}  # meta.topic routing via the jmespath rule


def test_metrics_listener_observes_counts(spark, tmp_path, canonical):
    in_dir = write_lines(tmp_path)
    emitter = StatsdEmitter(None)  # no UDP target; captures .last
    listener = HotdogQueryListener(emitter)
    spark.streams.addListener(listener)
    try:
        raw = sources.file_lines(spark, in_dir)
        routed = build_routed_stream(raw, canonical)
        q = sinks.memory_sink(routed, "t_metrics")
        try:
            q.processAllAvailable()
            deadline = time.time() + 20
            while time.time() < deadline and "lines_received" not in emitter.last:
                time.sleep(0.5)
        finally:
            graceful_stop(q, timeout_s=20)
        assert emitter.last.get("lines_received") == 4.0
        assert emitter.last.get("parse_errors") == 1.0
        assert emitter.last.get("routed") == 3.0
        assert emitter.last.get("merge_aborted") == 0.0
        # timer parity (M1): micro-batch durations emit as statsd timers
        assert "kafka.producer.sent" in emitter.last
        assert "batch.addBatch" in emitter.last
        assert emitter.last["batch.addBatch"] >= 0
    finally:
        spark.streams.removeListener(listener)


def test_statsd_line_formats():
    """The emitter speaks real statsd line protocol over UDP: counter |c,
    gauge |g, timer |ms (the dipstick shapes the reference emits)."""
    import socket as socket_mod

    recv = socket_mod.socket(socket_mod.AF_INET, socket_mod.SOCK_DGRAM)
    recv.bind(("127.0.0.1", 0))
    recv.settimeout(5)
    port = recv.getsockname()[1]
    emitter = StatsdEmitter(f"127.0.0.1:{port}")
    emitter.counter("lines", 42)
    emitter.gauge("connections", 1)
    emitter.timer("kafka.producer.sent", 12.7)
    got = {recv.recv(1024).decode() for _ in range(3)}
    recv.close()
    assert got == {
        "hotdog.lines:42|c",
        "hotdog.connections:1|g",
        "hotdog.kafka.producer.sent:12|ms",
    }


def test_merge_aborted_counts_non_json_targets(spark):
    """A matched merge rule over a non-JSON message aborts the merge
    (reference: hotdog.error.merge_target_not_json) but — faithful quirk —
    a later forward in the same rule still emits the raw msg."""
    from hotdog_spark.plans.compiler import apply_cascade

    settings = load_dict(
        {
            "global": {"listen": {"port": 1}},
            "rules": [
                {
                    "regex": ".*",
                    "field": "msg",
                    "actions": [
                        {"type": "merge", "json": {"tag": "x"}},
                        {"type": "forward", "topic": "out"},
                    ],
                }
            ],
        },
        environ={},
    )
    df = spark.createDataFrame(
        [("not json",), ('{"a": 1}',)], "msg string"
    ).withColumns(
        {
            "severity": F.lit(None).cast("string"),
            "facility": F.lit(None).cast("string"),
            "hostname": F.lit(None).cast("string"),
            "appname": F.lit(None).cast("string"),
        }
    )
    rows = {
        r.msg: r
        for r in apply_cascade(df, settings, keep_dropped=True).collect()
    }
    assert rows["not json"].merge_aborted is True
    assert rows["not json"].topic == "out"          # forward still ran
    assert rows["not json"].payload == "not json"   # raw msg passthrough
    assert rows['{"a": 1}'].merge_aborted is False
    assert rows['{"a": 1}'].topic == "out"


# ---------------------------------------------------------------------------
# Custom TCP/TLS syslog DataSource (S1/S2/S3 parity)


def _send_lines(host, port, lines, tls_cafile=None, retries=40):
    import socket as socket_mod
    import ssl as ssl_mod

    last = None
    for _ in range(retries):
        try:
            raw = socket_mod.create_connection((host, port), timeout=5)
            break
        except OSError as e:
            last = e
            time.sleep(0.25)
    else:
        raise last
    if tls_cafile:
        ctx = ssl_mod.create_default_context(cafile=tls_cafile)
        ctx.check_hostname = False
        raw = ctx.wrap_socket(raw)
    with raw:
        raw.sendall(("\n".join(lines) + "\n").encode())


def _drain_stream(spark, df, sink_name, send):
    q = (
        df.writeStream.format("memory")
        .queryName(sink_name)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        send()
        got = []
        for _ in range(60):
            time.sleep(0.5)
            got = [r.value for r in spark.sql(f"SELECT value FROM {sink_name}").collect()]
            if len(got) >= 3:
                break
        return got
    finally:
        q.stop()


def test_syslog_tcp_source(spark):
    import random

    from hotdog_spark.sources.syslog_tcp import syslog_stream

    port = random.randint(20000, 40000)
    df = syslog_stream(spark, host="127.0.0.1", port=port)
    got = _drain_stream(
        spark, df, "syslog_tcp_sink", lambda: _send_lines("127.0.0.1", port, LINES[:3])
    )
    assert sorted(got) == sorted(LINES[:3])


def test_syslog_tcp_octet_counted_framing(spark):
    """RFC 6587 octet-counted frames (`LEN SP MSG`) auto-detected from the
    connection's first byte — the framing rsyslog/syslog-ng emit over TCP,
    and the only one that can carry embedded newlines (here the multi-line
    payload must arrive as ONE record, which newline framing cannot do)."""
    import random
    import socket as socket_mod

    from hotdog_spark.sources.syslog_tcp import syslog_stream

    port = random.randint(20000, 40000)
    msgs = [
        LINES[0],
        "<13>1 2024-01-01T00:00:00Z h app - - - line one\nline two",  # embedded \n
        LINES[1],
    ]

    def send():
        payload = b"".join(
            f"{len(m.encode())} ".encode() + m.encode() for m in msgs
        )
        last = None
        for _ in range(40):
            try:
                with socket_mod.create_connection(("127.0.0.1", port), timeout=5) as s:
                    s.sendall(payload)
                return
            except OSError as e:
                last = e
                time.sleep(0.25)
        raise last

    df = syslog_stream(spark, host="127.0.0.1", port=port)
    got = _drain_stream(spark, df, "syslog_octet_sink", send)
    assert sorted(got) == sorted(msgs)


def test_syslog_octet_verbatim_and_oversized_shedding():
    """Listener-level framing pins (no Spark):

    * octet-counted payloads are delivered VERBATIM — RFC 6587 frames are
      exact byte counts, so a message legitimately ending in ``\\n`` keeps
      it (messages differing only in trailing newlines stay distinct);
    * a frame declaring a length beyond ``max_msg`` is shed streamingly
      and counted, and the connection keeps working afterwards;
    * an unterminated newline-mode line beyond ``max_msg`` is shed too,
      bounding per-connection memory."""
    import socket as socket_mod

    from hotdog_spark.sources.syslog_tcp import _Listener

    def drain(lst, want, timeout=10.0):
        deadline = time.time() + timeout
        while time.time() < deadline:
            items, _ = lst.snapshot_from(0)
            if len(items) >= want:
                return [line for _, line in items]
            time.sleep(0.05)
        items, _ = lst.snapshot_from(0)
        return [line for _, line in items]

    lst = _Listener("127.0.0.1", 0, 1024, None, max_msg=64)
    try:
        # --- octet mode: verbatim payloads + oversized frame in the middle
        with socket_mod.create_connection(("127.0.0.1", lst.port), timeout=5) as s:
            m1 = "keep my newline\n"
            m2 = "no newline"
            big = "x" * 200  # > max_msg=64 → shed, not buffered
            payload = (
                f"{len(m1.encode())} ".encode() + m1.encode()
                + f"{len(big.encode())} ".encode() + big.encode()
                + f"{len(m2.encode())} ".encode() + m2.encode()
            )
            s.sendall(payload)
        got = drain(lst, 2)
        assert got == [m1, m2]  # verbatim: trailing \n preserved, big shed
        assert lst._oversized == 1

        # --- newline mode: oversized unterminated line shed, next line OK
        with socket_mod.create_connection(("127.0.0.1", lst.port), timeout=5) as s:
            s.sendall(b"y" * 200)       # no newline yet, beyond the cap
            time.sleep(0.3)
            s.sendall(b"tail\nok\n")    # terminator of the shed line + good line
        got = drain(lst, 3)
        assert got == [m1, m2, "ok"]
        assert lst._oversized == 2
    finally:
        lst.close()


def test_tws_version_guard(spark, monkeypatch):
    """The transformWithStateInPandas twin must not break older Spark:
    the module imports without the Spark-4 API (the import is deferred
    into the function), and when the API is absent — simulated by
    blocking its module — the call raises a directed NotImplementedError
    naming the 3.5-compatible twin, not an opaque ImportError."""
    import importlib
    import sys as sys_mod

    import pytest as pytest_mod

    import hotdog_spark.streaming.stateful as st

    importlib.reload(st)  # import itself never touches the Spark-4 API

    routed = spark.createDataFrame([("t1",)], "topic string")
    monkeypatch.setitem(
        sys_mod.modules, "pyspark.sql.streaming.stateful_processor", None
    )
    with pytest_mod.raises(NotImplementedError, match="Spark >= 4"):
        st.running_topic_counts_tws(routed)


def test_syslog_tls_source(spark, tmp_path):
    import random
    import subprocess

    cert = tmp_path / "cert.pem"
    key = tmp_path / "key.pem"
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
            "-keyout", str(key), "-out", str(cert), "-days", "1",
            "-subj", "/CN=localhost",
        ],
        check=True,
        capture_output=True,
    )
    from hotdog_spark.sources.syslog_tcp import syslog_stream

    port = random.randint(20000, 40000)
    df = syslog_stream(
        spark, host="127.0.0.1", port=port, tls="true", cert=str(cert), key=str(key)
    )
    got = _drain_stream(
        spark,
        df,
        "syslog_tls_sink",
        lambda: _send_lines("127.0.0.1", port, LINES[:3], tls_cafile=str(cert)),
    )
    assert sorted(got) == sorted(LINES[:3])


def test_daemon_mode_syslog_to_memory(spark, canonical):
    """Full daemon-path e2e: TCP listener source → parse → cascade →
    in-memory sink — `hotdog -c config.yml` with nothing but Spark."""
    import random

    from hotdog_spark.streaming.runner import run_from_config

    port = random.randint(20000, 40000)
    q = run_from_config(
        spark, canonical, checkpoint_dir=None, source_kind="syslog", port=port
    )
    try:
        _send_lines("127.0.0.1", port, LINES)
        rows = []
        for _ in range(60):
            time.sleep(0.5)
            rows = spark.sql("SELECT topic, payload FROM hotdog_routed").collect()
            if len(rows) >= 3:
                break
        by_topic = {}
        for r in rows:
            by_topic.setdefault(r.topic, []).append(r.payload)
        assert by_topic["test"] == [
            "This is the total message: "
            + LINES[0].split("- - - ")[1]
            + " And the name is: world"
        ]
        assert "dyn-topic" in by_topic
        assert '"version":' in by_topic["dyn-topic"][0]
        assert by_topic["logs-unknown"] == [LINES[2].split("- - - ")[1]]
    finally:
        q.stop()


# ---------------------------------------------------------------------------
# Custom stateful operators (applyInPandasWithState)


def test_streaming_dedup_across_batches(spark, tmp_path):
    from hotdog_spark.streaming.stateful import streaming_dedup

    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    (src / "b0.txt").write_text("a\nb\na\n")

    raw = spark.readStream.format("text").load(str(src))
    keyed = raw.select(F.md5("value").alias("k"), F.col("value"))
    deduped = streaming_dedup(keyed, "k")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = sorted(r.value for r in spark.sql("SELECT value FROM dedup_sink").collect())
        assert got1 == ["a", "b"]
        # second batch: one repeat across batches, one new key
        (src / "b1.txt").write_text("a\nc\n")
        q.processAllAvailable()
        got2 = sorted(r.value for r in spark.sql("SELECT value FROM dedup_sink").collect())
        assert got2 == ["a", "b", "c"]
    finally:
        q.stop()


def test_running_topic_counts_transform_with_state(spark, tmp_path, canonical):
    """The transformWithStateInPandas twin must produce the same
    cumulative per-topic totals across micro-batches as the
    applyInPandasWithState implementation.

    SKIPPED where `google.protobuf` is absent: Spark's transformWithState
    driver worker speaks protobuf to the state server
    (pyspark/sql/streaming/proto/StateMessage_pb2), so without the
    package the query crashes at pre-init — an environment gap (like the
    Kafka broker), not a code path we can stub."""
    pytest.importorskip("google.protobuf")
    from hotdog_spark.streaming.stateful import running_topic_counts_tws

    src = tmp_path / "in_tws"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_tws")
    (src / "b0.txt").write_text("\n".join(LINES) + "\n")

    # transformWithState requires the RocksDB state store provider
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    raw = spark.readStream.format("text").load(str(src))
    routed = process_raw_lines(raw, canonical)
    counts = running_topic_counts_tws(routed)
    q = (
        counts.writeStream.format("memory")
        .queryName("counts_tws_sink")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        (src / "b1.txt").write_text("\n".join(LINES) + "\n")
        q.processAllAvailable()
        totals = {
            r.topic: r.total
            for r in spark.sql(
                "SELECT topic, max(total) AS total FROM counts_tws_sink GROUP BY topic"
            ).collect()
        }
        assert totals["test"] == 2
        assert totals["dyn-topic"] == 2
        assert totals["logs-unknown"] == 2
    finally:
        q.stop()
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )


def test_running_topic_counts_tws_constructs(spark, tmp_path, canonical):
    """Plan-construction check for the transformWithState twin, runnable
    WITHOUT protobuf: building the streaming DataFrame pins the grouping,
    output schema, and mode wiring even where the state server's wire
    protocol (google.protobuf) is absent from the environment."""
    from hotdog_spark.streaming.stateful import running_topic_counts_tws

    src = tmp_path / "in_tws_c"
    src.mkdir()
    raw = spark.readStream.format("text").load(str(src))
    counts = running_topic_counts_tws(process_raw_lines(raw, canonical))
    assert counts.isStreaming
    assert [(f.name, f.dataType.simpleString()) for f in counts.schema.fields] == [
        ("topic", "string"),
        ("total", "bigint"),
    ]


def test_running_topic_counts(spark, tmp_path, canonical):
    from hotdog_spark.streaming.stateful import running_topic_counts

    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt2")
    (src / "b0.txt").write_text("\n".join(LINES) + "\n")

    raw = spark.readStream.format("text").load(str(src))
    routed = process_raw_lines(raw, canonical)
    counts = running_topic_counts(routed)
    q = (
        counts.writeStream.format("memory")
        .queryName("counts_sink")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        (src / "b1.txt").write_text("\n".join(LINES) + "\n")
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT topic, max(total) AS total FROM counts_sink GROUP BY topic"
        ).collect()
        totals = {r.topic: r.total for r in rows}
        # each batch contributes 1 record per topic (3 routable lines)
        assert totals["test"] == 2
        assert totals["dyn-topic"] == 2
        assert totals["logs-unknown"] == 2
    finally:
        q.stop()


def test_status_server(spark, tmp_path, canonical):
    import json as json_mod
    import urllib.request

    from hotdog_spark.status import start_status_server

    src = tmp_path / "in"
    src.mkdir()
    (src / "b0.txt").write_text("\n".join(LINES) + "\n")
    raw = spark.readStream.format("text").load(str(src))
    routed = build_routed_stream(raw, canonical)
    q = (
        routed.writeStream.format("memory")
        .queryName("status_probe")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    server, port = start_status_server(spark)
    try:
        q.processAllAvailable()
        banner = urllib.request.urlopen(f"http://127.0.0.1:{port}/").read()
        assert banner == b"hotdog status server"
        stats = json_mod.loads(
            urllib.request.urlopen(f"http://127.0.0.1:{port}/stats").read()
        )
        names = [row["name"] for row in stats["queries"]]
        assert "status_probe" in names
        assert stats["connections"] >= 1
        probe = next(r for r in stats["queries"] if r["name"] == "status_probe")
        observed = (probe.get("observedMetrics") or {}).get("hotdog_pipeline")
        assert observed and observed["lines_received"] == 4
        assert observed["parse_errors"] == 1
    finally:
        server.shutdown()
        q.stop()


def test_kafka_env_overrides():
    """Runtime env overrides (src/sink/kafka.rs:72-84): KAFKA_BROKER and
    SASL_SCRAM_* beat the YAML conf."""
    from hotdog_spark.config import KafkaConfig

    kc = KafkaConfig(conf={"bootstrap.servers": "yaml:9092", "acks": "all"})
    opts = sinks.kafka_options(
        kc,
        "/ck",
        environ={
            "KAFKA_BROKER": "env:9092",
            "SASL_SCRAM_USERNAME": "u",
            "SASL_SCRAM_PASSWORD": "p",
        },
    )
    assert opts["kafka.bootstrap.servers"] == "env:9092"
    assert opts["kafka.sasl.username"] == "u"
    assert opts["kafka.sasl.password"] == "p"
    assert opts["kafka.acks"] == "all"
    # without env, YAML wins
    assert sinks.kafka_options(kc, "/ck", environ={})["kafka.bootstrap.servers"] == "yaml:9092"


def test_kafka_option_map_golden():
    """Golden snapshot of the ENTIRE resolved option map for a SASL/SCRAM
    config with all three runtime env overrides (VERDICT r3 item 8) —
    exact-equality, so any key added/renamed/dropped or any change to the
    reference's override order (conf first, then KAFKA_BROKER,
    SASL_SCRAM_USERNAME, SASL_SCRAM_PASSWORD — src/sink/kafka.rs:64-84)
    fails loudly.  This is the no-broker blind spot's recorded contract:
    what we would hand the Kafka client, byte for byte."""
    from hotdog_spark.config import KafkaConfig

    kc = KafkaConfig(
        conf={
            "bootstrap.servers": "yaml-broker:9092",
            "security.protocol": "SASL_SSL",
            "sasl.mechanism": "SCRAM-SHA-256",
            "sasl.username": "yaml-user",
            "sasl.password": "yaml-pass",
            "acks": "all",
            "compression.type": "lz4",
            "message.timeout.ms": "60000",
        },
        topic="logs",
    )
    got = sinks.kafka_options(
        kc,
        "/ckpt/kafka",
        environ={
            "KAFKA_BROKER": "env-broker:9092",
            "SASL_SCRAM_USERNAME": "env-user",
            "SASL_SCRAM_PASSWORD": "env-pass",
            "UNRELATED": "ignored",
        },
    )
    assert got == {
        "checkpointLocation": "/ckpt/kafka",
        "kafka.bootstrap.servers": "env-broker:9092",   # env beats yaml
        "kafka.security.protocol": "SASL_SSL",
        "kafka.sasl.mechanism": "SCRAM-SHA-256",
        "kafka.sasl.username": "env-user",              # env beats yaml
        "kafka.sasl.password": "env-pass",              # env beats yaml
        "kafka.acks": "all",
        "kafka.compression.type": "lz4",
        "kafka.message.timeout.ms": "60000",
    }


def test_parquet_url_env_fallback():
    """S3_OUTPUT_URL fallback parity (src/sink/parquet.rs:304-311)."""
    import pytest as _pytest

    from hotdog_spark.config import ParquetConfig

    assert sinks.parquet_url(ParquetConfig(url="s3a://cfg"), environ={}) == "s3a://cfg"
    assert (
        sinks.parquet_url(ParquetConfig(), environ={"S3_OUTPUT_URL": "s3a://env"})
        == "s3a://env"
    )
    with _pytest.raises(ValueError):
        sinks.parquet_url(ParquetConfig(), environ={})


def test_watermark_drops_late_rows(spark, tmp_path):
    """Event-time watermark semantics: a row arriving far behind the
    watermark is dropped from the windowed aggregation (append mode only
    emits windows the watermark has closed)."""
    from hotdog_spark.streaming.runner import windowed_counts_stream

    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ck")
    raw = spark.readStream.format("text").load(str(src))
    events = raw.select(
        F.to_timestamp(F.split("value", ",")[0]).alias("ts"),
        F.split("value", ",")[1].alias("k"),
    )
    counts = windowed_counts_stream(events, "ts", "k", width="1 hour", watermark="10 minutes")
    q = (
        counts.writeStream.format("memory")
        .queryName("wm_sink")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        # batch 1: two rows in hour-10, one in hour-13 (advances watermark
        # to 12:50 → closes the 10:00 window)
        (src / "b0.txt").write_text(
            "2024-01-01 10:05:00,a\n2024-01-01 10:20:00,a\n2024-01-01 13:00:00,a\n"
        )
        q.processAllAvailable()
        # batch 2: a LATE row for hour-10, far behind the 12:50 watermark
        (src / "b1.txt").write_text("2024-01-01 10:40:00,a\n")
        q.processAllAvailable()
        # batch 3: advance event time so every window closes and flushes
        (src / "b2.txt").write_text("2024-01-01 20:00:00,a\n")
        q.processAllAvailable()
        got = {
            (r.window_start, r.k): r.n
            for r in spark.sql("SELECT * FROM wm_sink").collect()
        }
        # the 10:00 window emitted with 2 rows — the late third row was dropped
        assert got.get(("2024-01-01 10:00:00", "a")) == 2
        assert got.get(("2024-01-01 13:00:00", "a")) == 1
    finally:
        q.stop()


def test_watermark_keeps_late_rows_within_bound(spark, tmp_path):
    """The inclusion side of the watermark contract (VERDICT r3 item 6):
    a row arriving LATE but still within the watermark bound must be
    folded into its (still-open) window before that window emits."""
    from hotdog_spark.streaming.runner import windowed_counts_stream

    src = tmp_path / "in_keep"
    src.mkdir()
    ckpt = str(tmp_path / "ck_keep")
    raw = spark.readStream.format("text").load(str(src))
    events = raw.select(
        F.to_timestamp(F.split("value", ",")[0]).alias("ts"),
        F.split("value", ",")[1].alias("k"),
    )
    counts = windowed_counts_stream(events, "ts", "k", width="1 hour", watermark="1 hour")
    q = (
        counts.writeStream.format("memory")
        .queryName("wm_keep_sink")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        # batch 1: two rows in hour-10
        (src / "b0.txt").write_text("2024-01-01 10:05:00,a\n2024-01-01 10:55:00,a\n")
        q.processAllAvailable()
        # batch 2: advance max event time to 11:30 → watermark 10:30;
        # hour-10's window (ends 11:00) is still OPEN
        (src / "b1.txt").write_text("2024-01-01 11:30:00,a\n")
        q.processAllAvailable()
        # batch 3: a late hour-10 row at 10:45 — behind current max event
        # time but AHEAD of the 10:30 watermark → must be included
        (src / "b2.txt").write_text("2024-01-01 10:45:00,a\n")
        q.processAllAvailable()
        # batch 4: advance to 13:00 → watermark 12:00 closes everything
        (src / "b3.txt").write_text("2024-01-01 13:00:00,a\n")
        q.processAllAvailable()
        got = {
            (r.window_start, r.k): r.n
            for r in spark.sql("SELECT * FROM wm_keep_sink").collect()
        }
        # hour-10 emitted with ALL THREE rows — the in-bound late row counted
        assert got.get(("2024-01-01 10:00:00", "a")) == 3
        assert got.get(("2024-01-01 11:00:00", "a")) == 1
    finally:
        q.stop()


def test_watermark_split_matches_batch_twin(spark, tmp_path):
    """Late-data PARITY pin (VERDICT r10 item 8): the streaming
    accepted/late split is ORACLE-CHECKED against a batch twin that
    replays Spark's documented watermark contract with the same cutoff,
    instead of hand-computed expected counts.

    Twin semantics (Structured Streaming docs, "Handling Late Data and
    Watermarking"): the watermark in effect during micro-batch i is
    ``max(event time over batches 0..i-1) - delay``; a row is folded
    into its window iff that window is still open — ``window_end >
    watermark_i`` (state for closed windows has been evicted); append
    mode finally emits every window once the watermark passes its end.
    The twin computes wm_i per batch in plain Python, splits every
    input row into accepted/late, batch-aggregates the accepted set,
    and the streaming memory-sink output must equal it exactly — and
    must differ from the no-watermark batch aggregate (proving the
    split is non-trivial: late rows exist and were dropped)."""
    from collections import Counter
    from datetime import datetime, timedelta

    from hotdog_spark.streaming.runner import windowed_counts_stream

    delay = timedelta(minutes=10)
    width = timedelta(hours=1)

    # arrival schedule: list of micro-batches of (event_ts, key); mixes
    # on-time rows, late-but-open rows, and late-behind-closed-window
    # rows across two keys and four windows
    batches = [
        [("2024-01-01 10:05:00", "a"), ("2024-01-01 10:20:00", "b")],
        [("2024-01-01 11:40:00", "a"), ("2024-01-01 10:59:00", "a")],
        # wm now 11:30 → hour-10 window (ends 11:00) CLOSED: first row
        # late-dropped; 11:25 lands in the still-open hour-11 window
        [("2024-01-01 10:45:00", "a"), ("2024-01-01 11:25:00", "b")],
        [("2024-01-01 13:05:00", "b"), ("2024-01-01 11:55:00", "a")],
        # wm 12:55 → hour-11 (ends 12:00) closed: 11:05 late-dropped;
        # 12:59 in hour-12 (ends 13:00 > wm) still open
        [("2024-01-01 11:05:00", "b"), ("2024-01-01 12:59:00", "a")],
        # flush: advance far enough to close every window
        [("2024-01-01 20:00:00", "a")],
    ]

    def parse(s):
        return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")

    # ---- batch twin: replay the watermark contract ----
    accepted, late = [], []
    max_seen = None  # max event time over PRIOR batches
    for batch in batches:
        wm = (max_seen - delay) if max_seen is not None else None
        for ts_s, key in batch:
            ts = parse(ts_s)
            window_start = ts.replace(minute=0, second=0)
            window_end = window_start + width
            if wm is None or window_end > wm:
                accepted.append((window_start, key))
            else:
                late.append((ts_s, key))
        batch_max = max(parse(t) for t, _ in batch)
        max_seen = batch_max if max_seen is None else max(max_seen, batch_max)
    # append mode only EMITS windows the final watermark has closed
    # (window_end <= wm); a still-open window — the flush row's own
    # hour-20 window here — is accepted into state but never output
    final_wm = max_seen - delay
    twin = Counter(
        (ws.strftime("%Y-%m-%d %H:%M:%S"), k)
        for ws, k in accepted
        if ws + width <= final_wm
    )
    assert len(twin) < len(
        {(ws, k) for ws, k in accepted}
    ), "schedule must leave one window open at stop (emission ≠ acceptance)"

    # the split must be non-trivial, and a no-watermark aggregate differs
    assert late, "schedule must contain genuinely late rows"
    no_wm = Counter(
        (parse(t).replace(minute=0, second=0).strftime("%Y-%m-%d %H:%M:%S"), k)
        for b in batches
        for t, k in b
    )
    assert twin != no_wm

    # ---- the streaming leg, same cutoff ----
    src = tmp_path / "in_twin"
    src.mkdir()
    raw = spark.readStream.format("text").load(str(src))
    events = raw.select(
        F.to_timestamp(F.split("value", ",")[0]).alias("ts"),
        F.split("value", ",")[1].alias("k"),
    )
    counts = windowed_counts_stream(
        events, "ts", "k", width="1 hour", watermark="10 minutes"
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("wm_twin_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_twin"))
        .start()
    )
    try:
        for i, batch in enumerate(batches):
            (src / f"b{i}.txt").write_text(
                "".join(f"{t},{k}\n" for t, k in batch)
            )
            q.processAllAvailable()
        got = {
            (r.window_start, r.k): r.n
            for r in spark.sql("SELECT * FROM wm_twin_sink").collect()
        }
    finally:
        q.stop()
    assert got == dict(twin)


def test_stream_static_enrichment(spark, tmp_path):
    """Stream-static join: each micro-batch enriches against a broadcast
    dimension; the stream side never shuffles."""
    from hotdog_spark.streaming.joins import enrich_static

    src = tmp_path / "enrich_in"
    src.mkdir()
    (src / "b0.txt").write_text("coconut\nbanana\nmango\n")
    dim = spark.createDataFrame(
        [("coconut", "infra"), ("banana", "web")], ["value", "owner"]
    )
    raw = spark.readStream.format("text").load(str(src))
    enriched = enrich_static(raw, dim, on="value")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_sink")
        .option("checkpointLocation", str(tmp_path / "enrich_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.value: r.owner for r in spark.sql("SELECT * FROM enrich_sink").collect()
        }
        assert got == {"coconut": "infra", "banana": "web", "mango": None}
    finally:
        q.stop()


def test_stream_stream_interval_join(spark, tmp_path):
    """Watermarked stream-stream interval join: purchase within 30 min
    after the click matches; outside the interval (before, or too late)
    does not.  Result equals the equivalent batch join."""
    import json

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from hotdog_spark.streaming.joins import interval_join

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("at", StringType()),
            StructField("kind", StringType()),
        ]
    )
    clicks_dir = tmp_path / "clicks"
    buys_dir = tmp_path / "buys"
    clicks_dir.mkdir()
    buys_dir.mkdir()
    clicks = [
        {"user_id": 1, "at": "2024-01-01 10:00:00", "kind": "click"},
        {"user_id": 2, "at": "2024-01-01 10:05:00", "kind": "click"},
    ]
    buys = [
        {"user_id": 1, "at": "2024-01-01 10:10:00", "kind": "buy"},   # match
        {"user_id": 1, "at": "2024-01-01 11:00:00", "kind": "buy"},   # > 30 min
        {"user_id": 2, "at": "2024-01-01 10:04:00", "kind": "buy"},   # before click
    ]
    (clicks_dir / "b0.json").write_text("\n".join(json.dumps(r) for r in clicks))
    (buys_dir / "b0.json").write_text("\n".join(json.dumps(r) for r in buys))

    def load_stream(d, ts_name, id_name):
        return (
            spark.readStream.schema(schema)
            .json(str(d))
            .select(
                F.col("user_id").alias(id_name),
                F.to_timestamp("at").alias(ts_name),
            )
        )

    left = load_stream(clicks_dir, "click_ts", "c_user")
    right = load_stream(buys_dir, "buy_ts", "b_user")
    joined = interval_join(
        left,
        right,
        on=F.col("c_user") == F.col("b_user"),
        left_ts="click_ts",
        right_ts="buy_ts",
        lower="0 seconds",
        upper="30 minutes",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ivj_sink")
        .option("checkpointLocation", str(tmp_path / "ivj_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = [
            (r.c_user, str(r.click_ts), str(r.buy_ts))
            for r in spark.sql("SELECT * FROM ivj_sink").collect()
        ]
        assert got == [(1, "2024-01-01 10:00:00", "2024-01-01 10:10:00")]
    finally:
        q.stop()

    # batch equivalence: the same join expressed over static frames
    lb = spark.createDataFrame(clicks, schema).select(
        F.col("user_id").alias("c_user"), F.to_timestamp("at").alias("click_ts")
    )
    rb = spark.createDataFrame(buys, schema).select(
        F.col("user_id").alias("b_user"), F.to_timestamp("at").alias("buy_ts")
    )
    batch = lb.join(
        rb,
        (F.col("c_user") == F.col("b_user"))
        & (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 minutes")),
    )
    assert [
        (r.c_user, str(r.click_ts), str(r.buy_ts)) for r in batch.collect()
    ] == got


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """Built-in streaming dedup with event-time-bounded state
    (dropDuplicatesWithinWatermark) — the zero-custom-code alternative to
    stateful.streaming_dedup when a watermark bound is acceptable."""
    from pyspark.sql import functions as F

    src = tmp_path / "ddw_in"
    src.mkdir()
    (src / "b0.txt").write_text(
        "2024-01-01 10:00:00,k1\n2024-01-01 10:01:00,k1\n2024-01-01 10:02:00,k2\n"
    )
    raw = spark.readStream.format("text").load(str(src))
    parsed = raw.select(
        F.to_timestamp(F.split("value", ",")[0]).alias("ts"),
        F.split("value", ",")[1].alias("k"),
    )
    deduped = parsed.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["k"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("ddw_sink")
        .option("checkpointLocation", str(tmp_path / "ddw_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(r.k for r in spark.sql("SELECT k FROM ddw_sink").collect())
        assert got == ["k1", "k2"]
        # duplicate arriving in a later batch, still inside the watermark
        (src / "b1.txt").write_text("2024-01-01 10:05:00,k1\n")
        q.processAllAvailable()
        got = sorted(r.k for r in spark.sql("SELECT k FROM ddw_sink").collect())
        assert got == ["k1", "k2"]
    finally:
        q.stop()


def test_checkpoint_restart_exactly_once_file_sink(spark, tmp_path):
    """Restarting a checkpointed query resumes from the committed offset:
    rows written before the stop are not re-emitted, new rows flow —
    exactly-once to files, strictly stronger than the reference's
    at-most-once queue (SURVEY §2.8 delivery)."""
    src = tmp_path / "ck_in"
    src.mkdir()
    out = str(tmp_path / "ck_out")
    ckpt = str(tmp_path / "ck_ckpt")
    (src / "b0.txt").write_text("r1\nr2\n")

    def start():
        return (
            spark.readStream.format("text")
            .load(str(src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(r.value for r in spark.read.parquet(out).collect()) == ["r1", "r2"]

    # restart from the same checkpoint; only the new file is processed
    (src / "b1.txt").write_text("r3\n")
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r.value for r in spark.read.parquet(out).collect())
    assert got == ["r1", "r2", "r3"]  # no duplicates from reprocessing


def test_parquet_replay_backfill(spark, tmp_path):
    """Replaying a historical parquet dataset through the streaming
    engine: file-per-trigger micro-batches, total output equals the batch
    read — the backfill path needs no separate batch pipeline."""
    from pyspark.sql import functions as F

    from hotdog_spark.streaming.sources import parquet_replay

    hist = str(tmp_path / "hist")
    spark.range(300).select(
        F.col("id"), (F.col("id") % 3).alias("k")
    ).repartition(3).write.parquet(hist)
    schema = spark.read.parquet(hist).schema

    replay = parquet_replay(spark, hist, schema, max_files_per_trigger=1)
    counts = replay.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    q = (
        counts.writeStream.format("memory")
        .queryName("replay_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "replay_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.k: r.n for r in spark.sql("SELECT * FROM replay_sink").collect()}
        assert got == {0: 100, 1: 100, 2: 100}
        # file-per-trigger: more than one micro-batch ran
        assert len(q.recentProgress) >= 3
    finally:
        q.stop()


def test_streaming_session_window_with_watermark(spark, tmp_path):
    """The session-window operator runs identically as a stream: gap-based
    sessions close once the watermark passes, and the emitted sessions
    match the batch computation over the same rows."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators.windows import session_counts

    src = tmp_path / "sess_in"
    src.mkdir()
    rows = [
        "2024-01-01 10:00:00,7",
        "2024-01-01 10:10:00,7",   # same session (gap < 30m)
        "2024-01-01 12:00:00,7",   # new session
        "2024-01-01 20:00:00,7",   # advances watermark far past both
    ]
    (src / "b0.txt").write_text("\n".join(rows) + "\n")
    raw = spark.readStream.format("text").load(str(src))
    parsed = raw.select(
        F.to_timestamp(F.split("value", ",")[0]).alias("ts"),
        F.split("value", ",")[1].alias("user"),
    ).withWatermark("ts", "1 hour")
    sessions = (
        parsed.groupBy(F.session_window("ts", "30 minutes"), "user")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias("s"),
            "user",
            "n",
        )
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_sink")
        .outputMode("append")  # append emits only watermark-closed sessions
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.s, r.user): r.n
            for r in spark.sql("SELECT * FROM sess_sink").collect()
        }
        assert got[("2024-01-01 10:00:00", "7")] == 2
        assert got[("2024-01-01 12:00:00", "7")] == 1
    finally:
        q.stop()


def test_streaming_curation_pipeline(spark, tmp_path):
    """The curation projections (PII scrub, quality, fingerprint) are pure
    column expressions, so the SAME operators run unchanged under
    Structured Streaming — one pipeline for batch corpus washes and live
    ingestion."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators import privacy
    from hotdog_spark.operators.textops import fingerprint_expr, quality_expr

    src = str(tmp_path / "docs")
    rows = [
        (1, "reach me at a@b.com please"),
        (2, "the the the the spam spam"),
        (3, "reach me at z@y.org please"),
    ]
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = spark.readStream.schema(schema).parquet(src)
    curated = stream.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit(privacy.EMAIL_RE), F.lit(0))
        ).alias("n_email"),
        quality_expr(F.col("text")).alias("quality"),
        fingerprint_expr(privacy.redacted_text(F.col("text"), [])).alias("scrub_fp"),
    )
    q = (
        curated.writeStream.format("memory")
        .queryName("curation_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cur_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.doc_id: r for r in spark.sql("SELECT * FROM curation_sink").collect()}
        assert got[1].n_email == 1 and got[2].n_email == 0
        # docs 1 and 3 differ only in the redacted email → same scrub key
        assert got[1].scrub_fp == got[3].scrub_fp != got[2].scrub_fp
    finally:
        q.stop()


def test_upsert_parquet_sink_builds_current_state(spark, tmp_path):
    """The streaming upsert sink replays a change log into the same
    current-state table the batch latest_snapshot computes — one keyed
    materialization usable from both engines' paths."""
    import datetime as dt

    from pyspark.sql import functions as F

    from hotdog_spark.operators.temporal import latest_snapshot
    from hotdog_spark.streaming.sinks import upsert_parquet_sink
    from hotdog_spark.streaming.sources import parquet_replay

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, t0, 10.0, 1),
        (2, t0, 20.0, 2),
        (1, t0 + dt.timedelta(minutes=1), 11.0, 3),   # upsert of key 1
        (3, t0 + dt.timedelta(minutes=2), 30.0, 4),
        (2, t0 + dt.timedelta(minutes=2), 21.0, 5),   # upsert of key 2
    ]
    log = str(tmp_path / "changelog")
    df = spark.createDataFrame(rows, ["k", "ts", "v", "seq"])
    df.repartition(3).write.parquet(log)
    schema = spark.read.parquet(log).schema

    state = str(tmp_path / "state")
    stream = parquet_replay(spark, log, schema, max_files_per_trigger=1)
    q = upsert_parquet_sink(
        stream, state, ["k"], "ts", "seq", str(tmp_path / "ckpt")
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r.k: (r.v, r.seq) for r in spark.read.parquet(state).collect()}
    want = {
        r.k: (r.v, r.seq)
        for r in latest_snapshot(df, ["k"], "ts", "seq").collect()
    }
    assert got == want == {1: (11.0, 3), 2: (21.0, 5), 3: (30.0, 4)}


def test_streaming_lm_scoring(spark, tmp_path):
    """The production LM-quality shape: model TRAINED IN BATCH (bigram +
    context counts), live documents scored via STREAM-STATIC joins + a
    streaming aggregate — lm_bigram_score runs unchanged with the model
    as the static side, and its complete-mode result equals the batch
    operator's on the same data."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators.textops import (
        bigram_stream,
        lm_bigram_familiarity,
        lm_bigram_score,
    )

    rows = [(1, "a b a b"), (2, "a b a c"), (3, "x y")]
    batch = spark.createDataFrame(rows, ["doc_id", "text"])
    bg = bigram_stream(batch, "text", "doc_id")
    cb = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt")).collect()
    cc = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("ctx")).collect()
    cb_df = spark.createDataFrame(cb)
    cc_df = spark.createDataFrame(cc)

    src = str(tmp_path / "lm_docs")
    batch.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    scored = lm_bigram_score(
        bigram_stream(stream, "text", "doc_id"), cb_df, cc_df, "doc_id",
        rare_denom=3,
    )
    q = (
        scored.writeStream.format("memory")
        .queryName("lm_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "lm_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["doc_id"]: r.asDict()
            for r in spark.sql("SELECT * FROM lm_sink").collect()
        }
    finally:
        q.stop()
    want = {
        r["doc_id"]: r.asDict()
        for r in lm_bigram_familiarity(
            batch, "text", "doc_id", rare_denom=3
        ).collect()
    }
    assert got == want


def test_streaming_incremental_view_state_parity(spark, tmp_path):
    """The incremental-view state algebra is EXACTLY Spark streaming's
    aggregation-state model: a streaming complete-mode aggregation over
    arriving batches must equal aggregate_state over the union, and
    merging per-batch states gives the same answer.  One view
    definition, three maintenance paths (full rebuild, batch merge,
    stream), all bit-equal."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators import incremental as inc

    src = str(tmp_path / "ev")
    b1 = [("a", 1), ("a", 5), ("b", -3)]
    b2 = [("a", 2), ("c", 100)]
    spark.createDataFrame(b1, ["k", "v"]).coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    agg = stream.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("v").alias("sum_value_q"),
        F.min("v").alias("min_value_q"),
        F.max("v").alias("max_value_q"),
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("inc_view_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "inc_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # second batch arrives as a new file: streaming state absorbs it
        spark.createDataFrame(b2, ["k", "v"]).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        streamed = sorted(
            tuple(r) for r in spark.sql("SELECT * FROM inc_view_sink").collect()
        )
    finally:
        q.stop()

    full = inc.aggregate_state(
        spark.createDataFrame(b1 + b2, ["k", "v"]), ["k"], F.col("v")
    )
    merged = inc.merge_states(
        inc.aggregate_state(spark.createDataFrame(b1, ["k", "v"]), ["k"], F.col("v")),
        inc.aggregate_state(spark.createDataFrame(b2, ["k", "v"]), ["k"], F.col("v")),
    )
    want = sorted(tuple(r) for r in full.collect())
    assert streamed == want
    assert sorted(tuple(r) for r in merged.collect()) == want


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Exact dedup under streaming ingest: dropDuplicatesWithinWatermark
    keys on the content hash, so re-delivered payloads inside the
    watermark window emit once — the streaming twin of dedup_exact, with
    BOUNDED state (keys expire with the watermark, unlike
    dropDuplicates' forever-state)."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "dupsrc")
    rows1 = [("2024-01-01 00:00:01", "hello world"),
             ("2024-01-01 00:00:02", "unique one")]
    rows2 = [("2024-01-01 00:00:03", "hello world"),   # dup content, in-window
             ("2024-01-01 00:00:04", "unique two")]
    df1 = spark.createDataFrame(rows1, ["ts_s", "text"]).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "text"
    )
    df1.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn("content_hash", F.md5("text"))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_stream_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ddw_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        df2 = spark.createDataFrame(rows2, ["ts_s", "text"]).select(
            F.col("ts_s").cast("timestamp").alias("ts"), "text"
        )
        df2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        texts = sorted(
            r.text for r in spark.sql("SELECT * FROM dedup_stream_sink").collect()
        )
    finally:
        q.stop()
    # the re-delivered "hello world" must appear exactly once
    assert texts == ["hello world", "unique one", "unique two"]


def test_streaming_pipeline_from_config_parity(spark, tmp_path):
    """The config-driven curation DSL dual-modes (VERDICT r6 item 6):
    the SAME YAML-compiled step list runs over a file stream and must
    equal the batch wash on identical data — stateless steps in append
    mode, the keyed dedup aggregation in complete mode; window-ranking
    steps (pack/bin_report) refuse at COMPILE time on a stream."""
    import pytest

    from hotdog_spark.curation import DEFAULT_WASH, build_curation_pipeline

    rows = [
        (1, "reach me at a@b.com please today friend", "en"),
        (2, "the the the the spam spam spam", "en"),
        (3, "reach me at z@y.org please today friend", "de"),
        (4, "ein ganz anderes dokument mit vielen neuen worten", "de"),
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, ["doc_id", "text", "lang"]).coalesce(
        1
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stateless = {
        "pipeline": [
            {"step": "redact", "deny_terms": ["spam"]},
            {"step": "features"},
            {"step": "quality_gate", "min_quality": 0.05},
        ]
    }
    stateful = {
        "pipeline": stateless["pipeline"] + [{"step": "dedup_fingerprint"}]
    }

    batch_df = spark.read.parquet(src)
    want_stateless = sorted(
        tuple(r) for r in build_curation_pipeline(batch_df, stateless).collect()
    )
    want_stateful = sorted(
        tuple(r) for r in build_curation_pipeline(batch_df, stateful).collect()
    )

    stream = spark.readStream.schema(schema).parquet(src)
    # pack ranks with a window → must refuse on a stream, at compile time
    with pytest.raises(ValueError, match="Structured Streaming"):
        build_curation_pipeline(stream, DEFAULT_WASH)

    q1 = (
        build_curation_pipeline(stream, stateless)
        .writeStream.format("memory")
        .queryName("cur_cfg_append")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    q2 = (
        build_curation_pipeline(stream, stateful)
        .writeStream.format("memory")
        .queryName("cur_cfg_complete")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    try:
        q1.processAllAvailable()
        q2.processAllAvailable()
        got1 = sorted(
            tuple(r)
            for r in spark.sql("SELECT * FROM cur_cfg_append").collect()
        )
        got2 = sorted(
            tuple(r)
            for r in spark.sql("SELECT * FROM cur_cfg_complete").collect()
        )
    finally:
        q1.stop()
        q2.stop()
    assert got1 == want_stateless and got1
    assert got2 == want_stateful and got2


def test_streaming_bpe_encode_stream_static_parity(spark, tmp_path):
    """Stream-static BPE encode (VERDICT r6 item 6): merges train on the
    STATIC corpus (the broadcast-dim pattern — the merge table rides the
    kernel closure), then the SAME encode kernel runs over a document
    stream and must emit bit-identical stats to the batch encode."""
    from hotdog_spark.operators import bpe

    rows = [
        (1, "low low lower lowest"),
        (2, "new newer newest low"),
        (3, "wider wide wide new"),
    ]
    src = str(tmp_path / "bpe_docs")
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.parquet(src)
    batch = spark.read.parquet(src)
    merges = bpe.bpe_train(batch, "text", n_merges=10)
    assert merges, "trainer found no merges on the toy corpus"
    want = sorted(
        tuple(r)
        for r in bpe.bpe_encode_stats(batch, "text", "doc_id", merges).collect()
    )

    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        bpe.bpe_encode_stats(stream, "text", "doc_id", merges)
        .writeStream.format("memory")
        .queryName("bpe_enc_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "bpe_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            tuple(r)
            for r in spark.sql("SELECT * FROM bpe_enc_stream").collect()
        )
    finally:
        q.stop()
    assert got == want and len(got) == 3


def test_streaming_kmv_sketch_rollup_parity(spark, tmp_path):
    """Streaming distinct-count rollup with MERGEABLE sketch state: each
    micro-batch's KMV partials (operators/sketches.py) append to a state
    table via foreachBatch; finalizing the accumulated partials must
    equal the one-shot batch sketch of everything seen — bit-equal,
    including the integer estimates.  This is the sketch counterpart of
    the incremental-view state parity test."""
    from hotdog_spark.operators import sketches as sk

    src = str(tmp_path / "ev")
    state = str(tmp_path / "kmv_state")
    b1 = [("click", i) for i in range(200)] + [("buy", i) for i in range(3)]
    b2 = [("click", i) for i in range(100, 350)] + [("buy", 7)]
    spark.createDataFrame(b1, "event_type string, user_id long").coalesce(
        1
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def sink(batch_df, _bid):
        sk.kmv_partials(batch_df, "event_type", "user_id").write.mode(
            "append"
        ).parquet(state)

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, "event_type string, user_id long").coalesce(
            1
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = sorted(
        tuple(r)
        for r in sk.kmv_finalize(
            spark.read.parquet(state), "event_type"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in sk.kmv_distinct(
            spark.createDataFrame(b1 + b2, "event_type string, user_id long"),
            "event_type",
            "user_id",
        ).collect()
    )
    assert streamed == want and len(streamed) == 2


def test_streaming_provenance_report_state_parity(spark, tmp_path):
    """Streaming dedup provenance (VERDICT r7 item 8): each micro-batch
    appends its per-doc MERGEABLE signals (content hash + MinHash
    signature rows — pure map-stage outputs) to state tables via
    foreachBatch; finalizing the accumulated state must equal the
    one-shot batch report bit-for-bit, including the first-match-wins
    removal stage.  Same monoid pattern as the KMV rollup parity."""
    from hotdog_spark.operators import dedup as D

    near_a = "the quick brown fox jumps over the lazy dog again and again ok"
    near_b = "the quick brown fox jumps over the lazy dog again and again no"
    rows = [
        (1, "an exactly duplicated document body"),
        (2, "an exactly duplicated document body"),     # exact dup of 1
        (3, near_a),
        (4, near_b),                                    # near dup of 3
        (5, "a completely unrelated singleton text"),
        (6, near_a),                                    # exact dup of 3
    ]
    src = str(tmp_path / "docs")
    h_state = str(tmp_path / "prov_hashes")
    s_state = str(tmp_path / "prov_sigs")
    spark.createDataFrame(rows[:3], "doc_id long, text string").coalesce(
        1
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def sink(batch_df, _bid):
        hashes, sigs = D.provenance_state(batch_df, "text", "doc_id", bands=4, k=3)
        hashes.write.mode("append").parquet(h_state)
        sigs.write.mode("append").parquet(s_state)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows[3:], "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = sorted(
        tuple(r)
        for r in D.provenance_report_from_state(
            spark.read.parquet(h_state), spark.read.parquet(s_state)
        ).collect()
    )
    full = spark.createDataFrame(rows, "doc_id long, text string")
    bh, bs = D.provenance_state(full, "text", "doc_id", bands=4, k=3)
    want = sorted(
        tuple(r) for r in D.provenance_report_from_state(bh, bs).collect()
    )
    assert streamed == want and len(streamed) == 6
    by_id = {r[0]: r for r in streamed}
    assert by_id[2][3] == "exact"           # exact dup of doc 1
    assert by_id[6][3] == "exact"           # exact wins over near
    assert by_id[4][3] == "near_dup"        # LSH pair (3,4), larger id
    assert by_id[1][3] == "kept" and by_id[5][3] == "kept"


def test_streaming_bpe_pack_state_parity(spark, tmp_path):
    """Streaming tokenizer-aware packing (VERDICT r7 item 8): merges are
    trained once on the static corpus; each micro-batch ENCODES its docs
    with the frozen merge table (per-doc kernel — delta-sized) and
    appends (doc_id, lang, n_bpe_tokens) to a state table; finalizing
    the accumulated state through the packing window must equal the
    one-shot batch pack_bpe_token_bins composition bit-for-bit."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators import bpe
    from hotdog_spark.operators.sampling import pack_token_budget

    rows = [
        (1, "low low lower lowest", "en"),
        (2, "new newer newest low", "en"),
        (3, "wider wide wide new", "de"),
        (4, "newest newest wide lower", "de"),
        (5, "low wide new lowest newer", "en"),
    ]
    src = str(tmp_path / "bpe_docs")
    state = str(tmp_path / "bpe_state")
    spark.createDataFrame(
        rows[:2], "doc_id long, text string, lang string"
    ).coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    full = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    merges = bpe.bpe_train(full, "text", n_merges=10)
    assert merges

    def pack(stats_df):
        packed = pack_token_budget(
            stats_df, "doc_id", "n_bpe_tokens", 12, group_col="lang"
        )
        return packed.groupBy("lang", "bin").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bpe_tokens").alias("bin_tokens"),
        )

    def sink(batch_df, _bid):
        stats = bpe.bpe_encode_stats(batch_df, "text", "doc_id", merges).select(
            "doc_id", "n_bpe_tokens"
        )
        batch_df.select("doc_id", "lang").join(stats, "doc_id").write.mode(
            "append"
        ).parquet(state)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            rows[2:], "doc_id long, text string, lang string"
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = sorted(
        tuple(r) for r in pack(spark.read.parquet(state)).collect()
    )
    stats_full = bpe.bpe_encode_stats(full, "text", "doc_id", merges).select(
        "doc_id", "n_bpe_tokens"
    )
    want = sorted(
        tuple(r)
        for r in pack(full.select("doc_id", "lang").join(stats_full, "doc_id")).collect()
    )
    assert streamed == want and len(streamed) >= 2


def test_streaming_kmv_set_relations_rollup_parity(spark, tmp_path):
    """Streaming SET-ALGEBRA rollup on mergeable KMV state: the same
    accumulated (key, mins) partials that answer per-key distinct counts
    also answer pairwise union/intersection/Jaccard — finalizing
    accumulated state through kmv_set_relations_from_partials must equal
    the one-shot batch kmv_set_relations of everything seen, bit-equal
    including the integer estimators (the k-min semilattice makes the
    union sketch independent of how the data was sliced)."""
    from hotdog_spark.operators import sketches as sk

    src = str(tmp_path / "ev")
    state = str(tmp_path / "kmv_state")
    b1 = [("click", i) for i in range(120)] + [("view", i) for i in range(60, 200)]
    b2 = [("click", i) for i in range(80, 300)] + [("buy", i) for i in range(40)]
    spark.createDataFrame(b1, "event_type string, user_id long").coalesce(
        1
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def sink(batch_df, _bid):
        sk.kmv_partials(batch_df, "event_type", "user_id").write.mode(
            "append"
        ).parquet(state)

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, "event_type string, user_id long").coalesce(
            1
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = sorted(
        tuple(r)
        for r in sk.kmv_set_relations_from_partials(
            spark.read.parquet(state)
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in sk.kmv_set_relations(
            spark.createDataFrame(b1 + b2, "event_type string, user_id long"),
            "event_type",
            "user_id",
        ).collect()
    )
    assert streamed == want and len(streamed) == 3  # 3 unordered type pairs


def test_streaming_simhash_hamming_incremental_state_parity(spark, tmp_path):
    """Incremental near-dup ingest for the Hamming family (the
    daily-ingest pattern: hash once per document on arrival, never
    re-hash the corpus): each micro-batch's 48-bit simhashes append to
    a state table via foreachBatch; running the blocked Hamming pair
    search over the ACCUMULATED state must equal the one-shot batch
    simhash_hamming_pairs over everything seen — bit-equal, because the
    per-doc hash is a pure function of the doc and the pairing is a
    pure function of the hash table."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators.dedup import (
        simhash_bits,
        simhash_hamming_pairs,
        simhash_hamming_pairs_from_hashes,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    src = str(tmp_path / "docs")
    state = str(tmp_path / "simhash_state")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    b1.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def sink(batch_df, _bid):
        simhash_bits(batch_df, "text", "doc_id").write.mode(
            "append"
        ).parquet(state)

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        b2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    # pair search over the accumulated hash state (no re-hash): the
    # SAME factored operator the batch path delegates to, so the
    # max_bucket saturation cap — part of the operator's contract — is
    # applied on the state side too, not just in the batch baseline
    sh = spark.read.parquet(state)
    streamed = sorted(
        tuple(r)
        for r in simhash_hamming_pairs_from_hashes(sh).collect()
    )
    want = sorted(
        tuple(r) for r in simhash_hamming_pairs(docs, "text", "doc_id").collect()
    )
    assert streamed == want and len(want) > 0

    # and the cap genuinely binds through the shared path: sf0.001
    # bucket sizes span 1..58, so max_bucket=5 drops some buckets while
    # keeping others — parity must hold on the CAPPED search too, and
    # the capped result is strictly smaller but non-empty
    capped_state = sorted(
        tuple(r)
        for r in simhash_hamming_pairs_from_hashes(sh, max_bucket=5).collect()
    )
    capped_batch = sorted(
        tuple(r)
        for r in simhash_hamming_pairs(
            docs, "text", "doc_id", max_bucket=5
        ).collect()
    )
    assert capped_state == capped_batch
    assert 0 < len(capped_state) < len(want)
