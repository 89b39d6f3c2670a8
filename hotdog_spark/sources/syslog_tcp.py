"""Native Spark streaming source for raw TCP / TLS syslog ingestion.

This is the Spark-side realization of the reference's listeners — the TCP
plaintext server (S1, reference: src/serve/plain.rs:1-6 +
src/serve/mod.rs:73-173), the TLS server with cert/key loading (S2,
src/serve/tls.rs:23-124), and newline framing (S3, src/connection.rs:69,85)
— implemented as a PySpark 4 ``pyspark.sql.datasource.DataSource`` so a
pipeline can say::

    spark.dataSource.register(SyslogDataSource)
    lines = (spark.readStream.format("hotdog_syslog")
             .option("port", 1514).load())          # → column `value`

Architecture notes (and why this is the right Spark shape):

* The listener runs as daemon threads inside a ``SimpleDataSourceStreamReader``
  on the **driver** — exactly where a single-socket ingest edge belongs.
  Spark's Simple reader contract is explicitly for low-rate sources that
  don't need partition planning; syslog over one listening socket is the
  textbook case.  The heavy work (parse, rule cascade, sinks) happens on
  executors after Spark redistributes the batch.
* The production path at scale stays the syslog→Kafka bridge + ``kafka``
  format (sources.py): a TCP socket is inherently a single-node, replay-
  free edge.  This source exists for parity (run the engine with nothing
  but Spark, as `hotdog` runs with nothing but itself) and for dev loops.
* Delivery is at-most-once **between restarts** (a line accepted but not
  yet read into a committed batch is lost on crash), which is the
  reference's own contract — it drops on a full internal queue
  (src/sink/kafka.rs:45, README.adoc:198-202).  Within a running query,
  ``readBetweenOffsets`` replays from a retained buffer so Spark's
  micro-batch retry works.  A bounded buffer mirrors the reference's
  ``kafka.buffer`` queue: overflow drops the oldest lines and counts them
  (`error.full_internal_queue`, src/status.rs:57-59).
* TLS termination uses ``ssl.SSLContext`` with the same cert/key file
  semantics as the reference (PEM cert chain + RSA/PKCS8 key,
  src/serve/tls.rs:73-124); client auth is not requested, matching the
  reference (no client verification, src/serve/tls.rs:33-38).
"""

from __future__ import annotations

import socket
import ssl
import threading
from collections import deque
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

DEFAULT_PORT = 1514          # the reference's example port (tsung.xml:9)
DEFAULT_BUFFER = 65536       # retained-lines cap (cf. kafka.buffer=1024 default)
DEFAULT_MAX_MSG = 1 << 20    # 1 MiB per-message cap; oversized frames are
                             # shed + counted, so one bad client can't grow
                             # a connection buffer without bound


class _Listener:
    """Accept loop + per-connection reader threads feeding one deque.

    The thread layout intentionally mirrors the reference: one acceptor
    (src/serve/mod.rs:138-171) spawning a detached per-connection reader
    (src/serve/mod.rs:54-70) that iterates newline-framed records
    (src/connection.rs:85)."""

    def __init__(
        self,
        host: str,
        port: int,
        buffer: int,
        ssl_ctx: ssl.SSLContext | None,
        max_msg: int = DEFAULT_MAX_MSG,
    ):
        self._lines: deque[tuple[int, str]] = deque()
        self._lock = threading.Lock()
        self._next_seq = 0
        self._dropped = 0
        self._oversized = 0
        self._buffer = buffer
        self._max_msg = max_msg
        self._ssl_ctx = ssl_ctx
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(128)
        self.port = self._sock.getsockname()[1]
        self._closed = False
        t = threading.Thread(target=self._accept_loop, daemon=True)
        t.start()

    def _accept_loop(self) -> None:
        while not self._closed:
            try:
                conn, _addr = self._sock.accept()
            except OSError:
                return
            threading.Thread(target=self._read_conn, args=(conn,), daemon=True).start()

    def _append(self, line: str) -> None:
        if not line:
            return
        with self._lock:
            self._lines.append((self._next_seq, line))
            self._next_seq += 1
            # bounded-queue load shedding, oldest first
            # (reference drops newest; either way it's counted)
            while len(self._lines) > self._buffer:
                self._lines.popleft()
                self._dropped += 1

    def _read_conn(self, conn: socket.socket) -> None:
        """Per-connection frame loop supporting BOTH RFC 6587 framings:

        * non-transparent (newline) framing — the reference's only mode
          (src/connection.rs:85);
        * octet counting (``LEN SP MSG``) — what rsyslog/syslog-ng emit
          over TCP by default, and the only framing that can carry
          embedded newlines.  EXTENSION beyond the reference.

        Mode is auto-detected from the connection's first byte (a digit
        ⇒ octet-counted), fixed per connection as the RFC prescribes; a
        malformed length prefix degrades to newline framing rather than
        stalling the connection.

        Memory safety: any single message larger than ``max_msg`` (default
        1 MiB) is shed and counted (`_oversized`) instead of buffered — an
        octet frame declaring a huge length is discarded streamingly
        without ever materializing it, and an unterminated newline-mode
        line longer than the cap is dropped up to its terminator.  This
        bounds per-connection memory at ~``max_msg`` + one recv chunk,
        the same load-shedding posture as the bounded line deque.

        Octet-counted payloads are delivered VERBATIM (RFC 6587 frames
        are exact byte counts — trailing newlines are part of the
        message); only newline-framed records are trimmed of their
        ``\\r\\n`` terminator."""
        try:
            if self._ssl_ctx is not None:
                # TLS handshake before any reads (src/serve/tls.rs:41-52);
                # handshake failure closes the connection, pipeline unharmed.
                conn = self._ssl_ctx.wrap_socket(conn, server_side=True)
            with conn:
                buf = b""
                mode: str | None = None
                discard = 0        # octet mode: oversized-frame bytes still to skip
                skip_line = False  # newline mode: inside an oversized line
                while True:
                    chunk = conn.recv(65536)
                    if not chunk:
                        break
                    buf += chunk
                    while buf:
                        if discard:
                            take = min(len(buf), discard)
                            buf = buf[take:]
                            discard -= take
                            if discard:
                                break  # rest of the frame not yet received
                            continue
                        if skip_line:
                            nl = buf.find(b"\n")
                            if nl < 0:
                                buf = b""
                                break
                            buf = buf[nl + 1:]
                            skip_line = False
                            continue
                        if mode is None:
                            mode = "octet" if buf[0:1].isdigit() else "newline"
                        if mode == "newline":
                            nl = buf.find(b"\n")
                            if nl < 0:
                                if len(buf) > self._max_msg:
                                    # unterminated oversized line: shed it
                                    buf = b""
                                    skip_line = True
                                    self._oversized += 1
                                break
                            if nl > self._max_msg:
                                buf = buf[nl + 1:]
                                self._oversized += 1
                                continue
                            raw, buf = buf[:nl], buf[nl + 1:]
                            self._append(
                                raw.decode("utf-8", errors="replace").rstrip("\r")
                            )
                        else:
                            sp = buf.find(b" ")
                            if sp < 0:
                                if len(buf) > 9:  # no sane length prefix
                                    mode = "newline"
                                    continue
                                break
                            head = buf[:sp]
                            if not head.isdigit() or len(head) > 9:
                                mode = "newline"
                                continue
                            n = int(head)
                            if n > self._max_msg:
                                # shed the whole declared frame streamingly
                                discard = sp + 1 + n
                                self._oversized += 1
                                continue
                            if len(buf) < sp + 1 + n:
                                break  # frame incomplete; wait for more
                            raw = buf[sp + 1:sp + 1 + n]
                            buf = buf[sp + 1 + n:]
                            # exact byte count ⇒ deliver verbatim (RFC 6587)
                            self._append(raw.decode("utf-8", errors="replace"))
                # trailing unterminated newline-framed record
                if mode == "newline" and buf and not skip_line:
                    self._append(buf.decode("utf-8", errors="replace").rstrip("\r"))
        except (OSError, ssl.SSLError):
            return  # connection reset / bad handshake: drop the connection

    def snapshot_from(self, seq: int) -> tuple[list[tuple[int, str]], int]:
        with self._lock:
            return [item for item in self._lines if item[0] >= seq], self._next_seq

    def prune_below(self, seq: int) -> None:
        with self._lock:
            while self._lines and self._lines[0][0] < seq:
                self._lines.popleft()

    def close(self) -> None:
        self._closed = True
        try:
            self._sock.close()
        except OSError:
            pass


class _SyslogStreamReader(SimpleDataSourceStreamReader):
    """Binds lazily on first ``read``: Spark constructs one reader instance
    during stream *planning* and another for *execution*; only the
    executing one may own the port."""

    def __init__(self, options: dict):
        self._options = options
        self._listener: _Listener | None = None

    def _ensure_listener(self) -> _Listener:
        if self._listener is None:
            opts = self._options
            ssl_ctx = None
            if str(opts.get("tls", "false")).lower() == "true":
                # cert/key loading parity with src/serve/tls.rs:73-124
                ssl_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
                ssl_ctx.load_cert_chain(opts["cert"], opts["key"])
            self._listener = _Listener(
                opts.get("host", "127.0.0.1"),
                int(opts.get("port", DEFAULT_PORT)),
                int(opts.get("buffer", DEFAULT_BUFFER)),
                ssl_ctx,
                max_msg=int(opts.get("max_msg", DEFAULT_MAX_MSG)),
            )
        return self._listener

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        items, end_seq = self._ensure_listener().snapshot_from(start["seq"])
        return iter([(line,) for _, line in items]), {"seq": end_seq}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # Replay path: runs on an executor when the prefetch cache misses
        # (e.g. the initial empty batch, or query restart).  It must NOT
        # bind the socket — only the driver-side prefetching read() owns
        # the listener.  A TCP stream is not replayable after a restart;
        # returning what the local buffer still holds (or nothing) is the
        # at-most-once contract the reference has by design
        # (drop-on-full queue, src/sink/kafka.rs:45).
        if self._listener is None:
            return iter([])
        items, _ = self._listener.snapshot_from(start["seq"])
        return iter([(line,) for seq, line in items if seq < end["seq"]])

    def commit(self, end: dict) -> None:
        # Batch is durably committed downstream: retained lines below the
        # committed offset can go (the sink-side flush ack analog,
        # src/sink/parquet.rs:226-229).
        if self._listener is not None:
            self._listener.prune_below(end["seq"])


class _EmptyBatchReader(DataSourceReader):
    def read(self, partition):
        return iter([])


class SyslogDataSource(DataSource):
    """``format("hotdog_syslog")`` — raw syslog lines over TCP/TLS.

    Options: ``host`` (default 127.0.0.1), ``port`` (default 1514; 0 =
    ephemeral), ``tls`` (true/false), ``cert``/``key`` (PEM paths when tls),
    ``buffer`` (retained-line cap, default 65536), ``max_msg``
    (per-message byte cap, default 1 MiB; larger frames are shed and
    counted, bounding per-connection memory)."""

    @classmethod
    def name(cls) -> str:
        return "hotdog_syslog"

    def schema(self) -> str:
        return "value string"

    def simpleStreamReader(self, schema: StructType) -> _SyslogStreamReader:
        return _SyslogStreamReader(self.options)

    def reader(self, schema: StructType) -> DataSourceReader:
        # Batch read of a live socket is the empty relation (parity with
        # "daemon mode only listens"; batch file ingestion is sources.py).
        return _EmptyBatchReader()


def register(spark) -> None:
    spark.dataSource.register(SyslogDataSource)


def syslog_stream(spark, **options):
    """readStream helper: ``syslog_stream(spark, port=1514)`` → DataFrame
    of raw lines (column ``value``)."""
    register(spark)
    reader = spark.readStream.format("hotdog_syslog")
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load()
