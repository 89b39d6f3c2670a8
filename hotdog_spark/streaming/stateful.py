"""Custom stateful streaming operators (applyInPandasWithState).

The reference pipeline is stateless per record (SURVEY.md §2.8); these are
north-star additions that need keyed state across micro-batches, built on
Spark's Arrow-batched state API:

* ``streaming_dedup`` — emit only the first occurrence of each key ever
  seen, with a processing-time TTL bounding state size (the streaming twin
  of operators/dedup.exact_dedup_groups).  Unlike the built-in
  ``dropDuplicates`` + watermark (event-time bounded), TTL state answers
  the training-data ask: "never emit the same document twice within N
  hours, whatever its event time".
* ``running_topic_counts`` — cumulative per-topic record counters emitted
  every micro-batch: the reference's per-topic statsd counters
  (src/sink/kafka.rs:170-186, src/status.rs:42-71) as queryable state
  instead of fire-and-forget metrics.

State scales horizontally: state rows live in the state store partitioned
by the grouping key (numShufflePartitions state partitions), so 10⁹ keys
spread across executors; TTL eviction keeps each partition bounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(
    df: DataFrame, key_col: str, ttl_ms: int | None = None
) -> DataFrame:
    """Keep the first row per ``key_col`` value across micro-batches.

    Emits each incoming row whose key has no live state entry, then
    records the key.  Input must be pre-projected to (key, value).

    ``ttl_ms`` enables a processing-time TTL that evicts idle keys and
    bounds state.  Note Spark's contract for processing-time timeouts:
    the engine schedules no-data micro-batches to evaluate them, so the
    query never fully quiesces — use it in daemon deployments with a
    ``processingTime`` trigger (where perpetual triggering is the normal
    operating mode), and leave it off for drain-and-stop batch-ish runs
    (``processAllAvailable`` would never return).  At 100 TB the state
    store is partitioned by key across executors either way; TTL (or a
    periodic checkpoint-compaction job) is what keeps each partition
    bounded over weeks of uptime.
    """

    def dedup_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if not state.exists:
            for pdf in pdfs:
                if len(pdf) > 0:
                    yield pdf.iloc[:1]
                    break
            state.update((1,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    out_schema = df.select(key_col, "value").schema
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        df.select(key_col, "value")
        .groupBy(key_col)
        .applyInPandasWithState(
            dedup_fn,
            outputStructType=out_schema,
            stateStructType="seen int",
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def running_topic_counts(routed: DataFrame) -> DataFrame:
    """Cumulative (topic, total) counters across all micro-batches so far.

    Emits one updated row per topic per batch — the engine-surface twin
    of the reference's `hotdog.topic.submitted.<topic>` counters."""

    def count_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        batch_n = sum(len(pdf) for pdf in pdfs)
        total = (state.get[0] if state.exists else 0) + batch_n
        state.update((total,))
        yield pd.DataFrame({"topic": [key[0]], "total": [total]})

    return (
        routed.select("topic")
        .groupBy("topic")
        .applyInPandasWithState(
            count_fn,
            outputStructType="topic string, total long",
            stateStructType="total long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_topic_counts_tws(routed: DataFrame) -> DataFrame:
    """`running_topic_counts` on Spark 4's transformWithStateInPandas —
    the successor API to applyInPandasWithState: named state variables on
    a handle (composable, individually TTL-able, queryable by the state
    reader) instead of one opaque state tuple.  Same contract: one
    updated (topic, total) row per topic per micro-batch.

    Both implementations stay registered side by side deliberately — the
    old API is what most deployed Spark supports; this one is where
    Structured Streaming state is going.

    VERSION GUARD: the Spark-4-only import lives inside this function, so
    the module imports cleanly on Spark 3.5; calling it there raises a
    directed NotImplementedError (pointing at the 3.5-compatible twin)
    instead of an opaque ImportError — pinned by
    tests/test_streaming.py::test_tws_version_guard."""
    try:
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )
    except ImportError as e:
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark >= 4.0; on older "
            "Spark use running_topic_counts (applyInPandasWithState), "
            "which has the identical contract"
        ) from e

    class _TopicCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._total = handle.getValueState("total", "total long")

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            batch_n = sum(len(pdf) for pdf in rows)
            prev = self._total.get()
            total = (prev[0] if prev is not None else 0) + batch_n
            self._total.update((total,))
            yield pd.DataFrame({"topic": [key[0]], "total": [total]})

        def close(self) -> None:
            pass

    return (
        routed.select("topic")
        .groupBy("topic")
        .transformWithStateInPandas(
            statefulProcessor=_TopicCount(),
            outputStructType="topic string, total long",
            outputMode="Update",
            timeMode="None",
        )
    )
