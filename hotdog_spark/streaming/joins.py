"""Streaming joins: watermarked stream-stream interval joins and
stream-static enrichment.

The reference is a stateless per-record pipeline — it has no joins of any
kind (SURVEY.md §2.9, verified over src/) — but a routing engine that
forwards events into topics invites exactly these two shapes downstream:

* **stream-static**: enrich each in-flight record against a slowly
  changing dimension (e.g. hostname → owner).  The dimension is read per
  micro-batch, so updates are picked up without restarting the query;
  small dims broadcast — zero shuffle on the stream side.

* **stream-stream interval join**: correlate two live streams within a
  time bound (e.g. click ↔ purchase within 30 minutes).  Both sides are
  watermarked, and the join condition carries BOTH the equality key and
  the event-time interval, so Spark can bound its join state: rows are
  evicted once the other side's watermark passes ``upper``.  Without the
  interval the state would grow forever — the watermark + interval IS
  the 100 TB design.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def enrich_static(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Join a streaming DataFrame against a static dimension.

    Supported natively by Structured Streaming (the static side is
    re-read each micro-batch).  ``broadcast_dim`` pins the replicated
    hash join so the stream never shuffles.
    """
    dim = broadcast(dim_df) if broadcast_dim else dim_df
    return stream_df.join(dim, on=on, how=how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    left_ts: str,
    right_ts: str,
    *,
    lower: str = "0 seconds",
    upper: str = "30 minutes",
    left_watermark: str = "1 hour",
    right_watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join where the right event must fall in
    ``[left_ts + lower, left_ts + upper]``.

    Both watermarks are mandatory for state cleanup; for outer joins
    Spark additionally requires the interval condition to emit the
    unmatched side once the watermark passes — this signature enforces
    both so every caller gets bounded state by construction.
    """
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    lcol, rcol = F.col(left_ts), F.col(right_ts)
    cond = (
        on
        & (rcol >= lcol + F.expr(f"INTERVAL {lower}"))
        & (rcol <= lcol + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, how)
