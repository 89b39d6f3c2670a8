"""Deterministic sampling and dataset splitting.

`df.sample()` is seed-and-partitioning dependent — rerun the job with
different parallelism and you get a different sample.  Training-data
pipelines need *content-deterministic* sampling: whether a row is in the
sample depends only on its key, so the split is reproducible across
engines, reruns, and backfills, and rows never migrate between train and
test when the corpus grows.  The trick: hash the key (md5 —
engine-portable), take a fixed-width lowercase-hex prefix, and compare it
lexicographically against a threshold — fixed-width hex ordering is
integer ordering, so no hex→int conversion is needed anywhere.

Pure projections — no shuffle, no state, no RNG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 4 hex chars → 16 bits of uniformity: granularity 1/65536 per key.
_PREFIX_LEN = 4
_SPACE = 16 ** _PREFIX_LEN


def hex_threshold(rate: float) -> str:
    """The 4-hex-char cutoff under which ~``rate`` of keys fall."""
    return format(int(rate * _SPACE), f"0{_PREFIX_LEN}x")


def _prefix(key: Column) -> Column:
    return F.substring(F.md5(key.cast("string")), 1, _PREFIX_LEN)


def md5_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Keep ~``rate`` of rows, chosen deterministically by key content."""
    return df.filter(_prefix(F.col(key_col)) < F.lit(hex_threshold(rate)))


def with_split(
    df: DataFrame, key_col: str, test_frac: float = 0.1, split_col: str = "split"
) -> DataFrame:
    """Add a stable train/test assignment column.  A key's split never
    changes as the corpus grows — the property random splits lose."""
    return df.withColumn(
        split_col,
        F.when(
            _prefix(F.col(key_col)) < F.lit(hex_threshold(test_frac)), F.lit("test")
        ).otherwise(F.lit("train")),
    )
