"""Query registry: every operator exposed through the driver contract.

Each entry pairs a PySpark implementation ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an equivalent ANSI-SQL oracle string that
DuckDB runs over the same parquet tables.  Column names and value
determinism are part of the contract: every computed column is aliased
identically on both sides, and float-order-sensitive math is avoided
(decimal casts for money sums, integer quantization for embeddings) so the
order-insensitive value hashes match bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}
_BENCH_ONLY: dict[str, Callable[[SparkSession, str], DataFrame]] = {}


def register(name: str, oracle: str | None = None):
    """Register a query implementation and (optionally) its DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def register_bench_only(name: str):
    """Register a BENCH-ONLY query: timed by bench.py / the scale sweeps
    but NOT exposed through the driver contract.  For plans whose emitted
    values are engine-specific (sketch estimates) so no DuckDB oracle can
    exist, yet whose COST is the thing worth measuring — the driver
    contract has no rows-only mode (r6's two `no_oracle` reds), so these
    must not reach ``queries()``.  The deterministic hash-checked
    contract lives in a sibling registered query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _BENCH_ONLY[name] = fn
        return fn

    return deco


def bench_only_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_modules()
    return dict(_BENCH_ONLY)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_modules()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_modules()
    return dict(_ORACLES)


def _load_modules() -> None:
    # Import for registration side effects.
    from hotdog_spark.queries import (  # noqa: F401
        analytics,
        curation,
        dedup,
        functional,
        graph,
        hotdog,
        multimodal,
        relational,
        similarity,
        streaming,
        temporal,
        text,
        tpch_extra,
    )
