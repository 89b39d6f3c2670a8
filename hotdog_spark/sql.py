"""SQL entry point: the engine as a SQL surface over the data lake.

``register_tables`` exposes every known table as a temp view;
``sql`` is then a one-call query surface — the same Catalyst planning as
the DataFrame API (all pushdown/pruning/AQE behavior is identical), so a
user of the reference who wants ad-hoc SQL over their routed topics gets
it with no extra machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hotdog_spark.sources.batch import TABLES, table


def register_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> list[str]:
    """Create a temp view per table; returns the registered names.
    Views are lazy — nothing is scanned until a query runs against them."""
    registered = []
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
        registered.append(name)
    return registered


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run ANSI SQL over the sf tables (registers views on first use)."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
