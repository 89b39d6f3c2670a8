"""Skew mitigation utilities.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin) handles most hot
keys at runtime; explicit salting remains the tool when one join key is so
hot that even split partitions overwhelm a task, or when the engine runs
with AQE off.  The transformation is the standard one: the large side gets
a deterministic salt in [0, salt), the small side is replicated once per
salt value, and the join key becomes (key..., salt) — turning one hot
partition into ``salt`` evenly-sized ones at the cost of replicating the
small side ``salt``×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the large side salted and the small side replicated.

    Semantically identical to ``large.join(small, on, how)`` for any
    ``how`` where the left/large side drives the result (inner, left,
    left_semi, left_anti): each large row carries exactly one salt value,
    so no duplicates are introduced.  The salt is a deterministic hash of
    the whole large row — identical rows co-locate, everything else
    spreads uniformly.
    """
    salted_large = large.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(salt)).cast("int"),
    )
    replicated_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_large.join(replicated_small, on=[*on, "_salt"], how=how).drop("_salt")
