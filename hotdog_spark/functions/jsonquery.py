"""Arrow-batched bridge from JSON string columns to the jmespath_lite
evaluator — the UDF slow path for rule matchers beyond the dotted-path
subset (reference: full JMESPath matching, src/rules.rs:75-93).

One pandas UDF evaluates the compiled expression per batch and returns a
struct of the two things the rule engine needs: the full result (JSON-
encoded, null == no match) and the string form exposed as the ``value``
template variable (non-string results leave it unset, mirroring the
reference's warn-and-skip at src/rules.rs:83-90).

Executors must be able to import ``hotdog_spark`` —
``dist.ensure_shipped`` (called by ``sources.batch.table``) handles that;
standalone pipelines on other sources should call it explicitly.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column

from hotdog_spark.functions import jmespath_lite


def jmespath_struct(col: Column, expression: str) -> Column:
    """Evaluate ``expression`` over a JSON-string column.

    Returns struct(res_json string, res_str string): ``res_json`` is the
    JSON-encoded result (null when the input is null/invalid JSON or the
    expression yields null — the no-match signal), ``res_str`` the result
    only when it is a JSON string.
    """
    from pyspark.sql.functions import pandas_udf

    compiled = jmespath_lite.compile(expression)  # fail fast on the driver

    @pandas_udf("res_json string, res_str string")
    def _eval(s: pd.Series) -> pd.DataFrame:
        res_json: list[str | None] = []
        res_str: list[str | None] = []
        for v in s:
            out = None
            if v is not None:
                try:
                    out = compiled.search(json.loads(v))
                except (json.JSONDecodeError, RecursionError):
                    out = None
            res_json.append(None if out is None else json.dumps(out))
            res_str.append(out if isinstance(out, str) else None)
        return pd.DataFrame({"res_json": res_json, "res_str": res_str})

    return _eval(col)
