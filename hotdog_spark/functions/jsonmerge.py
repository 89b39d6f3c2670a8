"""Deep JSON merge with the reference's exact semantics.

Semantics replicated (reference: src/merge.rs:67-86, itself vendored from
the public MIT-licensed json_value_merge crate):

* object ⊕ object  → recursive key-wise merge; for keys present in both,
  merge recurses (scalars: b wins); keys only in b are inserted.
* array  ⊕ array   → a.extend(b) then *consecutive*-duplicate removal
  (Rust ``Vec::dedup`` — NOT a set-dedup; ``[a, b, a]`` stays).
* array  ⊕ object  → push b then consecutive-duplicate removal.
* anything else    → b overwrites a.

Plus the action-level wrapper semantics (src/connection.rs:310-335):

* target not valid JSON → merge *fails* (caller sets continue_rules=false);
* rendered patch not a JSON object → original buffer passes through
  unchanged.

Two execution paths:

* ``merge_json_udf`` — Arrow-batched pandas UDF implementing the exact
  dynamic semantics for unknown target shapes (the UDF is the sanctioned
  slow path; it is only in the plan when a rule actually has a merge
  action).
* ``merge_static_object`` — pure-Catalyst fast path for the common config
  shape (patch is a static JSON object merged into a target with a known
  schema): ``from_json`` → ``withField`` per patch leaf → ``to_json``.
"""

from __future__ import annotations

import json
from typing import Any

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType


def merge_values(a: Any, b: Any) -> Any:
    """Exact port of the reference merge semantics over parsed JSON values.

    Returns the merged value (may mutate and return ``a`` for containers).
    """
    if isinstance(a, dict) and isinstance(b, dict):
        for k, v in b.items():
            a[k] = merge_values(a.get(k), v) if k in a else merge_values(None, v)
        return a
    if isinstance(a, list) and isinstance(b, list):
        a.extend(b)
        return _dedup_consecutive(a)
    if isinstance(a, list) and isinstance(b, dict):
        a.append(b)
        return _dedup_consecutive(a)
    # fallthrough: b overwrites a (covers a=None from the or_insert(Null)
    # path and every scalar/type-mismatch case)
    return b


def _dedup_consecutive(items: list) -> list:
    """Rust Vec::dedup — remove only *consecutive* equal elements."""
    out: list = []
    for item in items:
        if not out or out[-1] != item:
            out.append(item)
    return out


def merge_json_strings(target: str | None, patch: str | None) -> str | None:
    """Action-level merge of two JSON strings.

    Returns the merged JSON string; the original target when the patch is
    not a JSON object; ``None`` when the target is not valid JSON (the
    "Not JSON" failure, src/connection.rs:331-334).
    """
    if target is None:
        return None
    try:
        target_value = json.loads(target)
    except (ValueError, TypeError):
        return None  # merge failure: caller maps this to continue_rules=false
    try:
        patch_value = json.loads(patch) if patch is not None else None
    except (ValueError, TypeError):
        patch_value = None
    if not isinstance(patch_value, dict):
        # non-object patch passes the buffer through unchanged
        # (src/connection.rs:317-322)
        return target
    merged = merge_values(target_value, patch_value)
    return json.dumps(merged, separators=(",", ":"))


@F.pandas_udf(StringType())
def merge_json_udf(target: pd.Series, patch: pd.Series) -> pd.Series:
    """Arrow-batched exact deep merge: (target_json, patch_json) → merged."""
    return pd.Series(
        [merge_json_strings(t, p) for t, p in zip(target, patch)], dtype=object
    )


def flatten_patch_leaves(patch: dict, prefix: str = "") -> list[tuple[str, Any]]:
    """Flatten a static patch object into (dotted.path, leaf_value) pairs
    for ``withField`` grafting.  Leaf values may be scalars, arrays, or
    template strings (rendered to Columns by the rule compiler)."""
    out: list[tuple[str, Any]] = []
    for k, v in patch.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.extend(flatten_patch_leaves(v, path))
        else:
            out.append((path, v))
    return out


def merge_static_object(
    target: Column,
    target_schema: StructType,
    patch: dict,
    render_leaf,
) -> Column:
    """Catalyst-native fast path for object⊕object merges when the target
    schema is declared (per-topic sink schemas, SURVEY.md §1.3): decode,
    rebuild the struct along patch paths, re-encode.

    The struct is rebuilt field-by-field rather than ``withField``-grafted
    because ``withField`` on a *null* intermediate struct stays null —
    whereas the reference's merge inserts missing objects
    (``entry(k).or_insert(Null)``, src/merge.rs:70-71).  Rebuilding makes
    the patched sub-struct non-null whenever the patch addresses it.

    ``target_schema`` must already include the patch paths (the schema
    module unions them in).  JSON key order of the output = declared
    schema order.  ``render_leaf(value) -> Column`` turns patch leaves
    (template strings / scalars) into Columns.
    """
    decoded = F.from_json(target, target_schema)
    return F.to_json(_rebuild(decoded, target_schema, patch, render_leaf))


def _rebuild(base: Column, schema: StructType, patch: dict, render_leaf) -> Column:
    fields = []
    for f in schema.fields:
        cur = base.getField(f.name)
        if f.name in patch:
            pv = patch[f.name]
            if isinstance(pv, dict) and isinstance(f.dataType, StructType):
                fields.append(_rebuild(cur, f.dataType, pv, render_leaf).alias(f.name))
            else:
                fields.append(render_leaf(pv).alias(f.name))
        else:
            fields.append(cur.alias(f.name))
    return F.struct(*fields)


def is_valid_json(col: Column) -> Column:
    """True when the column parses as any JSON value (object, array or
    scalar) — the same acceptance as serde_json::from_str in the reference
    (src/json.rs:5-16)."""
    return F.try_parse_json(col).isNotNull()
