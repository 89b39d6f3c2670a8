"""Property-based tests pinning the deep-merge semantics
(reference: src/merge.rs:67-86) beyond the ported unit cases."""

import copy
import json

from hypothesis import given, settings
from hypothesis import strategies as st

from hotdog_spark.functions.jsonmerge import (
    _dedup_consecutive,
    merge_json_strings,
    merge_values,
)

json_values = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(10**6), max_value=10**6)
    | st.text(max_size=8),
    lambda children: st.lists(children, max_size=4)
    | st.dictionaries(st.text(max_size=4), children, max_size=4),
    max_leaves=12,
)
json_objects = st.dictionaries(st.text(max_size=4), json_values, max_size=4)
json_arrays = st.lists(json_values, max_size=6)


@settings(max_examples=200, deadline=None)
@given(a=json_objects, b=json_objects)
def test_object_merge_key_union_b_wins(a, b):
    a0, b0 = copy.deepcopy(a), copy.deepcopy(b)
    out = merge_values(a, b)
    assert set(out) == set(a0) | set(b0)
    for k, bv in b0.items():
        if isinstance(bv, dict) and isinstance(a0.get(k), dict):
            continue  # recursive case checked by recursion itself
        if isinstance(bv, (dict, list)) and isinstance(a0.get(k), list):
            continue  # array-extend case checked below
        # scalar / type-mismatch: b overwrites
        assert out[k] == bv
    for k in set(a0) - set(b0):
        assert out[k] == a0[k]


@settings(max_examples=200, deadline=None)
@given(a=json_arrays, b=json_arrays)
def test_array_merge_is_consecutive_dedup_of_concat(a, b):
    a0, b0 = copy.deepcopy(a), copy.deepcopy(b)
    out = merge_values(a, b)
    assert out == _dedup_consecutive(a0 + b0)


@settings(max_examples=200, deadline=None)
@given(items=json_arrays)
def test_consecutive_dedup_properties(items):
    out = _dedup_consecutive(list(items))
    # no adjacent equal elements remain
    assert all(out[i] != out[i + 1] for i in range(len(out) - 1))
    # subsequence of the input (order preserved, only deletions)
    it = iter(items)
    assert all(any(x == y for y in it) for x in out)
    # idempotent
    assert _dedup_consecutive(list(out)) == out


@settings(max_examples=200, deadline=None)
@given(a=json_objects)
def test_empty_patch_is_identity(a):
    a0 = copy.deepcopy(a)
    assert merge_values(a, {}) == a0


@settings(max_examples=200, deadline=None)
@given(a=json_values, b=st.one_of(st.none(), st.booleans(), st.integers(), st.text(max_size=8)))
def test_scalar_patch_overwrites_anything(a, b):
    if isinstance(a, list) and isinstance(b, dict):
        return
    assert merge_values(a, b) == b


@settings(max_examples=200, deadline=None)
@given(target=json_values, patch=json_objects)
def test_string_level_merge_round_trips(target, patch):
    out = merge_json_strings(
        json.dumps(target), json.dumps(patch, separators=(",", ":"))
    )
    assert out is not None
    expected = merge_values(copy.deepcopy(target), copy.deepcopy(patch))
    if isinstance(target, dict):
        assert json.loads(out) == expected
    else:
        # non-object targets still merge per merge_values semantics
        assert json.loads(out) == expected


@settings(max_examples=100, deadline=None)
@given(patch=st.one_of(st.integers(), st.text(max_size=8), json_arrays))
def test_non_object_patch_passes_target_through(patch):
    assert merge_json_strings('{"a":1}', json.dumps(patch)) == '{"a":1}'


@settings(max_examples=100, deadline=None)
@given(garbage=st.text(max_size=12).filter(lambda s: not _is_json(s)))
def test_invalid_target_fails_merge(garbage):
    assert merge_json_strings(garbage, '{"a":1}') is None


def _is_json(s):
    try:
        json.loads(s)
        return True
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Template compiler properties (hypothesis): compile_template must agree
# with a reference renderer for any mix of literals and variables.

import pytest
from pyspark.sql import functions as F

from hotdog_spark.plans.compiler import compile_template

_lit_seg = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="{}\\'\"\r\n",
                           exclude_categories=("Cc",)),
    max_size=8,
)
_var_name = st.sampled_from(["msg", "name", "value", "missing_var", "x1"])
_segments = st.lists(
    st.one_of(_lit_seg, _var_name.map(lambda v: ("var", v))), max_size=8
)
_var_values = st.fixed_dictionaries(
    {
        "msg": st.one_of(st.none(), _lit_seg),
        "name": st.one_of(st.none(), _lit_seg),
        "value": st.one_of(st.none(), _lit_seg),
    }
)


# handlebars' default escapeExpression table ('&' first): the reference's
# Handlebars 6 instance escapes every {{var}} this way (no custom
# escape_fn registered, src/connection.rs:260-289).
_HB_ESCAPES = (
    ("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;"),
    ("'", "&#x27;"), ("`", "&#x60;"), ("=", "&#x3d;"),
)


def _hb_escape(s):
    for ch, rep in _HB_ESCAPES:
        s = s.replace(ch, rep)
    return s


@settings(max_examples=10, deadline=None)
@given(segments=_segments, values=_var_values)
def test_template_matches_reference_renderer(spark, segments, values):
    template = "".join(
        "{{" + s[1] + "}}" if isinstance(s, tuple) else s for s in segments
    )
    expected = "".join(
        _hb_escape(values.get(s[1]) or "") if isinstance(s, tuple) else s
        for s in segments
    )
    variables = {k: F.lit(v) for k, v in values.items()}
    out = (
        spark.range(1)
        .select(compile_template(template, variables).alias("r"))
        .collect()[0]
        .r
    )
    assert (out or "") == expected


# ---- block helpers: {{#if}} / {{#each}} differential -----------------
#
# Same idea as the flat-template property above, extended to the block
# subset: random segment TREES are rendered to template text, compiled
# via Catalyst, and compared against a pure-Python reference renderer
# that implements the documented contract — rust-handlebars string
# truthiness for if (null/"" falsy), JSON-array iteration with element
# context switch ({{this}}/{{@index}} only) for each, inverse block on
# non-array/empty, default HTML escape on every double-stache.

_arr_value = st.one_of(
    st.lists(
        st.one_of(
            st.text(
                alphabet=st.characters(
                    codec="ascii", exclude_characters="{}\\'\"\r\n",
                    exclude_categories=("Cc",),
                ),
                max_size=6,
            ),
            st.integers(min_value=-999, max_value=999),
        ),
        max_size=4,
    ).map(lambda xs: json.dumps(xs, separators=(",", ":"))),
    st.sampled_from([
        None, "", "notjson", '{"k":1}', '"scalar"', "[]",
        # arrays of objects: {{this.k}} digs per element
        '[{"k":"x"},{"k":3},{"n":1}]', '[{"k":{"b":1}},7,"s"]',
    ]),
)

_each_body_leaf = st.one_of(
    _lit_seg,
    st.sampled_from([
        ("var", "this"), ("var", "@index"), ("var", "msg"),
        ("var", "this.k"), ("var", "this.nope"),   # element-context paths
    ]),
)

# a nested JSON document for dotted-path resolution ({{doc.a}},
# {{doc.a.b}}, scalar-dig and missing-key cases), plus non-JSON values
# where every path must render ""
_doc_value = st.one_of(
    st.fixed_dictionaries(
        {
            "a": st.one_of(
                _lit_seg,
                st.integers(min_value=-99, max_value=99),
                st.booleans(),
                st.none(),
                st.fixed_dictionaries(
                    {"b": st.one_of(_lit_seg, st.integers(-9, 9))}
                ),
            ),
            "k": st.one_of(_lit_seg, st.lists(st.integers(0, 9), max_size=3)),
        }
    ).map(lambda d: json.dumps(d, separators=(",", ":"))),
    st.sampled_from([None, "", "notjson", '"scalar"', "[1,2]"]),
)

_path_name = st.sampled_from(
    ["doc.a", "doc.k", "doc.a.b", "doc.missing", "doc.a.b.c",
     "msg.x", "missing_var.x"]
)

_block_nodes = st.recursive(
    st.one_of(
        _lit_seg,
        _var_name.map(lambda v: ("var", v)),
        _path_name.map(lambda v: ("var", v)),
    ),
    lambda kids: st.one_of(
        st.tuples(
            st.just("if"),
            st.one_of(_var_name, _path_name),   # paths in block heads too
            st.lists(kids, max_size=3),
            st.one_of(st.none(), st.lists(kids, max_size=2)),
        ),
        st.tuples(
            st.just("each"),
            st.sampled_from(["arr", "msg", "missing_var", "doc.k"]),
            st.lists(st.one_of(_each_body_leaf, kids), max_size=3),
            st.one_of(st.none(), st.lists(kids, max_size=2)),
        ),
    ),
    max_leaves=8,
)


def _to_template(nodes):
    out = []
    for n in nodes:
        if isinstance(n, str):
            out.append(n)
        elif n[0] == "var":
            out.append("{{" + n[1] + "}}")
        else:
            kind, name, body, els = n
            out.append("{{#" + kind + " " + name + "}}" + _to_template(body))
            if els is not None:
                out.append("{{else}}" + _to_template(els))
            out.append("{{/" + kind + "}}")
    return "".join(out)


def _dig_json(value, rest):
    """Reference semantics for dotted paths: parse the head variable's
    string value as JSON and walk dict keys; missing / non-dict hop /
    JSON null / invalid JSON -> None.  Leaves render like handlebars on
    structured contexts: strings unquoted, bools true/false, numbers
    and containers as compact JSON text."""
    try:
        cur = json.loads(value)
    except (json.JSONDecodeError, ValueError, TypeError):
        return None
    for seg in rest.split("."):
        if isinstance(cur, dict) and seg in cur:
            cur = cur[seg]
        else:
            return None
    if cur is None:
        return None
    if isinstance(cur, str):
        return cur
    if cur is True:
        return "true"
    if cur is False:
        return "false"
    return json.dumps(cur, separators=(",", ":"))


def _ref_lookup(values, name, json_paths):
    if name in values:
        return values.get(name)
    if not json_paths:
        # default reference parity: the context is HashMap<String,String>,
        # so any multi-segment path renders "" (compiler's json_paths=False)
        return None
    head, dot, rest = name.partition(".")
    if dot and values.get(head) is not None:
        return _dig_json(str(values[head]), rest)
    return None


def _ref_render(nodes, values, json_paths):
    out = []
    for n in nodes:
        if isinstance(n, str):
            out.append(n)
        elif n[0] == "var":
            out.append(
                _hb_escape(str(_ref_lookup(values, n[1], json_paths) or ""))
            )
        elif n[0] == "if":
            _, name, body, els = n
            branch = (
                body if _ref_lookup(values, name, json_paths) else (els or [])
            )
            out.append(_ref_render(branch, values, json_paths))
        else:  # each
            _, name, body, els = n
            v = _ref_lookup(values, name, json_paths)
            arr = None
            if isinstance(v, str):
                try:
                    parsed = json.loads(v)
                    if isinstance(parsed, list):
                        arr = parsed
                except (json.JSONDecodeError, ValueError):
                    pass
            if arr:
                for i, el in enumerate(arr):
                    eltext = el if isinstance(el, str) else (
                        "" if el is None else json.dumps(
                            el, separators=(",", ":"))
                    )
                    out.append(_ref_render(
                        body, {"this": eltext, "@index": str(i)}, json_paths
                    ))
            else:
                out.append(_ref_render(els or [], values, json_paths))
    return "".join(out)


# Both modes of the 5132892 semantics gate: json_paths=False (default,
# reference parity — every dotted path renders "", including {{this.k}}
# inside each) and json_paths=True (the global.template_json_paths
# opt-in JSON dig the reference renderer above models).
@pytest.mark.parametrize("json_paths", [False, True])
@settings(max_examples=15, deadline=None)
@given(
    nodes=st.lists(_block_nodes, max_size=5),
    values=_var_values,
    arr=_arr_value,
    doc=_doc_value,
)
def test_block_templates_match_reference_renderer(
    spark, json_paths, nodes, values, arr, doc
):
    values = dict(values)
    values["arr"] = arr
    values["doc"] = doc
    template = _to_template(nodes)
    expected = _ref_render(nodes, values, json_paths)
    variables = {k: F.lit(v) for k, v in values.items()}
    out = (
        spark.range(1)
        .select(
            compile_template(
                template, variables, json_paths=json_paths
            ).alias("r")
        )
        .collect()[0]
        .r
    )
    assert (out or "") == expected
