"""Deep-merge semantics ported from the reference's unit tests
(src/merge.rs:137-234 and src/connection.rs:337-427)."""

import json

from hotdog_spark.functions.jsonmerge import merge_json_strings, merge_values


def merge_str(a: str, b: str) -> str:
    va = json.loads(a)
    return json.dumps(merge_values(va, json.loads(b)), separators=(",", ":"))


# --- src/merge.rs ported cases ---

def test_merge_array_string():
    # arrays extend then consecutive-dedup: ["a","b"] ⊕ ["b","c"] → ["a","b","c"]
    assert merge_str('["a","b"]', '["b","c"]') == '["a","b","c"]'


def test_merge_array_object():
    assert (
        merge_str('[{"value":"a"},{"value":"b"}]', '[{"value":"b"},{"value":"c"}]')
        == '[{"value":"a"},{"value":"b"},{"value":"c"}]'
    )


def test_merge_object():
    assert (
        merge_str('{"value1":"a","value2":"b"}', '{"value1":"a","value2":"c","value3":"d"}')
        == '{"value1":"a","value2":"c","value3":"d"}'
    )


def test_merge_string_overwrite():
    assert merge_values("a", "b") == "b"


def test_consecutive_dedup_only():
    # Vec::dedup removes only consecutive duplicates: [a,b] ⊕ [a] → [a,b,a]
    assert merge_str('["a","b"]', '["a"]') == '["a","b","a"]'


def test_array_plus_object_appends_and_dedups():
    assert merge_str('[{"a":1}]', '{"a":1}') == '[{"a":1}]'
    assert merge_str('[{"a":1}]', '{"b":2}') == '[{"a":1},{"b":2}]'


def test_nested_object_recursion():
    assert (
        merge_str('{"meta":{"keep":1}}', '{"meta":{"hotdog":{"version":"1"}}}')
        == '{"meta":{"keep":1,"hotdog":{"version":"1"}}}'
    )


def test_scalar_replaced_by_object():
    assert merge_str("5", '{"a":1}') == '{"a":1}'


# --- src/connection.rs perform_merge ported cases ---

def test_merge_with_empty():
    assert merge_json_strings("{}", "{}") == "{}"


def test_merge_with_non_object_patch_passthrough():
    # non-object patch → original buffer unchanged (src/connection.rs:317-322)
    assert merge_json_strings("{}", "[1]") == "{}"


def test_merge_without_json_buffer_fails():
    # non-JSON target → failure (None), src/connection.rs:331-334
    assert merge_json_strings("invalid", "{}") is None


def test_merge_with_json_buffer():
    assert merge_json_strings("{}", '{"hello":1}') == '{"hello":1}'


def test_merge_null_inserted_then_overwritten():
    # object key missing in target: or_insert(Null) then Null⊕v → v cloned
    # wholesale — note NO array dedup on this path (the dedup rule only
    # fires when the *target* side is an array).
    assert merge_str("{}", '{"a":{"b":[1,1,2]}}') == '{"a":{"b":[1,1,2]}}'
