"""jmespath_lite golden tests — examples from the public JMESPath
tutorial/specification (jmespath.org), plus the matcher-contract cases
the rule engine relies on."""

import pytest

from hotdog_spark.functions import jmespath_lite as jp


def s(expr, data):
    return jp.search(expr, data)


def test_basic_field_and_subexpr():
    assert s("a", {"a": "foo"}) == "foo"
    assert s("a.b.c.d", {"a": {"b": {"c": {"d": "value"}}}}) == "value"
    assert s("b", {"a": "foo"}) is None
    assert s('"with space"', {"with space": 1}) == 1


def test_index_and_slice():
    data = ["a", "b", "c", "d", "e", "f"]
    assert s("[1]", data) == "b"
    assert s("[-1]", data) == "f"
    assert s("[10]", data) is None
    assert s("[0:3]", data) == ["a", "b", "c"]
    assert s("[::2]", data) == ["a", "c", "e"]
    assert s("a[0]", {"a": [1, 2]}) == 1


def test_projections():
    data = {"people": [{"first": "James", "last": "d"},
                       {"first": "Jacob", "last": "e"},
                       {"missing": "x"}]}
    assert s("people[*].first", data) == ["James", "Jacob"]
    assert s("people[:2].first", data) == ["James", "Jacob"]
    ops = {"ops": {"a": {"numArgs": 2}, "b": {"numArgs": 3}}}
    assert sorted(s("ops.*.numArgs", ops)) == [2, 3]
    nested = {"reservations": [{"instances": [{"state": "r"}, {"state": "s"}]},
                               {"instances": [{"state": "t"}]}]}
    assert s("reservations[*].instances[*].state", nested) == [["r", "s"], ["t"]]
    assert s("reservations[].instances[].state", nested) == ["r", "s", "t"]


def test_filter_projection():
    data = {"machines": [{"name": "a", "state": "running"},
                         {"name": "b", "state": "stopped"},
                         {"name": "c", "state": "running"}]}
    assert s("machines[?state=='running'].name", data) == ["a", "c"]
    nums = {"x": [{"v": 1}, {"v": 3}, {"v": 2}]}
    assert s("x[?v >= `2`].v", nums) == [3, 2]
    assert s("x[?v > `1` && v < `3`].v", nums) == [2]
    assert s("x[?v == `1` || v == `3`].v", nums) == [1, 3]
    assert s("x[?!(v == `1`)].v", nums) == [3, 2]


def test_pipe_stops_projection():
    data = {"people": [{"first": "James"}, {"first": "Jacob"}]}
    assert s("people[*].first | [0]", data) == "James"
    # without the pipe, [0] maps inside the projection
    assert s("people[*].first[0]", data) == []


def test_multiselect():
    data = {"people": [{"name": "a", "state": {"name": "up"}},
                       {"name": "b", "state": {"name": "down"}}]}
    assert s("people[].[name, state.name]", data) == [["a", "up"], ["b", "down"]]
    assert s("people[].{Name: name, State: state.name}", data) == [
        {"Name": "a", "State": "up"},
        {"Name": "b", "State": "down"},
    ]


def test_functions():
    data = {"myarray": ["foo", "foobar", "barfoo"]}
    assert s("length(myarray)", data) == 3
    assert s("myarray[?contains(@, 'foo') == `true`]", data) == data["myarray"]
    assert s("length('abc')", {}) == 3
    assert s("max(nums)", {"nums": [1, 5, 2]}) == 5
    assert s("sum(nums)", {"nums": [1, 5, 2]}) == 8
    assert s("keys(@)", {"a": 1, "b": 2}) == ["a", "b"]
    assert s("sort(@)", [3, 1, 2]) == [1, 2, 3]
    assert s("join(', ', @)", ["a", "b"]) == "a, b"
    assert s("to_number(v)", {"v": "42"}) == 42
    assert s("type(@)", []) == "array"
    assert s("not_null(missing, b)", {"b": 7}) == 7
    # tutorial closer: sort_by + expref
    people = {"people": [{"name": "b", "age": 30}, {"name": "a", "age": 50},
                         {"name": "c", "age": 40}]}
    assert s("sort_by(people, &age)[].name", people) == ["b", "c", "a"]
    assert s("max_by(people, &age).name", people) == "a"


def test_tutorial_composite():
    locations = {"locations": [
        {"name": "Seattle", "state": "WA"},
        {"name": "New York", "state": "NY"},
        {"name": "Bellevue", "state": "WA"},
        {"name": "Olympia", "state": "WA"},
    ]}
    expr = ("locations[?state == 'WA'].name | sort(@) | "
            "{WashingtonCities: join(', ', @)}")
    assert s(expr, locations) == {"WashingtonCities": "Bellevue, Olympia, Seattle"}


def test_syntax_errors_raise():
    for bad in [". 0 meta.topic", "a.", "a[", "[?x", "a..b", "a b", "}{"]:
        with pytest.raises(jp.JMESPathSyntaxError):
            jp.compile(bad)


def test_runtime_type_errors_yield_none():
    assert s("length(@)", 42) is None          # invalid-type at runtime
    assert s("a[0]", {"a": "string"}) is None  # index into non-list
    assert s("sum(@)", ["a"]) is None


def test_matcher_contract_null_means_no_match():
    # the rule engine treats non-null as a match and exposes str(result)
    assert s("meta.topic", {"meta": {"topic": "t1"}}) == "t1"
    assert s("meta.topic", {"meta": {}}) is None
    assert s("meta.topic", "not json object") is None


def test_spec_edge_cases():
    # slices with negative step and bounds clamping
    assert s("[::-1]", [1, 2, 3]) == [3, 2, 1]
    assert s("[-2:]", [1, 2, 3]) == [2, 3]
    # projections stop at pipe but not at chained filters
    data = {"a": [{"b": [{"c": 1}, {"c": 2}]}, {"b": [{"c": 3}]}]}
    assert s("a[].b[].c", data) == [1, 2, 3]
    # nested multiselect inside a projection
    people = {"people": [{"a": 1, "b": 2}, {"a": 3, "b": 4}]}
    assert s("people[*].[a, b]", people) == [[1, 2], [3, 4]]
    # or-expression element defaulting
    assert s("a || b", {"b": 2}) == 2
    assert s("a || b", {"a": None, "b": 2}) == 2
    assert s("a && b", {"a": 1, "b": 2}) == 2
    # comparisons against missing keys are null → filter drops
    assert s("x[?missing > `1`]", {"x": [{"v": 5}]}) == []
    # quoted identifiers with spaces through subexpressions
    assert s('a."b c".d', {"a": {"b c": {"d": 9}}}) == 9
    # literals in multiselect hashes
    assert s("{v: `42`, w: 'str'}", {"anything": 1}) == {"v": 42, "w": "str"}
    # floor/ceil/abs on negatives
    assert s("floor(`-1.5`)", {}) == -2
    assert s("ceil(`-1.5`)", {}) == -1
    assert s("abs(`-3`)", {}) == 3
    # merge later args win
    assert s("merge(`{\"a\":1}`, `{\"a\":2,\"b\":3}`)", {}) == {"a": 2, "b": 3}


def test_to_array():
    assert s("to_array(@)", [1, 2]) == [1, 2]
    assert s("to_array(@)", "x") == ["x"]
    assert s("to_array(missing)", {}) is None
