"""Differential test: the compiled Spark cascade vs a pure-Python
interpreter of the reference's per-line loop (src/connection.rs:104-243),
over randomly generated configs × messages.

The interpreter is written straight from the reference's control flow —
first-match-wins via continue_rules, forward breaks the action loop,
stop/failed-merge set the flag but keep walking, merge reads the ORIGINAL
msg, built-ins inserted last — so any divergence in the Column-expression
compilation shows up as a concrete (config, message) counterexample.

Payloads are compared as parsed JSON when both sides parse (serialization
key-order is not part of the semantics), else as raw strings.
"""

import json
import random
import re

import pytest

import hotdog_spark.config as cfg
from hotdog_spark.functions import jmespath_lite
from hotdog_spark.functions.jsonmerge import merge_values
from hotdog_spark.pipeline import process_envelope
from hotdog_spark.version import ENGINE_VERSION

_VAR = re.compile(r"\{\{\s*(\w+)\s*\}\}")
_PARTIAL = re.compile(r"\{\{\s*>\s*([A-Za-z0-9_.\-]+)\s*\}\}")

# handlebars' default escapeExpression table ('&' first), applied by the
# reference to every {{var}} (no custom escape_fn is registered).
_HB_ESCAPES = (
    ("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;"),
    ("'", "&#x27;"), ("`", "&#x60;"), ("=", "&#x3d;"),
)


def _hb_escape(s: str) -> str:
    for ch, rep in _HB_ESCAPES:
        s = s.replace(ch, rep)
    return s


def _render(template: str, variables: dict, partials: dict | None = None) -> str:
    if partials:
        # {{> id}} is textual inclusion (handlebars renders the named
        # registered template with the current context); expand to a
        # fixpoint — the injected configs are chain/cycle-free
        while True:
            expanded = _PARTIAL.sub(
                lambda m: partials[m.group(1)], template
            )
            if expanded == template:
                break
            template = expanded
    return _VAR.sub(
        lambda m: _hb_escape(str(variables.get(m.group(1), ""))), template
    )


def _render_patch(value, variables):
    if isinstance(value, dict):
        return {k: _render_patch(v, variables) for k, v in value.items()}
    if isinstance(value, str):
        return _render(value, variables)
    return value


def interpret(settings, envelope: dict, partials: dict | None = None):
    """The reference's read_logs loop, line for line."""
    msg = envelope["msg"]
    continue_rules = True
    for rule in settings.rules:
        if not continue_rules:
            break
        output = ""
        fieldval = envelope.get(rule.field)
        if fieldval is None:
            continue  # null-field guard (src/connection.rs:125-144)
        variables = {}
        matched = False
        if rule.regex is not None:
            m = re.search(rule.regex, fieldval)
            if m:
                matched = True
                for name, val in m.groupdict().items():
                    if val is not None:
                        variables[name] = val
        else:
            try:
                data = json.loads(fieldval)
            except (json.JSONDecodeError, ValueError):
                data = None
            res = None
            if isinstance(data, (dict, list)):
                res = jmespath_lite.search(rule.jmespath, data)
            if res is not None:
                matched = True
                if isinstance(res, str):
                    variables["value"] = res
        if not matched:
            continue
        # built-ins inserted LAST — they override captures
        variables["msg"] = msg
        variables["version"] = ENGINE_VERSION
        for action in rule.actions:
            if action.kind == "forward":
                topic = _render(action.topic, variables, partials)
                return topic, (output if output != "" else msg)
            if action.kind == "replace":
                output = _render(action.template, variables, partials)
            elif action.kind == "merge":
                try:
                    target = json.loads(msg)
                    valid = isinstance(target, (dict, list))
                except (json.JSONDecodeError, ValueError):
                    valid = False
                if not valid:
                    continue_rules = False  # abort later rules, keep walking
                else:
                    patch = _render_patch(action.json_value, variables)
                    if isinstance(patch, dict):
                        output = json.dumps(merge_values(target, patch))
                    else:
                        output = msg  # non-object patch passes through
            elif action.kind == "stop":
                continue_rules = False
    return None


REGEXES = [
    r"^hello\s+(?P<name>\w+)?",
    r"^(?P<kind>error|warn)",
    r"\d+",
    r".*",
]
JMESPATHS = ["meta.topic", "k"]
TEMPLATES = ["R:{{msg}}", "name={{name}}", "v={{value}}+{{version}}", "const"]
TOPICS = ["t1", "x-{{value}}", "n-{{name}}"]
PATCHES = [
    {"tag": "x"},
    {"meta": {"hotdog": {"version": "{{version}}"}}},
    {"a": {"b": 1}, "arr": ["p"]},
]


def _inject_partial(settings, rng: random.Random) -> dict:
    """With two+ replace actions in the config, rewrite one to include
    another rule's replace template via its registered {uuid}-{index}
    id (the reference registers every merge/replace template under that
    id and handlebars resolves {{> id}} against the registry).  One
    injection, distinct host/source → no chains, no cycles.  Returns
    the id → source map the interpreter expands against."""
    replaces = [
        (r, i)
        for r in settings.rules
        for i, a in enumerate(r.actions)
        if a.kind == "replace"
    ]
    registry = {f"{r.uuid}-{i}": r.actions[i].template for r, i in replaces}
    if len(replaces) >= 2:
        (host_r, hi), (src_r, si) = rng.sample(replaces, 2)
        pid = f"{src_r.uuid}-{si}"
        host_r.actions[hi].template = (
            f"P[{{{{> {pid}}}}}]" + host_r.actions[hi].template
        )
    return registry


def _random_rule(rng: random.Random) -> dict:
    rule: dict = {"field": rng.choice(["msg", "msg", "msg", "appname"])}
    if rng.random() < 0.65:
        rule["regex"] = rng.choice(REGEXES)
    else:
        rule["jmespath"] = rng.choice(JMESPATHS)
        rule["field"] = "msg"
    actions = []
    if rng.random() < 0.5:
        actions.append({"type": "replace", "template": rng.choice(TEMPLATES)})
    if rng.random() < 0.4:
        actions.append({"type": "merge", "json": rng.choice(PATCHES)})
    if rng.random() < 0.8:
        actions.append({"type": "forward", "topic": rng.choice(TOPICS)})
    if rng.random() < 0.4:
        actions.append({"type": "stop"})
    if not actions:
        actions.append({"type": "forward", "topic": "fallback"})
    rng.shuffle(actions)
    return {**rule, "actions": actions}


def _random_messages(rng: random.Random, n: int) -> list[dict]:
    out = []
    for i in range(n):
        kind = rng.randrange(9)
        # every msg is unique — the comparison is keyed by msg, and the
        # same text with different appname values must not collide
        msg = {
            0: f"hello world{i}",
            1: "hello" + " " * (i + 1),  # optional named group stays empty
            2: f"error happens {i}",
            3: f"warn {i}",
            4: f"plain text {i}",
            5: json.dumps({"k": rng.choice([f"s{i}", 7, None]), "i": i}),
            6: json.dumps({"meta": {"topic": f"top{i % 3}"}, "i": i}),
            7: "not {json" + str(i),
            8: json.dumps([1, 2, i]),
        }[kind]
        out.append(
            {
                "msg": msg,
                "appname": rng.choice([None, "error", f"app{i % 2}"]),
                "hostname": None,
                "severity": None,
                "facility": None,
            }
        )
    return out


def _canon_payload(p):
    if p is None:
        return None
    try:
        return ("json", json.dumps(json.loads(p), sort_keys=True))
    except (json.JSONDecodeError, ValueError):
        return ("str", p)


@pytest.mark.parametrize("seed", [11, 23, 37, 59, 71, 83, 97])
def test_cascade_matches_reference_interpreter(spark, seed):
    rng = random.Random(seed)
    settings = cfg.load_dict(
        {
            "global": {"listen": {"port": 1}},
            "rules": [_random_rule(rng) for _ in range(rng.randrange(1, 5))],
        },
        environ={},
    )
    partials = _inject_partial(settings, rng)
    envelopes = _random_messages(rng, 40)
    df = spark.createDataFrame(
        [
            (e["msg"], e["severity"], e["facility"], e["hostname"], e["appname"])
            for e in envelopes
        ],
        "msg string, severity string, facility string, hostname string, appname string",
    )
    got = {
        r.msg: (r.topic, _canon_payload(r.payload))
        for r in process_envelope(df, settings).collect()
    }
    for e in envelopes:
        want = interpret(settings, e, partials)
        have = got.get(e["msg"])
        if want is None:
            assert have is None, f"seed={seed} msg={e['msg']!r}: spark emitted {have}"
        else:
            topic, payload = want
            assert have is not None, f"seed={seed} msg={e['msg']!r}: spark dropped it"
            assert have[0] == topic, f"seed={seed} msg={e['msg']!r}: topic {have[0]} != {topic}"
            assert have[1] == _canon_payload(payload), (
                f"seed={seed} msg={e['msg']!r}: payload {have[1]} != {_canon_payload(payload)}"
            )
