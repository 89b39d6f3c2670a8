"""Rule-cascade compiler semantics (reference: src/connection.rs:104-243,
src/rules.rs:64-106)."""

import json
import os

import pytest
from pyspark.sql import Row

from hotdog_spark.config import ConfigError, load
from hotdog_spark.pipeline import process_envelope
from hotdog_spark.plans.compiler import compile_template, dry_run
from hotdog_spark.version import ENGINE_VERSION

CONFIGS = os.path.join(os.path.dirname(__file__), "configs")


ENVELOPE_SCHEMA = "msg string, severity string, facility string, hostname string, appname string"


def envelope(spark, msgs, **fields):
    rows = [
        (
            m,
            fields.get("severity"),
            fields.get("facility"),
            fields.get("hostname"),
            fields.get("appname"),
        )
        for m in msgs
    ]
    return spark.createDataFrame(rows, schema=ENVELOPE_SCHEMA)


@pytest.fixture(scope="module")
def canonical():
    return load(os.path.join(CONFIGS, "canonical.yml"))


def route(spark, settings, msgs, **fields):
    df = envelope(spark, msgs, **fields)
    return {
        r.msg: (r.topic, r.payload)
        for r in process_envelope(df, settings).collect()
    }


def test_first_match_wins_and_replace(spark, canonical):
    out = route(spark, canonical, ["hello world"])
    topic, payload = out["hello world"]
    assert topic == "test"
    assert payload == "This is the total message: hello world And the name is: world"


def test_optional_group_renders_empty(spark, canonical):
    out = route(spark, canonical, ["hello "])
    # regex matches with the optional named group empty → renders ""
    assert out["hello "][1].endswith("And the name is: ")


def test_jmespath_dynamic_topic_and_merge(spark, canonical):
    msg = '{"meta":{"topic":"foo"},"i":42}'
    out = route(spark, canonical, [msg])
    topic, payload = out[msg]
    assert topic == "foo"
    merged = json.loads(payload)
    assert merged["i"] == 42
    assert merged["meta"]["hotdog"]["version"] == ENGINE_VERSION
    assert merged["meta"]["topic"] == "foo"


def test_catch_all(spark, canonical):
    out = route(spark, canonical, ["something else entirely"])
    assert out["something else entirely"] == (
        "logs-unknown",
        "something else entirely",
    )


def test_jmespath_number_value_not_substituted(spark):
    # A numeric JMESPath result matches but leaves {{value}} unset
    # (src/rules.rs:83-90) → topic renders with empty substitution.
    import hotdog_spark.config as cfg

    settings = cfg.load_dict(
        {
            "global": {"listen": {"port": 1}},
            "rules": [
                {
                    "jmespath": "k",
                    "field": "msg",
                    "actions": [{"type": "forward", "topic": "t-{{value}}"}],
                }
            ],
        },
        environ={},
    )
    out = route(spark, settings, ['{"k": 87}', '{"k": "s"}'])
    assert out['{"k": 87}'][0] == "t-"
    assert out['{"k": "s"}'][0] == "t-s"


def test_null_field_never_matches(spark):
    settings = load(os.path.join(CONFIGS, "single-rule-with-hostname-field.yml"))
    df = envelope(spark, ["a message"])  # hostname null
    assert process_envelope(df, settings).count() == 0


def test_hostname_field_routing(spark):
    settings = load(os.path.join(CONFIGS, "single-rule-with-hostname-field.yml"))
    out = route(spark, settings, ["a message"], hostname="coconut")
    assert out["a message"] == (
        "test",
        "This messages was received by my workstation a message",
    )
    out2 = route(spark, settings, ["b message"], hostname="other")
    assert out2["b message"][1].startswith("This message NOT received properly")


def test_match_without_forward_falls_through(spark):
    # replace-only rule matches but never forwards → record continues to
    # later rules; with no later rule it is dropped.
    settings = load(os.path.join(CONFIGS, "single-rule-with-replace.yml"))
    out = route(spark, settings, ["hello world"])
    assert out == {}


def test_merge_only_rule_valid_json_falls_through(spark):
    # merge succeeds, no forward, no stop → continue to next rule → no
    # emission when there is none.
    settings = load(os.path.join(CONFIGS, "single-rule-with-merge.yml"))
    out = route(spark, settings, ['{"meta":{"topic":"x"}}'])
    assert out == {}


def test_stop_only_drops(spark):
    import hotdog_spark.config as cfg

    settings = cfg.load_dict(
        {
            "global": {"listen": {"port": 1}},
            "rules": [
                {
                    "regex": "^drop",
                    "field": "msg",
                    "actions": [{"type": "stop"}],
                },
                {
                    "regex": ".*",
                    "field": "msg",
                    "actions": [{"type": "forward", "topic": "rest"}],
                },
            ],
        },
        environ={},
    )
    out = route(spark, settings, ["drop me", "keep me"])
    assert "drop me" not in out
    assert out["keep me"] == ("rest", "keep me")


def test_merge_failure_does_not_stop_forward_in_same_rule(spark):
    # Faithful quirk: failed merge sets continue_rules=false but the
    # action loop keeps going; a forward in the same rule still emits the
    # raw message (src/connection.rs:213-224 has no break).
    import hotdog_spark.config as cfg

    settings = cfg.load_dict(
        {
            "global": {"listen": {"port": 1}},
            "rules": [
                {
                    "regex": "^notjson",
                    "field": "msg",
                    "actions": [
                        {"type": "merge", "json": {"a": 1}},
                        {"type": "forward", "topic": "merged"},
                    ],
                },
            ],
        },
        environ={},
    )
    out = route(spark, settings, ["notjson at all"])
    assert out["notjson at all"] == ("merged", "notjson at all")


def test_merge_failure_without_forward_terminates_cascade(spark):
    import hotdog_spark.config as cfg

    settings = cfg.load_dict(
        {
            "global": {"listen": {"port": 1}},
            "rules": [
                {
                    "regex": "^x",
                    "field": "msg",
                    "actions": [{"type": "merge", "json": {"a": 1}}],
                },
                {
                    "regex": ".*",
                    "field": "msg",
                    "actions": [{"type": "forward", "topic": "rest"}],
                },
            ],
        },
        environ={},
    )
    out = route(spark, settings, ["x not json", 'x {"ok": true}'.replace("x ", "", 1)])
    # "x not json": rule 1 matches, merge fails → terminal drop.
    assert "x not json" not in out
    # valid JSON not starting with x → catch-all forwards it.
    assert out['{"ok": true}'] == ("rest", '{"ok": true}')


def test_stop_then_forward_still_emits(spark):
    # [stop, forward] still forwards — stop sets the flag but does not
    # break the action loop (src/connection.rs:238-240).
    import hotdog_spark.config as cfg

    settings = cfg.load_dict(
        {
            "global": {"listen": {"port": 1}},
            "rules": [
                {
                    "regex": ".*",
                    "field": "msg",
                    "actions": [
                        {"type": "stop"},
                        {"type": "forward", "topic": "t"},
                    ],
                },
            ],
        },
        environ={},
    )
    out = route(spark, settings, ["m"])
    assert out["m"] == ("t", "m")


def test_builtins_shadow_captures(spark):
    # A capture group named `msg` is overwritten by the built-in (the
    # reference inserts built-ins after captures, src/connection.rs:155-157).
    import hotdog_spark.config as cfg

    settings = cfg.load_dict(
        {
            "global": {"listen": {"port": 1}},
            "rules": [
                {
                    "regex": "^(?P<msg>\\w+)",
                    "field": "msg",
                    "actions": [
                        {"type": "replace", "template": "[{{msg}}]"},
                        {"type": "forward", "topic": "t"},
                    ],
                },
            ],
        },
        environ={},
    )
    out = route(spark, settings, ["first second"])
    assert out["first second"][1] == "[first second]"


def test_invalid_jmespath_fails_at_load():
    with pytest.raises(ConfigError):
        load(os.path.join(CONFIGS, "single-rule-with-invalid-jmespath.yml"))


def test_template_compiler(spark):
    from pyspark.sql import functions as F

    df = spark.range(1)
    col = compile_template(
        "a {{x}} b {{missing}} c", {"x": F.lit("X")}
    )
    assert df.select(col.alias("t")).collect()[0].t == "a X b  c"


def test_template_escapes_like_handlebars(spark):
    """Pin the handlebars-6 default escape on {{var}} (the reference
    registers no custom escape_fn — src/connection.rs:260-289) and the
    raw forms {{{var}}} / {{&var}}."""
    from pyspark.sql import functions as F

    df = spark.range(1)
    hot = F.lit("""a&b<c>d"e'f`g=h""")
    out = df.select(
        compile_template("[{{v}}]", {"v": hot}).alias("esc"),
        compile_template("[{{{v}}}]", {"v": hot}).alias("raw3"),
        compile_template("[{{&v}}]", {"v": hot}).alias("rawamp"),
    ).collect()[0]
    assert out.esc == "[a&amp;b&lt;c&gt;d&quot;e&#x27;f&#x60;g&#x3d;h]"
    assert out.raw3 == """[a&b<c>d"e'f`g=h]"""
    assert out.rawamp == """[a&b<c>d"e'f`g=h]"""


def test_template_rejects_unsupported_constructs(spark):
    """Partials / comments / parent refs / non-if-each helpers /
    unbalanced blocks fail the config load instead of leaking through as
    literal text (the reference's full Handlebars engine would evaluate
    them, so passthrough would silently diverge)."""
    from pyspark.sql import functions as F

    for bad in (
        "{{> partial}}",
        "{{! a comment }}",
        "{{a..b}}",
        "{{.a}}",
        "{{a.}}",
        "{{#with x}}y{{/with}}",
        "{{#unless x}}y{{/unless}}",
        "{{#if x}}unclosed",
        "{{/if}}",
        "{{else}}",
        "{{#if x}}a{{/each}}",
        "{{#if x}}{{else}}a{{else}}b{{/if}}",
        "{{else if y}}",
        "{{../parent}}",
    ):
        with pytest.raises(ValueError, match="unsupported handlebars"):
            compile_template(bad, {"x": F.lit("X")})
    # stray '}}' is plain text (JSON patches end with '}}')
    compile_template('{"a": {"b": "{{v}}"}}', {"v": F.lit("X")})


def test_template_partials_inline_at_compile_time(spark):
    """{{> id}} (r10 verdict item 4) is compile-time textual inclusion
    against the registered-template registry (the reference registers
    every merge/replace action template under {uuid}-{index} and
    handlebars resolves partials against that same registry): the
    partial renders with the CURRENT context, nests, participates in
    block bodies, and escapes like any inline text would."""
    from pyspark.sql import functions as F

    df = spark.range(1)
    V = {
        "v": F.lit("x&y"),
        "arr": F.lit('["a","b"]'),
    }
    reg = {
        "9a-0": "[{{v}}]",
        "9a-1": "<{{> 9a-0}}>",          # nested partial
        "el": "({{this}}:{{@index}})",
    }
    out = df.select(
        compile_template("A{{> 9a-0}}B", V, reg).alias("basic"),
        compile_template("{{> 9a-1}}", V, reg).alias("nested"),
        compile_template("{{#each arr}}{{> el}}{{/each}}", V, reg).alias("each"),
        compile_template("{{#if v}}{{> 9a-0}}{{/if}}", V, reg).alias("inif"),
    ).collect()[0]
    assert out.basic == "A[x&amp;y]B"     # partial body escapes normally
    assert out.nested == "<[x&amp;y]>"
    assert out.each == "(a:0)(b:1)"       # element context reaches the partial
    assert out.inif == "[x&amp;y]"


def test_template_partials_reject_bad_shapes(spark):
    """Missing names, inclusion cycles, and parameterized partials all
    fail the config load loudly (handlebars-rust would error at render
    on the first, overflow on the second; parameters are outside the
    subset)."""
    from pyspark.sql import functions as F

    V = {"v": F.lit("x")}
    with pytest.raises(ValueError, match="names no registered template"):
        compile_template("{{> nope}}", V, {"other": "t"})
    with pytest.raises(ValueError, match="names no registered template"):
        compile_template("{{> nope}}", V)  # no registry at all
    with pytest.raises(ValueError, match="cycle"):
        compile_template("{{> a}}", V, {"a": "{{> b}}", "b": "{{> a}}"})
    with pytest.raises(ValueError, match="cycle"):
        compile_template("{{> a}}", V, {"a": "{{> a}}"})
    with pytest.raises(ValueError, match="unsupported handlebars"):
        compile_template("{{> p k=v}}", V, {"p": "t"})


def test_template_if_block(spark):
    """{{#if}}/{{else}} compiles to CASE WHEN on rust-handlebars string
    truthiness: null, "" and undefined names are falsy; any other string
    (including "0" and "false" — String-typed variables) is truthy."""
    from pyspark.sql import functions as F

    df = spark.range(1)
    V = {
        "x": F.lit("X"),
        "zero": F.lit("0"),
        "empty": F.lit(""),
        "nul": F.lit(None).cast("string"),
    }
    out = df.select(
        compile_template("A{{#if x}}T{{x}}{{else}}E{{/if}}B", V).alias("a"),
        compile_template("{{#if zero}}T{{else}}E{{/if}}", V).alias("b"),
        compile_template("{{#if empty}}T{{else}}E{{/if}}", V).alias("c"),
        compile_template("{{#if nul}}T{{else}}E{{/if}}", V).alias("d"),
        compile_template("{{#if missing}}T{{else}}E{{/if}}", V).alias("e"),
        compile_template("{{#if empty}}T{{/if}}", V).alias("f"),
    ).collect()[0]
    assert (out.a, out.b, out.c, out.d, out.e, out.f) == (
        "ATXB", "T", "E", "E", "E", "",
    )


def test_template_each_block(spark):
    """{{#each}} parses the variable as a JSON array and renders the
    body per element via a Catalyst transform lambda: {{this}} (escaped
    by default, raw as {{{this}}}) and {{@index}} bound, outer names
    invisible (handlebars context switch); non-array / invalid / empty
    values render the {{else}} block; blocks nest."""
    from pyspark.sql import functions as F

    df = spark.range(1)
    V = {
        "x": F.lit("X"),
        "arr": F.lit('["a","<b>",3]'),
        "obj": F.lit('{"k":1}'),
        "bad": F.lit("notjson"),
        "mt": F.lit("[]"),
    }
    out = df.select(
        compile_template(
            "[{{#each arr}}({{@index}}:{{this}}){{/each}}]", V
        ).alias("a"),
        compile_template("[{{#each arr}}{{{this}}}{{/each}}]", V).alias("b"),
        compile_template("{{#each obj}}X{{else}}E{{/each}}", V).alias("c"),
        compile_template("{{#each bad}}X{{else}}E{{/each}}", V).alias("d"),
        compile_template("{{#each mt}}X{{else}}E{{/each}}", V).alias("e"),
        compile_template(
            "{{#if x}}{{#each arr}}<{{{this}}}>{{/each}}{{/if}}", V
        ).alias("f"),
        compile_template(
            "{{#each arr}}{{#if this}}y{{else}}n{{/if}}{{/each}}", V
        ).alias("g"),
        compile_template("{{#each arr}}{{x}}{{/each}}", V).alias("h"),
    ).collect()[0]
    assert out.a == "[(0:a)(1:&lt;b&gt;)(2:3)]"  # numbers coerce to text
    assert out.b == "[a<b>3]"
    assert (out.c, out.d, out.e) == ("E", "E", "E")
    assert out.f == "<a><<b>><3>"
    assert out.g == "yyy"
    assert out.h == ""  # element context: outer variables don't resolve


def test_template_dotted_paths(spark):
    """Dotted paths under json_paths=True (the template_json_paths
    opt-in — a documented EXTENSION, ADVICE r10): {{a.b.c}} resolves
    the head in the variables map and digs the remainder into the
    value's JSON via get_json_object.  Digging into a scalar / non-JSON
    string renders "" (what rust handlebars renders navigating a path
    into a Json::String); object values render structured access:
    strings unquoted, numbers as text, objects as compact JSON text,
    JSON null / missing as "".  {{this.k}} inside {{#each}} digs into
    array elements (handlebars' own object-iteration shape), and paths
    work in block heads, raw forms, and escape like any
    double-stache."""
    from pyspark.sql import functions as F

    df = spark.range(1)
    V = {
        "msg": F.lit(
            '{"level":"<w>","n":7,"meta":{"host":"h1"},"nul":null,'
            '"objs":[{"k":"a"},{"k":2},{"nope":1}]}'
        ),
        "plain": F.lit("not json"),
        "x": F.lit("X"),
    }

    def ct(t):
        return compile_template(t, V, json_paths=True)

    out = df.select(
        ct("{{msg.level}}").alias("a"),
        ct("{{{msg.level}}}").alias("a_raw"),
        ct("{{msg.n}}|{{msg.meta.host}}").alias("b"),
        ct("{{{msg.meta}}}").alias("c"),
        ct("{{msg.nul}}|{{msg.missing}}|{{plain.x}}").alias("d"),
        ct("{{#if msg.level}}Y{{else}}N{{/if}}").alias("e"),
        ct("{{#if msg.nul}}Y{{else}}N{{/if}}").alias("f"),
        ct("{{#each msg.objs}}[{{this.k}}]{{/each}}").alias("g"),
        ct("{{#each msg.meta}}X{{else}}E{{/each}}").alias("h"),
        ct("{{unknown.path}}").alias("i"),
    ).collect()[0]
    assert out.a == "&lt;w&gt;"          # paths escape like plain vars
    assert out.a_raw == "<w>"
    assert out.b == "7|h1"
    assert out.c == '{"host":"h1"}'      # objects render as JSON text
    assert out.d == "||"                 # null / missing / scalar-dig -> ""
    assert (out.e, out.f) == ("Y", "N")  # truthiness on the dug value
    assert out.g == "[a][2][]"           # element-context digging
    assert out.h == "E"                  # object is not an array
    assert out.i == ""                   # unknown head: statically empty


def test_template_dotted_paths_default_is_reference_parity(spark):
    """DEFAULT dotted-path semantics are strict reference parity
    (ADVICE r10): the reference's template context is HashMap<String,
    String> (src/connection.rs:119-161), so rust handlebars renders ""
    for ANY multi-segment path — even when the variable's value happens
    to be JSON text.  Without the opt-in, {{msg.level}} on a JSON msg
    must render "" (NOT dig), dotted block heads constant-fold to the
    inverse block, and a variable literally named with a dot in the map
    still resolves (it's a plain key lookup, not navigation)."""
    from pyspark.sql import functions as F

    df = spark.range(1)
    V = {
        "msg": F.lit('{"level":"warn","tags":["a","b"]}'),
        "dotted.key": F.lit("LIT"),
    }
    out = df.select(
        compile_template("[{{msg.level}}]", V).alias("a"),
        compile_template("{{#if msg.level}}Y{{else}}N{{/if}}", V).alias("b"),
        compile_template("{{#each msg.tags}}X{{else}}E{{/each}}", V).alias("c"),
        compile_template("{{dotted.key}}", V).alias("d"),
        compile_template("{{{msg}}}", V, json_paths=False).alias("e"),
    ).collect()[0]
    assert out.a == "[]"     # no JSON dig by default — reference parity
    assert out.b == "N"      # dotted head is statically absent -> inverse
    assert out.c == "E"
    assert out.d == "LIT"    # literal map key wins regardless of the gate
    assert out.e == '{"level":"warn","tags":["a","b"]}'  # bare names free

    # The cascade threads the flag from Settings: same config, flag off
    # vs on, diverges exactly on the dug fragment.
    from hotdog_spark.config import load_dict
    from hotdog_spark.plans.compiler import compile_cascade

    def routed(flag):
        settings = load_dict(
            {
                "global": {"listen": {"port": 1},
                           "template_json_paths": flag},
                "rules": [
                    {
                        "regex": ".",
                        "field": "msg",
                        "actions": [
                            {"type": "replace",
                             "template": "L={{msg.level}}"},
                            {"type": "forward", "topic": "t"},
                        ],
                    }
                ],
            },
            environ={},
        )
        cc = compile_cascade(settings)
        return (
            df.select(
                F.lit('{"level":"warn"}').alias("msg"),
                *[F.lit(None).cast("string").alias(c)
                  for c in ("severity", "facility", "hostname", "appname")],
            )
            .select(cc.payload.alias("payload"))
            .collect()[0]
            .payload
        )

    assert routed(False) == "L="      # reference parity
    assert routed(True) == "L=warn"   # documented extension


def test_dry_run(spark, canonical):
    df = spark.createDataFrame(
        [Row(value="hello there"), Row(value='{"meta":{"topic":"test"}}'), Row(value="zzz")]
    )
    rows = {r.value: r for r in dry_run(df, canonical).collect()}
    assert rows["hello there"].matches == [0, 2]
    # JSON line matches the jmespath rule and the catch-all
    assert rows['{"meta":{"topic":"test"}}'].matches == [1, 2]
    assert rows["zzz"].matches == [2]


def test_cli_explain_and_list(capsys):
    """--list-queries prints every registered query; --explain dumps a
    formatted physical plan without needing a config."""
    from hotdog_spark.__main__ import main
    from hotdog_spark.queries import all_queries

    assert main(["--list-queries"]) == 0
    listed = capsys.readouterr().out.splitlines()
    assert sorted(listed) == sorted(all_queries())

    assert main(["--explain", "no_such_query"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_cli_test_mode_report(spark, canonical, tmp_path):
    """Byte-format parity with `hotdog -t example.log` (src/rules.rs:45-51,
    README.adoc:85-98): same lines, same matcher Display strings."""
    from hotdog_spark.__main__ import test_mode_report

    log = tmp_path / "example.log"
    log.write_text(
        "hello world\n"
        "fail\n"
        "hello\n"
        '{"meta":{"topic":"test"}}\n'
    )
    report = test_mode_report(spark, canonical, str(log))
    assert report[0] == "Line 1 matches on:"
    assert report[1] == "\t - Regex: ^hello\\s+(?P<name>\\w+)?"
    # every line matches the catch-all regex; line 4 also matches JMESPath
    assert "Line 4 matches on:" in report
    i = report.index("Line 4 matches on:")
    assert report[i + 1] == "\t - JMESPath: meta.topic"
    assert report[i + 2] == "\t - Regex: .*"

    # --limit bounds the driver-side collect: report covers the first N
    # lines only, with a truncation summary carrying the TOTAL count
    limited = test_mode_report(spark, canonical, str(log), limit=2)
    assert "Line 4 matches on:" not in limited
    assert limited[-1].startswith("... report truncated at --limit 2 of ")
    # a limit at/above the line count changes nothing and adds no footer
    assert test_mode_report(spark, canonical, str(log), limit=10_000) == report


def test_full_jmespath_rule_cascade(spark, tmp_path):
    """A rule whose JMESPath uses filters/functions (beyond the dotted
    subset) matches via the bundled jmespath_lite UDF path, exposes the
    string result as {{value}}, and composes with the cascade."""
    cfg = tmp_path / "full-jmespath.yml"
    cfg.write_text(
        """
---
global:
  listen:
    address: '127.0.0.1'
    port: 514
rules:
  - jmespath: "alerts[?sev >= `3`].name | join(',', @)"
    field: msg
    actions:
      - type: forward
        topic: 'sev-{{value}}'
"""
    )
    from hotdog_spark.config import load

    settings = load(str(cfg))
    msgs = [
        '{"alerts":[{"sev":5,"name":"disk"},{"sev":1,"name":"noise"},{"sev":4,"name":"mem"}]}',
        '{"alerts":[{"sev":1,"name":"noise"}]}',   # join -> "" (still a match)
        "not json at all",                          # no match
    ]
    out = route(spark, settings, msgs)
    assert out[msgs[0]][0] == "sev-disk,mem"
    assert out[msgs[1]][0] == "sev-"
    assert msgs[2] not in out  # no match → no topic → dropped


def test_full_jmespath_invalid_still_fails(tmp_path):
    from hotdog_spark.config import ConfigError, load

    cfg = tmp_path / "bad.yml"
    cfg.write_text(
        """
---
global:
  listen:
    address: '127.0.0.1'
    port: 514
rules:
  - jmespath: "alerts[?sev >= "
    field: msg
    actions:
      - type: stop
"""
    )
    with pytest.raises(ConfigError):
        load(str(cfg))


def test_reference_example_log_dry_run(spark, canonical, tmp_path):
    """The reference's own smoke input (example.log:1-4) through our dry
    run against the canonical config: line 1 matches the hello rule +
    catch-all, lines 2-3 only the catch-all, line 4 the JMESPath rule +
    catch-all — the exact matches `hotdog -t example.log` reports
    (README.adoc:85-98)."""
    log = tmp_path / "example.log"
    log.write_text(
        "hello there\n"
        "This is a somewhat longer line of logs?\n"
        "This is a MUCH longer log line and it should not be truncated, hopefully\n"
        '{"this": "is some JSON data", "which": "should also be transmitted properly", '
        '"meta" : {"topic" : "test"}}\n'
    )
    from hotdog_spark.sources.batch import read_log_file

    df = read_log_file(spark, str(log))
    rows = {r.line_no: r.matches for r in dry_run(df, canonical).collect()}
    assert rows[1] == [0, 2]
    assert rows[2] == [2]
    assert rows[3] == [2]
    assert rows[4] == [1, 2]


def test_builtin_variables_override_captures(spark):
    """Code-faithful quirk: README.adoc:348-353 says named groups override
    built-ins, but the reference inserts built-ins LAST via HashMap insert
    (src/connection.rs:155-157) — so a capture named `msg` loses to the
    original message.  We follow the code, not the README."""
    import hotdog_spark.config as cfg

    settings = cfg.load_dict(
        {
            "global": {"listen": {"port": 1}},
            "rules": [
                {
                    "regex": r"^(?P<msg>\w+)",
                    "field": "msg",
                    "actions": [
                        {"type": "replace", "template": "got: {{msg}}"},
                        {"type": "forward", "topic": "t"},
                    ],
                }
            ],
        },
        environ={},
    )
    out = route(spark, settings, ["first second"])
    # capture would render "got: first"; the built-in renders the whole line
    assert out["first second"][1] == "got: first second"


def test_merge_after_replace_discards_replace_output(spark):
    """Faithful subtlety: merge always reads the ORIGINAL msg, not a prior
    replace's output (perform_merge takes msg.msg — the &mut is simd-json
    in-place parsing, not a rewrite; src/connection.rs:213-224, 310-335).
    So [replace, merge, forward] forwards merged(msg), discarding the
    replace rendering."""
    import json as _json

    import hotdog_spark.config as cfg

    settings = cfg.load_dict(
        {
            "global": {"listen": {"port": 1}},
            "rules": [
                {
                    "regex": ".*",
                    "field": "msg",
                    "actions": [
                        {"type": "replace", "template": "REPLACED {{msg}}"},
                        {"type": "merge", "json": {"tag": "x"}},
                        {"type": "forward", "topic": "t"},
                    ],
                }
            ],
        },
        environ={},
    )
    msg = '{"a": 1}'
    out = route(spark, settings, [msg])
    payload = _json.loads(out[msg][1])
    assert payload == {"a": 1, "tag": "x"}  # no trace of "REPLACED"


def test_actions_after_forward_are_skipped(spark):
    """forward BREAKS the action loop (src/connection.rs:210's break) —
    unlike stop/merge-failure which only set the flag.  A replace after
    forward must not affect the emitted payload."""
    import hotdog_spark.config as cfg

    settings = cfg.load_dict(
        {
            "global": {"listen": {"port": 1}},
            "rules": [
                {
                    "regex": ".*",
                    "field": "msg",
                    "actions": [
                        {"type": "forward", "topic": "t"},
                        {"type": "replace", "template": "SHOULD NOT APPEAR"},
                    ],
                }
            ],
        },
        environ={},
    )
    out = route(spark, settings, ["plain line"])
    assert out["plain line"] == ("t", "plain line")


def test_forward_only_rule_builds_no_trivially_true_predicate(spark, canonical):
    """A forward-only rule's buffer is statically the '' literal; the
    compiler must forward msg directly rather than emit a
    `lit('') == lit('')` comparison, which trips Spark's
    trivially-true-predicate warning twice per run (VERDICT r7 item 6)."""
    from hotdog_spark.plans.compiler import compile_cascade

    cascade = compile_cascade(canonical)
    expr = str(cascade.payload)
    assert "('' = '')" not in expr
    # the replace rule (rule 0) keeps its runtime empty-buffer check
    assert " = '')" in expr or "= )" not in expr


def test_forward_only_payload_still_forwards_raw_msg(spark):
    """Semantics unchanged by the trivially-true fix: no replace/merge
    → the raw message is the payload."""
    import hotdog_spark.config as cfg

    settings = cfg.load_dict(
        {
            "global": {"listen": {"port": 1}},
            "rules": [
                {
                    "regex": ".*",
                    "field": "msg",
                    "actions": [{"type": "forward", "topic": "raw"}],
                }
            ],
        },
        environ={},
    )
    out = route(spark, settings, ["untouched payload"])
    assert out["untouched payload"] == ("raw", "untouched payload")
