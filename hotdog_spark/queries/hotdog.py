"""Hotdog-parity queries: the reference's rule-pipeline semantics expressed
over the synthetic batch tables, each with a DuckDB oracle.

The `events` table stands in for the syslog stream (FIXTURES.md B):
``props`` (a JSON string) is the message payload, ``event_type`` the
appname, ``'u'||user_id`` the hostname — mirroring how the reference's
canonical config (reference: hotdog.yml:26-68) routes on message fields.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hotdog_spark.config import load
from hotdog_spark.functions.syslog import parse_syslog_df
from hotdog_spark.operators import fan_out
from hotdog_spark.pipeline import process_envelope, routed_counts
from hotdog_spark.plans.compiler import dry_run
from hotdog_spark.queries import register
from hotdog_spark.sources.batch import table
from hotdog_spark.version import ENGINE_VERSION

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
EVENTS_CONFIG = os.path.join(_REPO_ROOT, "configs", "events.yml")


def events_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → syslog envelope projection (fanned out: the cascade's
    regex/JSON work is CPU-bound per row)."""
    return fan_out(table(spark, sf_dir, "events")).select(
        F.col("event_id"),
        F.col("props").alias("msg"),
        F.lit(None).cast("string").alias("severity"),
        F.lit(None).cast("string").alias("facility"),
        F.concat(F.lit("u"), F.col("user_id")).alias("hostname"),
        F.col("event_type").alias("appname"),
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship slice (SURVEY §7.2): parse → match → merge → route →
    per-topic counts, all pure Catalyst (native merge path)."""
    settings = load(EVENTS_CONFIG)
    routed = process_envelope(events_envelope(spark, sf_dir), settings, merge_mode="native")
    return routed_counts(routed).orderBy("topic")


_ROUTE_CASE = """
CASE
  WHEN regexp_matches(event_type, '^(error|signup)$') THEN 'events-' || event_type
  WHEN json_extract(props, '$.k') IS NOT NULL THEN 'events-json'
  ELSE 'logs-unknown'
END
""".strip()


@register(
    "hotdog_route_cascade",
    oracle=f"""
    SELECT topic, COUNT(*) AS n
    FROM (SELECT {_ROUTE_CASE} AS topic FROM events) t
    GROUP BY topic
    """,
)
def hotdog_route_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    return flagship(spark, sf_dir)


@register(
    "hotdog_route_payload",
    oracle=f"""
    SELECT event_id,
           {_ROUTE_CASE} AS topic,
           CASE
             WHEN regexp_matches(event_type, '^(error|signup)$') THEN props
             WHEN json_extract(props, '$.k') IS NOT NULL THEN
               '{{"k":' || CAST(json_extract(props, '$.k') AS VARCHAR)
               || ',"meta":{{"hotdog":{{"version":"{ENGINE_VERSION}"}}}}}}'
             ELSE props
           END AS payload
    FROM events
    """,
)
def hotdog_route_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-record routing + transformed payload (merge stamped through the
    declared-schema native path)."""
    settings = load(EVENTS_CONFIG)
    routed = process_envelope(
        events_envelope(spark, sf_dir), settings, merge_mode="native"
    )
    return routed.select("event_id", "topic", "payload")


_SYSLOG5424_LINE = (
    "'<' || (o_orderkey % 192) || '>1 2024-01-02T03:04:05Z host' || (o_custkey % 50)"
    " || ' app' || (o_orderkey % 7) || ' - - - order ' || o_orderkey"
)

_SEV_LIST = "['emerg','alert','crit','err','warning','notice','info','debug']"
_FAC_LIST = (
    "['kern','user','mail','daemon','auth','syslog','lpr','news','uucp','cron',"
    "'authpriv','ftp','ntp','audit','alert','clockd','local0','local1','local2',"
    "'local3','local4','local5','local6','local7']"
)


@register(
    "syslog_parse_5424",
    oracle=f"""
    SELECT o_orderkey AS line_id,
           'order ' || o_orderkey AS msg,
           ({_SEV_LIST})[(o_orderkey % 192) % 8 + 1] AS severity,
           ({_FAC_LIST})[(o_orderkey % 192) // 8 + 1] AS facility,
           'host' || (o_custkey % 50) AS hostname,
           'app' || (o_orderkey % 7) AS appname
    FROM orders
    """,
)
def syslog_parse_5424(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 5424 parse (P1) end-to-end: synthesize deterministic syslog
    lines from `orders`, run them through the real regexp parser, decode
    PRI → severity/facility names (golden pins src/parse.rs:76-89)."""
    orders = fan_out(table(spark, sf_dir, "orders"))
    lines = orders.select(
        F.col("o_orderkey").alias("line_id"),
        F.concat(
            F.lit("<"), (F.col("o_orderkey") % 192).cast("string"),
            F.lit(">1 2024-01-02T03:04:05Z host"), (F.col("o_custkey") % 50).cast("string"),
            F.lit(" app"), (F.col("o_orderkey") % 7).cast("string"),
            F.lit(" - - - order "), F.col("o_orderkey").cast("string"),
        ).alias("value"),
    )
    return parse_syslog_df(lines).select(
        "line_id", "msg", "severity", "facility", "hostname", "appname"
    )


@register(
    "syslog_parse_3164",
    oracle=f"""
    SELECT o_orderkey AS line_id,
           'started order ' || o_orderkey AS msg,
           ({_SEV_LIST})[(o_orderkey % 192) % 8 + 1] AS severity,
           ({_FAC_LIST})[(o_orderkey % 192) // 8 + 1] AS facility,
           'host' || (o_custkey % 50) AS hostname,
           'svc' || (o_orderkey % 5) AS appname
    FROM orders
    """,
)
def syslog_parse_3164(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 3164 fallback parse (P2), golden pin src/parse.rs:91-105."""
    orders = fan_out(table(spark, sf_dir, "orders"))
    lines = orders.select(
        F.col("o_orderkey").alias("line_id"),
        F.concat(
            F.lit("<"), (F.col("o_orderkey") % 192).cast("string"),
            F.lit(">May 13 21:45:18 host"), (F.col("o_custkey") % 50).cast("string"),
            F.lit(" svc"), (F.col("o_orderkey") % 5).cast("string"),
            F.lit(": started order "), F.col("o_orderkey").cast("string"),
        ).alias("value"),
    )
    return parse_syslog_df(lines).select(
        "line_id", "msg", "severity", "facility", "hostname", "appname"
    )


@register(
    "syslog_parse_failure_routing",
    oracle="""
    SELECT CASE WHEN o_orderkey % 10 = 0 THEN 'dropped' ELSE 'parsed' END AS bucket,
           COUNT(*) AS n
    FROM orders
    GROUP BY bucket
    """,
)
def syslog_parse_failure_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse-failure routing (P3): unparseable lines counted + dropped
    (src/connection.rs:89-95).  Every 10th line is garbage."""
    orders = table(spark, sf_dir, "orders")
    lines = orders.select(
        F.when(
            F.col("o_orderkey") % 10 == 0, F.lit("blah")
        ).otherwise(
            F.concat(
                F.lit("<13>1 2024-01-02T03:04:05Z h a - - - order "),
                F.col("o_orderkey").cast("string"),
            )
        ).alias("value")
    )
    parsed = parse_syslog_df(lines, drop_unparsed=False)
    return (
        parsed.select(
            F.when(F.col("format").isNull(), F.lit("dropped"))
            .otherwise(F.lit("parsed"))
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "hotdog_dryrun_matches",
    oracle="""
    SELECT doc_id AS line_no,
           array_to_string(
             list_filter(
               [CASE WHEN regexp_matches(line, '^hello\\s+(\\w+)?') THEN '0' END,
                -- nested CASE, not AND: DuckDB's vectorized AND does not
                -- guarantee short-circuit, so json_extract could run on
                -- non-JSON rows and throw (observed once the sf1 file
                -- gained multiple row groups); CASE branches ARE lazy
                CASE WHEN json_valid(line) THEN
                  CASE WHEN json_extract(line, '$.meta.topic') IS NOT NULL THEN '1' END
                END,
                '2'],
               x -> x IS NOT NULL), ',') AS matches
    FROM (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN 'hello ' || text
                  WHEN doc_id % 5 = 1 THEN '{"meta":{"topic":"t' || doc_id || '"}}'
                  ELSE text END AS line
      FROM documents
    ) t
    """,
)
def hotdog_dryrun_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dry-run / test mode (S4, src/rules.rs:16-57): which rules match each
    line, all rules tested independently."""
    settings = load(os.path.join(_REPO_ROOT, "tests", "configs", "canonical.yml"))
    docs = table(spark, sf_dir, "documents")
    lines = docs.select(
        F.col("doc_id"),
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.lit("hello "), F.col("text")))
        .when(
            F.col("doc_id") % 5 == 1,
            F.concat(F.lit('{"meta":{"topic":"t'), F.col("doc_id"), F.lit('"}}')),
        )
        .otherwise(F.col("text"))
        .alias("value"),
    )
    out = dry_run(lines, settings, key="doc_id")
    return out.select(
        "line_no",
        F.array_join(F.transform("matches", lambda x: x.cast("string")), ",").alias(
            "matches"
        ),
    )


@register(
    "merge_exact_deep",
    oracle=f"""
    SELECT event_id,
           '{{"k":' || CAST(json_extract(props, '$.k') AS VARCHAR)
           || ',"meta":{{"hotdog":{{"version":"{ENGINE_VERSION}"}}}}}}' AS payload
    FROM events
    """,
)
def merge_exact_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deep-merge (A2) through the Arrow-batched UDF path — the
    dynamic-shape semantics of src/merge.rs:67-86."""
    from hotdog_spark.config import load_dict

    settings = load_dict(
        {
            "global": {"listen": {"port": 1}},
            "rules": [
                {
                    "jmespath": "k",
                    "field": "msg",
                    "actions": [
                        {"type": "merge", "json": {"meta": {"hotdog": {"version": "{{version}}"}}}},
                        {"type": "forward", "topic": "out"},
                    ],
                }
            ],
        },
        environ={},
    )
    routed = process_envelope(events_envelope(spark, sf_dir), settings, merge_mode="exact")
    return routed.select("event_id", "payload")


@register(
    "replace_template_capture",
    oracle="""
    SELECT doc_id,
           'w1=' || regexp_extract(text, '^(\\w+) (\\w+)', 1)
           || ';w2=' || regexp_extract(text, '^(\\w+) (\\w+)', 2) AS payload,
           'words' AS topic
    FROM documents
    WHERE regexp_matches(text, '^(\\w+) (\\w+)')
    """,
)
def replace_template_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replace action (A1) with named-capture template variables (F1):
    regex named groups → indexed regexp_extract → template concat."""
    from hotdog_spark.config import load_dict

    settings = load_dict(
        {
            "global": {"listen": {"port": 1}},
            "rules": [
                {
                    "regex": "^(?P<w1>\\w+) (?P<w2>\\w+)",
                    "field": "msg",
                    "actions": [
                        {"type": "replace", "template": "w1={{w1}};w2={{w2}}"},
                        {"type": "forward", "topic": "words"},
                    ],
                }
            ],
        },
        environ={},
    )
    docs = table(spark, sf_dir, "documents")
    env = docs.select(
        F.col("doc_id"),
        F.col("text").alias("msg"),
        F.lit(None).cast("string").alias("severity"),
        F.lit(None).cast("string").alias("facility"),
        F.lit(None).cast("string").alias("hostname"),
        F.lit(None).cast("string").alias("appname"),
    )
    routed = process_envelope(env, settings)
    return routed.select("doc_id", "payload", "topic")


@register(
    "template_block_helpers",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type = 'error'  THEN 'blk-error'
                WHEN event_type = 'signup' THEN 'blk-sign'
                ELSE 'blk-other' END AS topic,
           CASE WHEN event_type = 'error'
                THEN 'error.solo|(0:error)(1:u' || user_id || ')'
                WHEN event_type = 'signup'
                THEN 'sign+up|(0:signup)(1:u' || user_id || ')'
                ELSE 'no-array' END AS payload
    FROM events
    """,
)
def template_block_helpers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Handlebars BLOCK helpers through the full cascade (the reference
    registers the complete Handlebars engine, src/connection.rs:260-289;
    this pins the compiled {{#if}}/{{#each}} subset): rule 1 branches a
    genuinely-optional capture through {{#if rest}}…{{else}}…{{/if}}
    (CASE WHEN on string truthiness — 'error' leaves the group empty,
    'signup' fills it) and iterates the JSON-array message through
    {{#each msg}} with {{@index}}/{{this}} (Catalyst transform lambda +
    array_join, no UDF); rule 2's {{#each version}} hits the runtime
    inverse block (the version string is not a JSON array).  The oracle
    rebuilds every branch arithmetically with CASE."""
    from hotdog_spark.config import load_dict

    settings = load_dict(
        {
            "global": {"listen": {"port": 1}},
            "rules": [
                {
                    "regex": "^(?P<kind>error|sign)(?P<rest>up)?$",
                    "field": "appname",
                    "actions": [
                        {
                            "type": "replace",
                            "template": (
                                "{{kind}}{{#if rest}}+{{rest}}{{else}}.solo"
                                "{{/if}}|{{#each msg}}({{@index}}:{{this}})"
                                "{{/each}}"
                            ),
                        },
                        {"type": "forward", "topic": "blk-{{kind}}"},
                    ],
                },
                {
                    "regex": ".",
                    "field": "msg",
                    "actions": [
                        {
                            "type": "replace",
                            "template": (
                                "{{#each version}}X{{else}}no-array{{/each}}"
                            ),
                        },
                        {"type": "forward", "topic": "blk-other"},
                    ],
                },
            ],
        },
        environ={},
    )
    ev = fan_out(table(spark, sf_dir, "events")).select(
        F.col("event_id"),
        # the message is a JSON ARRAY string so {{#each msg}} iterates it
        F.concat(
            F.lit('["'), F.col("event_type"), F.lit('","u'),
            F.col("user_id").cast("string"), F.lit('"]'),
        ).alias("msg"),
        F.lit(None).cast("string").alias("severity"),
        F.lit(None).cast("string").alias("facility"),
        F.concat(F.lit("u"), F.col("user_id")).alias("hostname"),
        F.col("event_type").alias("appname"),
    )
    routed = process_envelope(ev, settings)
    return routed.select("event_id", "topic", "payload")


@register(
    "template_dotted_paths",
    oracle="""
    SELECT event_id,
           'dot-' || event_type AS topic,
           't=' || event_type
             || ';u=' || CAST(user_id AS VARCHAR)
             || ';[' || event_type || '][' || CAST(user_id AS VARCHAR)
             || '];m=' AS payload
    FROM events
    """,
)
def template_dotted_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Handlebars DOTTED PATHS through the full cascade (VERDICT r9
    item 5), under the ``template_json_paths`` OPT-IN — a documented
    extension, not reference parity: the reference's context is
    ``HashMap<String, String>`` (src/connection.rs:119-161) so rust
    handlebars renders "" for every multi-segment path, and that is
    what this engine's default does too (ADVICE r10):
    the message is a JSON document and the replace template digs into
    it with {{msg.type}}, a two-hop {{msg.u.id}}, {{#each msg.tags}}
    iterating an array of OBJECTS with element-context {{this.k}}
    paths, and a missing-path {{msg.missing}} rendering "" — all
    compiled to get_json_object (Catalyst, no UDF).  The forward topic
    itself uses a path.  The oracle rebuilds every fragment from the
    typed columns the JSON was built from."""
    from hotdog_spark.config import load_dict

    settings = load_dict(
        {
            # The JSON-dig is an opt-in EXTENSION (ADVICE r10): default
            # semantics are strict reference parity (dotted paths render
            # "" because the reference's context is HashMap<String,
            # String>); this query exercises the extension explicitly.
            "global": {"listen": {"port": 1}, "template_json_paths": True},
            "rules": [
                {
                    "regex": ".",
                    "field": "msg",
                    "actions": [
                        {
                            "type": "replace",
                            "template": (
                                "t={{msg.type}};u={{msg.u.id}};"
                                "{{#each msg.tags}}[{{this.k}}]{{/each}};"
                                "m={{msg.missing}}"
                            ),
                        },
                        {"type": "forward", "topic": "dot-{{msg.type}}"},
                    ],
                }
            ],
        },
        environ={},
    )
    ev = fan_out(table(spark, sf_dir, "events")).select(
        F.col("event_id"),
        # a structured JSON message: object, nested object, object array
        F.concat(
            F.lit('{"type":"'), F.col("event_type"),
            F.lit('","u":{"id":'), F.col("user_id").cast("string"),
            F.lit('},"tags":[{"k":"'), F.col("event_type"),
            F.lit('"},{"k":'), F.col("user_id").cast("string"),
            F.lit("}]}"),
        ).alias("msg"),
        F.lit(None).cast("string").alias("severity"),
        F.lit(None).cast("string").alias("facility"),
        F.lit(None).cast("string").alias("hostname"),
        F.lit(None).cast("string").alias("appname"),
    )
    routed = process_envelope(ev, settings)
    return routed.select("event_id", "topic", "payload")


@register(
    "template_partials",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type IN ('click', 'view') THEN 'p-' || event_type
                ELSE 'p-other' END AS topic,
           CASE WHEN event_type IN ('click', 'view')
                THEN 'k=' || event_type || ';n=' || CAST(user_id AS VARCHAR)
                ELSE 'other[k=' || event_type || ';n='
                     || CAST(user_id AS VARCHAR) || ']'
           END AS payload
    FROM events
    """,
)
def template_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Handlebars PARTIALS through the full cascade (r10 verdict item
    4): rule 2's replace template includes rule 1's replace template by
    its registered ``{uuid}-{index}`` id via ``{{> id}}`` — the
    reference registers every merge/replace action template under that
    id (src/connection.rs:251-253,261-289) and handlebars resolves
    partials against the same registry, so a config can and does reuse
    one action's template inside another's.  The include is compiled
    away (textual inlining re-entered with the INCLUDING rule's
    variables: rule 2's own regex captures flow into rule 1's template
    body), so the plan is the same CASE WHEN + concat chain a hand-
    inlined template would produce.  The oracle rebuilds both branches
    arithmetically."""
    from hotdog_spark.config import load_dict

    settings = load_dict(
        {
            "global": {"listen": {"port": 1}},
            "rules": [
                {
                    "regex": "^(?P<kind>click|view):(?P<num>[0-9]+)$",
                    "field": "msg",
                    "actions": [
                        {"type": "replace", "template": "k={{kind}};n={{num}}"},
                        {"type": "forward", "topic": "p-{{kind}}"},
                    ],
                },
                {
                    "regex": "^(?P<kind>[a-z]+):(?P<num>[0-9]+)$",
                    "field": "msg",
                    "actions": [
                        # template set below: it names rule 1's action-0
                        # template id, which exists only after load
                        {"type": "replace", "template": ""},
                        {"type": "forward", "topic": "p-other"},
                    ],
                },
            ],
        },
        environ={},
    )
    partial_id = f"{settings.rules[0].uuid}-0"
    settings.rules[1].actions[0].template = f"other[{{{{> {partial_id}}}}}]"
    ev = fan_out(table(spark, sf_dir, "events")).select(
        F.col("event_id"),
        F.concat(
            F.col("event_type"), F.lit(":"), F.col("user_id").cast("string")
        ).alias("msg"),
        F.lit(None).cast("string").alias("severity"),
        F.lit(None).cast("string").alias("facility"),
        F.lit(None).cast("string").alias("hostname"),
        F.lit(None).cast("string").alias("appname"),
    )
    routed = process_envelope(ev, settings)
    return routed.select("event_id", "topic", "payload")


@register(
    "jmespath_full_filter",
    oracle="""
    SELECT event_id,
           concat_ws(',',
             CASE WHEN event_id % 7 >= 4 THEN 'a' END,
             CASE WHEN user_id % 7 >= 4 THEN 'b' END) AS names,
           (CASE WHEN event_id % 7 >= 4 THEN 1 ELSE 0 END
            + CASE WHEN user_id % 7 >= 4 THEN 1 ELSE 0 END) AS n
    FROM events
    """,
)
def jmespath_full_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-JMESPath matcher path (filters + functions + multihash via the
    bundled jmespath_lite evaluator, functions/jsonquery.py): JSON rows
    synthesized from `events` columns run through
    ``{names: join(',', items[?sev >= `4`].name), n: length(...)}``;
    the oracle derives the same answers arithmetically from the source
    columns — two independent routes to one result.  Reference parity:
    src/rules.rs:75-93 (full JMESPath matching)."""
    from hotdog_spark.functions.jsonquery import jmespath_struct

    ev = fan_out(table(spark, sf_dir, "events")).select(
        "event_id",
        F.concat(
            F.lit('{"items":[{"sev":'),
            (F.col("event_id") % 7).cast("string"),
            F.lit(',"name":"a"},{"sev":'),
            (F.col("user_id") % 7).cast("string"),
            F.lit(',"name":"b"}]}'),
        ).alias("payload"),
    )
    expr = (
        "{names: join(',', items[?sev >= `4`].name), "
        "n: length(items[?sev >= `4`])}"
    )
    res = ev.select(
        "event_id", jmespath_struct(F.col("payload"), expr)["res_json"].alias("r")
    )
    return res.select(
        "event_id",
        F.get_json_object("r", "$.names").alias("names"),
        F.get_json_object("r", "$.n").cast("int").alias("n"),
    )
