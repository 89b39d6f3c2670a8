"""YAML configuration → validated dataclasses.

The YAML rules file is the engine's entire user-facing query surface; this
module is the "parser" stage of the query lifecycle.  Mirrors the behavior
of the reference's settings module (reference: src/settings.rs:10-46,
53-99, 163-179): fail-fast on invalid YAML, missing ``global.listen.port``,
non-``.yml`` extensions, invalid regexes, and invalid JMESPath expressions
(the reference compiles regexes during deserialize via serde_regex at
src/settings.rs:95-96 and JMESPath at connection setup,
src/connection.rs:293-307; we do both at load time, which is strictly
earlier/fail-faster).

Environment overlay: variables prefixed ``HOTDOG_`` override YAML keys
(reference: src/settings.rs:36-40).  Nested keys use ``__`` as the path
separator, e.g. ``HOTDOG_GLOBAL__LISTEN__PORT=2514``.
"""

from __future__ import annotations

import json
import os
import re
import uuid as _uuid
from dataclasses import dataclass, field
from typing import Any

import yaml

# Matches the dotted-identifier subset of JMESPath that ships in every
# reference config (e.g. ``meta.topic``, hotdog.yml:46).  Anything outside
# this subset runs through the bundled jmespath_lite evaluator as an
# Arrow-batched UDF (functions/jsonquery.py — the sanctioned slow path).
_JMESPATH_SUBSET = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*$")

VALID_FIELDS = ("msg", "severity", "facility", "hostname", "appname")


class ConfigError(ValueError):
    """Raised for any invalid configuration — the Spark analog of the
    reference's fail-fast panics during settings load."""


@dataclass
class Action:
    """One entry of a rule's ordered action chain.

    kind is one of ``forward`` (topic template), ``merge`` (JSON value to
    deep-merge, with variable substitution), ``replace`` (payload
    template), ``stop``.  (reference: src/settings.rs:63-78)
    """

    kind: str
    topic: str | None = None
    template: str | None = None
    json_value: Any = None
    # Pre-serialized merge JSON acting as a template string — the analog of
    # the reference's populate_caches json_str (src/settings.rs:80-87).
    json_str: str | None = None


@dataclass
class Rule:
    """One ordered match rule (reference: src/settings.rs:89-99)."""

    field: str
    actions: list[Action]
    regex: str | None = None
    jmespath: str | None = None
    uuid: str = field(default_factory=lambda: str(_uuid.uuid4()))

    @property
    def matcher_display(self) -> str:
        # Mirrors Rule's Display impl (src/settings.rs:108-116).
        if self.regex is not None:
            return f"Regex: {self.regex}"
        return f"JMESPath: {self.jmespath}"


@dataclass
class SchemaField:
    """Recursive sink-schema field (reference: src/schema.rs:45-49)."""

    type: str
    fields: dict[str, "SchemaField"] | None = None


@dataclass
class SinkSchema:
    """Per-topic declared sink schema (reference: src/settings.rs:164-170)."""

    topic: str
    fields: dict[str, SchemaField]


@dataclass
class Listen:
    address: str = "127.0.0.1"
    port: int = 0
    tls: dict | None = None


@dataclass
class KafkaConfig:
    conf: dict[str, str] = field(default_factory=dict)
    topic: str | None = None
    buffer: int = 1024
    timeout_ms: int = 30_000


@dataclass
class ParquetConfig:
    url: str = ""
    buffer: int | None = None
    flush_ms: int = 60_000


@dataclass
class Global:
    listen: Listen = field(default_factory=Listen)
    kafka: KafkaConfig | None = None
    parquet: ParquetConfig | None = None
    metrics: dict | None = None
    status: dict | None = None
    # Opt-in EXTENSION (deliberate divergence from the reference): when
    # true, a dotted template path ({{msg.type}}) whose head resolves to
    # a JSON-text variable digs into the JSON via get_json_object.  The
    # reference's template context is HashMap<String, String>
    # (src/connection.rs:119-161), so rust handlebars renders "" for ANY
    # multi-segment path — which is exactly what the default (false)
    # reproduces.  Ported reference configs therefore keep bit-for-bit
    # output unless they explicitly ask for the extension
    # (`global.template_json_paths: true`, or env overlay
    # HOTDOG_GLOBAL__TEMPLATE_JSON_PATHS=true).
    template_json_paths: bool = False


@dataclass
class Settings:
    global_: Global
    rules: list[Rule]
    schemas: list[SinkSchema] = field(default_factory=list)


def _deep_set(d: dict, path: list[str], value: Any) -> None:
    cur = d
    for k in path[:-1]:
        cur = cur.setdefault(k, {})
        if not isinstance(cur, dict):
            return
    cur[path[-1]] = value


def _apply_env_overlay(raw: dict, environ: dict[str, str]) -> dict:
    for key, value in environ.items():
        if not key.startswith("HOTDOG_"):
            continue
        path = [p.lower() for p in key[len("HOTDOG_"):].split("__") if p]
        if path:
            _deep_set(raw, path, value)
    return raw


def _validate_regex(pattern: str) -> None:
    """Validate under Python `re` and check Java-translatability.

    The reference uses Rust's `regex` crate; Spark's rlike/regexp_extract
    use Java regex.  We normalize ``(?P<name>`` → ``(?<name>`` for Java
    (SURVEY.md §7.4 regex-dialect risk) and reject constructs Rust regex
    would reject (backreferences) so behavior stays within the common
    dialect subset.
    """
    try:
        re.compile(pattern)
    except re.error as e:  # pragma: no cover - message path
        raise ConfigError(f"invalid regex {pattern!r}: {e}") from e
    if re.search(r"\\[1-9]", pattern):
        raise ConfigError(
            f"regex {pattern!r} uses backreferences, which the rule dialect "
            "(Rust-regex-compatible subset) does not support"
        )


def java_pattern(pattern: str) -> str:
    """Translate a rule regex to the Java dialect used by Spark."""
    return pattern.replace("(?P<", "(?<")


def regex_group_names(pattern: str) -> dict[str, int]:
    """name → group index map, consistent with Rust regex ordering
    (left-to-right by opening parenthesis), via Python re.groupindex."""
    return dict(re.compile(pattern).groupindex)


def validate_jmespath(expression: str) -> str:
    """Validate a JMESPath expression at config-load time.

    Returns "subset" when the expression is a dotted identifier path our
    native JSONPath translation covers, or "full" when the bundled
    jmespath_lite evaluator compiles it (UDF matcher path).  Raises
    ConfigError otherwise — mirroring the reference where JMESPath compile
    failure disables processing (src/connection.rs:76-82, 293-307; the
    invalid fixture test/configs/single-rule-with-invalid-jmespath.yml
    must fail).
    """
    if _JMESPATH_SUBSET.match(expression):
        return "subset"
    from hotdog_spark.functions import jmespath_lite

    try:
        jmespath_lite.compile(expression)
        return "full"
    except jmespath_lite.JMESPathSyntaxError as e:
        raise ConfigError(f"invalid JMESPath expression {expression!r}: {e}") from e


def _parse_bool(value, key: str) -> bool:
    """YAML gives a real bool; the HOTDOG_* env overlay gives a string.
    Accept the usual spellings, reject everything else loudly (a typo'd
    toggle silently defaulting would flip template semantics)."""
    if isinstance(value, bool):
        return value
    s = str(value).strip().lower()
    if s in ("1", "true", "yes", "on"):
        return True
    if s in ("0", "false", "no", "off", ""):
        return False
    raise ConfigError(f"global.{key}: expected a boolean, got {value!r}")


def _parse_action(raw: dict) -> Action:
    if not isinstance(raw, dict) or "type" not in raw:
        raise ConfigError(f"action must be a mapping with a `type`: {raw!r}")
    kind = raw["type"]
    if kind == "forward":
        if "topic" not in raw:
            raise ConfigError("forward action requires `topic`")
        return Action(kind="forward", topic=str(raw["topic"]))
    if kind == "replace":
        if "template" not in raw:
            raise ConfigError("replace action requires `template`")
        return Action(kind="replace", template=str(raw["template"]))
    if kind == "merge":
        if "json" not in raw:
            raise ConfigError("merge action requires `json`")
        jv = raw["json"]
        # populate_caches analog: pre-serialize the merge JSON so it can be
        # treated as a template string (src/settings.rs:80-87).
        return Action(kind="merge", json_value=jv, json_str=json.dumps(jv))
    if kind == "stop":
        return Action(kind="stop")
    raise ConfigError(f"unknown action type: {kind!r}")


def _parse_rule(raw: dict) -> Rule:
    if "field" not in raw:
        raise ConfigError(f"rule missing `field`: {raw!r}")
    fld = str(raw["field"])
    if fld not in VALID_FIELDS:
        raise ConfigError(f"rule field must be one of {VALID_FIELDS}, got {fld!r}")
    regex = raw.get("regex")
    jmes = raw.get("jmespath")
    if (regex is None) == (jmes is None):
        raise ConfigError("rule must have exactly one of `regex` or `jmespath`")
    if regex is not None:
        _validate_regex(str(regex))
    if jmes is not None:
        validate_jmespath(str(jmes))
    actions = [_parse_action(a) for a in raw.get("actions", [])]
    return Rule(field=fld, actions=actions, regex=regex, jmespath=jmes)


def _parse_schema_field(raw: dict) -> SchemaField:
    if not isinstance(raw, dict) or "type" not in raw:
        raise ConfigError(f"schema field must be a mapping with `type`: {raw!r}")
    nested = raw.get("fields")
    return SchemaField(
        type=str(raw["type"]),
        fields={k: _parse_schema_field(v) for k, v in nested.items()} if nested else None,
    )


def load_dict(raw: dict, environ: dict[str, str] | None = None) -> Settings:
    """Build Settings from an already-parsed mapping (+ env overlay)."""
    raw = _apply_env_overlay(dict(raw), environ if environ is not None else dict(os.environ))

    g = raw.get("global") or {}
    listen_raw = g.get("listen") or {}
    if "port" not in listen_raw:
        # Mirrors the reference's `Configuration had no global.listen.port`
        # panic (src/settings.rs:42-44).
        raise ConfigError("configuration had no `global.listen.port` setting")
    listen = Listen(
        address=str(listen_raw.get("address", "127.0.0.1")),
        port=int(listen_raw["port"]),
        tls=listen_raw.get("tls") or None,
    )
    kafka = None
    if g.get("kafka") is not None:
        k = g["kafka"]
        kafka = KafkaConfig(
            conf={str(a): str(b) for a, b in (k.get("conf") or {}).items()},
            topic=k.get("topic"),
            buffer=int(k.get("buffer", 1024)),
            timeout_ms=int(k.get("timeout_ms", 30_000)),
        )
    parquet = None
    if g.get("parquet") is not None:
        p = g["parquet"]
        parquet = ParquetConfig(
            url=str(p.get("url", "")),
            buffer=int(p["buffer"]) if p.get("buffer") is not None else None,
            flush_ms=int(p.get("flush_ms", 60_000)),
        )
    if kafka is not None and parquet is not None:
        raise ConfigError("kafka and parquet sinks are mutually exclusive")

    rules = [_parse_rule(r) for r in raw.get("rules", [])]
    schemas = [
        SinkSchema(
            topic=str(s["topic"]),
            fields={k: _parse_schema_field(v) for k, v in (s.get("fields") or {}).items()},
        )
        for s in raw.get("schemas", [])
    ]
    return Settings(
        global_=Global(
            listen=listen,
            kafka=kafka,
            parquet=parquet,
            metrics=g.get("metrics"),
            status=g.get("status"),
            template_json_paths=_parse_bool(
                g.get("template_json_paths", False), "template_json_paths"
            ),
        ),
        rules=rules,
        schemas=schemas,
    )


def load(path: str, environ: dict[str, str] | None = None) -> Settings:
    """Load settings from a .yml file with HOTDOG_* env overlay."""
    if not path.endswith((".yml", ".yaml")):
        # reference: src/settings.rs:22-24 (".yml" only; we accept .yaml too)
        raise ConfigError("the configuration file must end with .yml")
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return load_dict(raw, environ)
