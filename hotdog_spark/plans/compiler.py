"""Rule-cascade compiler: Settings → Catalyst Column expressions.

This is the heart of the engine.  The reference evaluates rules per record
in an imperative loop (reference: src/connection.rs:104-243); we compile
the *whole ordered cascade* into two ``CASE WHEN`` chains — one producing
the routing ``topic``, one the transformed ``payload`` — so Catalyst sees a
single declarative plan (short-circuit first-match evaluation comes free
from lazily-evaluated CaseWhen codegen).

Faithful semantics captured from src/connection.rs:

* Rules evaluate in order; processing of a record stops at the first rule
  that sets ``continue_rules = false``.
* A rule on a null field never matches (src/connection.rs:125-144).
* On match, template variables are: regex named-capture groups
  (src/rules.rs:98-103), the JMESPath string result as ``value``
  (src/rules.rs:83-85), then the built-ins ``msg``/``version``/``iso8601``
  which are inserted *after* captures and therefore shadow same-named
  groups (src/connection.rs:155-157 — note the README claims the opposite;
  the code wins).
* Action walk (src/connection.rs:167-242): per-rule ``output`` buffer
  starts empty.  ``replace`` renders into it; ``merge`` deep-merges the
  configured JSON into the *message* and stores the result in it (merge
  failure — non-JSON message — sets continue_rules=false but does NOT
  break the action loop); ``forward`` emits (topic, output-or-msg), sets
  continue_rules=false and breaks; ``stop`` sets continue_rules=false and
  keeps walking (so ``[stop, forward]`` still forwards — faithful quirk).
* ``iso8601`` is a per-plan timestamp; the reference stamps once per
  connection (src/connection.rs:83) — documented divergence (SURVEY §4
  O14): we stamp per batch/query via current_timestamp().
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hotdog_spark.config import (
    Rule,
    Settings,
    java_pattern,
    regex_group_names,
)
from hotdog_spark.functions.jsonmerge import (
    flatten_patch_leaves,
    is_valid_json,
    merge_json_udf,
    merge_static_object,
)
from hotdog_spark.plans import schema as schema_mod
from hotdog_spark.version import ENGINE_VERSION

#: A variable reference: an identifier head optionally followed by
#: dotted path segments ({{a}}, {{a.b.c}}, {{this.level}}).  ``..``
#: (parent refs) never matches — the leftover ``{{`` fails loudly in
#: the tokenizer's literal handler.
_HB_NAME = r"@?[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*"

# Partial ids are the reference's `{uuid}-{index}` template ids
# (src/connection.rs:251-253), so the charset admits hyphens and
# digit-leading segments that _HB_NAME does not.
_HB_PARTIAL = r"[A-Za-z0-9_][A-Za-z0-9_.\-]*"

_TEMPLATE_TOKEN = re.compile(
    r"\{\{\{\s*(" + _HB_NAME + r")\s*\}\}\}"                     # {{{raw}}}
    r"|\{\{\s*#(if|each)\s+(" + _HB_NAME + r")\s*\}\}"           # {{#if v}}
    r"|\{\{\s*/(if|each)\s*\}\}"                                 # {{/if}}
    r"|\{\{\s*(else)\s*\}\}"                                     # {{else}}
    r"|\{\{\s*>\s*(" + _HB_PARTIAL + r")\s*\}\}"                 # {{> p}}
    r"|\{\{\s*(&\s*)?(" + _HB_NAME + r")\s*\}\}"                 # {{v}} {{&v}}
)

ISO8601_FORMAT = "yyyy-MM-dd'T'HH:mm:ssXXX"

# Handlebars' default escapeExpression table (handlebars 6 keeps the
# classic handlebars.js map; the reference registers no custom escape_fn,
# src/connection.rs:260-289, so every {{var}} goes through this).  Order
# matters only for '&', which must be escaped first.
_HB_ESCAPES = (
    ("&", "&amp;"),
    ("<", "&lt;"),
    (">", "&gt;"),
    ('"', "&quot;"),
    ("'", "&#x27;"),
    ("`", "&#x60;"),
    ("=", "&#x3d;"),
)


def _hb_escape(col: Column) -> Column:
    """HTML-escape a string Column the way handlebars' default escape
    does — seven chained JVM-side replaces, codegen-friendly."""
    for ch, rep in _HB_ESCAPES:
        col = F.replace(col, F.lit(ch), F.lit(rep))
    return col


def _tokenize_template(template: str) -> list[tuple]:
    """Template string → token list.  Tokens: ("lit", text),
    ("var", name, raw), ("open", kind, name), ("close", kind),
    ("else",).  Any ``{{`` left in literal text is an unsupported
    construct (partial, comment, ``../`` parent ref, ``{{#with}}``,
    ``{{else if}}`` …) and fails loudly — the reference's full
    Handlebars engine would evaluate these, so passing them through as
    text would diverge wrong-way."""
    toks: list[tuple] = []
    pos = 0

    def literal(text: str) -> None:
        # A stray '}}' is plain text to handlebars (JSON merge patches
        # end in '}}'); an unconsumed '{{' opener is not.
        if "{{" in text:
            raise ValueError(
                f"unsupported handlebars construct in template {template!r}: "
                f"only {{{{var}}}}, {{{{{{var}}}}}}, {{{{&var}}}}, "
                f"{{{{> partial}}}}, "
                f"{{{{#if v}}}}…{{{{else}}}}…{{{{/if}}}} and "
                f"{{{{#each v}}}}…{{{{/each}}}} are supported "
                "(no comments, ../ parent refs, {{#with}}, partial "
                "parameters, or custom helpers)"
            )
        if text:
            toks.append(("lit", text))

    for m in _TEMPLATE_TOKEN.finditer(template):
        literal(template[pos:m.start()])
        raw3, okind, oname, ckind, els, pname, amp, ename = m.groups()
        if raw3 is not None:
            toks.append(("var", raw3, True))
        elif okind is not None:
            toks.append(("open", okind, oname))
        elif ckind is not None:
            toks.append(("close", ckind))
        elif els is not None:
            toks.append(("else",))
        elif pname is not None:
            toks.append(("partial", pname))
        else:
            toks.append(("var", ename, amp is not None))
        pos = m.end()
    literal(template[pos:])
    return toks


def _parse_nodes(toks: list[tuple], i: int, closing: str | None):
    """Recursive-descent parse → (nodes, else_nodes|None, next_i).
    AST nodes: ("lit", s) | ("var", name, raw) |
    ("if"|"each", name, body_nodes, else_nodes|None)."""
    nodes: list[tuple] = []
    else_nodes = None
    cur = nodes
    while i < len(toks):
        t = toks[i]
        if t[0] in ("lit", "var", "partial"):
            cur.append(t)
            i += 1
        elif t[0] == "open":
            body, inner_else, i = _parse_nodes(toks, i + 1, t[1])
            cur.append((t[1], t[2], body, inner_else))
        elif t[0] == "else":
            if closing is None or else_nodes is not None:
                raise ValueError(
                    "unsupported handlebars construct: {{else}} outside a "
                    "block or repeated within one"
                )
            else_nodes = []
            cur = else_nodes
            i += 1
        else:  # close
            if t[1] != closing:
                raise ValueError(
                    f"unsupported handlebars construct: unbalanced "
                    f"{{{{/{t[1]}}}}}"
                )
            return nodes, else_nodes, i + 1
    if closing is not None:
        raise ValueError(
            f"unsupported handlebars construct: unclosed {{{{#{closing}}}}}"
        )
    return nodes, else_nodes, i


def _hb_truthy(col: Column) -> Column:
    """Handlebars truthiness for the engine's STRING-typed variables:
    null/missing and "" are falsy, any other string truthy — exactly the
    rust handlebars crate's ``is_truthy`` on ``Json::String`` (the
    reference's variables map is ``HashMap<String, String>``,
    src/connection.rs:150-165, so string truthiness is the whole
    contract)."""
    return col.isNotNull() & (col.cast("string") != F.lit(""))


def _resolve_var(
    name: str, variables: dict[str, Column], json_paths: bool = False
) -> Column | None:
    """Resolve a (possibly dotted) handlebars reference to a Column.

    A bare name looks up the variables map.  What a dotted ``a.b.c``
    does depends on ``json_paths``:

    * ``False`` (default — strict reference parity): the reference's
      template context is ``HashMap<String, String>``
      (src/connection.rs:119-161), so rust handlebars renders "" for
      ANY multi-segment path — a String context has nothing to navigate
      into.  A dotted name that is not literally a key in the variables
      map therefore resolves to None (→ "" downstream, inverse block in
      block heads), bit-for-bit what the reference emits.
    * ``True`` (opt-in EXTENSION, ``global.template_json_paths``): the
      head segment resolves in the map and the remaining path digs into
      the value's JSON structure via ``get_json_object`` (compile-time
      constant path — Catalyst, no UDF).  Digging into a non-JSON or
      scalar string yields null → "" (what handlebars renders
      navigating into a ``Json::String``); where the value IS a JSON
      document — ``{{msg.level}}`` on a JSON payload, ``{{this.k}}``
      inside ``{{#each}}`` over an array of objects — the path resolves
      into it, matching handlebars' own behavior on structured contexts
      (objects/arrays render as their JSON text, scalars unquoted, JSON
      null as empty).

    The gate exists because the extension semantics were validated only
    against this engine's own oracle, not the reference (ADVICE r10):
    a ported reference config must not silently change output, so the
    dig is off unless the config asks for it.  An unknown head resolves
    to None (statically absent, same as an unknown bare name)."""
    var = variables.get(name)
    if var is not None or "." not in name:
        return var
    if not json_paths:
        return None
    head, _, rest = name.partition(".")
    base = variables.get(head)
    if base is None:
        return None
    return F.get_json_object(base.cast("string"), "$." + rest)


def _compile_nodes(
    nodes: list[tuple],
    variables: dict[str, Column],
    partials: dict[str, str] | None = None,
    _stack: tuple[str, ...] = (),
    json_paths: bool = False,
) -> Column:
    parts: list[Column] = []
    for node in nodes:
        kind = node[0]
        if kind == "lit":
            parts.append(F.lit(node[1]))
        elif kind == "partial":
            _, name = node
            # Compile-time textual inclusion: a partial is the named
            # registered template re-entered with the CURRENT variables
            # map (handlebars passes the current context to a bare
            # ``{{> p}}``) — no runtime machinery needed.  Missing
            # partials and inclusion cycles fail the config load loudly
            # (handlebars-rust's render would error on the former and
            # overflow on the latter; rejecting at compile time is the
            # house fail-fast posture).
            if not partials or name not in partials:
                raise ValueError(
                    f"unsupported handlebars construct: partial "
                    f"{{{{> {name}}}}} names no registered template "
                    "(merge/replace action templates register under "
                    "'{rule-uuid}-{action-index}')"
                )
            if name in _stack:
                raise ValueError(
                    "unsupported handlebars construct: partial inclusion "
                    f"cycle {' -> '.join((*_stack, name))}"
                )
            sub_nodes, _, _ = _parse_nodes(
                _tokenize_template(partials[name]), 0, None
            )
            parts.append(
                _compile_nodes(
                    sub_nodes, variables, partials, (*_stack, name), json_paths
                )
            )
        elif kind == "var":
            _, name, raw = node
            var = _resolve_var(name, variables, json_paths)
            if var is None:
                parts.append(F.lit(""))
            else:
                rendered = F.coalesce(var.cast("string"), F.lit(""))
                parts.append(rendered if raw else _hb_escape(rendered))
        elif kind == "if":
            _, name, body, else_nodes = node
            then_col = _compile_nodes(body, variables, partials, _stack, json_paths)
            else_col = _compile_nodes(
                else_nodes or [], variables, partials, _stack, json_paths
            )
            var = _resolve_var(name, variables, json_paths)
            if var is None:
                # undefined is statically falsy: constant-fold to the
                # inverse block (what Catalyst would do anyway)
                parts.append(else_col)
            else:
                parts.append(
                    F.when(_hb_truthy(var), then_col).otherwise(else_col)
                )
        else:  # each
            _, name, body, else_nodes = node
            else_col = _compile_nodes(
                else_nodes or [], variables, partials, _stack, json_paths
            )
            var = _resolve_var(name, variables, json_paths)
            if var is None:
                parts.append(else_col)
                continue
            # The variable's string value parsed as a JSON array:
            # elements coerce to their JSON text (numbers -> "1",
            # objects -> '{"k":1}'); null / scalar / invalid JSON ->
            # null array -> inverse block, and [] -> inverse block
            # (handlebars renders {{else}} for empty iterables).  The
            # body renders in the ELEMENT context — {{this}} and
            # {{@index}} resolve, outer names do not (handlebars does
            # not climb the context stack without ../, which stays
            # unsupported) — via a two-arg Catalyst transform lambda;
            # aggregation back to one string is array_join, all
            # JVM-side.
            arr = F.from_json(var.cast("string"), "array<string>")
            joined = F.array_join(
                F.transform(
                    arr,
                    lambda x, i: _compile_nodes(
                        body,
                        {"this": x, "@index": i.cast("string")},
                        partials,
                        _stack,
                        json_paths,
                    ),
                ),
                "",
            )
            parts.append(
                F.when(arr.isNotNull() & (F.size(arr) > 0), joined)
                .otherwise(else_col)
            )
    if not parts:
        return F.lit("")
    return F.concat(*parts) if len(parts) > 1 else parts[0]


def compile_template(
    template: str,
    variables: dict[str, Column],
    partials: dict[str, str] | None = None,
    json_paths: bool = False,
) -> Column:
    """Handlebars-subset template → one Catalyst expression.

    Supports ``{{var}}`` (HTML-escaped, handlebars' default — the
    reference registers no custom escape_fn so its Handlebars instance
    escapes ``& < > " ' \\` =`` on every double-stache), the raw forms
    ``{{{var}}}`` / ``{{&var}}``, and the two classic block helpers:

    * ``{{#if var}}…{{else}}…{{/if}}`` — compiled to ``CASE WHEN`` on
      string truthiness (null/"" falsy — the rust handlebars crate's
      ``is_truthy`` on the reference's String-typed variables map).
    * ``{{#each var}}…{{/each}}`` — the variable parsed as a JSON array
      (``from_json`` → ``array<string>``); the body renders per element
      via a Catalyst ``transform`` lambda with ``{{this}}`` /
      ``{{@index}}`` bound, concatenated with ``array_join`` — fully
      JVM-side, no UDF.  Non-array / empty values render the
      ``{{else}}`` (inverse) block, matching handlebars.

    Dotted paths (``{{a.b.c}}``, raw forms, and block heads) render ""
    by DEFAULT — strict reference parity, since the reference's context
    is ``HashMap<String, String>`` and rust handlebars cannot navigate
    into a String (ADVICE r10).  With ``json_paths=True`` (the
    ``global.template_json_paths`` opt-in) the head resolves in the
    variables map and the rest digs into the value's JSON structure via
    ``get_json_object`` — a documented EXTENSION, not parity; see
    :func:`_resolve_var` for the exact semantics.  Under the extension
    ``{{this.k}}`` inside ``{{#each}}`` digs into array elements —
    handlebars' own object-iteration shape.

    Partials (``{{> p}}`` — r10 verdict item 4) inline at COMPILE time:
    ``partials`` maps registered template ids to their source (the
    reference registers every merge/replace action template under
    ``{rule-uuid}-{action-index}``, src/connection.rs:251-253,261-289,
    and handlebars resolves ``{{> id}}`` against that same registry),
    and the named source is re-tokenized and compiled in place with the
    CURRENT variables map — a partial is textual inclusion, so no
    runtime machinery survives into the plan.  Missing names, inclusion
    cycles, and parameterized partials (``{{> p k=v}}``) all raise.

    Blocks nest arbitrarily.  Unknown / null variables render as empty
    string (handlebars' lenient mode); an unknown name in a block head
    constant-folds to the inverse block.  Comments (``{{! c}}``),
    ``../`` parent refs, ``{{#with}}``,
    ``{{else if}}`` chains and custom helpers are REJECTED at compile
    time with ``ValueError`` — the reference's full Handlebars engine
    (src/connection.rs:260-289) would evaluate them, so silently
    emitting them as literal text would diverge wrong-way; failing the
    config load is the honest subset boundary.  The resulting
    expression is constant-folded by Catalyst when all parts are
    literals (the analog of the reference's template precompilation).
    """
    nodes, _, _ = _parse_nodes(_tokenize_template(template), 0, None)
    return _compile_nodes(nodes, variables, partials, (), json_paths)


def _jsonpath(path: str) -> str:
    """Dotted JMESPath subset → JSONPath for get_json_object."""
    return "$." + path


def _jmespath_value_var(field_col: Column, path: str) -> Column:
    """The ``value`` template variable: the JMESPath result *only when it
    is a JSON string* (numbers/objects leave the variable unset — the
    reference warns and skips, src/rules.rs:83-90)."""
    variant = F.try_parse_json(field_col)
    leaf = F.try_variant_get(variant, _jsonpath(path), "variant")
    return F.when(
        F.schema_of_variant(leaf) == F.lit("STRING"),
        F.try_variant_get(variant, _jsonpath(path), "string"),
    )


@dataclass
class CompiledRule:
    """One rule lowered to Column expressions."""

    index: int
    matched: Column          # does this rule match the record?
    terminal: Column         # given matched: does processing stop here?
    topic: Column            # routing topic when terminal (null = drop)
    payload: Column          # payload when terminal
    merge_fail: Column       # given matched: did a merge action abort?


@dataclass
class CompiledCascade:
    """The whole cascade as Column expressions + per-rule parts."""

    topic: Column
    payload: Column
    matched_rule: Column     # 0-based index of the terminating rule (null = none)
    merge_aborted: Column    # any reached rule's merge action aborted
    rules: list[CompiledRule]


def _jmespath_is_subset(expr: str) -> bool:
    from hotdog_spark.config import _JMESPATH_SUBSET

    return bool(_JMESPATH_SUBSET.match(expr))


def _match_condition(rule: Rule, field_col: Column) -> Column:
    if rule.regex is not None:
        # rlike on a null column yields null, which CaseWhen treats as
        # false — the null-field guard comes free (SURVEY §2.3 F3).
        return field_col.rlike(java_pattern(rule.regex))
    # JMESPath: match iff the result is non-null (src/rules.rs:75-93).
    # Dotted-path subset → native get_json_object (null for invalid JSON,
    # missing keys and JSON null); anything richer → the bundled
    # jmespath_lite evaluator as an Arrow-batched UDF.
    if _jmespath_is_subset(rule.jmespath):
        return F.get_json_object(field_col, _jsonpath(rule.jmespath)).isNotNull()
    from hotdog_spark.functions.jsonquery import jmespath_struct

    return jmespath_struct(field_col, rule.jmespath)["res_json"].isNotNull()


def _rule_variables(
    rule: Rule, field_col: Column, msg: Column, iso8601: Column
) -> dict[str, Column]:
    variables: dict[str, Column] = {}
    if rule.regex is not None:
        pat = java_pattern(rule.regex)
        for name, idx in regex_group_names(rule.regex).items():
            # Unmatched optional groups extract as "" — handlebars renders
            # missing vars as "" too, so behavior matches the reference.
            variables[name] = F.regexp_extract(field_col, pat, idx)
    elif _jmespath_is_subset(rule.jmespath):
        variables["value"] = _jmespath_value_var(field_col, rule.jmespath)
    else:
        from hotdog_spark.functions.jsonquery import jmespath_struct

        # string results only, like the subset path (src/rules.rs:83-90)
        variables["value"] = jmespath_struct(field_col, rule.jmespath)["res_str"]
    # Built-ins inserted last → they shadow captures (src/connection.rs:155-157).
    variables["msg"] = msg
    variables["version"] = F.lit(ENGINE_VERSION)
    variables["iso8601"] = iso8601
    return variables


def _static_forward_topic(rule: Rule) -> str | None:
    """The first forward action's topic, when it is a plain string with no
    template variables (else None)."""
    for action in rule.actions:
        if action.kind == "forward":
            return action.topic if not _TEMPLATE_TOKEN.search(action.topic) else None
    return None


def compile_rule(
    rule: Rule,
    index: int,
    env: dict[str, Column],
    iso8601: Column,
    sink_schemas: dict[str, "object"] | None = None,
    merge_mode: str = "exact",
    partials: dict[str, str] | None = None,
    json_paths: bool = False,
) -> CompiledRule:
    """Lower one rule's match + action walk to Column expressions.

    ``merge_mode='native'`` uses the pure-Catalyst merge fast path
    (from_json → withField → to_json) when the rule forwards to a static
    topic with a declared sink schema; otherwise it falls back to the
    exact Arrow-batched UDF.  The native path confines the payload to the
    declared schema — exactly the contract of a declared-schema topic
    (SURVEY §1.3) — and keeps the hot path 100% JVM-side.
    """
    msg = env["msg"]
    field_col = env[rule.field]
    matched = _match_condition(rule, field_col)
    variables = _rule_variables(rule, field_col, msg, iso8601)

    output: Column = F.lit("")          # the per-rule output buffer
    output_set = False                  # did any action write the buffer?
    topic: Column | None = None
    emitted = False
    stopped = False
    merge_fail: Column | None = None    # condition under which a merge failed

    for action in rule.actions:
        if action.kind == "forward":
            topic = compile_template(
                action.topic, variables, partials, json_paths
            )
            emitted = True
            break  # forward breaks the action loop (src/connection.rs:210)
        if action.kind == "replace":
            output = compile_template(
                action.template, variables, partials, json_paths
            )
            output_set = True
        elif action.kind == "merge":
            valid = is_valid_json(msg)
            if isinstance(action.json_value, dict):
                merged = _compile_merge(
                    rule, action, msg, variables, sink_schemas, merge_mode,
                    partials, json_paths,
                )
                output = F.when(valid, merged).otherwise(output)
            else:
                # Non-object patch: buffer passes through un-merged
                # (src/connection.rs:317-322).
                output = F.when(valid, msg).otherwise(output)
            output_set = True
            fail = ~valid
            merge_fail = fail if merge_fail is None else (merge_fail | fail)
        elif action.kind == "stop":
            stopped = True  # sets the flag but keeps walking (faithful)

    if emitted or stopped:
        terminal = F.lit(True)
    elif merge_fail is not None:
        terminal = merge_fail
    else:
        terminal = F.lit(False)

    if emitted:
        # Empty buffer forwards the raw message.  Build the runtime
        # comparison only when some action actually wrote the buffer:
        # with no replace/merge the buffer is statically the '' literal,
        # and `lit('') == lit('')` trips Spark's trivially-true-predicate
        # warning twice per run (VERDICT r7 item 6) while folding to the
        # same constant anyway.
        payload = (
            F.when(output == F.lit(""), msg).otherwise(output)
            if output_set
            else msg
        )
        topic_expr = topic
    else:
        # Terminal without forward = drop (stop-only rule, or failed merge).
        payload = F.lit(None).cast("string")
        topic_expr = F.lit(None).cast("string")

    return CompiledRule(
        index=index,
        matched=matched,
        terminal=terminal,
        topic=topic_expr,
        payload=payload,
        merge_fail=merge_fail if merge_fail is not None else F.lit(False),
    )


def _compile_merge(
    rule: Rule,
    action,
    msg: Column,
    variables: dict[str, Column],
    sink_schemas: dict[str, "object"] | None,
    merge_mode: str,
    partials: dict[str, str] | None = None,
    json_paths: bool = False,
) -> Column:
    """Lower one merge action: native withField graft when possible,
    exact pandas UDF otherwise."""
    if merge_mode == "native" and sink_schemas:
        static_topic = _static_forward_topic(rule)
        target_schema = sink_schemas.get(static_topic) if static_topic else None
        if target_schema is not None:
            leaves = flatten_patch_leaves(action.json_value)
            schema = schema_mod.ensure_paths(target_schema, [p for p, _ in leaves])

            def render_leaf(v):
                return (
                    compile_template(v, variables, partials, json_paths)
                    if isinstance(v, str)
                    else F.lit(v)
                )

            return merge_static_object(msg, schema, action.json_value, render_leaf)
    patch = compile_template(action.json_str, variables, partials, json_paths)
    return merge_json_udf(msg, patch)


def template_registry(settings: Settings) -> dict[str, str]:
    """The partial-resolution registry: every merge/replace action
    template keyed by the reference's ``{rule-uuid}-{action-index}``
    template id (src/connection.rs:251-253 ``template_id_for``;
    :261-289 ``precompile_templates`` registers exactly the Merge and
    Replace actions).  handlebars resolves ``{{> id}}`` against the
    same registry it renders from, so any registered template is
    usable as a partial — including from forward-topic templates,
    which render ad hoc but see the registry."""
    reg: dict[str, str] = {}
    for rule in settings.rules:
        for idx, action in enumerate(rule.actions):
            if action.kind == "replace" and action.template is not None:
                reg[f"{rule.uuid}-{idx}"] = action.template
            elif action.kind == "merge" and action.json_str is not None:
                reg[f"{rule.uuid}-{idx}"] = action.json_str
    return reg


def compile_cascade(
    settings: Settings,
    env: dict[str, Column] | None = None,
    merge_mode: str = "exact",
) -> CompiledCascade:
    """Compile the full ordered rule cascade into CASE WHEN chains.

    ``env`` maps envelope field names to Columns; defaults to columns named
    msg/severity/facility/hostname/appname.  ``merge_mode='native'``
    enables the declared-schema Catalyst merge fast path.
    """
    if env is None:
        env = {f: F.col(f) for f in ("msg", "severity", "facility", "hostname", "appname")}
    iso8601 = F.date_format(F.current_timestamp(), ISO8601_FORMAT)

    sink_schemas = {
        s.topic: schema_mod.sink_schema_to_struct(s) for s in settings.schemas
    }
    partials = template_registry(settings)
    json_paths = settings.global_.template_json_paths
    compiled = [
        compile_rule(
            r, i, env, iso8601, sink_schemas, merge_mode, partials, json_paths
        )
        for i, r in enumerate(settings.rules)
    ]

    topic: Column = F.lit(None).cast("string")
    payload: Column = F.lit(None).cast("string")
    matched_rule: Column = F.lit(None).cast("int")

    # Build the first-match-wins chain back-to-front with otherwise();
    # Catalyst flattens nested CaseWhen into one lazily-evaluated chain.
    for cr in reversed(compiled):
        cond = cr.matched & cr.terminal
        topic = F.when(cond, cr.topic).otherwise(topic)
        payload = F.when(cond, cr.payload).otherwise(payload)
        matched_rule = F.when(cond, F.lit(cr.index)).otherwise(matched_rule)

    # merge_aborted (the reference's hotdog.error.merge_target_not_json):
    # rule i's actions run iff it matches AND every earlier rule was
    # unmatched-or-non-terminal, so walk forward carrying "reached".
    # matched/merge_fail can be NULL (rlike on a null field, JSON checks on
    # null msg) — coalesce to false so the chain stays three-valued-safe.
    merge_aborted: Column = F.lit(False)
    reached: Column = F.lit(True)
    for cr in compiled:
        hit = F.coalesce(cr.matched, F.lit(False))
        fail = F.coalesce(cr.merge_fail, F.lit(False))
        term = F.coalesce(cr.terminal, F.lit(False))
        merge_aborted = merge_aborted | (reached & hit & fail)
        reached = reached & ~(hit & term)

    return CompiledCascade(
        topic=topic,
        payload=payload,
        matched_rule=matched_rule,
        merge_aborted=merge_aborted,
        rules=compiled,
    )


def apply_cascade(
    df: DataFrame,
    settings: Settings,
    keep_dropped: bool = False,
    merge_mode: str = "exact",
) -> DataFrame:
    """Route a parsed-envelope DataFrame through the cascade.

    Adds ``topic`` and ``payload`` columns; rows that no rule forwards
    (unmatched, stop-dropped, or merge-aborted) are filtered out unless
    ``keep_dropped`` (dead-letter / metrics analysis) is set.
    """
    from hotdog_spark.dist import ensure_shipped

    # The exact-merge pandas UDF runs on executor Python workers, which
    # must be able to import this package regardless of driver cwd.
    ensure_shipped(df.sparkSession)
    cascade = compile_cascade(settings, merge_mode=merge_mode)
    out = df.withColumns(
        {
            "topic": cascade.topic,
            "payload": cascade.payload,
            "matched_rule": cascade.matched_rule,
            "merge_aborted": cascade.merge_aborted,
        }
    )
    if not keep_dropped:
        out = out.filter(F.col("topic").isNotNull())
    return out


def dry_run(
    df: DataFrame, settings: Settings, column: str = "value", key: str | None = None
) -> DataFrame:
    """Test mode (`hotdog -t file.log`): which rules match each raw line?

    Mirrors rules::test_rules (reference: src/rules.rs:16-57): every
    ``field: msg`` rule is tested against the raw line independently (no
    actions run, no first-match short-circuit); non-msg rules are skipped.
    Returns (line_no, value, matches: array<int>, matchers: array<string>).
    With ``key`` set, that column is used as the line identifier instead of
    a global row_number (the distributed-friendly form).
    """
    line = F.col(column)
    conds = []
    for i, rule in enumerate(settings.rules):
        if rule.field != "msg":
            continue
        conds.append((i, rule.matcher_display, _match_condition(rule, line)))
    matches = F.filter(
        F.array(*[F.when(c, F.lit(i)) for i, _, c in conds]),
        lambda x: x.isNotNull(),
    ) if conds else F.array().cast("array<int>")
    matchers = F.filter(
        F.array(*[F.when(c, F.lit(d)) for _, d, c in conds]),
        lambda x: x.isNotNull(),
    ) if conds else F.array().cast("array<string>")
    if key is not None:
        return df.select(
            F.col(key).alias("line_no"),
            line.alias("value"),
            matches.alias("matches"),
            matchers.alias("matchers"),
        )
    # NOTE: the global row_number window funnels through one partition —
    # acceptable because dry-run is an interactive debugging surface over a
    # small sample file (the reference's test mode reads one local file,
    # src/rules.rs:16-57), never part of the production dataflow.
    return df.select(
        F.row_number().over(Window.orderBy(F.monotonically_increasing_id())).alias("line_no"),
        line.alias("value"),
        matches.alias("matches"),
        matchers.alias("matchers"),
    )
