"""Config-driven corpus-curation pipelines.

The reference engine's whole surface is a YAML rule file compiled into
a dataflow (`/root/reference/config.yml` → `src/settings.rs`; our
syslog twin is `hotdog_spark.config` + `plans/compiler.py`).  This
module applies the same ethos to the LLM-curation domain: a declarative
step list compiles into ONE composed DataFrame DAG — the user writes
policy (which gates, which dials), the engine owns the plan shape.

Design rules, mirroring the cascade compiler:

* **Fail at compile time, not mid-job.**  Unknown steps, missing
  required params, wrong step order (e.g. `pack` before `features`)
  raise ``ValueError`` while the config is being compiled, before any
  Spark job is queued — a 100 TB run must not die three hours in on a
  typo.
* **Pure composition.**  Every step maps onto the SAME oracle-backed
  expressions the registered queries use (`redacted_text`,
  `quality_expr`, `fingerprint_expr`, `pack_token_budget`), so a
  config that spells out the default wash reproduces
  `pipeline_corpus_build` bit-for-bit — which is exactly how the
  `pipeline_from_config` driver query proves the DSL wiring against
  that query's DuckDB oracle.
* **One DAG out.**  Steps extend a single lazy plan; nothing is
  materialized between steps, so Catalyst fuses the projections and
  the whole wash keeps the composed shape (one scan → one fp
  aggregate → one keyed window → one bin aggregate).

Schema (YAML or an equivalent dict)::

    pipeline:
      - step: redact            # PII patterns + deny_terms list
        deny_terms: [a, b]
      - step: features          # quality, fingerprint, n_tokens
      - step: quality_gate
        min_quality: 0.1
      - step: dedup_fingerprint # min-id canonical per content print
      - step: pack
        budget_tokens: 2048
        group_by: lang
      - step: bin_report        # (group, bin, n_docs, bin_tokens)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_REQUIRED_ORDER = ["redact", "features"]  # prerequisites for the rest


def load_curation_config(source) -> list[dict]:
    """Parse + validate a pipeline config from a YAML string, a path, or
    an already-parsed dict.  Returns the validated step list."""
    if isinstance(source, str):
        import yaml

        if "\n" not in source and source.endswith((".yml", ".yaml")):
            with open(source) as f:
                data = yaml.safe_load(f)
        else:
            data = yaml.safe_load(source)
    else:
        data = source
    if not isinstance(data, dict) or "pipeline" not in data:
        raise ValueError("curation config must be a mapping with a 'pipeline' list")
    steps = data["pipeline"]
    if not isinstance(steps, list) or not steps:
        raise ValueError("'pipeline' must be a non-empty list of steps")
    seen: list[str] = []
    for i, st in enumerate(steps):
        if not isinstance(st, dict) or "step" not in st:
            raise ValueError(f"pipeline[{i}]: each entry needs a 'step' name")
        name = st["step"]
        if name not in _STEPS:
            raise ValueError(
                f"pipeline[{i}]: unknown step {name!r}; known: {sorted(_STEPS)}"
            )
        unknown = set(st) - {"step"} - _STEPS[name][0]
        if unknown:
            raise ValueError(
                f"pipeline[{i}] ({name}): unknown params {sorted(unknown)}"
            )
        for dep in _STEPS[name][1]:
            if dep not in seen:
                raise ValueError(
                    f"pipeline[{i}] ({name}): requires a prior {dep!r} step"
                )
        seen.append(name)
    _check_group_by(steps)
    return steps


#: Columns the `features` step projects — the full set any later step's
#: group_by can reference (the compiled plan carries nothing else).
_FEATURE_COLS = frozenset({"doc_id", "lang", "quality", "fp", "n_tokens"})


def _check_group_by(steps: list[dict]) -> None:
    """Param CONSISTENCY validation (ADVICE r6): step order and param
    names alone let a `bin_report` group_by that differs from `pack`'s
    (or names a column `features` never produced) compile fine and die
    mid-job — against the module's fail-at-compile-time rule.  `pack`'s
    group column must be one the features projection carries, and
    `bin_report` groups the PACK OUTPUT, which carries only pack's own
    group column, so the two must agree."""
    pack_group = None
    for i, st in enumerate(steps):
        name = st["step"]
        if name == "pack":
            pack_group = st.get("group_by", "lang")
            if pack_group not in _FEATURE_COLS:
                raise ValueError(
                    f"pipeline[{i}] (pack): group_by {pack_group!r} is not a "
                    f"column the features step produces "
                    f"({sorted(_FEATURE_COLS)})"
                )
        elif name == "bin_report":
            group = st.get("group_by", "lang")
            if group != pack_group:
                raise ValueError(
                    f"pipeline[{i}] (bin_report): group_by {group!r} must "
                    f"match the pack step's group_by ({pack_group!r}) — the "
                    "packed plan carries no other grouping column"
                )


#: Steps that compile onto a STREAMING input.  redact/features/
#: quality_gate are pure column expressions (append-mode safe);
#: dedup_fingerprint is a keyed aggregation (complete/update output
#: modes — Spark streaming's native state model).  pack and bin_report
#: rank with window functions, which Structured Streaming does not
#: support — a config using them on a stream must fail at COMPILE time,
#: same rule as every other config error in this module.
_STREAMABLE_STEPS = frozenset(
    {"redact", "features", "quality_gate", "dedup_fingerprint"}
)


def build_curation_pipeline(docs: DataFrame, config) -> DataFrame:
    """Compile the config into one composed DataFrame DAG over ``docs``
    (expects doc_id, text, lang columns).  ``docs`` may be a STREAMING
    DataFrame: the same step handlers compile unchanged (one definition,
    batch wash + live ingestion — the dual-mode posture of the cascade
    compiler, plans/compiler.py), with non-streamable steps rejected up
    front."""
    steps = load_curation_config(config)
    if docs.isStreaming:
        bad = [st["step"] for st in steps if st["step"] not in _STREAMABLE_STEPS]
        if bad:
            raise ValueError(
                f"steps {bad} use ranking windows, which Structured "
                "Streaming does not support — streamable steps: "
                f"{sorted(_STREAMABLE_STEPS)}"
            )
    state: dict = {"df": docs, "red": None}
    for st in steps:
        handler = _STEPS[st["step"]][2]
        handler(state, st)
    return state["df"]


# ---- step handlers: (allowed_params, prerequisites, fn) ----


def _h_redact(state, st):
    from hotdog_spark.operators import privacy

    terms = st.get("deny_terms", [])
    state["red"] = privacy.redacted_text(F.col("text"), list(terms))


def _h_features(state, st):
    from hotdog_spark.operators.dedup import normalized_tokens
    from hotdog_spark.operators.textops import fingerprint_expr, quality_expr

    red = state["red"]
    state["df"] = state["df"].select(
        "doc_id",
        "lang",
        quality_expr(F.col("text")).alias("quality"),
        fingerprint_expr(red).alias("fp"),
        F.size(normalized_tokens(red)).alias("n_tokens"),
    )


def _h_quality_gate(state, st):
    state["df"] = state["df"].filter(
        F.col("quality") > float(st.get("min_quality", 0.1))
    )


def _h_dedup_fp(state, st):
    state["df"] = state["df"].groupBy("fp").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("lang", "doc_id").alias("lang"),
        F.min_by("n_tokens", "doc_id").alias("n_tokens"),
    )


def _h_pack(state, st):
    from hotdog_spark.operators.sampling import pack_token_budget

    state["df"] = pack_token_budget(
        state["df"],
        "doc_id",
        "n_tokens",
        int(st.get("budget_tokens", 2048)),
        group_col=st.get("group_by", "lang"),
    )


def _h_bin_report(state, st):
    group = st.get("group_by", "lang")
    state["df"] = state["df"].groupBy(group, "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )


_STEPS = {
    "redact": ({"deny_terms"}, [], _h_redact),
    "features": (set(), ["redact"], _h_features),
    "quality_gate": ({"min_quality"}, ["features"], _h_quality_gate),
    "dedup_fingerprint": (set(), ["features"], _h_dedup_fp),
    "pack": ({"budget_tokens", "group_by"}, ["features"], _h_pack),
    "bin_report": ({"group_by"}, ["pack"], _h_bin_report),
}

#: The default wash — spells out pipeline_corpus_build exactly, so the
#: DSL is provable against that query's DuckDB oracle.
DEFAULT_WASH = {
    "pipeline": [
        {"step": "redact", "deny_terms": ["customer", "spark", "vector"]},
        {"step": "features"},
        {"step": "quality_gate", "min_quality": 0.1},
        {"step": "dedup_fingerprint"},
        {"step": "pack", "budget_tokens": 2048, "group_by": "lang"},
        {"step": "bin_report", "group_by": "lang"},
    ]
}
