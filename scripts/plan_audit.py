"""Plan audit: record the physical-plan properties that matter at 100 TB
for representative queries — filter pushdown, column pruning, whole-stage
codegen, broadcast vs shuffle joins, exchange count — into PLANS.md.

Reproducible evidence that the plans are the ones we designed for, not
just the first ones that passed:

    python scripts/plan_audit.py          # rewrites PLANS.md
    python scripts/plan_audit.py --check  # regression gate (see below)

``--check`` (VERDICT r7 item 7): PLANS.md was regenerated every round
but nothing FAILED when a query's exchange/scan/Python counts silently
grew — the exact class of plan regression the table exists to catch.
The check parses the full-registry table out of the COMMITTED PLANS.md
(``git show HEAD:PLANS.md``, so a regenerated working tree cannot mask
a regression), re-probes every currently registered query, and exits
nonzero when any query present in both has MORE exchanges, MORE scans,
or a Python stage where the committed plan had none.  New queries have
no baseline and pass; decreases pass (and should be re-recorded).

Intentional-change override: ``--allow name1,name2`` (or
``$SPARK_GRAFT_PLAN_ALLOW``) waives named queries for one run — the
waiver is printed so it lands in the gate log, and the same commit
should regenerate PLANS.md so the new shape becomes the baseline.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

AUDIT = [
    ("q6_forecast_revenue", "selective scan: every predicate pushed"),
    ("q5_regional_revenue", "6-way join: dims broadcast, facts shuffle"),
    ("q19_disjunctive_revenue", "OR-groups imply single-side pushdowns"),
    ("q21_waiting_suppliers", "self semi/anti joins co-partitioned"),
    ("hotdog_route_payload", "rule cascade: one scan, zero shuffle, no Python"),
    ("dedup_minhash_lsh", "LSH: shuffle on signature key only"),
    ("ann_ivf", "IVF: centroid literals, no corpus shuffle before prune"),
    ("text_clean_corpus_pipeline", "composed pipeline: 1 scan + 1 agg"),
    ("window_topk_orders_per_customer", "ranking window: one keyed shuffle"),
    ("topk_orders_global", "global top-k: TakeOrderedAndProject"),
    ("text_pii_scrub", "regex scrub: pure projection, zero shuffle"),
    ("decontaminate_ngram_overlap", "decontamination: bench grams broadcast"),
    ("upsert_latest_state", "log compaction: one keyed window shuffle"),
    ("pipeline_corpus_build", "composed wash: 1 scan, fp agg + lang window"),
    ("classify_docs_by_taxonomy", "taxonomy tagging: dictionary broadcast"),
    ("snapshot_diff_orders", "CDC diff: co-partitioned full-outer join"),
    ("sessionize_user_events", "sessionize: one user-keyed window shuffle"),
    ("dedup_ngram_jaccard", "jaccard: max_df cap kills hot-token skew, anti-join broadcast"),
    ("asof_nearest_click", "as-of nearest: both carries in one window pass"),
    ("export_shard_manifest", "shard export: one hash shuffle on the shard key"),
    ("agg_approx_percentile_value", "sketch percentile: one agg, mergeable state"),
    ("multimodal_media_sniff", "media sniff: Arrow kernels are the sanctioned Python"),
    ("dedup_chunk_boilerplate", "chunk dedup: hot-chunk broadcast flag-join, ONE doc aggregate"),
    ("pack_split_sequences", "split packing: window cumsum + bounded generator"),
    ("embedding_drift_report", "drift: both cohorts in ONE conditional-sum aggregate"),
    ("dedup_winnowing_pairs", "MOSS pairs: one (id,fp) shuffle, map-side pairs from capped lists"),
    ("agg_approx_distinct_users_sketch_only", "HLL rollup: one mergeable agg, no per-user shuffle"),
    ("knn_graph_ivf", "kNN graph: per-cell Arrow matmul, window only on nprobe*k rows"),
    ("pack_sharded_bins", "sharded packing: langs x shards parallel windows"),
    ("export_zorder_tiles", "zorder tiles: bit-interleave projection + one agg"),
    ("text_bm25_topk", "bm25: 1-row stats broadcast + TakeOrdered top-k"),
    ("quality_calibrate_by_source", "calibration: one source-keyed window, no global sort"),
    ("dedup_prefix_filter_jaccard", "PPJoin: rare-prefix candidates only, lossless"),
    ("dedup_minhash_jaccard_estimate", "LSH stage 2: bands-bounded per-pair agreement"),
    ("heavy_hitters_cms", "CMS: 256-counter mergeable sketch + bcast probe join"),
    ("text_ngram_novelty", "novelty: gram-keyed first-occurrence agg + join-back"),
    ("embedding_quantize_int8_report", "SQ8 audit: 2 aggs + 64-row calib broadcast"),
    ("asof_forward_next_purchase", "as-of forward: union-and-carry single keyed sort"),
    ("dq_constraint_report", "DQ gate: bcast anti-join FKs + single-agg checks"),
    ("dedup_image_ahash", "aHash dedup: decode projection + hash-group, no pairs"),
    ("quality_lm_bigram", "bigram LM: one explode, vocab-bounded model joins"),
    ("curation_importance_weights", "DSIR: 1024-row bucket models broadcast"),
]


def audit_one(spark, name, fn, sf_dir):
    # release cross-query cached intermediates FIRST: a persist left by
    # an earlier audited query (e.g. the kmeans family's quantized
    # corpus) substitutes into this query's plan as InMemoryRelation,
    # hiding its real parquet pushdown/pruning columns
    from hotdog_spark.operators import release_tracked_persists

    release_tracked_persists()
    spark.catalog.clearCache()
    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
    scans = plan.count("FileScan parquet")
    read_cols = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    narrow = all(0 < len(s.split(",")) <= 12 for s in read_cols) if read_cols else False
    return {
        # whole-stage codegen spans render as "*(n) Operator" in toString
        "codegen": re.search(r"\*\(\d+\)", plan) is not None,
        "pushed_filters": pushed,
        "scans": scans,
        "narrow_reads": narrow,
        "broadcasts": plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoop"),
        "smj": plan.count("SortMergeJoin"),
        "exchanges": len(re.findall(r"Exchange (hash|range|Single)", plan)),
        "topk": "TakeOrderedAndProject" in plan,
        "python": ("ArrowEvalPython" in plan)
        or ("BatchEvalPython" in plan)
        or ("MapInPandas" in plan)
        or ("FlatMapGroupsInPandas" in plan),
        "single_task_python": _single_task_python(plan),
        "global_window_unagg": _global_window_unaggregated(plan),
    }


#: One plan-tree line: Spark renders depth with 3-char branch prefixes
#: (``+- ``, ``:- ``, ``:  ``, ``   ``); depth = prefix length // 3.
_TREE_PREFIX = re.compile(r"^((?:\+- |:- |:  |   )*)(.*)$")

#: A partition-moving (shuffle) exchange — BroadcastExchange is NOT one:
#: it replicates its own (small) subtree and does nothing to the probe
#: side's partitioning (r10 ADVICE).
_SHUFFLE_EXCHANGE = re.compile(
    r"Exchange (hash|range|roundrobin|Single)", re.IGNORECASE
)


def _tree_lines(plan: str) -> list[tuple[int, str]]:
    """Plan string → [(depth, node text), ...]."""
    out = []
    for line in plan.splitlines():
        m = _TREE_PREFIX.match(line)
        out.append((len(m.group(1)) // 3, m.group(2)))
    return out


def _subtree(lines: list[tuple[int, str]], i: int):
    """Yield the lines of node i's OWN child subtree (strictly deeper
    lines until the first line at node i's depth or shallower — a
    join's sibling branch prints below but not deeper, so it is
    correctly excluded; r10 ADVICE: the flat 'anything textually below'
    scan let an exchange in the OTHER join branch satisfy the
    invariant)."""
    d = lines[i][0]
    for j in range(i + 1, len(lines)):
        if lines[j][0] <= d:
            return
        yield lines[j]


def _single_task_python(plan: str) -> bool:
    """True when any Python/Arrow stage sits directly on a compact scan
    with no shuffle exchange or cached relation below it — the kernel
    then runs on however many partitions the file split produced, which
    for a bench-SF parquet is ONE task (r10 audit: the progressive-JPEG
    query was 6.2 s of single-core Python behind a 6.4 s total; five
    more operator families had the same shape).  At 100 TB inputs
    arrive multi-partition, so the fix — ``fan_out`` at the producer —
    no-ops there; this invariant exists so the single-task shape can
    never silently return.

    r11 (r10 ADVICE): the check walks the Python node's OWN child
    subtree by indentation, so an exchange in a join's sibling branch
    no longer satisfies it, and BroadcastExchange (which never
    repartitions the probe side) does not count.  InMemoryTableScan
    still counts as sufficient: every track_persist'ed table in this
    repo caches an already-fanned-out derivation, and the cached plan
    is not rendered here to inspect."""
    lines = _tree_lines(plan)
    for i, (_d, text) in enumerate(lines):
        if re.search(r"MapInPandas|ArrowEvalPython|FlatMapGroupsInPandas", text):
            skip_deeper_than = None  # inside a BroadcastExchange subtree
            for d2, t2 in _subtree(lines, i):
                if skip_deeper_than is not None:
                    if d2 > skip_deeper_than:
                        continue
                    skip_deeper_than = None
                if "BroadcastExchange" in t2:
                    # the build side replicates; an exchange inside it
                    # says nothing about the streaming side's partitions
                    skip_deeper_than = d2
                    continue
                if _SHUFFLE_EXCHANGE.search(t2) or "InMemoryTableScan" in t2:
                    break
            else:
                return True
    return False


def _global_window_unaggregated(plan: str) -> bool:
    """True when a Window (or WindowGroupLimit) runs over an Exchange
    SinglePartition whose input was not first aggregated / limited —
    the JVM twin of the single-task-Python shape (VERDICT r10 item 5):
    every row funnels through ONE task's sort buffer.  A global window
    over an already-aggregated or top-k-limited input is the sanctioned
    pattern (privacy equivalence classes, BM25 post-limit scoring) and
    passes."""
    lines = _tree_lines(plan)
    for i, (_d, text) in enumerate(lines):
        if not re.match(r"(\*\(\d+\) )?Window", text):
            continue
        for j, (d2, t2) in enumerate(_subtree(lines, i), start=i + 1):
            if re.search(r"Exchange (hash|range|roundrobin)", t2, re.IGNORECASE):
                break  # partitioned window — fine
            if "Exchange SinglePartition" in t2:
                for _d3, t3 in _subtree(lines, j):
                    if re.search(
                        r"HashAggregate|SortAggregate|ObjectHashAggregate"
                        r"|TakeOrderedAndProject|CollectLimit|GlobalLimit"
                        r"|LocalLimit",
                        t3,
                    ):
                        break  # shrunk input — sanctioned
                else:
                    return True
                break
    return False


_ROW_RE = re.compile(
    r"^\| `([^`]+)`(?: \^)? \| ([✓✗]) \| (\d+) \| (\d+) \| ([✓✗]) "
    r"\| (\d+) \| (\d+) \| (\d+) \| (✓|—) \| (yes|—) \|$"
)


def _committed_baseline() -> dict[str, dict]:
    """Parse the full-registry table out of HEAD's PLANS.md."""
    import subprocess

    text = subprocess.run(
        ["git", "-C", REPO, "show", "HEAD:PLANS.md"],
        capture_output=True, text=True, check=True,
    ).stdout
    # rows after the '## Full-registry audit' heading are the inventory;
    # rows before it are the curated table (same probe values — both
    # parse fine, the inventory simply overwrites on duplicate names)
    base: dict[str, dict] = {}
    for line in text.splitlines():
        m = _ROW_RE.match(line.strip())
        if m:
            base[m.group(1)] = {
                "scans": int(m.group(4)),
                "exchanges": int(m.group(8)),
                "python": m.group(10) == "yes",
            }
    if not base:
        raise RuntimeError("no parsable rows in committed PLANS.md")
    return base


def check(allow: set[str]) -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    base = _committed_baseline()
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    from hotdog_spark.queries import bench_only_queries

    queries.update(bench_only_queries())
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    regressions, new, waived, errors = [], [], [], []
    for name in sorted(queries):
        if name in allow:
            waived.append(name)
            continue
        try:
            a = audit_one(spark, name, queries[name], sf_dir)
        except Exception as e:  # noqa: BLE001 — a now-unplannable query is a regression too
            errors.append(f"{name}: plan build failed: {type(e).__name__}: {e}")
            continue
        if name not in base:
            new.append(name)
            # no baseline to diff against, but the absolute invariant
            # still applies to brand-new queries
            if a.get("single_task_python"):
                regressions.append(
                    f"{name}: Python stage runs single-task "
                    "(no exchange below it; new query)"
                )
            if a.get("global_window_unagg"):
                regressions.append(
                    f"{name}: global Window over unaggregated input "
                    "(Exchange SinglePartition; new query)"
                )
            continue
        b = base[name]
        msgs = []
        if a["exchanges"] > b["exchanges"]:
            msgs.append(f"exchanges {b['exchanges']} -> {a['exchanges']}")
        if a["scans"] > b["scans"]:
            msgs.append(f"scans {b['scans']} -> {a['scans']}")
        if a["python"] and not b["python"]:
            msgs.append("Python stage appeared in a previously JVM-only plan")
        # absolute invariant, not baseline-relative: no Python kernel may
        # run on an unexchanged compact scan (single-task at bench SFs)
        if a.get("single_task_python"):
            msgs.append("Python stage runs single-task (no exchange below it)")
        # absolute invariant (VERDICT r10 item 5): a global window over
        # unaggregated input funnels every row through one sort task
        if a.get("global_window_unagg"):
            msgs.append(
                "global Window over unaggregated input (Exchange SinglePartition)"
            )
        if msgs:
            regressions.append(f"{name}: " + "; ".join(msgs))
    spark.stop()
    print(
        f"plan check: {len(base)} baseline rows, {len(queries)} registered, "
        f"{len(new)} new (no baseline), {len(waived)} waived, "
        f"{len(regressions)} regressions, {len(errors)} errors"
    )
    for n in waived:
        print(f"  WAIVED {n} (intentional change — regenerate PLANS.md)")
    for r in regressions:
        print(f"  PLAN REGRESSION {r}")
    for e in errors:
        print(f"  ERROR {e}")
    return 1 if (regressions or errors) else 0


def main() -> None:
    if "--check" in sys.argv:
        i = sys.argv.index("--allow") if "--allow" in sys.argv else -1
        allow = set()
        if i >= 0 and i + 1 < len(sys.argv):
            allow = {n for n in sys.argv[i + 1].split(",") if n}
        allow |= {
            n for n in os.environ.get("SPARK_GRAFT_PLAN_ALLOW", "").split(",") if n
        }
        sys.exit(check(allow))

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # AQE wraps the plan in AdaptiveSparkPlan(isFinalPlan=false), which
        # hides WholeStageCodegen spans from toString until execution; the
        # audit inspects the static plan (same operators, visible codegen).
        .config("spark.sql.adaptive.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    from hotdog_spark.queries import bench_only_queries

    queries.update(bench_only_queries())
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    lines = [
        "# PLANS — physical-plan audit (generated by scripts/plan_audit.py)",
        "",
        f"Scale dir: `{sf_dir}`.  Columns: WSCG = whole-stage codegen present;",
        "pushed = scans with non-empty PushedFilters; reads≤12 = every scan's",
        "ReadSchema is a pruned column set; bcast/smj = broadcast vs sort-merge",
        "joins; exch = data shuffles (hash/range exchanges — the round-robin",
        "exchange `fan_out` adds to parallelize compact LOCAL inputs is excluded",
        "deliberately: at 100 TB inputs arrive multi-partition and it no-ops);",
        "Py = any Python/Arrow stage in plan.",
        "",
        "| query | intent | WSCG | pushed | scans | reads≤12 | bcast | smj | exch | top-k | Py |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name, intent in AUDIT:
        a = audit_one(spark, name, queries[name], sf_dir)
        lines.append(
            f"| `{name}` | {intent} | {'✓' if a['codegen'] else '✗'} "
            f"| {a['pushed_filters']} | {a['scans']} "
            f"| {'✓' if a['narrow_reads'] else '✗'} | {a['broadcasts']} "
            f"| {a['smj']} | {a['exchanges']} "
            f"| {'✓' if a['topk'] else '—'} | {'yes' if a['python'] else '—'} |"
        )
    lines += [
        "",
        "Expectations: the cascade (`hotdog_route_payload`) must show 1 scan /",
        "0 exchanges / no Python (merge fast path); the ONLY sanctioned Python",
        "stages are Arrow-batched kernels where Catalyst can't express the",
        "semantics — `merge_exact_deep`'s deep-merge UDF, full-JMESPath, and",
        "the multimodal mapInPandas codecs (`multimodal_media_sniff` above);",
        "`topk_orders_global` must plan TakeOrderedAndProject, never a global",
        "sort.",
        "",
        "Skew note (`dedup_ngram_jaccard`): the token join carries a per-block",
        "document-frequency cap (max_df) — tokens in > max_df same-block docs",
        "leave the token universe before the join, removing both the hot",
        "shuffle partition and the O(df²) pair blowup a ubiquitous token",
        "(\"the\") would cause at 100 TB.  The over-cap list is ≤",
        "total_tokens/max_df entries, so it rides a broadcast anti-join;",
        "the DuckDB oracle applies the identical cap, keeping the hash match",
        "exact by construction.",
        "",
    ]

    # ---- complete inventory: EVERY registered query, compact columns ----
    lines += [
        "## Full-registry audit (every `queries()` entry)",
        "",
        "Same probes as above, no curated intent column — the complete plan",
        "inventory so no query's physical shape goes unreviewed.  Queries",
        "whose plan cannot be built statically (e.g. ones that materialize",
        "an index first) report `n/a`.",
        "",
        "| query | WSCG | pushed | scans | reads≤12 | bcast | smj | exch | top-k | Py |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    curated = {n for n, _ in AUDIT}
    for name in sorted(queries):
        try:
            a = audit_one(spark, name, queries[name], sf_dir)
        except Exception as e:  # plan construction needs runtime state
            lines.append(f"| `{name}` | n/a ({type(e).__name__}) | | | | | | | | |")
            continue
        mark = "" if name not in curated else " ^"
        lines.append(
            f"| `{name}`{mark} | {'✓' if a['codegen'] else '✗'} "
            f"| {a['pushed_filters']} | {a['scans']} "
            f"| {'✓' if a['narrow_reads'] else '✗'} | {a['broadcasts']} "
            f"| {a['smj']} | {a['exchanges']} "
            f"| {'✓' if a['topk'] else '—'} | {'yes' if a['python'] else '—'} |"
        )
    lines += ["", "`^` = also in the curated table above with its intent.", ""]
    out = os.path.join(REPO, "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
