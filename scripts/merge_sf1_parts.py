"""Merge per-batch sf1 sweep partials into SCALE_sf1_correctness.json —
the sf1 counterpart of merge_sf10_parts.py, with the same staleness
guards: commit-hash provenance per entry, registry-dropped queries
removed rather than persisted as phantom rows.  Partials are
verify_sf1.py --only outputs at /tmp/sf1_part_*.json.
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

OUT = os.path.join(REPO, "SCALE_sf1_correctness.json")

merged: dict = {}
if os.path.exists(OUT):
    with open(OUT) as f:
        for k, v in json.load(f).get("queries", {}).items():
            v.setdefault("commit", "pre-r7-unstamped")
            merged[k] = v
for p in sorted(glob.glob("/tmp/sf1_part_*.json")):
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

statuses = [v.get("status") for v in merged.values()]
out = {
    "sf": 1.0,
    "mode": "full",
    "checked": sum(s in ("match", "MISMATCH", "error") for s in statuses),
    "matched": statuses.count("match"),
    "mismatched_or_error": sorted(
        k for k, v in merged.items() if v.get("status") in ("MISMATCH", "error")
    ),
    "rows_only": sorted(
        k for k, v in merged.items() if v.get("status") == "rows_only"
    ),
    "dropped_stale": dropped,
    "notes": (
        "Full-mode (exact sorted-row) Spark-vs-DuckDB comparison at sf1. "
        "Each row's `commit` is the repo HEAD when it was recorded; "
        "'pre-r7-unstamped' marks rows inherited from before provenance "
        "stamping landed."
    ),
    "queries": {k: merged[k] for k in sorted(merged)},
}
with open(OUT, "w") as f:
    json.dump(out, f, indent=1)
print(f"merged {len(merged)} queries: {out['matched']} matched, "
      f"{len(out['mismatched_or_error'])} bad, rows_only: {out['rows_only']}, "
      f"dropped stale: {dropped}")
