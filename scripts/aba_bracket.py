"""Per-query ABA bracket (the BENCH_INVESTIGATION_r08 methodology,
applied on demand): is a paired-run outlier on UNTOUCHED code a real
regression or window drift?

Three legs run back-to-back in one quiet window, each in a FRESH
process (the E3 lesson: resident-JVM placement effects dominate
in-process comparisons):

    leg1: HEAD code          — median of N reps per query
    leg2: <baseline ref>     — same, from a temporary git worktree
    leg3: HEAD code again    — same

If leg3/leg1 (identical code) spreads as much as leg1/leg2, the outlier
is window drift; a real regression shows BOTH head legs sitting above
the baseline leg by the disputed ratio.

    python scripts/aba_bracket.py --queries q1,q2 --baseline cbe7877 \
        --reps 7 --out BENCH_ABA_r9.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_LEG_PROG = r"""
import json, os, sys, time
repo = sys.argv[1]
sys.path.insert(0, repo)
names = sys.argv[2].split(",")
reps = int(sys.argv[3])
sf_dir = sys.argv[4]

from pyspark.sql import SparkSession
spark = (SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
         .appName("aba-leg")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as mod
qs = mod.queries()
try:
    from hotdog_spark.operators import release_tracked_persists
except Exception:
    release_tracked_persists = lambda: None

out = {}
for name in names:
    fn = qs[name]
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
    release_tracked_persists()
    times = []
    for _ in range(reps):
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        times.append(time.time() - t0)
        release_tracked_persists()
    out[name] = times
print("LEGRESULT " + json.dumps(out))
spark.stop()
"""


def run_leg(repo: str, names: list[str], reps: int, sf_dir: str) -> dict:
    r = subprocess.run(
        [sys.executable, "-c", _LEG_PROG, repo, ",".join(names),
         str(reps), sf_dir],
        capture_output=True, text=True, timeout=3600,
    )
    for line in r.stdout.splitlines():
        if line.startswith("LEGRESULT "):
            return json.loads(line[len("LEGRESULT "):])
    raise RuntimeError(
        f"leg failed rc={r.returncode}: {r.stderr.strip().splitlines()[-3:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--baseline", required=True,
                    help="git ref for the B leg (e.g. the prior round head)")
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_ABA.json"))
    args = ap.parse_args()
    names = [n for n in args.queries.split(",") if n]

    wt = tempfile.mkdtemp(prefix="aba_baseline_")
    subprocess.run(["git", "-C", REPO, "worktree", "add", "--detach",
                    wt, args.baseline], check=True, capture_output=True)
    try:
        legs = {
            "leg1_head": run_leg(REPO, names, args.reps, args.sf_dir),
            "leg2_baseline": run_leg(wt, names, args.reps, args.sf_dir),
            "leg3_head": run_leg(REPO, names, args.reps, args.sf_dir),
        }
    finally:
        subprocess.run(["git", "-C", REPO, "worktree", "remove", "--force",
                        wt], capture_output=True)

    med = {
        leg: {n: round(statistics.median(ts), 3) for n, ts in d.items()}
        for leg, d in legs.items()
    }
    verdicts = {}
    for n in names:
        l1, l2, l3 = (med["leg1_head"][n], med["leg2_baseline"][n],
                      med["leg3_head"][n])
        same_code_spread = max(l1, l3) / min(l1, l3)
        head_vs_base = ((l1 + l3) / 2) / l2
        # a real regression: both head legs above baseline by more than
        # the same-code spread; anything else is window drift
        real = (min(l1, l3) / l2) > same_code_spread
        verdicts[n] = {
            "leg1_head_s": l1, "leg2_baseline_s": l2, "leg3_head_s": l3,
            "same_code_spread": round(same_code_spread, 3),
            "head_vs_baseline": round(head_vs_base, 3),
            "verdict": "REGRESSION" if real else "window-drift noise",
        }
    payload = {
        "methodology": "BENCH_INVESTIGATION_r08.md E3: fresh-process ABA, "
                       "median-of-N per query per leg, one quiet window",
        "baseline_ref": args.baseline,
        "reps_per_leg": args.reps,
        "sf_dir": args.sf_dir,
        "medians": med,
        "raw": legs,
        "verdicts": verdicts,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"out": args.out, "verdicts": verdicts}))


if __name__ == "__main__":
    main()
