"""Capture ``explain("formatted")`` for named queries into plans/r{N}/.

Used to (re)generate the committed before/after plan evidence the round
deliverables require:

    python scripts/capture_plans.py --queries a,b --suffix after \
        --outdir plans/r11 [--repo /path/to/worktree]

``--repo`` points at the source tree whose plans to capture (a git
worktree of the baseline commit for the ``before`` leg); the output
always lands in THIS repo's ``--outdir``.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROG = r"""
import os, sys
repo = sys.argv[1]
sys.path.insert(0, repo)
names = sys.argv[2].split(",")
outdir = sys.argv[3]
suffix = sys.argv[4]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import SparkSession
spark = (SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
         .appName("capture-plans")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as mod
qs = mod.queries()
for name in names:
    df = qs[name](spark, sf_dir)
    text = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
        fh.write("== Physical Plan ==\n" if not text.startswith("==")
                 else "")
        fh.write(text)
    print(f"captured {name}_{suffix}.txt")
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--suffix", required=True, choices=["before", "after"])
    ap.add_argument("--outdir", default=os.path.join(HERE, "plans", "r11"))
    ap.add_argument("--repo", default=HERE,
                    help="source tree to capture from (default: this repo)")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    r = subprocess.run(
        [sys.executable, "-c", _PROG, args.repo, args.queries,
         os.path.abspath(args.outdir), args.suffix],
        timeout=1800,
    )
    sys.exit(r.returncode)


if __name__ == "__main__":
    main()
