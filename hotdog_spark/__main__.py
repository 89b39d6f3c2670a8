"""CLI entry point mirroring the reference's interface
(reference: src/main.rs:88-154):

    python -m hotdog_spark -c config.yml                # daemon mode
    python -m hotdog_spark -c config.yml -t file.log    # test (dry-run) mode
    python -m hotdog_spark --explain <query> [--sf DIR] # physical plan dump
    python -m hotdog_spark --list-queries               # registered queries

Daemon mode starts the configured source → parse → cascade → sink stream
and blocks until Ctrl-C, which drains the in-flight micro-batch before
exiting (the reference's SIGINT final flush, src/serve/mod.rs:124-134).
Test mode prints which `field: msg` rules match each line of the file,
byte-format-compatible with `hotdog -t` (src/rules.rs:16-57).
"""

from __future__ import annotations

import argparse
import sys


def _build_session(app: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName(app)
        .config("spark.sql.adaptive.enabled", "true")
        # epoch_us/epoch_s NTZ->LTZ casts rely on a UTC session zone
        # (operators/__init__.py); every entrypoint must pin it.
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def test_mode_report(
    spark, settings, file_name: str, limit: int | None = None
) -> list[str]:
    """The dry-run report as lines of text (reference output format:
    'Line N matches on:' / '\\t - <matcher>').  ``limit`` bounds the
    driver-side collect so the CLI stays safe against an arbitrarily
    large log file: the report covers the FIRST ``limit`` lines and
    appends a truncation summary with the total line count (computed
    distributed, not collected)."""
    from hotdog_spark.plans.compiler import dry_run
    from hotdog_spark.sources.batch import read_log_file

    df = read_log_file(spark, file_name)
    report = dry_run(df, settings).orderBy("line_no")
    out = []
    truncated = False
    if limit is not None:
        total = report.count()
        truncated = total > limit
        report = report.limit(limit)
    for row in report.collect():
        if row.matchers:
            out.append(f"Line {row.line_no} matches on:")
            out.extend(f"\t - {m}" for m in row.matchers)
    if truncated:
        out.append(
            f"... report truncated at --limit {limit} of {total} lines"
        )
    return out


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="hotdog_spark", description="PySpark-native hotdog engine"
    )
    parser.add_argument("-c", "--config", help="YAML rules file")
    parser.add_argument("-t", "--test", help="log file to dry-run the rules against")
    parser.add_argument(
        "--limit",
        type=int,
        default=10_000,
        help="max lines collected for the -t report (0 = unlimited); the"
        " total line count is still computed distributed",
    )
    parser.add_argument(
        "--explain",
        metavar="QUERY",
        help="print a registered query's formatted physical plan and exit",
    )
    parser.add_argument(
        "--list-queries",
        action="store_true",
        help="list the registered driver-contract queries and exit",
    )
    parser.add_argument(
        "--sf",
        default="/root/testdata/sf0.001",
        help="scale-factor directory for --explain (default: sf0.001)",
    )
    parser.add_argument(
        "--source",
        default="syslog",
        choices=["syslog", "socket", "file", "kafka", "rate"],
        help="streaming source kind for daemon mode (default: native TCP/TLS listener)",
    )
    parser.add_argument("--checkpoint", default="/tmp/hotdog_spark_ckpt")
    parser.add_argument(
        "--source-opt",
        action="append",
        default=[],
        metavar="K=V",
        help="source option, repeatable (e.g. --source-opt path=/logs)",
    )
    args = parser.parse_args(argv)

    if args.list_queries or args.explain:
        from hotdog_spark.queries import all_queries

        queries = all_queries()
        if args.list_queries:
            for name in sorted(queries):
                print(name)
            return 0
        if args.explain not in queries:
            print(f"unknown query {args.explain!r}; try --list-queries", file=sys.stderr)
            return 2
        spark = _build_session("hotdog-spark-explain")
        try:
            queries[args.explain](spark, args.sf).explain("formatted")
        finally:
            spark.stop()
        return 0

    if not args.config:
        parser.error("-c/--config is required for daemon and test modes")

    from hotdog_spark.config import load

    settings = load(args.config)

    if args.test:
        spark = _build_session("hotdog-spark-test")
        limit = args.limit if args.limit > 0 else None
        for line in test_mode_report(spark, settings, args.test, limit=limit):
            print(line)
        spark.stop()
        return 0

    from hotdog_spark.streaming.runner import graceful_stop, run_from_config

    spark = _build_session("hotdog-spark")
    opts = dict(kv.split("=", 1) for kv in args.source_opt)
    query = run_from_config(
        spark, settings, checkpoint_dir=args.checkpoint, source_kind=args.source, **opts
    )
    try:
        query.awaitTermination()
    except KeyboardInterrupt:
        print("interrupt received, draining...", file=sys.stderr)
        graceful_stop(query)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
