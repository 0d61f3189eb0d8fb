"""spark-submit entrypoint for checkpointed suite runs.

Production launch (package shipped to executors via --py-files;
spark-submit takes a script file, so use the thin driver):

    zip -r ges.zip great_expectations_spark
    spark-submit --py-files ges.zip tools/submit_checkpoint.py \\
        --table ... --suite ... --state-dir ... --run-id ...

Local/dev launch (plain Python, same flags):

    python -m great_expectations_spark.checkpoint \\
        --table /data/images_table \\
        --suite suite.json \\
        --state-dir /data/_validation_state \\
        --run-id nightly-2026-08-17 \\
        --group-col fmt

Re-running the same command after a failure resumes: completed
partition groups are skipped (their committed state files are the
resume log), the input fingerprint is verified against the pinned
batch, and the final result/lineage/metrics are (re)written.

Exit code: 0 when the suite succeeds, 2 when validation ran but
failed expectations, 1 on error.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="great_expectations_spark.checkpoint",
        description="Resumable checkpointed expectation-suite run",
    )
    ap.add_argument("--table", required=True, help="input table path (parquet)")
    ap.add_argument("--suite", required=True, help="suite JSON file")
    ap.add_argument("--state-dir", required=True, help="checkpoint state dir")
    ap.add_argument("--run-id", required=True)
    ap.add_argument(
        "--group-col",
        default=None,
        help="partition-group column (e.g. the table's physical "
        "partition column) for group-grained resume",
    )
    ap.add_argument("--result-format", default="SUMMARY")
    ap.add_argument(
        "--base-run-id",
        default=None,
        help="incremental mode: validate only the files appended "
        "since this completed run, merging with its persisted "
        "partials (append-only contract; fails loud on rewrites)",
    )
    ap.add_argument(
        "--master", default=None, help="override spark master (local dev)"
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from ..core.config import ExpectationSuite
    from .runner import CheckpointRunner

    builder = SparkSession.builder.appName(f"ges-checkpoint-{args.run_id}")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()
    try:
        suite = ExpectationSuite.load(args.suite)
        runner = CheckpointRunner(
            spark,
            table_path=args.table,
            suite=suite,
            state_dir=args.state_dir,
            run_id=args.run_id,
            group_col=args.group_col,
            result_format=args.result_format,
            base_run_id=args.base_run_id,
        )
        result = runner.run()
        print(json.dumps(result.statistics))
        print(json.dumps(result.meta, default=str))
        return 0 if result.success else 2
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
