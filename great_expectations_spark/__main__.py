"""Project CLI over the DataContext stores.

The reference ships ``great_expectations init / suite list /
checkpoint run / docs build`` (cli/ package). Same verbs here, over
the reduced DataContext (context.py):

    python -m great_expectations_spark init [--root DIR]
    python -m great_expectations_spark suite list|show NAME
    python -m great_expectations_spark checkpoint list
    python -m great_expectations_spark checkpoint run NAME \\
        --run-id RID [--base-run-id RID] [--master local[8]]
    python -m great_expectations_spark docs build

``--root`` defaults to ``$GES_ROOT`` or ``./ges_project``. Exit
codes match the flag-based runner (checkpoint/__main__.py): 0
success, 2 validation ran but failed expectations, 1 error. For
cluster launches keep using ``spark-submit --py-files ges.zip
tools/submit_checkpoint.py`` — this CLI is the named-store,
local-driver face of the same runner.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _default_root() -> str:
    return os.environ.get("GES_ROOT", os.path.join(os.getcwd(), "ges_project"))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="great_expectations_spark",
        description="Named-store project CLI (suites, checkpoints, docs)",
    )
    ap.add_argument("--root", default=None, help="project dir "
                    "(default: $GES_ROOT or ./ges_project)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("init", help="scaffold the project layout")

    p_suite = sub.add_parser("suite", help="suite store")
    suite_sub = p_suite.add_subparsers(dest="suite_cmd", required=True)
    suite_sub.add_parser("list")
    p_show = suite_sub.add_parser("show")
    p_show.add_argument("name")

    p_ckpt = sub.add_parser("checkpoint", help="checkpoint store")
    ckpt_sub = p_ckpt.add_subparsers(dest="ckpt_cmd", required=True)
    ckpt_sub.add_parser("list")
    p_run = ckpt_sub.add_parser("run")
    p_run.add_argument("name")
    p_run.add_argument("--run-id", required=True)
    p_run.add_argument("--base-run-id", default=None)
    p_run.add_argument("--master", default=None)

    p_docs = sub.add_parser("docs", help="data docs site")
    docs_sub = p_docs.add_subparsers(dest="docs_cmd", required=True)
    docs_sub.add_parser("build")

    args = ap.parse_args(argv)
    root = args.root or _default_root()

    from .context import DataContext

    try:
        if args.cmd == "init":
            ctx = DataContext.create(root)
            print(f"initialized project at {ctx.root_dir}")
            return 0

        ctx = DataContext(root)
        if args.cmd == "suite":
            if args.suite_cmd == "list":
                for name in ctx.list_suites():
                    print(name)
                return 0
            suite = ctx.get_suite(args.name)
            print(json.dumps(suite.to_json_dict(), indent=2, default=str))
            return 0

        if args.cmd == "checkpoint":
            if args.ckpt_cmd == "list":
                for name in ctx.list_checkpoints():
                    print(name)
                return 0
            from pyspark.sql import SparkSession

            # reuse a live session (embedding callers, tests); only
            # stop a session this command itself created
            preexisting = SparkSession.getActiveSession()
            builder = SparkSession.builder.appName(
                f"ges-{args.name}-{args.run_id}"
            )
            if args.master:
                builder = builder.master(args.master)
            spark = builder.getOrCreate()
            try:
                result = ctx.run_checkpoint(
                    args.name,
                    run_id=args.run_id,
                    spark=spark,
                    base_run_id=args.base_run_id,
                )
            finally:
                if preexisting is None:
                    spark.stop()
            stats = result.statistics
            print(
                json.dumps(
                    {
                        "checkpoint": args.name,
                        "run_id": args.run_id,
                        "success": result.success,
                        "statistics": stats,
                    },
                    default=str,
                )
            )
            return 0 if result.success else 2

        if args.cmd == "docs":
            print(ctx.build_data_docs())
            return 0
    except (FileNotFoundError, ValueError) as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 1
    return 1  # pragma: no cover - argparse enforces a subcommand


if __name__ == "__main__":
    sys.exit(main())
