"""North-rule launch contract: the checkpointed suite run must work
under REAL ``spark-submit --py-files ges.zip`` — engine imported from
the zip (no repo on sys.path), resumable by re-running the same
command. One spark-submit JVM boot per test run keeps this affordable;
the resume re-run reuses the same subprocess pattern.

Reference anchor: great_expectations runs validations via its own
CLI/checkpoint machinery (great_expectations/checkpoint/checkpoint.py);
the Spark-native equivalent is a spark-submit batch job.
"""

import json
import os
import subprocess
import sys
import zipfile

import great_expectations_spark as ges
from great_expectations_spark.data.images import images_df

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_zip(dest: str) -> str:
    """Zip the package the way the README tells users to
    (zip -r ges.zip great_expectations_spark)."""
    pkg = os.path.join(REPO, "great_expectations_spark")
    zpath = os.path.join(dest, "ges.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return zpath


def _submit(script, zpath, cwd, *args):
    env = {
        k: v for k, v in os.environ.items() if k != "PYTHONPATH"
    }
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    return subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            script,
            *args,
        ],
        cwd=cwd,  # NOT the repo: import must resolve from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )


def _json_lines(stdout: str):
    """The CLI prints two JSON lines (statistics, meta); Spark can
    interleave its own stdout noise, so keep only parseable lines."""
    out = []
    for line in stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                out.append(json.loads(line))
            except ValueError:
                pass
    return out


def test_spark_submit_pyfiles_run_and_resume(spark, tmp_path):
    table = str(tmp_path / "images")
    images_df(spark, n_rows=2000, seed=7).write.partitionBy(
        "fmt"
    ).parquet(table)

    suite = (
        ges.suite("submit")
        .expect("expect_column_values_to_not_be_null", column="caption",
                mostly=0.99)
        .expect("expect_column_mean_to_be_between", column="w",
                min_value=8, max_value=40)
        .expect("expect_column_values_to_be_unique", column="image_id",
                mostly=0.99)
    )
    suite_path = str(tmp_path / "suite.json")
    suite.save(suite_path)

    zpath = _build_zip(str(tmp_path))
    # the driver script is also copied out of the repo so nothing on
    # the submit side can shadow the zip import
    script = str(tmp_path / "submit_checkpoint.py")
    with open(os.path.join(REPO, "tools", "submit_checkpoint.py")) as f:
        body = f.read()
    with open(script, "w") as f:
        f.write(body)

    state = str(tmp_path / "state")
    args = (
        "--table", table, "--suite", suite_path,
        "--state-dir", state, "--run-id", "sub1",
        "--group-col", "fmt",
    )
    first = _submit(script, zpath, str(tmp_path), *args)
    assert first.returncode == 0, first.stderr[-4000:]
    stats, meta = _json_lines(first.stdout)[-2:]
    assert stats["evaluated_expectations"] == 3
    assert meta["groups_computed"] > 0 and meta["groups_resumed"] == 0

    result_json = os.path.join(state, "run=sub1", "result.json")
    assert os.path.exists(result_json)
    assert os.path.isdir(os.path.join(state, "run=sub1", "lineage.parquet"))
    assert os.path.isdir(os.path.join(state, "run=sub1", "metrics.parquet"))

    # re-running the SAME command resumes: no group recomputed
    second = _submit(script, zpath, str(tmp_path), *args)
    assert second.returncode == 0, second.stderr[-4000:]
    meta2 = _json_lines(second.stdout)[-1]
    assert meta2["groups_computed"] == 0
    assert meta2["groups_resumed"] == meta["groups_total"]
