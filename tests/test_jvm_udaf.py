"""O(K) violation buffer (tools/jvm CappedCollect): when the jar is
on the session classpath the single-pass plan aggregates violation
samples with a capped JVM buffer instead of slice(collect_list) —
results must be byte-identical to the fallback, and sessions without
the jar must silently keep the fallback (the availability probe must
never raise)."""

import os
import shutil
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = textwrap.dedent(
    """
    import json, sys
    from pyspark.sql import SparkSession

    jar = sys.argv[1]
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.jars", jar)
        .config("spark.driver.extraClassPath", jar)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import great_expectations_spark as ges
    from great_expectations_spark.data.images import images_df
    from great_expectations_spark.plans import single_pass as sp

    df = images_df(spark, n_rows=3000, seed=42).repartition(8)
    suite = (
        ges.suite("rich")
        .expect("expect_column_values_to_be_in_set", column="fmt",
                value_set=["jpeg", "png", "webp"], mostly=0.99)
        .expect("expect_column_values_to_be_between", column="w",
                min_value=1, max_value=64)
        .expect("expect_column_value_lengths_to_be_between",
                column="caption", min_value=1, max_value=200,
                mostly=0.99)
    )
    def run():
        r = ges.SparkValidator(
            df, suite, strategy="single_pass",
            result_format={"result_format": "COMPLETE"},
        ).validate()
        return [
            {"success": e.success, "result": e.result} for e in r.results
        ]

    jvm = run()
    key = sp._session_key(spark)
    used_jvm = sp._JVM_UDAF_AVAILABLE.get(key)
    sp._JVM_UDAF_AVAILABLE[key] = False  # force fallback
    fb = run()
    print(json.dumps({
        "used_jvm": used_jvm,
        "equal": jvm == fb,
        "counts": [e["result"]["unexpected_count"] for e in jvm],
    }, default=str))
    """
)


@pytest.mark.skipif(
    shutil.which("javac") is None, reason="javac not available"
)
def test_capped_collect_udaf_equivalence(tmp_path):
    jar_dir = str(tmp_path / "jar")
    out = subprocess.run(
        ["sh", os.path.join(REPO, "tools", "jvm", "build.sh"), jar_dir],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    jar = os.path.join(jar_dir, "ges-spark-udaf.jar")
    assert os.path.exists(jar)

    run = subprocess.run(
        [sys.executable, "-c", _CHILD, jar],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=600,
    )
    assert run.returncode == 0, run.stderr[-3000:]
    import json

    got = json.loads(run.stdout.strip().splitlines()[-1])
    assert got["used_jvm"] is True, "jar on classpath but UDAF unused"
    assert got["equal"] is True, "JVM capped collect != fallback EVRs"
    # the synthetic table injects defects — the sample must be real
    assert any(c > 0 for c in got["counts"])


def test_no_jar_probe_is_silent_and_memoized(spark):
    """Without the jar, the availability probe returns the fallback
    expression and memoizes False for the session."""
    from pyspark.sql import functions as F

    from great_expectations_spark.plans import single_pass as sp

    sp._JVM_UDAF_AVAILABLE.pop(sp._session_key(spark), None)
    expr = sp.violation_collect_expr(
        spark, F.col("v") > 1, F.col("v").cast("string"), 5, "s"
    )
    assert sp._JVM_UDAF_AVAILABLE.get(sp._session_key(spark)) is False
    df = spark.createDataFrame([(i,) for i in range(10)], "v int")
    row = df.groupBy().agg(expr).first()
    assert row["s"] == [str(i) for i in range(2, 7)]
