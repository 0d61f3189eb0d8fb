"""Batch readers (dispatch, schema rules) and the profile -> baseline
-> generated-suite -> drift pipeline."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

import great_expectations_spark as ges
from great_expectations_spark.profile import (
    load_baseline,
    profile_table,
    save_baseline,
    suite_from_baseline,
)
from great_expectations_spark.sources.iceberg import iceberg_available
from great_expectations_spark.sources.readers import (
    infer_reader_method,
    read_batch,
)


def test_reader_dispatch(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 3).cast("int").alias("k")
    )
    pq = str(tmp_path / "t.parquet")
    df.write.parquet(pq)
    csv = str(tmp_path / "t.csv")
    df.write.option("header", "true").csv(csv)

    assert read_batch(spark, path=pq).count() == 100
    assert infer_reader_method("x/y.tsv") == "tsv"
    assert infer_reader_method("warehouse/tbl") == "parquet"

    got = read_batch(spark, path=csv, reader_method="csv")
    assert got.count() == 100

    st = StructType(
        [StructField("id", IntegerType()), StructField("k", IntegerType())]
    )
    typed = read_batch(spark, path=csv, reader_method="csv", schema=st)
    assert [f.dataType for f in typed.schema.fields] == [
        IntegerType(),
        IntegerType(),
    ]
    # dict schema accepted
    read_batch(spark, path=csv, reader_method="csv", schema=st.jsonValue())
    # string schema rejected like the reference
    with pytest.raises(ValueError, match="string schemas"):
        read_batch(spark, path=csv, reader_method="csv", schema="id INT")
    # runtime df passthrough
    assert read_batch(spark, df=df) is df
    with pytest.raises(ValueError):
        read_batch(spark, df=df, path=pq)


def test_iceberg_gated(spark):
    # jars absent in this container: capability must report False and
    # entry points must fail with the capability message, not ImportError
    assert iceberg_available(spark) is False
    from great_expectations_spark.sources.iceberg import read_table

    with pytest.raises(RuntimeError, match="Iceberg runtime not available"):
        read_table(spark, "db.tbl")


def test_profile_baseline_suite_roundtrip(spark, tmp_path):
    df = spark.range(2000).select(
        F.col("id"),
        (F.rand(7) * 100).alias("x"),
        F.concat(F.lit("cat_"), (F.col("id") % 4).cast("string")).alias(
            "c"
        ),
        F.when(F.col("id") % 50 == 0, None)
        .otherwise(F.concat(F.lit("t"), F.col("id").cast("string")))
        .alias("s"),
    )
    baseline = profile_table(df)
    cols = baseline["columns"]
    assert baseline["row_count"] == 2000
    assert cols["x"]["min"] >= 0 and cols["x"]["max"] <= 100
    assert "partition" in cols["x"]  # continuous partition object
    assert cols["c"]["partition"]["values"] == [
        "cat_0", "cat_1", "cat_2", "cat_3"
    ]
    assert abs(sum(cols["c"]["partition"]["weights"]) - 1.0) < 1e-9
    assert cols["s"]["null_fraction"] == pytest.approx(0.02, abs=1e-6)

    p = str(tmp_path / "baseline.json")
    save_baseline(baseline, p)
    loaded = load_baseline(p)
    assert loaded["columns"].keys() == cols.keys()

    # generated suite validates the SAME data green
    suite = suite_from_baseline(loaded, drift="psi")
    types = [e.expectation_type for e in suite.expectations]
    assert "expect_column_psi_to_be_less_than" in types
    assert "expect_column_values_to_be_in_set" in types
    res = ges.validate(df, suite, result_format="BASIC")
    failed = [
        r.expectation_config.expectation_type
        for r in res.results
        if not r.success
    ]
    assert res.success, failed

    # drifted data (shifted distribution) must trip the PSI check
    drifted = df.withColumn("x", F.col("x") + 60)
    res2 = ges.validate(drifted, suite, result_format="BASIC")
    failed_types = {
        (r.expectation_config.expectation_type,
         r.expectation_config.kwargs.get("column"))
        for r in res2.results
        if not r.success
    }
    assert ("expect_column_psi_to_be_less_than", "x") in failed_types
