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
from great_expectations_spark.data.images import images_df
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


def test_multibatch_profile_and_suite(spark):
    from great_expectations_spark.data.images import images_df
    from great_expectations_spark.profile import (
        profile_batches,
        suite_from_batches,
    )

    batches = [
        images_df(spark, n_rows=800, seed=s) for s in (1, 2, 3)
    ]
    mb = profile_batches(batches, columns=["w", "h", "caption", "fmt"])
    assert mb["n_batches"] == 3
    assert len(mb["batches"]) == 3
    wmean = mb["columns"]["w"]["mean"]
    assert len(wmean["values"]) == 3
    assert wmean["min"] <= wmean["mean"] <= wmean["max"]

    suite = suite_from_batches(mb)
    types = {e.expectation_type for e in suite.expectations}
    assert "expect_column_mean_to_be_between" in types
    assert "expect_column_values_to_be_between" in types

    # a fresh same-distribution batch passes every derived expectation
    fresh = images_df(spark, n_rows=800, seed=9)
    res = ges.validate(fresh, suite, result_format="BASIC")
    assert res.success, [
        (r.expectation_config.expectation_type,
         r.expectation_config.kwargs.get("column"), r.result)
        for r in res.results if not r.success
    ]

    # a shifted batch (w scaled 3x) must fail the w-range/mean checks
    shifted = fresh.withColumn("w", (F.col("w") * 3).cast("int"))
    res2 = ges.validate(shifted, suite, result_format="BASIC")
    failed_cols = {
        r.expectation_config.kwargs.get("column")
        for r in res2.results
        if not r.success
    }
    assert "w" in failed_cols


def test_bootstrap_estimator_suite_covers_held_out_batch(spark):
    from great_expectations_spark.data.images import images_df
    from great_expectations_spark.profile import (
        profile_batches,
        suite_from_batches,
    )

    batches = [
        images_df(spark, n_rows=800, seed=s) for s in (1, 2, 3, 4, 5)
    ]
    mb = profile_batches(batches, columns=["w", "h"])
    suite = suite_from_batches(mb, estimator="bootstrap", seed=7)
    types = {e.expectation_type for e in suite.expectations}
    assert "expect_column_mean_to_be_between" in types

    # deterministic: same seed → identical bounds
    suite_again = suite_from_batches(mb, estimator="bootstrap", seed=7)
    assert [e.kwargs for e in suite.expectations] == [
        e.kwargs for e in suite_again.expectations
    ]

    # bootstrap bounds cover a fresh same-distribution batch
    fresh = images_df(spark, n_rows=800, seed=11)
    res = ges.validate(fresh, suite, result_format="BASIC")
    assert res.success, [
        (r.expectation_config.expectation_type,
         r.expectation_config.kwargs.get("column"), r.result)
        for r in res.results if not r.success
    ]


def test_bootstrap_estimator_shrinks_outlier_batch_influence():
    """The property the reference buys with its bootstrap estimator
    (onboarding_data_assistant's default): one wild batch drags the
    'range' interval to its extremes, while the bootstrap quantile
    point estimate stays near the bulk of the batches."""
    from great_expectations_spark.profile import (
        bootstrap_quantile_range,
    )

    bulk = [10.0, 10.2, 9.9, 10.1, 10.0, 9.8, 10.3, 10.05]
    values = bulk + [40.0]  # one outlier batch
    lo, hi = bootstrap_quantile_range(
        values, false_positive_rate=0.2, seed=3
    )
    assert lo == pytest.approx(9.88, abs=0.5)
    # range estimator would put hi at 40; bootstrap keeps it near bulk
    assert hi < 15.0
    # with no outlier both estimators agree on the support
    lo2, hi2 = bootstrap_quantile_range(
        bulk, false_positive_rate=0.2, seed=3
    )
    assert 9.0 <= lo2 <= 10.0 and 10.0 <= hi2 <= 11.0
    # estimates are always inside the observed support, even where
    # the raw bias correction would overshoot past the data
    lo3, hi3 = bootstrap_quantile_range(
        values, false_positive_rate=0.3, seed=3
    )
    assert min(values) <= lo3 <= max(values)
    assert min(values) <= hi3 <= max(values)


def test_suite_from_batches_rejects_unknown_estimator(spark):
    from great_expectations_spark.data.images import images_df
    from great_expectations_spark.profile import (
        profile_batches,
        suite_from_batches,
    )

    mb = profile_batches(
        [images_df(spark, n_rows=100, seed=1)], columns=["w"]
    )
    with pytest.raises(ValueError, match="unknown estimator"):
        suite_from_batches(mb, estimator="jackknife")


def test_azure_url_and_confs():
    from great_expectations_spark.sources.cloud import (
        azure_spark_confs,
        parse_azure_url,
    )

    p = parse_azure_url(
        "wasbs://data@myacct.blob.core.windows.net/images/part-0.parquet"
    )
    assert p["container"] == "data"
    assert p["account"] == "myacct"
    assert p["blob"] == "images/part-0.parquet"

    confs = azure_spark_confs(
        "wasbs://data@myacct.blob.core.windows.net/x", credential="KEY"
    )
    assert (
        confs["fs.azure.account.key.myacct.blob.core.windows.net"] == "KEY"
    )
    assert confs["fs.wasbs.impl"].endswith("$Secure")

    # ADLS Gen2 variant
    confs2 = azure_spark_confs(
        "abfss://lake@acct2.dfs.core.windows.net/tbl", credential="K2"
    )
    assert "fs.azure.account.key.acct2.dfs.core.windows.net" in confs2

    with pytest.raises(ValueError, match="not an Azure storage URL"):
        parse_azure_url("s3://bucket/key")


def test_catalog_table_read(spark, tmp_path):
    from great_expectations_spark.sources.cloud import read_catalog_table

    spark.sql("CREATE DATABASE IF NOT EXISTS ges_test_db")
    try:
        spark.range(20).withColumnRenamed("id", "k").write.mode(
            "overwrite"
        ).saveAsTable("ges_test_db.t1")
        df = read_catalog_table(spark, "ges_test_db", "t1")
        assert df.count() == 20
        assert df.columns == ["k"]
        with pytest.raises(ValueError, match="database_name"):
            read_catalog_table(spark, "", "t1")
    finally:
        spark.sql("DROP TABLE IF EXISTS ges_test_db.t1")
        spark.sql("DROP DATABASE IF EXISTS ges_test_db")


def test_profile_table_approximate_one_scan(spark, monkeypatch):
    """approximate=True profiles numerics in ONE scan: bin edges and
    weights come from pass-1 KLL sketches (approxQuantile and the
    histogram agg are never called), and the resulting partitions are
    drift-usable — close to the exact profile's."""
    from pyspark.sql import DataFrame
    from great_expectations_spark.profile import profile_table

    df = images_df(spark, n_rows=4000, seed=9)
    exact = profile_table(df, head_rows=0)

    def boom(self, *a, **k):
        raise AssertionError("approxQuantile called in approximate mode")

    monkeypatch.setattr(DataFrame, "approxQuantile", boom)
    approx = profile_table(df, head_rows=0, approximate=True)

    for col in ("w", "h"):
        pa = approx["columns"][col]["partition"]
        assert len(pa["bins"]) >= 2
        # the partition is a proper probability mass over the bins
        # (exact and approx bin EDGES legitimately differ, so weights
        # aren't comparable bin-for-bin — self-consistency with the
        # drift check below is the real contract)
        assert abs(sum(pa["weights"]) - 1.0) < 0.05
        assert pa["bins"][0] >= exact["columns"][col]["min"]
        assert pa["bins"][-1] <= exact["columns"][col]["max"]
        assert all(0 <= wt <= 1 for wt in pa["weights"])
    # scalar stats identical (same fused pass in both modes)
    assert approx["columns"]["w"]["mean"] == exact["columns"]["w"]["mean"]

    # the approximate baseline drives the drift suite end-to-end
    from great_expectations_spark.profile import suite_from_baseline
    import great_expectations_spark as ges

    s = suite_from_baseline(approx, drift="psi")
    res = ges.validate(df, s)
    psi_results = [
        r for r in res.results
        if "kl_divergence" in r.expectation_config.expectation_type
        or "psi" in r.expectation_config.expectation_type
    ]
    # profiling data vs its own baseline: no drift
    assert all(r.success for r in psi_results)


def test_profile_table_approximate_allnull_numeric(spark):
    """An all-null numeric column in approximate mode yields no
    partition (empty sketch) and profiling does not throw."""
    from great_expectations_spark.profile import profile_table
    from pyspark.sql import functions as F

    df = images_df(spark, n_rows=300, seed=4).withColumn(
        "dead", F.lit(None).cast("double")
    )
    b = profile_table(df, head_rows=0, approximate=True)
    assert "partition" not in b["columns"]["dead"]
    assert b["columns"]["dead"]["nonnull"] == 0


def test_profile_table_approximate_nanosecond_epoch_lattice(spark):
    """Exclusive interior ranks must survive huge-magnitude lattice
    columns: at nanosecond-epoch scale (~1.7e18) a relative offset
    like spacing*1e-6 rounds back to the edge in float64, silently
    turning interior ranks inclusive and shifting every point mass
    one bin. math.nextafter(e, -inf) keeps them exclusive, so a
    column whose mass sits EXACTLY on bin edges partitions with
    weights matching the exact value frequencies."""
    from great_expectations_spark.profile import profile_table

    base = 1_700_000_000_000_000_000  # ns epoch
    # 0.1s spacing: ulp(1.7e18) = 256, so the old relative offset
    # spacing*1e-6 = 100 < ulp/2 rounds back onto the edge —
    # exactly the silent-inclusive regime the fix targets
    step = 100_000_000
    # lattice: 4 distinct timestamps with known frequencies
    vals = (
        [base] * 10
        + [base + step] * 20
        + [base + 2 * step] * 30
        + [base + 3 * step] * 40
    )
    df = spark.createDataFrame([(v,) for v in vals], "ts_ns long")
    prof = profile_table(df, head_rows=0, approximate=True)
    pa = prof["columns"]["ts_ns"]["partition"]
    assert abs(sum(pa["weights"]) - 1.0) < 1e-9
    assert pa["bins"] == [float(base + i * step) for i in range(4)]
    # bins are [lo, hi) with an inclusive final bin; with inclusive
    # interior ranks the first bin would absorb the next edge's
    # point mass (0.3 instead of 0.1). KLL is exact at this tiny n.
    assert pa["weights"][0] == pytest.approx(0.1, abs=0.02)
    assert pa["weights"][1] == pytest.approx(0.2, abs=0.02)
    assert pa["weights"][-1] == pytest.approx(0.7, abs=0.02)
