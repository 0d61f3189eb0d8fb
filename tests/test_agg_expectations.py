"""Aggregate / schema / value-metric expectation semantics, with a
pandas differential oracle for the statistics (SURVEY.md §5)."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import types as T

import great_expectations_spark as ges


@pytest.fixture(scope="module")
def pdf():
    rng = np.random.default_rng(7)
    return pd.DataFrame(
        {
            "v": rng.normal(10, 2, 200).round(3),
            "k": rng.choice(["A", "B", "C"], 200, p=[0.5, 0.3, 0.2]),
            "i": np.arange(200),
        }
    )


@pytest.fixture(scope="module")
def df(spark, pdf):
    return spark.createDataFrame(pdf)


def run_all(df, suite, **kw):
    res = ges.validate(df, suite, **kw)
    for r in res.results:
        assert not r.exception_info["raised_exception"], r.exception_info[
            "exception_message"
        ]
    return res


def test_fused_stats_match_pandas(df, pdf):
    s = (
        ges.suite("stats")
        .expect("expect_column_mean_to_be_between", column="v",
                min_value=pdf["v"].mean() - 1e-9, max_value=pdf["v"].mean() + 1e-9)
        .expect("expect_column_min_to_be_between", column="v",
                min_value=pdf["v"].min(), max_value=pdf["v"].min())
        .expect("expect_column_max_to_be_between", column="v",
                min_value=pdf["v"].max(), max_value=pdf["v"].max())
        .expect("expect_column_sum_to_be_between", column="v",
                min_value=pdf["v"].sum() - 1e-6, max_value=pdf["v"].sum() + 1e-6)
        .expect("expect_column_stdev_to_be_between", column="v",
                min_value=pdf["v"].std() - 1e-9, max_value=pdf["v"].std() + 1e-9)
        .expect("expect_column_unique_value_count_to_be_between", column="k",
                min_value=3, max_value=3)
        .expect("expect_table_row_count_to_equal", value=200)
    )
    res = run_all(df, s)
    assert res.success, [
        (r.expectation_config.expectation_type, r.result) for r in res.results
    ]


def test_approximate_unique_count(df, pdf):
    """approximate=True swaps countDistinct for the HLL++ sketch: at
    low cardinality (k has 3 values) the sketch is exact, the two
    forms coexist in one suite under distinct stat keys, and the
    proportion variant tracks the numerator."""
    s = (
        ges.suite("approx")
        .expect("expect_column_unique_value_count_to_be_between",
                column="k", min_value=3, max_value=3)
        .expect("expect_column_unique_value_count_to_be_between",
                column="k", min_value=3, max_value=3, approximate=True)
        .expect("expect_column_proportion_of_unique_values_to_be_between",
                column="k", min_value=3 / 200 - 1e-9,
                max_value=3 / 200 + 1e-9, approximate=True, rsd=0.01)
    )
    res = run_all(df, s)
    assert res.success, [
        (r.expectation_config.expectation_type, r.result)
        for r in res.results
    ]
    assert res.results[1].result["observed_value"] == 3


def test_observed_values(df, pdf):
    s = ges.suite("o").expect(
        "expect_column_mean_to_be_between", column="v", min_value=0, max_value=1
    )
    res = ges.validate(df, s)
    evr = res.results[0]
    assert evr.success is False
    assert abs(evr.result["observed_value"] - pdf["v"].mean()) < 1e-9


def test_median_and_quantiles(df, pdf):
    med = float(np.median(pdf["v"]))
    q25, q75 = np.quantile(pdf["v"], [0.25, 0.75], method="lower"), None
    s = (
        ges.suite("q")
        .expect("expect_column_median_to_be_between", column="v",
                min_value=med - 1e-9, max_value=med + 1e-9)
        .expect(
            "expect_column_quantile_values_to_be_between",
            column="v",
            quantile_ranges={
                "quantiles": [0.25, 0.5, 0.75],
                "value_ranges": [
                    [pdf["v"].min(), med],
                    [med - 1, med + 1],
                    [med, pdf["v"].max()],
                ],
            },
        )
    )
    res = run_all(df, s)
    assert res.success, [r.result for r in res.results]
    qvals = res.results[1].result["observed_value"]["values"]
    assert qvals[0] <= qvals[1] <= qvals[2]


def test_proportion_unique(df):
    s = ges.suite("p").expect(
        "expect_column_proportion_of_unique_values_to_be_between",
        column="k",
        min_value=0.0,
        max_value=0.05,
    )
    res = run_all(df, s)
    assert res.results[0].result["observed_value"] == 3 / 200


def test_distinct_sets(df):
    s = (
        ges.suite("d")
        .expect("expect_column_distinct_values_to_be_in_set", column="k",
                value_set=["A", "B", "C", "D"])
        .expect("expect_column_distinct_values_to_contain_set", column="k",
                value_set=["A", "B"])
        .expect("expect_column_distinct_values_to_equal_set", column="k",
                value_set=["A", "B", "C"])
    )
    res = run_all(df, s)
    assert res.success
    assert res.results[0].result["observed_value"] == ["A", "B", "C"]
    vc = res.results[0].result["details"]["value_counts"]
    assert sum(d["count"] for d in vc) == 200


def test_most_common_value(df, pdf):
    mode = pdf["k"].mode()[0]
    s = ges.suite("m").expect(
        "expect_column_most_common_value_to_be_in_set",
        column="k",
        value_set=[mode],
    )
    res = run_all(df, s)
    assert res.results[0].success is True
    assert res.results[0].result["observed_value"] == [mode]


def test_schema_checks(df):
    s = (
        ges.suite("schema")
        .expect("expect_column_to_exist", column="v")
        .expect("expect_table_columns_to_match_ordered_list",
                column_list=["v", "k", "i"])
        .expect("expect_table_columns_to_match_set", column_set=["k", "v", "i"])
        .expect("expect_table_column_count_to_equal", value=3)
        .expect("expect_table_column_count_to_be_between", min_value=1, max_value=5)
        .expect("expect_column_values_to_be_of_type", column="k", type_="StringType")
        .expect("expect_column_values_to_be_in_type_list", column="v",
                type_list=["DoubleType", "FloatType"])
    )
    res = run_all(df, s)
    assert res.success, [
        (r.expectation_config.expectation_type, r.result) for r in res.results
    ]


def test_schema_check_failure(df):
    s = ges.suite("schema").expect(
        "expect_column_values_to_be_of_type", column="k", type_="IntegerType"
    )
    res = ges.validate(df, s)
    assert res.results[0].success is False
    assert res.results[0].result["observed_value"] == "StringType"


def test_unique(spark):
    schema = T.StructType([T.StructField("u", T.IntegerType())])
    df = spark.createDataFrame([(1,), (2,), (2,), (3,), (None,), (3,)], schema)
    s = ges.suite("u").expect("expect_column_values_to_be_unique", column="u")
    res = ges.validate(df, s, result_format="COMPLETE")
    evr = res.results[0]
    assert evr.success is False
    r = evr.result
    assert r["element_count"] == 6
    assert r["missing_count"] == 1
    assert r["unexpected_count"] == 4
    assert sorted(r["unexpected_list"]) == [2, 2, 3, 3]


def test_unique_mostly(spark):
    schema = T.StructType([T.StructField("u", T.IntegerType())])
    df = spark.createDataFrame(
        [(i,) for i in range(98)] + [(1,), (None,)], schema
    )
    s = ges.suite("u").expect(
        "expect_column_values_to_be_unique", column="u", mostly=0.9
    )
    res = ges.validate(df, s)
    assert res.results[0].success is True  # 2/99 duplicated < 10%


def test_compound_unique(spark):
    schema = T.StructType(
        [
            T.StructField("a", T.IntegerType()),
            T.StructField("b", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (1, "x")], schema
    )
    s = ges.suite("cu").expect(
        "expect_compound_columns_to_be_unique", column_list=["a", "b"]
    )
    res = ges.validate(df, s, result_format="COMPLETE")
    evr = res.results[0]
    assert evr.success is False
    assert evr.result["unexpected_count"] == 2
    assert evr.result["unexpected_list"] == [{"a": 1, "b": "x"}] * 2


def test_foreign_keys(spark):
    fact = spark.createDataFrame(
        [(1, "a"), (2, "b"), (9, "c"), (None, "d")], ["fk", "val"]
    )
    dim = spark.createDataFrame([(1,), (2,), (3,)], ["pk"])
    s = ges.suite("fk").expect(
        "expect_foreign_keys_to_exist",
        column="fk",
        reference_table_name="dim",
        reference_column="pk",
        broadcast=True,
    )
    res = ges.validate(
        fact, s, aux_tables={"dim": dim}, result_format="COMPLETE"
    )
    evr = res.results[0]
    assert not evr.exception_info["raised_exception"], evr.exception_info
    assert evr.success is False
    r = evr.result
    assert r["element_count"] == 4
    assert r["missing_count"] == 1  # null FK not considered
    assert r["unexpected_count"] == 1
    assert r["unexpected_list"] == [9]


def test_increasing(spark):
    df = spark.range(0, 1000, 1, 8).withColumnRenamed("id", "n")
    s = ges.suite("inc").expect(
        "expect_column_values_to_be_increasing", column="n", strictly=True
    )
    res = ges.validate(df, s)
    assert res.results[0].success is True, res.results[0].result


def test_increasing_violations(spark):
    schema = T.StructType([T.StructField("n", T.IntegerType())])
    df = spark.createDataFrame(
        [(1,), (2,), (5,), (4,), (6,), (None,), (7,)], schema
    ).coalesce(1)
    s = ges.suite("inc").expect(
        "expect_column_values_to_be_increasing", column="n"
    )
    res = ges.validate(df, s, result_format="COMPLETE")
    evr = res.results[0]
    assert evr.success is False
    assert evr.result["unexpected_count"] == 1
    assert evr.result["unexpected_list"] == [4]


def test_decreasing(spark):
    schema = T.StructType([T.StructField("n", T.IntegerType())])
    df = spark.createDataFrame([(9,), (7,), (7,), (3,)], schema).coalesce(1)
    s = ges.suite("dec").expect(
        "expect_column_values_to_be_decreasing", column="n"
    )
    res = ges.validate(df, s)
    assert res.results[0].success is True
    s2 = ges.suite("dec").expect(
        "expect_column_values_to_be_decreasing", column="n", strictly=True
    )
    res2 = ges.validate(df, s2)
    assert res2.results[0].success is False


def test_row_count_equal_other_table(spark):
    a = spark.range(10)
    b = spark.range(10)
    c = spark.range(11)
    s = ges.suite("rc").expect(
        "expect_table_row_count_to_equal_other_table", other_table_name="other"
    )
    assert ges.validate(a, s, aux_tables={"other": b}).success is True
    assert ges.validate(a, s, aux_tables={"other": c}).success is False


def test_unknown_expectation_type(spark):
    df = spark.range(3)
    s = ges.suite("bad").expect("expect_nonsense", column="id")
    res = ges.validate(df, s)
    assert res.results[0].success is False
    assert res.results[0].exception_info["raised_exception"] is True


def test_table_head_and_profile_head(spark):
    from great_expectations_spark.data.images import images_df
    from great_expectations_spark.operators.checks import MetricCache
    from great_expectations_spark.profile import profile_table

    df = images_df(spark, n_rows=300, seed=3)
    cache = MetricCache(df)
    head = cache.head(4)
    assert len(head) == 4
    assert set(head[0]) == set(df.columns)
    assert cache.head(4) is head  # memoized

    prof = profile_table(df, head_rows=3)
    assert len(prof["head"]) == 3
    # binary cells elided to lengths, JSON-serializable
    import json

    json.dumps(prof["head"])
    assert prof["head"][0]["bytes"].startswith("<binary:")


def test_metric_cache_cardinality_guard(spark):
    from pyspark.sql import functions as F

    from great_expectations_spark.operators.checks import MetricCache

    df = spark.range(5000).withColumn(
        "v", F.col("id").cast("string")
    )
    cache = MetricCache(df)
    cache.max_collect_values = 1000
    with pytest.raises(ValueError, match="max_collect_values"):
        cache.distinct_set("v")
    with pytest.raises(ValueError, match="max_collect_values"):
        cache.value_counts("v")
    # low-cardinality columns are unaffected
    small = spark.range(5000).withColumn("v", F.lit("x"))
    c2 = MetricCache(small)
    c2.max_collect_values = 1000
    assert c2.distinct_set("v") == {"x"}


def test_distinct_overlap_with_reference(spark):
    """Theta-sketch overlap: exact in exact mode (cardinality < 2^lg_k),
    so small-set results equal the true intersection; jaccard and
    containment derive from the same four estimates."""
    a = spark.createDataFrame(
        [(v,) for v in ["a", "b", "c", "d", "b"]], "id string"
    )
    b = spark.createDataFrame(
        [(v,) for v in ["c", "d", "e", "d"]], "id string"
    )
    s = (
        ges.suite("ovl")
        .expect("expect_column_distinct_overlap_with_reference_to_be_between",
                column="id", reference_table_name="ref",
                min_value=2, max_value=2)
        .expect("expect_column_distinct_overlap_with_reference_to_be_between",
                column="id", reference_table_name="ref",
                metric="jaccard", min_value=0.39, max_value=0.41)
        .expect("expect_column_distinct_overlap_with_reference_to_be_between",
                column="id", reference_table_name="ref",
                metric="containment", min_value=0.49, max_value=0.51)
    )
    res = ges.validate(a, s, aux_tables={"ref": b})
    assert res.success, [
        (r.expectation_config.kwargs.get("metric"), r.result)
        for r in res.results
    ]
    d = res.results[0].result["details"]
    assert d == {"overlap_count": 2, "union_count": 5,
                 "batch_distinct": 4, "reference_distinct": 3}

    # estimation mode: two overlapping 50k ranges, default lg_k=12
    big_a = spark.range(0, 50000).selectExpr("cast(id as string) id")
    big_b = spark.range(25000, 75000).selectExpr("cast(id as string) id")
    s2 = ges.suite("ovl2").expect(
        "expect_column_distinct_overlap_with_reference_to_be_between",
        column="id", reference_table_name="ref",
        min_value=20000, max_value=30000,
    )
    r2 = ges.validate(big_a, s2, aux_tables={"ref": big_b})
    assert r2.success, r2.results[0].result


def test_value_share_match_targets(df, pdf):
    shares = (pdf["k"].value_counts() / len(pdf)).to_dict()
    s = ges.suite("mix").expect(
        "expect_column_value_share_to_match_targets",
        column="k",
        targets={k: round(v, 2) for k, v in shares.items()},
        tolerance=0.02,
    )
    res = run_all(df, s)
    r = res.results[0]
    assert r.success is True
    assert r.result["observed_value"] == {
        k: round(v, 6) for k, v in shares.items()
    }
    assert r.result["details"]["max_abs_deviation"] <= 0.02

    # an off-target mix fails, and the deviation is reported
    bad = ges.suite("mix2").expect(
        "expect_column_value_share_to_match_targets",
        column="k",
        targets={"A": 0.9, "B": 0.05, "C": 0.05},
        tolerance=0.05,
    )
    r2 = run_all(df, bad).results[0]
    assert r2.success is False
    assert r2.result["details"]["max_abs_deviation"] > 0.05

    # a tracked value absent from the data: require_tracked_values
    # gates it, opting out checks the arithmetic on share 0.0
    missing = ges.suite("mix3").expect(
        "expect_column_value_share_to_match_targets",
        column="k",
        targets={"ZZZ": 0.0},
        tolerance=0.01,
    )
    r3 = run_all(df, missing).results[0]
    assert r3.success is False
    assert r3.result["details"]["missing_values"] == ["ZZZ"]
    lax = ges.suite("mix4").expect(
        "expect_column_value_share_to_match_targets",
        column="k",
        targets={"ZZZ": 0.0},
        tolerance=0.01,
        require_tracked_values=False,
    )
    assert run_all(df, lax).results[0].success is True
