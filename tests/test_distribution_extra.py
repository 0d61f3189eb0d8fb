"""Parameterized-distribution KS, Cramér's phi, and the multicolumn
uniqueness alias — the last three reference expectation types
(reference is Pandas-only for the first two; ours are Spark-first)."""

import numpy as np
import pytest

import great_expectations_spark as ges


def test_all_reference_types_covered():
    ours = set(ges.list_expectation_types())
    # the reference's 58 core expectation modules
    import os

    ref_dir = "/root/reference/great_expectations/expectations/core"
    if os.path.isdir(ref_dir):
        ref = {
            f[:-3]
            for f in os.listdir(ref_dir)
            if f.startswith("expect") and f.endswith(".py")
        }
        assert ref <= ours, sorted(ref - ours)


def test_parameterized_ks(spark):
    rng = np.random.default_rng(0)
    df = spark.createDataFrame(
        [(float(x),) for x in rng.normal(10, 2, 4000)], "x double"
    )
    s = (
        ges.suite("ks")
        .expect(
            "expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than",
            column="x", distribution="norm",
            params={"loc": 10, "scale": 2}, p_value=0.05,
        )
        .expect(
            "expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than",
            column="x", distribution="uniform",
            params={"loc": 0, "scale": 20}, p_value=0.05,
        )
        .expect(
            "expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than",
            column="x", distribution="expon",
            params=[0, 10], p_value=0.05,  # scipy positional (loc, scale)
        )
    )
    res = ges.validate(df, s)
    assert res.results[0].success  # true distribution accepted
    assert not res.results[1].success  # wrong family rejected
    assert not res.results[2].success
    assert res.results[0].result["observed_value"] > 0.05


def test_parameterized_ks_unsupported_distribution(spark):
    df = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    s = ges.suite("bad").expect(
        "expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than",
        column="x", distribution="zipf", params={},
    )
    r = ges.validate(df, s).results[0]
    assert not r.success
    assert "unsupported distribution" in str(
        r.exception_info.get("exception_message", "")
    )


def test_cramers_phi(spark):
    rng = np.random.default_rng(1)
    rows = [
        (rng.choice(["a", "b", "c"]).item(), rng.choice(["x", "y"]).item())
        for _ in range(3000)
    ]
    ind = spark.createDataFrame(rows, "A string, B string")
    dep = spark.createDataFrame(
        [(a, "x" if a == "a" else "y") for a, _ in rows],
        "A string, B string",
    )
    s = ges.suite("c").expect(
        "expect_column_pair_cramers_phi_value_to_be_less_than",
        column_A="A", column_B="B", threshold=0.1,
    )
    r_ind = ges.validate(ind, s).results[0]
    r_dep = ges.validate(dep, s).results[0]
    assert r_ind.success and r_ind.result["observed_value"] < 0.1
    assert not r_dep.success and r_dep.result["observed_value"] > 0.9
    assert "crosstab" in r_dep.result["details"]


def test_multicolumn_unique_alias(spark):
    df = spark.createDataFrame([(1, 1), (1, 1), (2, 3)], "a int, b int")
    s = ges.suite("m").expect(
        "expect_multicolumn_values_to_be_unique", column_list=["a", "b"]
    )
    r = ges.validate(df, s).results[0]
    assert not r.success
    assert r.result["unexpected_count"] == 2
