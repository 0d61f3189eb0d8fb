"""Distribution-drift expectations: KL (categorical + continuous with
holdouts), chi-square, binned KS, PSI — differential-tested against
straight numpy math."""

import math

import numpy as np
import pandas as pd
import pytest

import great_expectations_spark as ges
from great_expectations_spark.functions.stats_math import (
    chi2_sf,
    kl_divergence,
    ks_p_value,
)


@pytest.fixture(scope="module")
def cat_df(spark):
    # weights ≈ [0.54, 0.32, 0.14] like the reference's categorical fixture
    data = [("A",)] * 54 + [("B",)] * 32 + [("C",)] * 14
    return spark.createDataFrame(data, ["cat"])


@pytest.fixture(scope="module")
def num_df(spark):
    rng = np.random.default_rng(3)
    vals = rng.normal(0, 1, 500)
    return spark.createDataFrame(pd.DataFrame({"x": vals}))


def test_kl_categorical_exact_match(cat_df):
    s = ges.suite("kl").expect(
        "expect_column_kl_divergence_to_be_less_than",
        column="cat",
        partition_object={"values": ["A", "B", "C"], "weights": [0.54, 0.32, 0.14]},
        threshold=0.01,
    )
    res = ges.validate(cat_df, s)
    evr = res.results[0]
    assert not evr.exception_info["raised_exception"], evr.exception_info
    assert evr.success is True
    assert abs(evr.result["observed_value"]) < 1e-9
    details = evr.result["details"]
    assert details["observed_partition"]["weights"] == pytest.approx(
        [0.54, 0.32, 0.14]
    )


def test_kl_categorical_drift(cat_df):
    s = ges.suite("kl").expect(
        "expect_column_kl_divergence_to_be_less_than",
        column="cat",
        partition_object={"values": ["A", "B", "C"], "weights": [0.2, 0.3, 0.5]},
        threshold=0.05,
    )
    res = ges.validate(cat_df, s)
    evr = res.results[0]
    assert evr.success is False
    expected_kl = kl_divergence([0.54, 0.32, 0.14], [0.2, 0.3, 0.5])
    assert evr.result["observed_value"] == pytest.approx(expected_kl)


def test_kl_categorical_unknown_value_inf(cat_df):
    # observed C not in expected set and no holdout → inf KL → observed None
    s = ges.suite("kl").expect(
        "expect_column_kl_divergence_to_be_less_than",
        column="cat",
        partition_object={"values": ["A", "B"], "weights": [0.6, 0.4]},
        threshold=1.0,
    )
    res = ges.validate(cat_df, s)
    evr = res.results[0]
    assert evr.success is False
    assert evr.result["observed_value"] is None


def test_kl_categorical_tail_holdout(cat_df):
    s = ges.suite("kl").expect(
        "expect_column_kl_divergence_to_be_less_than",
        column="cat",
        partition_object={"values": ["A", "B"], "weights": [0.6, 0.4]},
        threshold=1.0,
        tail_weight_holdout=0.2,
    )
    res = ges.validate(cat_df, s)
    evr = res.results[0]
    assert evr.result["observed_value"] is not None
    assert evr.success is True


def test_kl_continuous(num_df):
    bins = [-3.0, -1.0, 0.0, 1.0, 3.0]
    # expected ≈ standard normal masses for those bins
    po = {
        "bins": bins,
        "weights": [0.157, 0.341, 0.341, 0.157],
        "tail_weights": [0.002, 0.002],
    }
    s = ges.suite("klc").expect(
        "expect_column_kl_divergence_to_be_less_than",
        column="x",
        partition_object=po,
        threshold=0.1,
    )
    res = ges.validate(num_df, s)
    evr = res.results[0]
    assert not evr.exception_info["raised_exception"], evr.exception_info
    assert evr.success is True, evr.result
    det = evr.result["details"]
    assert det["observed_partition"]["bins"] == bins
    assert sum(det["observed_partition"]["weights"]) + sum(
        det["observed_partition"]["tail_weights"]
    ) == pytest.approx(1.0)


def test_kl_continuous_infinite_endpoints(num_df):
    po = {
        "bins": [-math.inf, -1.0, 0.0, 1.0, math.inf],
        "weights": [0.159, 0.341, 0.341, 0.159],
    }
    s = ges.suite("klinf").expect(
        "expect_column_kl_divergence_to_be_less_than",
        column="x",
        partition_object=po,
        threshold=0.1,
    )
    res = ges.validate(num_df, s)
    evr = res.results[0]
    assert not evr.exception_info["raised_exception"], evr.exception_info
    assert evr.success is True, evr.result


def test_chisquare(cat_df):
    s = ges.suite("chi").expect(
        "expect_column_chisquare_test_p_value_to_be_greater_than",
        column="cat",
        partition_object={"values": ["A", "B", "C"], "weights": [0.54, 0.32, 0.14]},
        p=0.05,
    )
    res = ges.validate(cat_df, s)
    evr = res.results[0]
    assert evr.success is True
    assert evr.result["observed_value"] == pytest.approx(1.0)


def test_chisquare_drift(cat_df):
    s = ges.suite("chi").expect(
        "expect_column_chisquare_test_p_value_to_be_greater_than",
        column="cat",
        partition_object={"values": ["A", "B", "C"], "weights": [1 / 3] * 3},
        p=0.05,
    )
    res = ges.validate(cat_df, s)
    assert res.results[0].success is False


def test_chi2_sf_against_known_values():
    # chi2.sf(3.84, 1) ≈ 0.05; chi2.sf(5.99, 2) ≈ 0.05
    assert chi2_sf(3.841, 1) == pytest.approx(0.05, abs=2e-3)
    assert chi2_sf(5.991, 2) == pytest.approx(0.05, abs=2e-3)
    assert chi2_sf(0.0, 3) == 1.0


def test_ks(num_df):
    # GE-parity (dataset/pandas_dataset.py:1627-1760): finite
    # endpoints, NO tail weights, bootstrap-fraction observed value
    po = {
        "bins": [-3.0, -1.0, 0.0, 1.0, 3.0],
        "weights": [0.1585, 0.3415, 0.3415, 0.1585],
    }
    s = ges.suite("ks").expect(
        "expect_column_bootstrapped_ks_test_p_value_to_be_greater_than",
        column="x",
        partition_object=po,
        p=0.05,
    )
    res = ges.validate(num_df, s)
    evr = res.results[0]
    assert not evr.exception_info["raised_exception"], evr.exception_info
    assert evr.success is True, evr.result
    assert evr.result["observed_value"] > 0.05
    details = evr.result["details"]
    assert details["bootstrap_sample_size"] == 8  # 2 x n_weights

    # non-overlapping partition must fail (the small bootstrap sample
    # size makes the test deliberately tolerant of mild mismatch —
    # pandas_dataset.py:1655 comment — so only a gross mismatch is a
    # reliable negative)
    po_bad = {
        "bins": [10.0, 11.0, 12.0, 13.0],
        "weights": [0.4, 0.3, 0.3],
    }
    s2 = ges.suite("ks2").expect(
        "expect_column_bootstrapped_ks_test_p_value_to_be_greater_than",
        column="x", partition_object=po_bad, p=0.05,
    )
    assert ges.validate(num_df, s2).results[0].success is False

    # validation parity: tail weights and infinite endpoints rejected
    for po_err, msg in [
        (
            {
                "bins": [-3.0, 0.0, 3.0],
                "weights": [0.4, 0.4],
                "tail_weights": [0.1, 0.1],
            },
            "tail weights",
        ),
        (
            {
                "bins": [float("-inf"), 0.0, 3.0],
                "weights": [0.5, 0.5],
            },
            "must be finite",
        ),
    ]:
        s_err = ges.suite("kse").expect(
            "expect_column_bootstrapped_ks_test_p_value_to_be_greater_than",
            column="x", partition_object=po_err, p=0.05,
        )
        evr_err = ges.validate(num_df, s_err).results[0]
        assert evr_err.exception_info["raised_exception"]
        assert msg in evr_err.exception_info["exception_message"]


def test_ks_p_value_sanity():
    assert ks_p_value(0.0, 100) == pytest.approx(1.0)
    assert ks_p_value(0.5, 100) < 1e-6


def test_psi(cat_df):
    s = ges.suite("psi").expect(
        "expect_column_psi_to_be_less_than",
        column="cat",
        partition_object={"values": ["A", "B", "C"], "weights": [0.54, 0.32, 0.14]},
        threshold=0.1,
    )
    res = ges.validate(cat_df, s)
    assert res.results[0].success is True
    assert res.results[0].result["observed_value"] == pytest.approx(0.0, abs=1e-6)


def test_profile_builders(spark, num_df, cat_df):
    from great_expectations_spark.operators.distribution import (
        build_categorical_partition_object,
        build_continuous_partition_object,
        is_valid_categorical_partition_object,
        is_valid_continuous_partition_object,
    )

    po_cat = build_categorical_partition_object(cat_df, "cat")
    assert is_valid_categorical_partition_object(po_cat)
    assert po_cat["values"] == ["A", "B", "C"]

    po_cont = build_continuous_partition_object(num_df, "x", n_bins=5)
    assert is_valid_continuous_partition_object(po_cont)

    # round-trip: profile → KL vs the same data ≈ 0
    s = ges.suite("rt").expect(
        "expect_column_kl_divergence_to_be_less_than",
        column="x",
        partition_object=po_cont,
        threshold=0.01,
    )
    res = ges.validate(num_df, s)
    assert res.results[0].success is True, res.results[0].result
