"""Distribution-drift expectations: KL divergence, chi-square, KS, PSI.

KL divergence is a faithful port of the reference's driver-side math
(expect_column_kl_divergence_to_be_less_than.py:371-728), fed by Spark
jobs through the MetricCache:
- categorical: value_counts (one groupBy job)
- continuous: histogram bin counts as a fused when-chain agg — exact
  reference bin-edge semantics (column_histogram.py:267-290) — plus
  below/above-partition counts (column_values_between_count.py:199-255)
  fused into the SAME single agg job.

Chi-square is a v3-API stub in the reference (the math lived in the v2
dataset API); we implement the standard Pearson test with the p-value
from a self-contained regularized incomplete gamma (no scipy here).
KS is Pandas-only in the reference (scipy bootstrap); ours is the
documented scale-path variant: binned-CDF sup-difference with the
asymptotic Kolmogorov p-value. PSI is our addition for drift
monitoring, using the same partition-object machinery.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..functions.stats_math import (
    chi2_sf,
    cramers_v,
    dist_cdf,
    kl_divergence,
    ks_p_value,
    psi,
)
from .checks import JobCheck, MetricCache


# --- partition object helpers (ref execution_engine/util.py:17-75) ----------

def is_valid_categorical_partition_object(po) -> bool:
    if po is None or "weights" not in po or "values" not in po:
        return False
    return len(po["values"]) == len(po["weights"]) and np.allclose(
        np.sum(po["weights"]), 1
    )


def is_valid_continuous_partition_object(po) -> bool:
    if po is None or "weights" not in po or "bins" not in po:
        return False
    if "tail_weights" in po:
        if len(po["tail_weights"]) != 2:
            return False
        comb = list(po["tail_weights"]) + list(po["weights"])
    else:
        comb = list(po["weights"])
    return (
        len(po["bins"]) == len(po["weights"]) + 1
        and bool(np.all(np.diff(po["bins"]) > 0))
        and np.allclose(np.sum(comb), 1.0)
    )


def is_valid_partition_object(po) -> bool:
    return is_valid_continuous_partition_object(
        po
    ) or is_valid_categorical_partition_object(po)


def build_categorical_partition_object(df, column: str) -> dict:
    """Profile a categorical column into {values, weights}
    (ref execution_engine/util.py:149-192)."""
    rows = (
        df.select(column)
        .where(F.col(column).isNotNull())
        .groupBy(column)
        .count()
        .orderBy(column)
        .collect()
    )
    total = sum(r["count"] for r in rows) or 1
    return {
        "values": [r[0] for r in rows],
        "weights": [r["count"] / total for r in rows],
    }


def build_continuous_partition_object(
    df, column: str, n_bins: int = 10, allow_relative_error: float = 0.0
) -> dict:
    """Profile a numeric column into {bins, weights, tail_weights}
    via ntile-spaced quantile bins
    (ref execution_engine/util.py:77-148)."""
    qs = [i / n_bins for i in range(n_bins + 1)]
    edges = df.approxQuantile(column, qs, allow_relative_error)
    # dedupe equal edges (heavy point masses)
    bins: List[float] = []
    for e in edges:
        if not bins or e > bins[-1]:
            bins.append(e)
    if len(bins) < 2:
        bins = [bins[0], bins[0] + 1] if bins else [0.0, 1.0]
    cache = MetricCache(df)
    hist = cache.histogram(column, bins)
    nonnull = df.where(F.col(column).isNotNull()).count() or 1
    weights = [h / nonnull for h in hist]
    tail = max(0.0, (1.0 - sum(weights)) / 2.0)
    return {"bins": bins, "weights": weights, "tail_weights": [tail, tail]}


# --- KL divergence ------------------------------------------------------------

def _categorical_kl(cache: MetricCache, column: str, partition_object, threshold,
                    tail_weight_holdout):
    vc = cache.value_counts(column)
    nonnull = sum(c for _, c in vc)
    observed = pd.Series(
        {v: c / nonnull for v, c in vc}, name="count", dtype=float
    )
    expected = pd.Series(
        partition_object["weights"],
        index=partition_object["values"],
        name="expected",
        dtype=float,
    )
    test_df = pd.concat([expected, observed], axis=1)
    na_counts = test_df.isnull().sum()
    pk = test_df["count"].fillna(0)
    if na_counts["expected"] > 0:
        test_df["expected"] *= 1 - tail_weight_holdout
        qk = test_df["expected"].fillna(
            tail_weight_holdout / na_counts["expected"]
        )
    else:
        qk = test_df["expected"]
    kl = kl_divergence(pk.tolist(), qk.tolist())
    observed_value = None if (math.isinf(kl) or math.isnan(kl)) else kl
    success = True if threshold is None else kl <= threshold
    return success, {
        "observed_value": observed_value,
        "details": {
            "observed_partition": {
                "values": test_df.index.tolist(),
                "weights": pk.tolist(),
            },
            "expected_partition": {
                "values": test_df.index.tolist(),
                "weights": qk.tolist(),
            },
        },
    }


def _continuous_kl(cache: MetricCache, column: str, partition_object, threshold,
                   tail_weight_holdout, internal_weight_holdout):
    bins = list(partition_object["bins"])
    # histogram over the *finite* core; ±inf edges handled via tails
    neg_inf_left = math.isinf(bins[0]) and bins[0] < 0
    pos_inf_right = math.isinf(bins[-1])
    core_bins = bins
    if neg_inf_left or pos_inf_right:
        core_bins = bins[1:] if neg_inf_left else bins
        core_bins = core_bins[:-1] if pos_inf_right else core_bins
        hist_core = cache.histogram(column, core_bins) if len(core_bins) >= 2 else []
    else:
        hist_core = cache.histogram(column, bins)

    nonnull = cache.between_count(column, None, None)
    if nonnull == 0:
        return True, {"observed_value": None, "details": {}}

    below = cache.between_count(
        column, None, core_bins[0], min_strict=False, max_strict=True
    )
    above = cache.between_count(
        column, core_bins[-1], None, min_strict=True, max_strict=False
    )

    expected_weights = np.array(partition_object["weights"]) * (
        1 - tail_weight_holdout - internal_weight_holdout
    )
    if internal_weight_holdout > 0:
        zero_count = len(expected_weights) - np.count_nonzero(expected_weights)
        if zero_count > 0:
            for i, v in enumerate(expected_weights):
                if v == 0:
                    expected_weights[i] = internal_weight_holdout / zero_count

    if neg_inf_left and pos_inf_right:
        if tail_weight_holdout > 0:
            raise ValueError(
                "tail_weight_holdout cannot be used for partitions with infinite endpoints."
            )
        if "tail_weights" in partition_object:
            raise ValueError(
                "There can be no tail weights for partitions with one or both endpoints at infinity"
            )
        # observed over [-inf, core..., inf]: tails are below/above core
        observed_all = (
            [below / nonnull]
            + [h / nonnull for h in hist_core]
            + [above / nonnull]
        )
        observed_weights = np.array(observed_all)
        expected_bins = bins[1:-1]
        comb_expected = expected_weights
        expected_tails = np.array([expected_weights[0], expected_weights[-1]])
        expected_main = expected_weights[1:-1]
        comb_observed = observed_weights
        observed_tails = np.array([observed_weights[0], observed_weights[-1]])
        observed_main = observed_weights[1:-1]
    elif neg_inf_left or pos_inf_right:
        if "tail_weights" in partition_object:
            raise ValueError(
                "There can be no tail weights for partitions with one or both endpoints at infinity"
            )
        hist_w = [h / nonnull for h in hist_core]
        if neg_inf_left:
            observed_weights = np.array([below / nonnull] + hist_w)
            expected_bins = bins[1:]
            comb_expected = np.concatenate(
                (expected_weights, [tail_weight_holdout])
            )
            expected_tails = np.array([expected_weights[0], tail_weight_holdout])
            expected_main = expected_weights[1:]
            comb_observed = np.concatenate(
                (observed_weights, [above / nonnull])
            )
            observed_tails = np.array([observed_weights[0], above / nonnull])
            observed_main = observed_weights[1:]
        else:
            observed_weights = np.array(hist_w + [above / nonnull])
            expected_bins = bins[:-1]
            comb_expected = np.concatenate(
                ([tail_weight_holdout], expected_weights)
            )
            expected_tails = np.array([tail_weight_holdout, expected_weights[-1]])
            expected_main = expected_weights[:-1]
            comb_observed = np.concatenate(
                ([below / nonnull], observed_weights)
            )
            observed_tails = np.array([below / nonnull, observed_weights[-1]])
            observed_main = observed_weights[:-1]
    else:
        observed_weights = np.array([h / nonnull for h in hist_core])
        expected_bins = bins
        if "tail_weights" in partition_object:
            tw = partition_object["tail_weights"]
            comb_expected = np.concatenate(([tw[0]], expected_weights, [tw[1]]))
            expected_tails = np.array(tw)
        else:
            comb_expected = np.concatenate(
                ([tail_weight_holdout / 2], expected_weights, [tail_weight_holdout / 2])
            )
            expected_tails = np.array(
                [tail_weight_holdout / 2, tail_weight_holdout / 2]
            )
        expected_main = expected_weights
        comb_observed = np.concatenate(
            ([below / nonnull], observed_weights, [above / nonnull])
        )
        observed_tails = np.array([below, above]) / nonnull
        observed_main = observed_weights

    kl = kl_divergence(comb_observed.tolist(), comb_expected.tolist())
    observed_value = None if (math.isinf(kl) or math.isnan(kl)) else kl
    success = True if threshold is None else kl <= threshold
    return success, {
        "observed_value": observed_value,
        "details": {
            "observed_partition": {
                "bins": list(expected_bins),
                "weights": np.asarray(observed_main).tolist(),
                "tail_weights": observed_tails.tolist(),
            },
            "expected_partition": {
                "bins": list(expected_bins),
                "weights": np.asarray(expected_main).tolist(),
                "tail_weights": expected_tails.tolist(),
            },
        },
    }


def compile_kl_divergence(index, cfg, schema) -> JobCheck:
    column = cfg.kwargs["column"]
    threshold = cfg.kwargs.get("threshold")
    tail_weight_holdout = cfg.kwargs.get("tail_weight_holdout", 0)
    internal_weight_holdout = cfg.kwargs.get("internal_weight_holdout", 0)
    bucketize_data = cfg.kwargs.get("bucketize_data", True)
    partition_object = cfg.kwargs.get("partition_object")

    def run(df, stats: Dict[str, Any], cache: MetricCache):
        po = partition_object
        if po is None:
            # profile the batch itself (ref :396-414): auto-build a
            # partition; KL vs itself is 0 — useful in profile mode
            if bucketize_data:
                po = build_continuous_partition_object(df, column)
            else:
                po = build_categorical_partition_object(df, column)
        if not is_valid_partition_object(po):
            raise ValueError("Invalid partition object.")
        if not 0 <= tail_weight_holdout <= 1:
            raise ValueError(
                "tail_weight_holdout must be between zero and one."
            )
        if not 0 <= internal_weight_holdout <= 1:
            raise ValueError(
                "internal_weight_holdout must be between zero and one."
            )
        if threshold is not None and (
            not isinstance(threshold, (int, float)) or threshold < 0
        ):
            raise ValueError(
                "Threshold must be specified, greater than or equal to zero."
            )
        if tail_weight_holdout != 0 and "tail_weights" in po:
            raise ValueError(
                "tail_weight_holdout must be 0 when using tail_weights in partition object"
            )
        if is_valid_categorical_partition_object(po):
            if internal_weight_holdout > 0:
                raise ValueError(
                    "Internal weight holdout cannot be used for discrete data."
                )
            return _categorical_kl(
                cache, column, po, threshold, tail_weight_holdout
            )
        if bucketize_data is False:
            raise ValueError(
                "KL Divergence cannot be computed with a continuous partition "
                "object and the bucketize_data parameter set to false."
            )
        return _continuous_kl(
            cache, column, po, threshold, tail_weight_holdout,
            internal_weight_holdout,
        )

    return JobCheck(index=index, config=cfg, run=run)


def compile_chisquare_p_value(index, cfg, schema) -> JobCheck:
    """Pearson chi-square goodness-of-fit vs a categorical partition
    (v2-API semantics; v3 file is a stub —
    expect_column_chisquare_test_p_value_to_be_greater_than.py)."""
    column = cfg.kwargs["column"]
    po = cfg.kwargs["partition_object"]
    p_threshold = cfg.kwargs.get("p", 0.05)
    tail_weight_holdout = cfg.kwargs.get("tail_weight_holdout", 0)

    def run(df, stats: Dict[str, Any], cache: MetricCache):
        if not is_valid_categorical_partition_object(po):
            raise ValueError("Invalid partition object.")
        vc = cache.value_counts(column)
        total = sum(c for _, c in vc)
        observed = pd.Series({v: c for v, c in vc}, name="count", dtype=float)
        expected = pd.Series(
            po["weights"], index=po["values"], name="expected", dtype=float
        )
        test_df = pd.concat([expected, observed], axis=1)
        na_expected = int(test_df["expected"].isnull().sum())
        f_obs = test_df["count"].fillna(0).to_numpy()
        if na_expected > 0:
            test_df["expected"] *= 1 - tail_weight_holdout
            f_exp = (
                test_df["expected"].fillna(tail_weight_holdout / na_expected)
                * total
            ).to_numpy()
        else:
            f_exp = (test_df["expected"] * total).to_numpy()
        if np.any(f_exp <= 0):
            return False, {"observed_value": None}
        stat = float(np.sum((f_obs - f_exp) ** 2 / f_exp))
        p_value = chi2_sf(stat, len(f_obs) - 1)
        return p_value > p_threshold, {
            "observed_value": p_value,
            "details": {"chi_squared": stat, "dof": len(f_obs) - 1},
        }

    return JobCheck(index=index, config=cfg, run=run)


def compile_ks_p_value(index, cfg, schema) -> JobCheck:
    """expect_column_bootstrapped_ks_test_p_value_to_be_greater_than.

    Pandas-only in the reference (scipy bootstrap, dataset/
    pandas_dataset.py:1627-1760). Spark-first reproduction of the SAME
    statistic: the partition CDF is linearly interpolated over the
    bins, B bootstrap draws of size m (default 2 x n_weights, ~20)
    are taken from a bounded uniform sample of the column (at 10^12
    rows the driver sample is statistically equivalent to drawing from
    the full column since m is tiny), each draw's one-sample KS
    p-value is computed (Stephens asymptotic), and the observed value
    is the bootstrap fraction (1 + #{p_i >= p}) / (B + 1)."""
    column = cfg.kwargs["column"]
    po = cfg.kwargs["partition_object"]
    p_threshold = cfg.kwargs.get("p", 0.05)
    bootstrap_samples = cfg.kwargs.get("bootstrap_samples") or 1000
    bootstrap_sample_size = cfg.kwargs.get("bootstrap_sample_size")
    sample_cap = int(cfg.kwargs.get("driver_sample_cap", 50_000))
    seed = int(cfg.kwargs.get("seed", 42))

    def run(df, stats: Dict[str, Any], cache: MetricCache):
        if not is_valid_continuous_partition_object(po):
            raise ValueError("Invalid partition object.")
        bins = list(po["bins"])
        if math.isinf(bins[0]) or math.isinf(bins[-1]):
            raise ValueError("Partition endpoints must be finite.")
        if "tail_weights" in po and sum(po["tail_weights"]) > 0:
            raise ValueError(
                "Partition cannot have tail weights -- endpoints must be finite."
            )
        nonnull = cache.between_count(column, None, None)
        if nonnull == 0:
            return True, {"observed_value": None}

        # bounded driver sample (full collect below the cap)
        col_df = df.select(column).where(F.col(column).isNotNull())
        if nonnull > sample_cap:
            col_df = col_df.sample(
                fraction=min(1.0, (1.2 * sample_cap) / nonnull), seed=seed
            ).limit(sample_cap)
        values = np.array([r[0] for r in col_df.collect()], dtype=float)

        test_cdf = np.append([0.0], np.cumsum(po["weights"]))

        m = bootstrap_sample_size or 2 * len(po["weights"])
        rng = np.random.default_rng(seed)
        p_values = []
        for _ in range(int(bootstrap_samples)):
            draw = np.sort(rng.choice(values, size=int(m)))
            cdf = np.interp(draw, bins, test_cdf)
            n = len(draw)
            upper = np.arange(1, n + 1) / n - cdf
            lower = cdf - np.arange(0, n) / n
            d = float(max(upper.max(), lower.max(), 0.0))
            p_values.append(ks_p_value(d, n))
        observed = (1 + sum(pv >= p_threshold for pv in p_values)) / (
            int(bootstrap_samples) + 1
        )

        # observed partition expanded to the data range (ref shape)
        hist = cache.histogram(column, bins)
        below = cache.between_count(
            column, None, bins[0], min_strict=False, max_strict=True
        )
        above = cache.between_count(
            column, bins[-1], None, min_strict=True, max_strict=False
        )
        obs_bins = list(bins)
        obs_weights = [h / nonnull for h in hist]
        if below > 0:
            obs_bins = [float(values.min())] + obs_bins
            obs_weights = [below / nonnull] + obs_weights
        if above > 0:
            obs_bins = obs_bins + [float(values.max())]
            obs_weights = obs_weights + [above / nonnull]

        return observed > p_threshold, {
            "observed_value": observed,
            "details": {
                "bootstrap_samples": int(bootstrap_samples),
                "bootstrap_sample_size": int(m),
                "observed_partition": {
                    "bins": obs_bins,
                    "weights": obs_weights,
                },
                "expected_partition": {
                    "bins": bins,
                    "weights": list(po["weights"]),
                },
            },
        }

    return JobCheck(index=index, config=cfg, run=run)


def compile_psi_less_than(index, cfg, schema) -> JobCheck:
    """Population-stability-index drift check (ours; not in the
    reference — uses the same partition_object machinery)."""
    column = cfg.kwargs["column"]
    po = cfg.kwargs["partition_object"]
    threshold = cfg.kwargs.get("threshold", 0.2)

    def run(df, stats: Dict[str, Any], cache: MetricCache):
        if is_valid_categorical_partition_object(po):
            vc = cache.value_counts(column)
            total = sum(c for _, c in vc) or 1
            observed_map = {v: c / total for v, c in vc}
            values = list(po["values"])
            pk = [observed_map.get(v, 0.0) for v in values]
            qk = list(po["weights"])
        elif is_valid_continuous_partition_object(po):
            bins = list(po["bins"])
            hist = cache.histogram(column, bins)
            nonnull = cache.between_count(column, None, None) or 1
            pk = [h / nonnull for h in hist]
            qk = list(po["weights"])
        else:
            raise ValueError("Invalid partition object.")
        value = psi(pk, qk)
        return value < threshold, {
            "observed_value": value,
            "details": {
                "observed_weights": pk,
                "expected_weights": qk,
            },
        }

    return JobCheck(index=index, config=cfg, run=run)


def compile_parameterized_ks_p_value(index, cfg, schema) -> JobCheck:
    """expect_column_parameterized_distribution_ks_test_p_value_to_be_
    greater_than — Pandas-only in the reference (scipy.stats.kstest,
    column_parameterized_distribution_ks_test_p_value.py:29-54). The
    Spark-first variant evaluates the empirical CDF on an exact
    quantile grid (one approxQuantile job at rel_err=0; at 10^12 rows
    a small rel_err bounds the added D error by rel_err) and takes the
    sup-difference against the parametric CDF (scipy-free
    stats_math.dist_cdf), with the asymptotic Kolmogorov p-value."""
    from ..functions.stats_math import DIST_POSITIONAL

    column = cfg.kwargs["column"]
    distribution = cfg.kwargs["distribution"]
    p_threshold = cfg.kwargs.get("p_value", 0.05)
    params = cfg.kwargs.get("params") or {}
    if isinstance(params, (list, tuple)):
        names = DIST_POSITIONAL.get(distribution, ["loc", "scale"])
        params = dict(zip(names, params))
    grid_points = int(cfg.kwargs.get("grid_points", 200))
    # up to this many rows, compute the textbook exact D over the
    # sorted sample; beyond it, a quantile grid bounds the error by
    # ~1/grid_points + quantile rel_err (the 10^12-row path)
    exact_cap = int(cfg.kwargs.get("exact_sample_cap", 65536))

    def run(df, stats: Dict[str, Any], cache: MetricCache):
        nonnull = cache.between_count(column, None, None)
        if nonnull == 0:
            return True, {"observed_value": None}
        d_stat = 0.0
        if nonnull <= exact_cap:
            values = [
                r[0]
                for r in df.select(column)
                .where(F.col(column).isNotNull())
                .orderBy(column)
                .collect()
            ]
            n = len(values)
            for i, x in enumerate(values):
                cdf = dist_cdf(distribution, params, float(x))
                d_stat = max(
                    d_stat, abs((i + 1) / n - cdf), abs(i / n - cdf)
                )
        else:
            m = grid_points
            qs = [(k + 1) / (m + 1) for k in range(m)]
            values = cache.quantiles(column, qs, 1.0 / (4 * m))
            for q, x in zip(qs, values):
                cdf = dist_cdf(distribution, params, float(x))
                d_stat = max(d_stat, abs(q - cdf))
        p_value = ks_p_value(d_stat, nonnull)
        return p_value > p_threshold, {
            "observed_value": p_value,
            "details": {
                "ks_statistic": d_stat,
                "distribution": distribution,
                "params": params,
            },
        }

    return JobCheck(index=index, config=cfg, run=run)


def compile_cramers_phi_less_than(index, cfg, schema) -> JobCheck:
    """expect_column_pair_cramers_phi_value_to_be_less_than — Pandas-
    only in the reference (dataset.py:4379-4450: pandas crosstab +
    scipy chi2_contingency). Spark-first: the contingency table is a
    groupBy(A, B).count() (two-phase hash agg), Cramér's V from the
    scipy-free chi2 (stats_math.cramers_v, Yates-corrected for 2x2
    like scipy's default); success = V <= threshold."""
    col_a = cfg.kwargs["column_A"]
    col_b = cfg.kwargs["column_B"]
    threshold = cfg.kwargs.get("threshold", 0.1)
    max_cells = int(cfg.kwargs.get("max_cells", 10_000))

    def run(df, stats: Dict[str, Any], cache: MetricCache):
        pairs = (
            df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
            .groupBy(col_a, col_b)
            .count()
            .limit(max_cells + 1)
            .collect()
        )
        if len(pairs) > max_cells:
            raise ValueError(
                f"contingency table exceeds max_cells={max_cells}; "
                "bin the columns first"
            )
        if not pairs:
            return True, {"observed_value": None}
        a_vals = sorted({r[0] for r in pairs}, key=str)
        b_vals = sorted({r[1] for r in pairs}, key=str)
        a_idx = {v: i for i, v in enumerate(a_vals)}
        b_idx = {v: i for i, v in enumerate(b_vals)}
        table = [[0.0] * len(b_vals) for _ in a_vals]
        n = 0
        for r in pairs:
            table[a_idx[r[0]]][b_idx[r[1]]] = float(r[2])
            n += r[2]
        # ref divides by get_row_count() (the full table count)
        total_rows = stats.get("table.row_count") or n
        _, v = cramers_v(table, total_rows)
        return v <= threshold, {
            "observed_value": v,
            "details": {
                "crosstab": {
                    "index": [str(x) for x in a_vals],
                    "columns": [str(x) for x in b_vals],
                    "values": table,
                }
            },
        }

    return JobCheck(
        index=index,
        config=cfg,
        needs={"table.row_count": F.count(F.lit(1))},
        run=run,
    )


DISTRIBUTION_COMPILERS = {
    "expect_column_kl_divergence_to_be_less_than": compile_kl_divergence,
    "expect_column_chisquare_test_p_value_to_be_greater_than": compile_chisquare_p_value,
    "expect_column_bootstrapped_ks_test_p_value_to_be_greater_than": compile_ks_p_value,
    "expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than": compile_parameterized_ks_p_value,
    "expect_column_pair_cramers_phi_value_to_be_less_than": compile_cramers_phi_less_than,
    "expect_column_psi_to_be_less_than": compile_psi_less_than,
}
