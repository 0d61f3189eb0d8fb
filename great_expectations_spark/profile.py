"""Table profiling → baseline.json → auto-generated expectation suite.

Replicates the CONCEPT of the reference's onboarding DataAssistant
(rule_based_profiler/data_assistant/onboarding_data_assistant.py:
46-476 — emit min/max/between/uniqueness/nullness expectations from
profiled metric estimates) without its rule machinery: one fused
profiling pass produces a per-column baseline (stats + GE-schema
partition objects, execution_engine/util.py:77-192), which

  * drift checks consume directly (KL / PSI / KS take
    ``partition_object=baseline["columns"][col]["partition"]``), and
  * ``suite_from_baseline`` turns into a ready-to-run suite.

Scale shape: ONE df.agg for every numeric/string stat across all
columns (min/max/mean/stddev/nonnull/approx-distinct fused), ONE
multi-column approxQuantile job for all numeric bins, and per-column
value_counts jobs ONLY for columns the fused pass showed to be
low-cardinality. Payload (binary) columns are profiled by length, not
content, so the profiling pass never decodes images.
"""

from __future__ import annotations

import json
import time
from typing import Any, Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .operators.distribution import (
    build_categorical_partition_object,
)
from .core.config import ExpectationSuite

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_CATEGORICAL_MAX_DISTINCT = 50


def profile_table(
    df: DataFrame,
    columns: Optional[List[str]] = None,
    n_bins: int = 10,
    quantile_rel_err: float = 0.001,
    head_rows: int = 5,
    approximate: bool = False,
    sketch_k: int = 200,
) -> Dict[str, Any]:
    """Profile a DataFrame into a baseline dict (JSON-serializable).
    Includes a `head` sample (table.head, ref table_head.py:143-157)
    for the docs/preview flow; binary cells are elided to lengths.

    ``approximate=True`` collapses numeric profiling to ONE scan: each
    numeric column adds a Datasketches KLL sketch to the fused pass-1
    agg; bin EDGES come from the sketch's quantiles and bin WEIGHTS
    from its rank function — so passes 2 (approxQuantile) and 3 (the
    histogram-weight agg) never touch the table. At 100 TB that's the
    difference between one and three full scans for a
    baseline-then-drift workflow; accuracy is the sketch's normalized
    rank error (~1.65% at the default k=200 — plenty for PSI/KS
    baselines, which smooth by eps anyway). Low-cardinality string
    value_counts remain separate (cheap, pruned) jobs in both modes.
    """
    fields = [
        f for f in df.schema.fields if columns is None or f.name in columns
    ]
    qs = [i / n_bins for i in range(n_bins + 1)]

    # ---- pass 1: ONE fused agg over every column --------------------
    exprs = [F.count(F.lit(1)).alias("__n")]
    for f in fields:
        c = F.col(f.name)
        a = f.name
        exprs.append(
            F.sum(F.when(c.isNotNull(), 1).otherwise(0)).alias(f"nn:{a}")
        )
        exprs.append(F.approx_count_distinct(c).alias(f"ad:{a}"))
        if isinstance(f.dataType, _NUMERIC):
            exprs.extend(
                [
                    F.min(c).alias(f"min:{a}"),
                    F.max(c).alias(f"max:{a}"),
                    F.avg(c).alias(f"mean:{a}"),
                    F.stddev_samp(c).alias(f"std:{a}"),
                ]
            )
            if approximate:
                sk = F.kll_sketch_agg_double(
                    c.cast("double"), F.lit(int(sketch_k))
                )
                # empty-sketch quantile extraction throws; when()
                # short-circuits it (all-null column -> None edges)
                exprs.append(
                    F.when(
                        F.kll_sketch_get_n_double(sk) > 0,
                        F.kll_sketch_get_quantile_double(
                            sk, F.array(*[F.lit(q) for q in qs])
                        ),
                    ).alias(f"kq:{a}")
                )
                exprs.append(sk.alias(f"kll:{a}"))
        elif isinstance(f.dataType, T.StringType):
            exprs.extend(
                [
                    F.min(F.length(c)).alias(f"lmin:{a}"),
                    F.max(F.length(c)).alias(f"lmax:{a}"),
                ]
            )
        elif isinstance(f.dataType, T.BinaryType):
            exprs.extend(
                [
                    F.min(F.length(c)).alias(f"lmin:{a}"),
                    F.max(F.length(c)).alias(f"lmax:{a}"),
                    F.avg(F.length(c)).alias(f"lmean:{a}"),
                ]
            )
    row = df.agg(*exprs).first()
    n = row["__n"]

    # ---- pass 2: numeric bin edges ----------------------------------
    # approximate mode: edges were already extracted from the pass-1
    # KLL sketches (zero extra scans); exact mode: ONE multi-column
    # approxQuantile job
    num_cols = [f.name for f in fields if isinstance(f.dataType, _NUMERIC)]
    edges_by_col: Dict[str, List[float]] = {}
    if num_cols and n > 0:
        if approximate:
            edges_by_col = {
                a: list(row[f"kq:{a}"] or []) for a in num_cols
            }
        else:
            all_edges = df.approxQuantile(num_cols, qs, quantile_rel_err)
            edges_by_col = dict(zip(num_cols, all_edges))

    # approximate mode: bin weights from the sketches' rank function —
    # one LOCAL job over (col, sketch, deduped-edges) rows, never the
    # table. kll_sketch_get_rank_double is inclusive (fraction of
    # values <= e), so weight_i = rank(edge_{i+1}) - rank(edge_i).
    ranks_by_col: Dict[str, List[float]] = {}
    if approximate and num_cols and n > 0:
        sk_rows = []
        for a in num_cols:
            s = row[f"kll:{a}"]
            edges = edges_by_col.get(a) or []
            dedup: List[float] = []
            for e in edges:
                if e is not None and (not dedup or e > dedup[-1]):
                    dedup.append(float(e))
            if s is not None and len(dedup) >= 2:
                sk_rows.append((a, bytes(s), dedup))
        if sk_rows:
            spark = df.sparkSession
            # Rank semantics must match the drift check's bin
            # conditions ([lo, hi) per bin, [lo, hi] for the last):
            # kll_sketch_get_rank_double is INCLUSIVE (fraction <= v),
            # so interior edges query the rank of the largest float64
            # BELOW the edge — math.nextafter(e, -inf) — which is
            # exactly "fraction < e" (on lattice-valued columns ALL
            # the mass sits on edges and inclusive ranks would shift
            # every bin by one point mass). A relative offset like
            # spacing*1e-6 rounds back to e in float64 once edge
            # magnitude/spacing passes ~1e10 (nanosecond-epoch
            # columns), silently turning the rank inclusive; only the
            # final edge uses the inclusive rank. The rank value must
            # be FOLDABLE (a literal), so each column gets a when()
            # branch with its own literal edges — still one local job
            # over len(num_cols) rows.
            import math

            ranks_expr = None
            for a, _s, dedup in sk_rows:
                branch = F.array(
                    *[
                        F.kll_sketch_get_rank_double(
                            "s", F.lit(math.nextafter(e, -math.inf))
                        )
                        for e in dedup
                    ],
                    F.kll_sketch_get_rank_double("s", F.lit(dedup[-1])),
                )
                ranks_expr = (
                    F.when(F.col("col") == a, branch)
                    if ranks_expr is None
                    else ranks_expr.when(F.col("col") == a, branch)
                )
            rrows = (
                spark.createDataFrame(
                    [(a, s) for a, s, _ in sk_rows], "col string, s binary"
                )
                .select("col", ranks_expr.alias("ranks"))
                .collect()
            )
            ranks_by_col = {r["col"]: list(r["ranks"]) for r in rrows}

    # ---- pass 3: value_counts only where pass 1 showed low card -----
    head: List[Dict[str, Any]] = []
    if head_rows > 0:
        for r in df.head(head_rows):
            d = r.asDict()
            head.append(
                {
                    k: (f"<binary:{len(v)}B>" if isinstance(v, (bytes, bytearray)) else v)
                    for k, v in d.items()
                }
            )
    baseline: Dict[str, Any] = {
        "profiled_at": time.time(),
        "row_count": n,
        "head": head,
        "columns": {},
    }
    for f in fields:
        a = f.name
        nonnull = row[f"nn:{a}"] or 0
        col_info: Dict[str, Any] = {
            "type": type(f.dataType).__name__,
            "nonnull": nonnull,
            "null_fraction": (1 - nonnull / n) if n else 0.0,
            "approx_distinct": int(row[f"ad:{a}"] or 0),
        }
        if isinstance(f.dataType, _NUMERIC):
            col_info.update(
                {
                    "min": row[f"min:{a}"],
                    "max": row[f"max:{a}"],
                    "mean": row[f"mean:{a}"],
                    "stddev": row[f"std:{a}"],
                }
            )
            edges = edges_by_col.get(a) or []
            bins: List[float] = []
            for e in edges:
                if e is not None and (not bins or e > bins[-1]):
                    bins.append(float(e))
            if len(bins) >= 2 and nonnull:
                if approximate:
                    ranks = ranks_by_col.get(a)
                    if not ranks:
                        baseline["columns"][a] = col_info
                        continue
                    # ranks[:m] are exclusive ranks at the m edges,
                    # ranks[m] the inclusive rank at the last edge;
                    # bin i = [e_i, e_{i+1}) except the last, [lo, hi]
                    m = len(bins)
                    weights = [
                        max(0.0, ranks[i + 1] - ranks[i])
                        for i in range(m - 2)
                    ] + [max(0.0, ranks[m] - ranks[m - 2])]
                else:
                    hist_exprs = []
                    for i in range(len(bins) - 1):
                        lo, hi = bins[i], bins[i + 1]
                        c = F.col(a)
                        cond = (c >= F.lit(lo)) & (
                            (c <= F.lit(hi))
                            if i == len(bins) - 2
                            else (c < F.lit(hi))
                        )
                        hist_exprs.append(
                            F.sum(F.when(cond, 1).otherwise(0)).alias(
                                f"b{i}"
                            )
                        )
                    hrow = df.agg(*hist_exprs).first()
                    weights = [
                        (hrow[f"b{i}"] or 0) / nonnull
                        for i in range(len(bins) - 1)
                    ]
                tail = max(0.0, (1.0 - sum(weights)) / 2.0)
                col_info["partition"] = {
                    "bins": bins,
                    "weights": weights,
                    "tail_weights": [tail, tail],
                }
        elif isinstance(f.dataType, T.StringType):
            col_info["len_min"] = row[f"lmin:{a}"]
            col_info["len_max"] = row[f"lmax:{a}"]
            if 0 < col_info["approx_distinct"] <= _CATEGORICAL_MAX_DISTINCT:
                col_info["partition"] = build_categorical_partition_object(
                    df, a
                )
        elif isinstance(f.dataType, T.BinaryType):
            col_info["len_min"] = row[f"lmin:{a}"]
            col_info["len_max"] = row[f"lmax:{a}"]
            col_info["len_mean"] = row[f"lmean:{a}"]
        baseline["columns"][a] = col_info
    return baseline


def save_baseline(baseline: Dict[str, Any], path: str) -> None:
    with open(path, "w") as f:
        json.dump(baseline, f, indent=2, default=str)


def load_baseline(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)


def suite_from_baseline(
    baseline: Dict[str, Any],
    name: str = "profiled",
    null_margin: float = 0.01,
    range_margin: float = 0.1,
    drift: str = "psi",
    drift_threshold: float = 0.2,
) -> ExpectationSuite:
    """Generate a suite from a baseline: nullness with observed+margin
    `mostly`, min/max with a relative margin, uniqueness when the
    profile says values were unique, set membership for low-cardinality
    strings, and a drift check against each profiled partition."""
    suite = ExpectationSuite(name=name)
    n = baseline.get("row_count", 0)
    for col, info in baseline["columns"].items():
        nf = info.get("null_fraction", 0.0)
        if nf == 0:
            suite.expect("expect_column_values_to_not_be_null", column=col)
        elif nf < 0.5:
            suite.expect(
                "expect_column_values_to_not_be_null",
                column=col,
                mostly=max(0.0, round(1 - nf - null_margin, 4)),
            )
        if "min" in info and info["min"] is not None:
            lo, hi = float(info["min"]), float(info["max"])
            span = (hi - lo) or abs(lo) or 1.0
            suite.expect(
                "expect_column_values_to_be_between",
                column=col,
                min_value=lo - range_margin * span,
                max_value=hi + range_margin * span,
            )
        if (
            n
            and info.get("nonnull")
            and info.get("approx_distinct", 0) >= 0.98 * info["nonnull"]
            and info["nonnull"] >= 0.5 * n
        ):
            suite.expect(
                "expect_column_values_to_be_unique", column=col, mostly=0.98
            )
        part = info.get("partition")
        if part and "values" in part:
            suite.expect(
                "expect_column_values_to_be_in_set",
                column=col,
                value_set=list(part["values"]),
                mostly=0.99,
            )
        if part:
            expectation = (
                "expect_column_psi_to_be_less_than"
                if drift == "psi"
                else "expect_column_kl_divergence_to_be_less_than"
            )
            suite.expect(
                expectation,
                column=col,
                partition_object=part,
                threshold=drift_threshold,
            )
    return suite


# =============================================================================
# Multi-batch profiling — the concept replacement for the reference's
# OnboardingDataAssistant (rule_based_profiler/data_assistant/
# onboarding_data_assistant.py:46-476), which estimates each metric's
# plausible range from its distribution ACROSS batches rather than
# from a single batch. One fused-agg profile per batch (no extra scans
# vs profiling each batch once); cross-batch estimation is driver-side
# arithmetic on the per-batch summaries.
# =============================================================================


def profile_batches(
    dfs: List[DataFrame],
    columns: Optional[List[str]] = None,
    n_bins: int = 10,
) -> Dict[str, Any]:
    """Profile each batch and fold the per-batch metric values into
    cross-batch ranges: for every (column, metric) the observed
    values, their min/max/mean across batches, and the batch count —
    the inputs the range estimator in suite_from_batches consumes."""
    if not dfs:
        raise ValueError("profile_batches needs at least one batch")
    per_batch = [
        profile_table(df, columns=columns, n_bins=n_bins, head_rows=0)
        for df in dfs
    ]
    tracked = (
        "min", "max", "mean", "stddev", "null_fraction",
        "approx_distinct", "len_min", "len_max",
    )
    multi: Dict[str, Dict[str, Any]] = {}
    for prof in per_batch:
        for col, info in prof["columns"].items():
            slot = multi.setdefault(col, {"type": info["type"]})
            for m in tracked:
                v = info.get(m)
                if v is None:
                    continue
                slot.setdefault(m, []).append(float(v))
    summary: Dict[str, Any] = {}
    for col, slot in multi.items():
        summary[col] = {"type": slot["type"]}
        for m, vals in slot.items():
            if m == "type":
                continue
            summary[col][m] = {
                "values": vals,
                "min": min(vals),
                "max": max(vals),
                "mean": sum(vals) / len(vals),
            }
    return {
        "profiled_at": time.time(),
        "n_batches": len(dfs),
        "row_counts": [p["row_count"] for p in per_batch],
        "batches": per_batch,
        "columns": summary,
    }


def bootstrap_quantile_range(
    values: List[float],
    false_positive_rate: float = 0.05,
    n_resamples: int = 1000,
    seed: int = 0,
    bias_std_error_ratio_threshold: float = 0.25,
) -> "tuple[float, float]":
    """Bootstrap point estimates of the (fpr/2, 1-fpr/2) quantiles of
    a per-batch metric-value sample — the reference's "bootstrap"
    range estimator (rule_based_profiler/helpers/util.py:716
    ``compute_bootstrap_quantiles_point_estimate``, Efron &
    Tibshirani bias-corrected): resample the k batch values with
    replacement n_resamples times, take each resample's lower/upper
    quantile, and correct the sample quantile by the bootstrap bias
    when the bias is large relative to its standard error (ref
    util.py:847-900 ``_determine_quantile_bias_corrected_point_
    estimate``; same default 0.25 ratio threshold).

    Driver-side numpy over k ≈ n_batches scalars — never over rows —
    so cost is O(n_resamples·k) regardless of table size."""
    import numpy as np

    arr = np.asarray(values, dtype=float)
    lo_q = false_positive_rate / 2.0
    hi_q = 1.0 - false_positive_rate / 2.0
    sample_lo = float(np.quantile(arr, lo_q, method="linear"))
    sample_hi = float(np.quantile(arr, hi_q, method="linear"))
    rng = np.random.Generator(np.random.PCG64(seed))
    boots = rng.choice(arr, size=(n_resamples, arr.size), replace=True)

    def corrected(sample_q: float, q: float) -> float:
        bq = np.quantile(boots, q, axis=1, method="linear")
        bias = float(bq.mean()) - sample_q
        std_err = float(bq.std(ddof=1)) if bq.size > 1 else 0.0
        est = sample_q
        if std_err > 0 and abs(bias) / std_err > (
            bias_std_error_ratio_threshold
        ):
            est = sample_q - bias
        # clamp into the observed support: with tiny k and a heavy
        # outlier the raw correction 'sample - bias' can overshoot
        # clear past the data (the reference's formula shares this
        # pathology; a quantile point estimate outside [min, max] is
        # never the right answer for bound-setting)
        return float(min(max(est, arr.min()), arr.max()))

    return corrected(sample_lo, lo_q), corrected(sample_hi, hi_q)


def suite_from_batches(
    multibatch: Dict[str, Any],
    name: str = "multibatch-profiled",
    slack: float = 0.25,
    rel_floor: float = 0.05,
    estimator: str = "range",
    false_positive_rate: float = 0.05,
    n_resamples: int = 1000,
    seed: int = 0,
) -> ExpectationSuite:
    """Derive a suite from cross-batch metric ranges, the assistant's
    range-estimator shape (ref onboarding_data_assistant.py:100-476
    via NumericMetricRangeMultiBatchParameterBuilder):

    - ``estimator="range"`` — a metric observed in [lo, hi] across
      batches gets those observed extremes as the core interval.
    - ``estimator="bootstrap"`` — the core interval is the
      bias-corrected bootstrap point estimate of the
      (fpr/2, 1-fpr/2) quantiles of the per-batch values
      (:func:`bootstrap_quantile_range`), the reference's default
      estimator; robust to one outlier batch where "range" is not.

    Either interval is then padded by max(slack*spread,
    rel_floor*magnitude). The relative floor matters when a handful
    of batches agree tightly — the observed spread then underestimates
    sampling variance (HLL distinct counts carry ~2% error, stddev has
    sampling noise), and an unpadded interval would fail fresh
    same-distribution batches. (The reference hits the same small-k
    limitation: a batch-level bootstrap cannot see outside the
    observed support, so bounds stay point-estimate-tight without a
    floor.)"""
    if estimator not in ("range", "bootstrap"):
        raise ValueError(
            f"unknown estimator {estimator!r}: use 'range' or 'bootstrap'"
        )
    suite = ExpectationSuite(name=name)

    def bounds(rng: Dict[str, Any]):
        if estimator == "bootstrap" and len(rng["values"]) > 1:
            lo, hi = bootstrap_quantile_range(
                rng["values"],
                false_positive_rate=false_positive_rate,
                n_resamples=n_resamples,
                seed=seed,
            )
        else:
            lo, hi = rng["min"], rng["max"]
        spread = hi - lo
        pad = max(
            slack * spread, rel_floor * max(abs(lo), abs(hi), 1.0)
        )
        return lo - pad, hi + pad

    for col, info in multibatch["columns"].items():
        nf = info.get("null_fraction")
        if nf is not None:
            worst = nf["max"]
            if worst == 0:
                suite.expect(
                    "expect_column_values_to_not_be_null", column=col
                )
            elif worst < 0.5:
                suite.expect(
                    "expect_column_values_to_not_be_null",
                    column=col,
                    mostly=max(
                        0.0, round(1 - worst * (1 + slack), 4)
                    ),
                )
        if "min" in info and "max" in info:
            lo, _ = bounds(info["min"])
            _, hi = bounds(info["max"])
            suite.expect(
                "expect_column_values_to_be_between",
                column=col,
                min_value=lo,
                max_value=hi,
            )
        if "mean" in info:
            lo, hi = bounds(info["mean"])
            suite.expect(
                "expect_column_mean_to_be_between",
                column=col,
                min_value=lo,
                max_value=hi,
            )
        if "stddev" in info:
            lo, hi = bounds(info["stddev"])
            suite.expect(
                "expect_column_stdev_to_be_between",
                column=col,
                min_value=max(0.0, lo),
                max_value=hi,
            )
        if "approx_distinct" in info:
            lo, hi = bounds(info["approx_distinct"])
            suite.expect(
                "expect_column_unique_value_count_to_be_between",
                column=col,
                min_value=max(0, int(lo)),
                max_value=int(hi) + 1,
            )
    return suite
