"""Watermarked event-time windowed drift validation.

Extends the foreachBatch bridge (validate_stream.py) with the one
genuinely STREAMING check a validation engine needs: "did this
column's distribution drift inside each event-time window?" —
computed with built-in Structured Streaming operators only:

    readStream
      -> withWatermark(ts_col, watermark)        late data bounded
      -> groupBy(window(ts_col, window_len))
           .agg(one conditional count per baseline bin)   incremental
      -> per-window PSI vs the profiled baseline           projection

No applyInPandasWithState and no foreachBatch: conditional sums over
a time window ARE the engine's fused-agg pattern, so Spark maintains
O(#open windows x #bins) state, handles late arrivals up to the
watermark, and evicts closed windows — the same math as the batch
psi_drift check (operators/distribution.py), just grouped by
event-time window.

The baseline is a categorical/continuous partition object exactly as
`profile_table` emits (bins + weights), so batch-profiled baselines
drive streaming monitors without conversion.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# PSI epsilon — same smoothing as the batch PSI implementation so a
# windowed result over identical rows matches the batch number
_EPS = 1e-6


def _bin_condition(col: Column, bins: List[float], i: int) -> Column:
    lo, hi = bins[i], bins[i + 1]
    if i == len(bins) - 2:
        return (col >= F.lit(lo)) & (col <= F.lit(hi))
    return (col >= F.lit(lo)) & (col < F.lit(hi))


def windowed_psi_drift(
    stream_df: DataFrame,
    column: str,
    baseline: Dict[str, Any],
    ts_col: str = "ts",
    window_len: str = "10 minutes",
    watermark: str = "5 minutes",
    slide: Optional[str] = None,
    threshold: float = 0.2,
) -> DataFrame:
    """Streaming DataFrame of per-window PSI against a baseline
    partition ({"bins": [...], "weights": [...]} — profile_table's
    numeric partition object, or {"values": [...], "weights": [...]}
    for categoricals).

    Output columns: window_start, window_end, n, psi, drifted.
    Append-mode sinks emit each window once its watermark passes.
    """
    c = F.col(column)
    if "bins" in baseline:
        bins = [float(b) for b in baseline["bins"]]
        weights = list(baseline["weights"])
        conds = [
            _bin_condition(c, bins, i) for i in range(len(bins) - 1)
        ]
    else:
        values = list(baseline["values"])
        weights = list(baseline["weights"])
        conds = [c == F.lit(v) for v in values]

    counts = [
        F.sum(F.when(cond, 1).otherwise(0)).alias(f"b{i}")
        for i, cond in enumerate(conds)
    ]
    w = F.window(F.col(ts_col), window_len, slide or window_len)
    agg = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), *counts)
    )

    total_binned = sum(
        (F.col(f"b{i}") for i in range(1, len(conds))),
        F.col("b0"),
    )
    psi_terms = []
    for i, base_w in enumerate(weights):
        actual = F.col(f"b{i}") / F.greatest(total_binned, F.lit(1))
        a = F.greatest(actual, F.lit(_EPS))
        b = F.lit(max(float(base_w), _EPS))
        psi_terms.append((a - b) * F.log(a / b))
    psi = sum(psi_terms[1:], psi_terms[0])

    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        F.col("n"),
        F.round(psi, 6).alias("psi"),
        (psi > F.lit(threshold)).alias("drifted"),
    )


def start_windowed_drift_monitor(
    stream_df: DataFrame,
    column: str,
    baseline: Dict[str, Any],
    result_path: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    window_len: str = "10 minutes",
    watermark: str = "5 minutes",
    threshold: float = 0.2,
    trigger_available_now: bool = True,
):
    """Run the windowed drift check to a parquet sink (append mode —
    one row per closed window); returns the StreamingQuery."""
    out = windowed_psi_drift(
        stream_df,
        column,
        baseline,
        ts_col=ts_col,
        window_len=window_len,
        watermark=watermark,
        threshold=threshold,
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", result_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_distinct_stats(
    stream_df: DataFrame,
    column: str,
    ts_col: str = "ts",
    window_len: str = "10 minutes",
    watermark: str = "5 minutes",
    slide: Optional[str] = None,
    rsd: float = 0.05,
    min_distinct: Optional[int] = None,
    min_distinct_ratio: Optional[float] = None,
) -> DataFrame:
    """Per-event-time-window approximate distinct cardinality of
    ``column`` — the upstream-failure signal PSI can't see: a stuck
    producer replaying one ID keeps the VALUE distribution of every
    other column plausible while the key cardinality collapses.

    Distinct is approx_count_distinct (HyperLogLog++, fixed-size
    partials) so the streaming state per open window is O(sketch),
    not O(distinct values) — an exact streaming countDistinct would
    hold every distinct key of every open window in the state store.
    Output: window_start, window_end, n, distinct_est,
    distinct_ratio, collapsed (true when distinct_est < min_distinct
    or distinct_ratio < min_distinct_ratio; false when neither bound
    is given). Append-mode sinks emit each window once the watermark
    passes its end; same operator shape as windowed_psi_drift, so
    state is evicted with closed windows.
    """
    w = F.window(F.col(ts_col), window_len, slide or window_len)
    agg = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct(column, rsd).alias("distinct_est"),
        )
    )
    ratio = F.col("distinct_est") / F.greatest(
        F.col("n"), F.lit(1)
    )
    collapsed = F.lit(False)
    if min_distinct is not None:
        collapsed = collapsed | (
            F.col("distinct_est") < F.lit(int(min_distinct))
        )
    if min_distinct_ratio is not None:
        collapsed = collapsed | (
            ratio < F.lit(float(min_distinct_ratio))
        )
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        F.col("n"),
        F.col("distinct_est"),
        F.round(ratio, 6).alias("distinct_ratio"),
        collapsed.alias("collapsed"),
    )


def windowed_quantile_stats(
    stream_df: DataFrame,
    column: str,
    quantiles=(0.5, 0.95, 0.99),
    ts_col: str = "ts",
    window_len: str = "10 minutes",
    watermark: str = "5 minutes",
    slide: Optional[str] = None,
    sketch_k: int = 200,
    upper_bounds: Optional[Dict[float, float]] = None,
) -> DataFrame:
    """Per-event-time-window quantiles of a numeric column via a
    Datasketches KLL sketch — tail-latency/size monitoring (p50/p95/
    p99) with O(sketch) streaming state per open window; an exact
    streaming percentile would hold every value of every open window
    in the state store. ``upper_bounds`` maps quantile -> max allowed
    value; ``breached`` is true when any bound is exceeded. Output
    columns are named p50 / p95 / p99 / p99_9 after the quantile.
    Same watermark/append shape as the other windowed monitors, so
    closed windows evict their state."""
    qs = [float(q) for q in quantiles]
    names = [
        "p" + ("%g" % (q * 100)).replace(".", "_") for q in qs
    ]
    c = F.col(column).cast("double")
    sk = F.kll_sketch_agg_double(c, F.lit(int(sketch_k)))
    qarr = F.when(
        F.kll_sketch_get_n_double(sk) > 0,
        F.kll_sketch_get_quantile_double(
            sk, F.array(*[F.lit(q) for q in qs])
        ),
    )
    w = F.window(F.col(ts_col), window_len, slide or window_len)
    agg = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), qarr.alias("__q"))
    )
    breached = F.lit(False)
    if upper_bounds:
        for q, bound in upper_bounds.items():
            i = qs.index(float(q))
            breached = breached | (
                F.element_at("__q", i + 1) > F.lit(float(bound))
            )
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        F.col("n"),
        *[
            F.element_at("__q", i + 1).alias(names[i])
            for i in range(len(qs))
        ],
        breached.alias("breached"),
    )


def windowed_mix_stats(
    stream_df: DataFrame,
    column: str,
    targets: Dict[str, float],
    ts_col: str = "ts",
    window_len: str = "10 minutes",
    watermark: str = "5 minutes",
    slide: Optional[str] = None,
    tolerance: float = 0.05,
) -> DataFrame:
    """Per-event-time-window composition of ``column`` against a
    target mix — the streaming face of source_mix_sample's
    accounting and the expect_column_value_share_to_match_targets
    gate: an upstream source going quiet (or a replay flooding one
    source) skews the mix long before any value distribution drifts.

    One conditional count per tracked value inside ONE windowed agg
    (the windowed_psi_drift bin-count shape), so streaming state is
    O(#open windows x #targets) — grouping by (window, value) would
    need a second streaming agg for the window total, which
    Structured Streaming disallows, and per-value state rows besides.
    The per-value rows are a post-agg inline projection.

    Output (append mode, one row per window x tracked value once the
    watermark closes the window): window_start, window_end, n,
    value, share, target, deviation, off_target.
    """
    if not targets:
        raise ValueError("windowed_mix_stats requires a non-empty "
                         "`targets` dict of value -> proportion")
    vals = sorted(targets)
    w = F.window(F.col(ts_col), window_len, slide or window_len)
    conds = [
        F.sum(
            F.when(F.col(column) == F.lit(v), 1).otherwise(0)
        ).alias(f"__c{i}")
        for i, v in enumerate(vals)
    ]
    agg = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), *conds)
    )
    share_rows = F.array(
        *[
            F.struct(
                F.lit(str(v)).alias("value"),
                (F.col(f"__c{i}") / F.greatest(F.col("n"), F.lit(1)))
                .alias("share"),
                F.lit(float(targets[v])).alias("target"),
            )
            for i, v in enumerate(vals)
        ]
    )
    rows = agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        F.col("n"),
        F.inline(share_rows),
    )
    deviation = F.abs(F.col("share") - F.col("target"))
    return rows.select(
        "window_start",
        "window_end",
        "n",
        "value",
        F.round("share", 6).alias("share"),
        "target",
        F.round(deviation, 6).alias("deviation"),
        (deviation > F.lit(float(tolerance))).alias("off_target"),
    )
