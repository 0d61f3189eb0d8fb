"""Monotonicity checks with partition-boundary exchange.

The reference computes increasing/decreasing with
``F.lag(col).over(Window.orderBy(F.lit("constant")))`` — a
single-partition global window that serializes the whole table through
one task (column_values_increasing.py:143-146; flagged non-scalable in
SURVEY.md §7). We keep the same row-order semantics (scan order, which
is what an unordered orderBy(lit) yields on Spark) but compute it
scalably:

1. tag rows with ``monotonically_increasing_id`` (strictly increasing
   in (partition, position) order) and ``spark_partition_id``;
2. per-partition lag window (parallel — partitionBy(pid));
3. boundary rows (first/last non-null value of each partition via
   min_by/max_by) are collected to the driver — O(#partitions) — and
   cross-partition steps are checked there.
"""

from __future__ import annotations

from typing import Any, Dict

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..core.config import parse_result_format, result_format_at_least
from ..core.result import format_map_output, mostly_success
from .checks import JobCheck, MetricCache
from .common import get_mostly


def _compile_monotonic(index, cfg, schema, direction: str) -> JobCheck:
    column = cfg.kwargs["column"]
    strictly = bool(cfg.kwargs.get("strictly", False))
    mostly = get_mostly(cfg.kwargs)
    c = F.col(column)

    def step_ok(prev, cur):
        if direction == "increasing":
            return cur > prev if strictly else cur >= prev
        return cur < prev if strictly else cur <= prev

    def run(df, stats: Dict[str, Any], cache: MetricCache):
        rf = parse_result_format(
            cfg.kwargs.get("result_format", cache.result_format)
        )
        element_count = stats["table.row_count"]
        nonnull = stats[f"nonnull:{column}"]

        tagged = (
            df.select(c.alias("__v"))
            .withColumn("__mid", F.monotonically_increasing_id())
            .withColumn("__pid", F.spark_partition_id())
            .where(F.col("__v").isNotNull())
        )
        w = Window.partitionBy("__pid").orderBy("__mid")
        prev = F.lag("__v").over(w)
        cur = F.col("__v")
        if direction == "increasing":
            ok = (cur > prev) if strictly else (cur >= prev)
        else:
            ok = (cur < prev) if strictly else (cur <= prev)
        flagged = tagged.withColumn(
            "__bad", prev.isNotNull() & ~ok
        )

        cap = (
            cache.complete_cap
            if result_format_at_least(rf, "COMPLETE")
            else rf["partial_unexpected_count"]
        )
        # one job: per-partition violation counts + bounded samples +
        # boundary values
        agg = flagged.groupBy("__pid").agg(
            F.sum(F.when(F.col("__bad"), 1).otherwise(0)).alias("bad"),
            F.slice(
                F.collect_list(F.when(F.col("__bad"), F.col("__v"))), 1, cap
            ).alias("samples"),
            F.min_by("__v", "__mid").alias("first_v"),
            F.max_by("__v", "__mid").alias("last_v"),
        )
        rows = sorted(agg.collect(), key=lambda r: r["__pid"])

        unexpected_count = sum(r["bad"] for r in rows)
        samples = []
        for r in rows:
            samples.extend(r["samples"])
        # cross-partition boundary steps
        for i in range(1, len(rows)):
            prev_last = rows[i - 1]["last_v"]
            cur_first = rows[i]["first_v"]
            if prev_last is not None and cur_first is not None:
                if not step_ok(prev_last, cur_first):
                    unexpected_count += 1
                    samples.append(cur_first)
        samples = samples[:cap]

        unexpected_list = (
            samples if rf["result_format"] != "BOOLEAN_ONLY" else None
        )
        success = (
            True
            if element_count == 0 or nonnull == 0
            else mostly_success(nonnull, unexpected_count, mostly)
        )
        out = format_map_output(
            result_format=rf,
            success=success,
            element_count=element_count,
            nonnull_count=nonnull,
            unexpected_count=unexpected_count,
            unexpected_list=unexpected_list,
        )
        return out["success"], out.get("result", {})

    return JobCheck(
        index=index,
        config=cfg,
        needs={
            "table.row_count": F.count(F.lit(1)),
            f"nonnull:{column}": F.sum(F.when(c.isNotNull(), 1).otherwise(0)),
        },
        run=run,
    )


def compile_increasing(index, cfg, schema) -> JobCheck:
    return _compile_monotonic(index, cfg, schema, "increasing")


def compile_decreasing(index, cfg, schema) -> JobCheck:
    return _compile_monotonic(index, cfg, schema, "decreasing")


SEQUENCE_COMPILERS = {
    "expect_column_values_to_be_increasing": compile_increasing,
    "expect_column_values_to_be_decreasing": compile_decreasing,
}
