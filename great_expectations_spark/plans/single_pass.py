"""Single-pass per-partition suite execution.

The classic plan (plans/planner.py) runs phase 1 (fused df.agg) and
phase 2 (violations harvest) as two separate scans. For payload-heavy
tables that means decoding every image twice. This module compiles the
same work into ONE Spark job:

    df.groupBy(spark_partition_id()).agg(
        <partial stats: counts / sums / mins / maxs / (n, mean, M2)>,
        <per-check bounded violation slices:
             slice(collect_list(when(cond, value)), 1, K)>,
    )

followed by a driver-side merge of the per-partition partials (Chan's
parallel variance merge for stddev). Violation memory stays bounded at
O(K x checks x partitions) exactly like the classic harvest's
two-level slice. Aggregates that cannot be merged from partition
partials (countDistinct) go to a LEFTOVER df.agg job — which Catalyst
column-prunes, so it never touches payload columns and costs a cheap
scalar scan.

This is the literal realization of the target architecture: "all
per-column stats run as a single fused multi-aggregate pass per
partition ... and violation rows are emitted with the same
per-partition pass/fail result schema" — and it is also how the run
resumes from a checkpoint: the per-partition rows this pass produces
ARE the lineage/metrics table (see checkpoint/).

Stat-key contract (planner-internal names):
    table.row_count                 count          merge: sum
    nonnull:<c> / considered:<k>    sum(when)      merge: sum
    unexpected:<i>                  sum(when)      merge: sum
    column.min:<c> / column.max:<c> min/max        merge: min/max
    column.mean:<c>                 sum+count      merge: weighted
    column.sum:<c>                  sum            merge: sum
    column.standard_deviation:<c>   n, mean, M2    merge: Chan
    anything else                   -> leftover df.agg job
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class _Merge:
    """How to turn per-partition partial values into the final stat."""

    def __init__(self, kind: str, aliases: List[str]):
        self.kind = kind
        self.aliases = aliases


def _col_of(key: str) -> str:
    return key.split(":", 1)[1]


def plan_stat_partials(
    stat_keys: Dict[str, Column],
) -> Tuple[Dict[str, Column], Dict[str, _Merge], Dict[str, Column]]:
    """Split stat needs into per-partition partial expressions plus
    merge recipes, and leftover (non-mergeable) exprs."""
    partials: Dict[str, Column] = {}
    merges: Dict[str, _Merge] = {}
    leftover: Dict[str, Column] = {}
    i = 0

    def add(expr: Column) -> str:
        nonlocal i
        alias = f"p{i}"
        i += 1
        partials[alias] = expr
        return alias

    for key, expr in stat_keys.items():
        if key == "table.row_count":
            merges[key] = _Merge("sum0", [add(F.count(F.lit(1)))])
        elif key.startswith(("nonnull:", "considered:", "unexpected:")):
            # already a sum(when(...)) — partial sums merge by addition
            merges[key] = _Merge("sum0", [add(expr)])
        elif key.startswith("column.min:"):
            merges[key] = _Merge("min", [add(expr)])
        elif key.startswith("column.max:"):
            merges[key] = _Merge("max", [add(expr)])
        elif key.startswith("column.sum:"):
            merges[key] = _Merge("sum", [add(expr)])
        elif key.startswith("column.mean:"):
            c = F.col(_col_of(key))
            merges[key] = _Merge(
                "mean",
                [
                    add(F.sum(c)),
                    add(F.sum(F.when(c.isNotNull(), 1).otherwise(0))),
                ],
            )
        elif key.startswith("column.standard_deviation:"):
            c = F.col(_col_of(key))
            n = F.sum(F.when(c.isNotNull(), 1).otherwise(0))
            merges[key] = _Merge(
                "stddev",
                [
                    add(n),
                    add(F.avg(c)),
                    # M2 = var_samp * (n-1); 0 for single-element parts
                    add(
                        F.coalesce(
                            F.var_samp(c) * (n - F.lit(1)), F.lit(0.0)
                        )
                    ),
                ],
            )
        else:
            leftover[key] = expr
    return partials, merges, leftover


def merge_stat_rows(
    rows: List[Any], merges: Dict[str, _Merge]
) -> Dict[str, Any]:
    """Driver-side merge of the collected per-partition partials."""
    stats: Dict[str, Any] = {}
    for key, m in merges.items():
        vals = [[r[a] for a in m.aliases] for r in rows]
        if m.kind == "sum0":
            stats[key] = sum(v[0] or 0 for v in vals)
        elif m.kind == "sum":
            nonnull = [v[0] for v in vals if v[0] is not None]
            stats[key] = sum(nonnull) if nonnull else None
        elif m.kind == "min":
            nonnull = [v[0] for v in vals if v[0] is not None]
            stats[key] = min(nonnull) if nonnull else None
        elif m.kind == "max":
            nonnull = [v[0] for v in vals if v[0] is not None]
            stats[key] = max(nonnull) if nonnull else None
        elif m.kind == "mean":
            s = sum(v[0] for v in vals if v[0] is not None)
            n = sum(v[1] or 0 for v in vals)
            stats[key] = (s / n) if n else None
        elif m.kind == "stddev":
            # Chan et al. pairwise merge of (n, mean, M2) partials —
            # numerically stable across any partition count
            n, mean, m2 = 0, 0.0, 0.0
            for v in vals:
                n_i = v[0] or 0
                if n_i == 0:
                    continue
                mean_i = v[1]
                m2_i = v[2] or 0.0
                delta = mean_i - mean
                n_new = n + n_i
                m2 += m2_i + delta * delta * n * n_i / n_new
                mean = (mean * n + mean_i * n_i) / n_new
                n = n_new
            if n < 2:
                # match F.stddev_samp: NaN for a single value, null for none
                stats[key] = float("nan") if n == 1 else None
            else:
                stats[key] = math.sqrt(m2 / (n - 1))
    return stats


def violation_slice_expr(
    cond: Column, value: Column, cap: int, alias: str
) -> Column:
    """Bounded per-partition violation sample: the collect_list only
    ever holds values for rows matching cond, sliced to the cap."""
    return F.slice(
        F.collect_list(F.when(cond, value)), 1, cap
    ).alias(alias)


def run_single_pass(
    df: DataFrame,
    partials: Dict[str, Column],
    violation_exprs: List[Column],
) -> List[Any]:
    """ONE Spark job: per-partition partial aggregation. No shuffle —
    the grouping key is spark_partition_id(), so Catalyst plans a
    partition-local hash agg and the driver receives one row per
    input partition."""
    exprs = [expr.alias(alias) for alias, expr in partials.items()]
    exprs.extend(violation_exprs)
    if not exprs:
        return []
    return (
        df.groupBy(F.spark_partition_id().alias("__pid"))
        .agg(*exprs)
        .collect()
    )
