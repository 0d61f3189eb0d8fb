"""Referential-integrity checks (ours; the reference has no join-based
expectation — closest are in_set with a literal set and
QueryExpectation SQL, SURVEY.md §2.2 "Joins").

expect_foreign_keys_to_exist: every (non-null) foreign-key tuple in the
batch must exist in a reference table. Implemented as a left-anti join
against the distinct key projection of the dimension side; the
dimension is broadcast when small (explicit hint via ``broadcast=True``
or left to AQE + autoBroadcastJoinThreshold otherwise). Violation rows
are exactly the anti-join output.
"""

from __future__ import annotations

from functools import reduce
from typing import Any, Dict, List

from pyspark.sql import functions as F

from ..core.config import parse_result_format, result_format_at_least
from ..core.result import format_map_output, mostly_success
from .checks import JobCheck, MetricCache
from .common import get_mostly


def compile_foreign_keys_exist(index, cfg, schema) -> JobCheck:
    columns: List[str] = (
        list(cfg.kwargs.get("column_list") or [])
        or [cfg.kwargs["column"]]
    )
    ref_table = cfg.kwargs["reference_table_name"]
    ref_columns: List[str] = (
        list(cfg.kwargs.get("reference_column_list") or [])
        or [cfg.kwargs.get("reference_column") or columns[0]]
    )
    if len(columns) != len(ref_columns):
        raise ValueError("column_list and reference_column_list lengths differ")
    force_broadcast = bool(cfg.kwargs.get("broadcast", False))
    mostly = get_mostly(cfg.kwargs)

    nonnull = reduce(
        lambda a, b: a & b, [F.col(c).isNotNull() for c in columns]
    )
    consider_key = f"fk:{':'.join(columns)}"

    def run(df, stats: Dict[str, Any], cache: MetricCache):
        rf = parse_result_format(
            cfg.kwargs.get("result_format", cache.result_format)
        )
        aux = cache.aux_tables
        if ref_table not in aux:
            raise ValueError(
                f"reference table {ref_table!r} not provided to the validator"
            )
        element_count = stats["table.row_count"]
        considered = stats[f"considered:{consider_key}"]

        dim = (
            aux[ref_table]
            .select(*[F.col(rc).alias(f"__ref_{i}") for i, rc in enumerate(ref_columns)])
            .distinct()
        )
        if force_broadcast:
            dim = F.broadcast(dim)
        join_cond = reduce(
            lambda a, b: a & b,
            [
                F.col(c).eqNullSafe(F.col(f"__ref_{i}"))
                for i, c in enumerate(columns)
            ],
        )
        # Orphans: FK tuples absent from the dimension. Aggregate count
        # + bounded sample in one cached anti-join plan.
        orphans = df.where(nonnull).join(dim, join_cond, "left_anti")
        unexpected_count = orphans.count()

        unexpected_list = None
        if rf["result_format"] != "BOOLEAN_ONLY":
            cap = (
                cache.complete_cap
                if result_format_at_least(rf, "COMPLETE")
                else rf["partial_unexpected_count"]
            )
            rows = orphans.select(*columns).limit(cap).collect()
            if len(columns) == 1:
                unexpected_list = [r[0] for r in rows]
            else:
                unexpected_list = [
                    {c: r[c] for c in columns} for r in rows
                ]

        success = (
            True
            if element_count == 0 or considered == 0
            else mostly_success(considered, unexpected_count, mostly)
        )
        out = format_map_output(
            result_format=rf,
            success=success,
            element_count=element_count,
            nonnull_count=considered,
            unexpected_count=unexpected_count,
            unexpected_list=unexpected_list,
        )
        return out["success"], out.get("result", {})

    return JobCheck(
        index=index,
        config=cfg,
        needs={
            "table.row_count": F.count(F.lit(1)),
            f"considered:{consider_key}": F.sum(
                F.when(nonnull, 1).otherwise(0)
            ),
        },
        run=run,
    )


REFERENTIAL_COMPILERS = {
    "expect_foreign_keys_to_exist": compile_foreign_keys_exist,
}
