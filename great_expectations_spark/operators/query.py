"""Query expectations: arbitrary Spark SQL against the batch.

The reference exposes this as the QueryExpectation base class +
query.* metrics (expectations/expectation.py:2250-2352,
metrics/query_metrics/query_table.py:67-91: register the batch as a
temp view, format the template with {active_batch}, run the SQL). The
reference ships the machinery but no concrete core expectation; these
two cover the common uses — and because the query is plain Spark SQL,
the full surface (joins, CTEs, window functions) is available.
"""

from __future__ import annotations

import uuid
from typing import Any, Dict

from pyspark.sql import functions as F

from ..core.result import validate_metric_value_between
from .checks import JobCheck, MetricCache


def _run_query(df, query: str):
    view = f"ges_batch_{uuid.uuid4().hex[:12]}"
    df.createOrReplaceTempView(view)
    try:
        return df.sparkSession.sql(
            query.format(active_batch=view, batch=view)
        )
    finally:
        df.sparkSession.catalog.dropTempView(view)


def compile_query_row_count_between(index, cfg, schema) -> JobCheck:
    """expect_query_row_count_to_be_between: the row count of
    `query` (templated with {active_batch}) within bounds."""
    query = cfg.kwargs["query"]
    kw = {
        "min_value": cfg.kwargs.get("min_value"),
        "max_value": cfg.kwargs.get("max_value"),
        "strict_min": bool(cfg.kwargs.get("strict_min", False)),
        "strict_max": bool(cfg.kwargs.get("strict_max", False)),
    }

    def run(df, stats: Dict[str, Any], cache: MetricCache):
        n = _run_query(df, query).count()
        out = validate_metric_value_between(n, **kw)
        return out["success"], out["result"]

    return JobCheck(index=index, config=cfg, run=run)


def compile_query_single_value_between(index, cfg, schema) -> JobCheck:
    """expect_query_single_value_to_be_between: first row / first
    column of the query result within bounds."""
    query = cfg.kwargs["query"]
    kw = {
        "min_value": cfg.kwargs.get("min_value"),
        "max_value": cfg.kwargs.get("max_value"),
        "strict_min": bool(cfg.kwargs.get("strict_min", False)),
        "strict_max": bool(cfg.kwargs.get("strict_max", False)),
    }

    def run(df, stats: Dict[str, Any], cache: MetricCache):
        row = _run_query(df, query).first()
        value = row[0] if row is not None else None
        out = validate_metric_value_between(value, **kw)
        return out["success"], out["result"]

    return JobCheck(index=index, config=cfg, run=run)


def compile_query_to_return_no_rows(index, cfg, schema) -> JobCheck:
    """expect_query_to_return_no_rows: violation-hunting SQL — the
    query SELECTs the bad rows; success iff none exist. A bounded
    sample of offending rows is reported."""
    query = cfg.kwargs["query"]
    sample_limit = int(cfg.kwargs.get("sample_limit", 20))

    def run(df, stats: Dict[str, Any], cache: MetricCache):
        res = _run_query(df, query)
        rows = res.limit(sample_limit + 1).collect()
        count_exact = (
            len(rows) if len(rows) <= sample_limit else res.count()
        )
        return len(rows) == 0, {
            "observed_value": count_exact,
            "details": {
                "unexpected_rows": [
                    r.asDict() for r in rows[:sample_limit]
                ]
            },
        }

    return JobCheck(index=index, config=cfg, run=run)


QUERY_COMPILERS = {
    "expect_query_row_count_to_be_between": compile_query_row_count_between,
    "expect_query_single_value_to_be_between": compile_query_single_value_between,
    "expect_query_to_return_no_rows": compile_query_to_return_no_rows,
}
