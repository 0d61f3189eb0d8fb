"""Validation result objects + GE-compatible result formatting.

The field-level contract matches the reference exactly:
- `_format_map_output`: great_expectations/expectations/expectation.py:3074-3211
- `_mostly_success`:    great_expectations/expectations/expectation.py:3232-3242
- EVR / suite-result shape: great_expectations/core/expectation_validation_result.py
"""

from __future__ import annotations

import datetime
import math
from collections import Counter
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from .config import ExpectationConfiguration, parse_result_format


def mostly_success(rows_considered: int, unexpected: int, mostly: float) -> bool:
    """success_ratio >= mostly; ref expectation.py:3232-3242."""
    return (float(rows_considered) - float(unexpected)) / float(rows_considered) >= mostly


def format_map_output(
    result_format: dict,
    success: bool,
    element_count: Optional[int] = None,
    nonnull_count: Optional[int] = None,
    unexpected_count: Optional[int] = None,
    unexpected_list: Optional[List[Any]] = None,
    unexpected_index_list: Optional[List[int]] = None,
    unexpected_rows: Any = None,
) -> Dict[str, Any]:
    """Build the result dict for a map expectation.

    Field-for-field port of the reference semantics
    (expectation.py:3074-3211): BASIC adds counts/percents + partial
    list; SUMMARY adds partial_unexpected_counts (sorted by (-count,
    value)); COMPLETE adds full unexpected_list. When nonnull_count is
    None (e.g. expect_column_values_to_not_be_null) the missing_* block
    is skipped and unexpected_percent is computed over element_count.
    """
    if element_count is None:
        element_count = 0

    return_obj: Dict[str, Any] = {"success": success}
    if result_format["result_format"] == "BOOLEAN_ONLY":
        return return_obj

    skip_missing = nonnull_count is None
    missing_count = None if skip_missing else element_count - nonnull_count

    missing_percent = None
    unexpected_percent_total = None
    unexpected_percent_nonmissing = None
    if unexpected_count is not None and element_count > 0:
        unexpected_percent_total = unexpected_count / element_count * 100
        if not skip_missing and missing_count is not None:
            missing_percent = missing_count / element_count * 100
            if nonnull_count is not None and nonnull_count > 0:
                unexpected_percent_nonmissing = unexpected_count / nonnull_count * 100
        else:
            unexpected_percent_nonmissing = unexpected_percent_total

    return_obj["result"] = {
        "element_count": element_count,
        "unexpected_count": unexpected_count,
        "unexpected_percent": unexpected_percent_nonmissing,
    }

    if unexpected_list is not None:
        return_obj["result"]["partial_unexpected_list"] = unexpected_list[
            : result_format["partial_unexpected_count"]
        ]

    if not skip_missing:
        return_obj["result"]["missing_count"] = missing_count
        return_obj["result"]["missing_percent"] = missing_percent
        return_obj["result"]["unexpected_percent_total"] = unexpected_percent_total
        return_obj["result"]["unexpected_percent_nonmissing"] = unexpected_percent_nonmissing

    if result_format.get("include_unexpected_rows"):
        return_obj["result"]["unexpected_rows"] = unexpected_rows

    if result_format["result_format"] == "BASIC":
        return return_obj

    # SUMMARY: most-common violating values, sorted by (-count, value)
    if unexpected_list is not None:
        if len(unexpected_list) and isinstance(unexpected_list[0], dict):
            immutable = [tuple(item.values()) for item in unexpected_list]
        elif len(unexpected_list) and isinstance(unexpected_list[0], list):
            immutable = [tuple(item) for item in unexpected_list]
        else:
            immutable = unexpected_list
        k = result_format.get("partial_unexpected_count")
        if k is not None and k > 0:
            try:
                partial_counts = [
                    {"value": key, "count": value}
                    for key, value in sorted(
                        Counter(immutable).most_common(k),
                        key=lambda x: (-x[1], x[0]),
                    )
                ]
            except TypeError:
                partial_counts = [
                    {"error": "partial_exception_counts requires a hashable type"}
                ]
            if unexpected_index_list is not None:
                return_obj["result"]["partial_unexpected_index_list"] = (
                    unexpected_index_list[:k]
                )
            return_obj["result"]["partial_unexpected_counts"] = partial_counts

    if result_format["result_format"] == "SUMMARY":
        return return_obj

    if unexpected_list is not None:
        return_obj["result"]["unexpected_list"] = unexpected_list
    if unexpected_index_list is not None:
        return_obj["result"]["unexpected_index_list"] = unexpected_index_list
    if result_format["result_format"] == "COMPLETE":
        return return_obj

    raise ValueError(f"Unknown result_format {result_format['result_format']}.")


def validate_metric_value_between(
    metric_value: Any,
    min_value: Any = None,
    max_value: Any = None,
    strict_min: bool = False,
    strict_max: bool = False,
) -> Dict[str, Any]:
    """Bounds check for aggregate expectations.

    Port of _validate_metric_value_between semantics
    (expectation.py:2153-2247): None metric → failure with observed
    None; NaN → failure; open bounds when min/max omitted.
    """
    if metric_value is None:
        return {"success": False, "result": {"observed_value": None}}
    if not isinstance(metric_value, (datetime.datetime, datetime.date, str)):
        try:
            if metric_value is not None and math.isnan(float(metric_value)):
                return {"success": False, "result": {"observed_value": None}}
        except (TypeError, ValueError):
            pass

    # temporal metric vs string bounds: parse the bounds so the
    # comparison is temporal (ref compares after parse; a raw
    # datetime>str comparison would TypeError)
    if isinstance(metric_value, (datetime.datetime, datetime.date)):
        from dateutil.parser import parse as _parse_dt

        def _coerce(b):
            if isinstance(b, str):
                parsed = _parse_dt(b)
                if isinstance(
                    metric_value, datetime.date
                ) and not isinstance(metric_value, datetime.datetime):
                    return parsed.date()
                return parsed
            return b

        min_value = _coerce(min_value)
        max_value = _coerce(max_value)

    if min_value is not None:
        above = metric_value > min_value if strict_min else metric_value >= min_value
    else:
        above = True
    if max_value is not None:
        below = metric_value < max_value if strict_max else metric_value <= max_value
    else:
        below = True
    return {"success": bool(above and below), "result": {"observed_value": metric_value}}


@dataclass
class ExpectationValidationResult:
    """EVR; ref core/expectation_validation_result.py:65-95."""

    success: bool
    expectation_config: Optional[ExpectationConfiguration] = None
    result: Dict[str, Any] = field(default_factory=dict)
    meta: Dict[str, Any] = field(default_factory=dict)
    exception_info: Dict[str, Any] = field(
        default_factory=lambda: {
            "raised_exception": False,
            "exception_traceback": None,
            "exception_message": None,
        }
    )

    def to_json_dict(self) -> dict:
        return {
            "success": self.success,
            "expectation_config": (
                self.expectation_config.to_json_dict()
                if self.expectation_config
                else None
            ),
            "result": self.result,
            "meta": self.meta,
            "exception_info": self.exception_info,
        }


@dataclass
class ExpectationSuiteValidationResult:
    """Suite rollup; ref core/expectation_validation_result.py:393-419
    and statistics calc at validator/validator.py:1804-1824."""

    success: bool
    results: List[ExpectationValidationResult] = field(default_factory=list)
    statistics: Dict[str, Any] = field(default_factory=dict)
    meta: Dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_results(
        cls, results: List[ExpectationValidationResult], meta: Optional[dict] = None
    ) -> "ExpectationSuiteValidationResult":
        evaluated = len(results)
        successful = sum(1 for r in results if r.success)
        return cls(
            success=all(r.success for r in results),
            results=results,
            statistics={
                "evaluated_expectations": evaluated,
                "successful_expectations": successful,
                "unsuccessful_expectations": evaluated - successful,
                "success_percent": (successful / evaluated * 100) if evaluated else None,
            },
            meta=meta or {},
        )

    def to_json_dict(self) -> dict:
        return {
            "success": self.success,
            "results": [r.to_json_dict() for r in self.results],
            "statistics": self.statistics,
            "meta": self.meta,
        }


def exception_result(
    config: ExpectationConfiguration, exc: BaseException, traceback_str: str = ""
) -> ExpectationValidationResult:
    """catch_exceptions behavior; ref validator.py:1213-1247."""
    return ExpectationValidationResult(
        success=False,
        expectation_config=config,
        result={},
        exception_info={
            "raised_exception": True,
            "exception_traceback": traceback_str,
            "exception_message": str(exc),
        },
    )
