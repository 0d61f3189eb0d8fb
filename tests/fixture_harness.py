"""Harness for the reference's golden JSON corpus
(tests/test_definitions/: 62 files / 658 cases). The fixtures are
treated as an external oracle: tests SKIP cleanly when the reference
checkout is absent, so the repo stays standalone.

Mirrors the reference runner's semantics
(self_check/util.py:2799-3130): Spark applicability via
only_for/suppress_test_for, result_format=COMPLETE,
order-insensitive unexpected_list comparison, np.allclose with
RTOL=1e-7 / ATOL=5e-2, unexpected_index_list skipped for Spark
(:3036-3040), traceback tests asserting an exception was raised.
"""

from __future__ import annotations

import glob
import json
import math
import os
from typing import Any, Dict, List, Optional, Tuple

import pandas as pd

from pyspark.sql import types as T

REF_DIR = "/root/reference/tests/test_definitions"

RTOL = 1.0e-7
ATOL = 5.0e-2

# the reference harness's Spark schema vocabulary
# (self_check/util.py:1110-1121)
TYPE_MAP = {
    "StringType": T.StringType(),
    "IntegerType": T.IntegerType(),
    "LongType": T.LongType(),
    "DateType": T.DateType(),
    "TimestampType": T.TimestampType(),
    "FloatType": T.FloatType(),
    "DoubleType": T.DoubleType(),
    "BooleanType": T.BooleanType(),
    "DataType": T.NullType(),
    "NullType": T.NullType(),
}


def fixture_files() -> List[str]:
    if not os.path.isdir(REF_DIR):
        return []
    return sorted(glob.glob(f"{REF_DIR}/**/*.json", recursive=True))


def spark_applicable(test: Dict[str, Any]) -> Optional[str]:
    """None when the case applies to the Spark backend, else a skip
    reason — the reference's backend filter."""
    only = test.get("only_for")
    if only and not any(str(b).startswith("spark") for b in only):
        return f"only_for={only}"
    for b in test.get("suppress_test_for") or []:
        if str(b).startswith("spark"):
            return "suppressed for spark"
    if "$PARAMETER" in json.dumps(test.get("in", {})):
        return "evaluation parameters not implemented"
    return None


def build_df(spark, data: Dict[str, List[Any]], schema: Optional[Dict[str, str]]):
    cols = list(data.keys())
    n = max((len(v) for v in data.values()), default=0)
    rows = []
    for i in range(n):
        rows.append(tuple(data[c][i] if i < len(data[c]) else None for c in cols))

    if schema:
        fields = []
        for c in cols:
            tname = schema.get(c, "StringType")
            fields.append(T.StructField(c, TYPE_MAP[tname], True))
        st = T.StructType(fields)
        conv = []
        for r in rows:
            vals = []
            for c, v in zip(cols, r):
                tname = schema.get(c, "StringType")
                if v is None:
                    vals.append(None)
                elif tname in ("TimestampType", "DateType"):
                    ts = pd.Timestamp(v)
                    vals.append(
                        ts.date() if tname == "DateType" else ts.to_pydatetime()
                    )
                elif tname == "FloatType" or tname == "DoubleType":
                    vals.append(float(v))
                elif tname in ("IntegerType", "LongType"):
                    vals.append(int(v))
                elif tname == "StringType":
                    vals.append(str(v))
                else:
                    vals.append(v)
            conv.append(tuple(vals))
        return spark.createDataFrame(conv, st)

    # no schema: infer from the raw JSON values (pandas inference would
    # coerce int columns containing nulls to float64 + NaN, which Spark
    # keeps as NaN instead of NULL and breaks null semantics)
    def infer_type(values):
        kinds = {type(v) for v in values if v is not None}
        if not kinds:
            return T.StringType()
        if kinds <= {bool}:
            return T.BooleanType()
        if kinds <= {int}:
            return T.LongType()
        if kinds <= {int, float}:
            return T.DoubleType()
        if kinds <= {str}:
            return T.StringType()
        return T.StringType()

    fields = [T.StructField(c, infer_type(data[c]), True) for c in cols]
    st = T.StructType(fields)
    conv = []
    for r in rows:
        vals = []
        for (c, v), fld in zip(zip(cols, r), fields):
            if v is None:
                vals.append(None)
            elif isinstance(fld.dataType, T.DoubleType):
                vals.append(float(v))
            elif isinstance(fld.dataType, T.StringType):
                vals.append(str(v))
            else:
                vals.append(v)
        conv.append(tuple(vals))
    return spark.createDataFrame(conv, st)


def _is_num(x) -> bool:
    return isinstance(x, (int, float)) and not isinstance(x, bool)


def _close(a, b) -> bool:
    import datetime as _dt

    # EVRs may carry datetime objects where fixtures pin isoformat
    # strings — normalize both sides to instants
    if isinstance(a, (_dt.datetime, _dt.date)) or isinstance(
        b, (_dt.datetime, _dt.date)
    ):
        try:
            return pd.Timestamp(a) == pd.Timestamp(b)
        except (ValueError, TypeError):
            return str(a) == str(b)
    if _is_num(a) and _is_num(b):
        if math.isnan(a) if isinstance(a, float) else False:
            return isinstance(b, float) and math.isnan(b)
        return math.isclose(a, b, rel_tol=RTOL, abs_tol=ATOL)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_close(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(_close(a[k], b[k]) for k in a)
    # datetime normalization: the engine serializes timestamps through
    # JSON ("2018-01-01T00:00:00.000Z" / date-only forms) while
    # fixtures pin Python isoformat — compare as instants when both
    # sides look temporal
    if isinstance(a, str) and isinstance(b, str):
        if a == b:
            return True
        if any(ch in a for ch in "-:") and any(ch in b for ch in "-:"):
            try:
                ta, tb = pd.Timestamp(a), pd.Timestamp(b)
                if ta.tzinfo is not None:
                    ta = ta.tz_convert("UTC").tz_localize(None)
                if tb.tzinfo is not None:
                    tb = tb.tz_convert("UTC").tz_localize(None)
                return ta == tb
            except (ValueError, TypeError):
                pass
        return False
    # fixtures sometimes write numbers where the engine returns the
    # same value as a float and vice versa; fall back to str compare
    return a == b or str(a) == str(b)


def _sort_key(v):
    return json.dumps(v, sort_keys=True, default=str)


def _values_match_unordered(expected: List, actual: List) -> bool:
    if len(expected) != len(actual) :
        return False
    es = sorted(expected, key=_sort_key)
    asr = sorted(actual, key=_sort_key)
    return all(_close(e, a) for e, a in zip(es, asr))


def compare_out(
    out: Dict[str, Any], evr, result: Dict[str, Any]
) -> List[str]:
    """Mismatch descriptions for the fields the fixture pins
    (exact_match_out=False subset semantics — what the v3 runner
    actually exercises for Spark)."""
    problems: List[str] = []
    for key, expected in out.items():
        if key == "success":
            if bool(evr.success) != bool(expected):
                problems.append(
                    f"success={evr.success} expected={expected}"
                )
        elif key == "unexpected_list":
            actual = result.get("unexpected_list")
            if actual is None:
                actual = result.get("partial_unexpected_list", [])
            if not _values_match_unordered(expected, actual):
                problems.append(
                    f"unexpected_list={actual!r} expected={expected!r}"
                )
        elif key == "partial_unexpected_list":
            actual = result.get("partial_unexpected_list", [])
            if not _values_match_unordered(expected, actual):
                problems.append(
                    f"partial_unexpected_list={actual!r} expected={expected!r}"
                )
        elif key == "unexpected_index_list":
            continue  # skipped for Spark (self_check/util.py:3036-3040)
        elif key == "observed_value":
            actual = result.get("observed_value")
            if isinstance(expected, list) and isinstance(actual, list):
                ok = _close(expected, actual) or _values_match_unordered(
                    expected, actual
                )
            else:
                ok = _close(expected, actual)
            if not ok:
                problems.append(
                    f"observed_value={actual!r} expected={expected!r}"
                )
        elif key == "observed_partition":
            actual = (result.get("details") or {}).get(
                "observed_partition"
            )
            if not _close(expected, actual):
                problems.append(
                    f"observed_partition={actual!r} expected={expected!r}"
                )
        elif key == "expected_partition":
            actual = (result.get("details") or {}).get(
                "expected_partition"
            )
            if not _close(expected, actual):
                problems.append(
                    f"expected_partition={actual!r} expected={expected!r}"
                )
        elif key == "value_counts":
            details = result.get("details") or {}
            actual_vc = details.get("value_counts")
            if actual_vc is not None:
                actual_pairs = sorted(
                    (str(d["value"]), d["count"]) for d in actual_vc
                )
                expected_pairs = sorted(
                    (str(d["value"]), d["count"]) for d in expected
                )
                if actual_pairs != expected_pairs:
                    problems.append(
                        f"value_counts={actual_pairs!r} expected={expected_pairs!r}"
                    )
        elif key in ("result", "details", "meta"):
            continue  # nested free-form payloads; success already pinned
        elif key.startswith("observed_cdf") or key == "observed_value_list":
            continue  # bootstrapped-KS internals (Pandas-only shape)
        elif key == "traceback_substring":
            info = evr.exception_info or {}
            if not info.get("raised_exception"):
                problems.append(
                    f"expected exception containing {expected!r}, none raised"
                )
        else:
            problems.append(f"unhandled out key {key!r}")
    return problems
