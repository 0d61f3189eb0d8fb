"""The GE row_condition mini-DSL -> Spark Column.

Reference: great_expectations/expectations/row_conditions.py:31-57
(grammar) and 117-146 (Spark lowering). A suite ported from GE may
carry kwargs like

    {"row_condition": 'col("status")=="active"',
     "condition_parser": "great_expectations"}

The grammar is deliberately tiny (and reproduced exactly, including
its quirks, so ported suites behave identically):

    condition  := col("<name>") ( .notnull() | <op> <value> )
    name       := alpha (alnum | _ | .)*
    op         := > | < | >= | <= | ==
    value      := number | quoted word        (quoted only with ==)
    number     := [+-]?digits[.digits][eE exp]  -> int if integral
    quoted word:= '"' (alnum | . | _)+ '"' | "'" ... "'"

Implemented with `re` instead of pyparsing (not a hard dependency
here); `parse_condition_to_spark` raises ConditionParserError on
anything else — matching the reference, which also refuses e.g.
string literals with `>` (row_conditions.py:121-127).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


class ConditionParserError(ValueError):
    """Raised when a row_condition does not match the GE grammar."""


_COL = r'col\("(?P<column>[A-Za-z][A-Za-z0-9_.]*)"\)'
_NOTNULL = re.compile(
    _COL + r"\.notnull\(\)\s*$", re.IGNORECASE
)
_OP = re.compile(
    _COL
    + r"\s*(?P<op>>=|<=|==|>|<)\s*"
    + r"(?P<rest>.+?)\s*$"
)
_NUMBER = re.compile(r"^[+-]?\d+(?:\.\d*)?(?:[eE][+-]?\d+)?$")
_QUOTED = re.compile(
    r"^(?:\"(?P<dq>[A-Za-z0-9._]+)\"|'(?P<sq>[A-Za-z0-9._]+)')$"
)


def parse_condition_to_spark(row_condition: str) -> Column:
    """GE mini-DSL string -> Spark Column predicate."""
    s = row_condition.strip()
    m = _NOTNULL.match(s)
    if m:
        return F.col(m.group("column")).isNotNull()
    m = _OP.match(s)
    if not m:
        raise ConditionParserError(
            f"unable to parse condition: {row_condition}"
        )
    column, op, rest = m.group("column"), m.group("op"), m.group("rest")
    qm = _QUOTED.match(rest)
    if qm:
        if op != "==":
            raise ConditionParserError(
                f"Invalid operator: {op} for string literal spark "
                "condition."
            )
        return F.col(column) == (qm.group("dq") or qm.group("sq"))
    if _NUMBER.match(rest):
        try:
            num: float = int(rest)
        except ValueError:
            num = float(rest)
        c = F.col(column)
        return {
            ">": c > num,
            "<": c < num,
            ">=": c >= num,
            "<=": c <= num,
            "==": c == num,
        }[op]
    raise ConditionParserError(
        f"unable to parse condition: {row_condition}"
    )


def domain_condition(
    row_condition: str, condition_parser: str | None
) -> Column:
    """Lower a row_condition to a Column per its declared parser:
    the GE mini-DSL for condition_parser="great_expectations", Spark
    SQL (F.expr) for the spark parser names / None — mirroring the
    reference's RowConditionParserType dispatch. Any OTHER declared
    parser (pandas, python, sql) raises: feeding e.g. a pandas
    .query() string to F.expr can parse successfully with different
    semantics (& as bitwise-and, different precedence) and silently
    validate the wrong row domain."""
    if condition_parser in ("great_expectations", "ge"):
        return parse_condition_to_spark(row_condition)
    if condition_parser in (None, "", "spark", "spark_sql",
                            "spark_dataframe"):
        return F.expr(row_condition)
    raise ConditionParserError(
        f"unsupported condition_parser {condition_parser!r} for the "
        "Spark engine (use 'great_expectations' or 'spark')"
    )
