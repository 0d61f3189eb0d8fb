"""evaluation_parameters binding: resolve {"$PARAMETER": ...} kwargs
at validate time.

Reference semantics: great_expectations/core/evaluation_parameters.py
:205-246 (build_evaluation_parameters) and :313+ (expression
evaluation with +,-,*,/ arithmetic and trunc()/round()/now()), bound
by validator.py:1727-1751 with runtime parameters taking priority
over the suite's stored evaluation_parameters.

URN-store resolution (reference core/urn.py +
expectation_validation_result.get_metric): a
`urn:great_expectations:validations:<suite>:<metric>[:<kwargs>]`
token resolves against a store of previously persisted validation
results — here, the checkpoint state directory's `run=*/result.json`
files (see resolve_validation_urn). A URN used without a store, or
one that matches no stored result, raises the same loud "No value
found" error a detached GE validator raises.

The expression evaluator uses Python's `ast` with a strict whitelist
instead of the reference's pyparsing stack machine: identical
arithmetic semantics, no eval() and no attribute/subscript access.
"""

from __future__ import annotations

import ast
import copy
import datetime
import glob
import json
import math
import operator
import os
import re
from typing import Any, Callable, Dict, Optional, Tuple


class EvaluationParameterError(ValueError):
    """A $PARAMETER could not be resolved."""


_BINOPS = {
    ast.Add: operator.add,
    ast.Sub: operator.sub,
    ast.Mult: operator.mul,
    ast.Div: operator.truediv,
    ast.Pow: operator.pow,
    ast.Mod: operator.mod,
}
_UNARY = {ast.UAdd: operator.pos, ast.USub: operator.neg}
_FUNCS = {
    "trunc": math.trunc,
    "round": round,
    "abs": abs,
    "ceil": math.ceil,
    "floor": math.floor,
    "exp": math.exp,
    "sqrt": math.sqrt,
    "now": lambda: datetime.datetime.now(datetime.timezone.utc),
    "datetime": datetime.datetime,
    "timedelta": datetime.timedelta,
}


def _eval_node(node: ast.AST, params: Dict[str, Any]) -> Any:
    if isinstance(node, ast.Expression):
        return _eval_node(node.body, params)
    if isinstance(node, ast.Constant):
        if isinstance(node.value, (int, float, str)):
            return node.value
        raise EvaluationParameterError(
            f"unsupported literal {node.value!r}"
        )
    if isinstance(node, ast.Name):
        if node.id in params:
            return params[node.id]
        raise EvaluationParameterError(
            f"No value found for $PARAMETER {node.id}"
        )
    if isinstance(node, ast.BinOp) and type(node.op) in _BINOPS:
        return _BINOPS[type(node.op)](
            _eval_node(node.left, params), _eval_node(node.right, params)
        )
    if isinstance(node, ast.UnaryOp) and type(node.op) in _UNARY:
        return _UNARY[type(node.op)](_eval_node(node.operand, params))
    if (
        isinstance(node, ast.Call)
        and isinstance(node.func, ast.Name)
        and node.func.id in _FUNCS
        and not node.keywords
    ):
        args = [_eval_node(a, params) for a in node.args]
        return _FUNCS[node.func.id](*args)
    raise EvaluationParameterError(
        f"unsupported expression element: {ast.dump(node)[:80]}"
    )


# the reference's urn_word charset (core/urn.py:3) minus ":" which
# delimits segments; segments are suite names / dotted metric paths /
# kwargs like column=w
_URN_RE = re.compile(
    r"urn:great_expectations:validations(?::[A-Za-z0-9_$?=%.&,\-]+)+"
)


def resolve_validation_urn(urn: str, store_dir: str) -> Any:
    """Resolve `urn:great_expectations:validations:<suite_name>:
    <metric_name>[:<metric_kwargs>]` against the newest stored
    result.json for that suite under `store_dir` (the checkpoint
    state directory — each run writes run=<id>/result.json).

    metric_name follows the reference's
    ExpectationValidationResult.get_metric grammar
    (expectation_validation_result.py:268-313):
    `<expectation_type>.success` or `<expectation_type>.result.<key>`
    (or `...result.details.<key>`); metric_kwargs narrows to one
    expectation instance, e.g. `column=w`."""
    parts = urn.split(":")
    if len(parts) not in (5, 6) or parts[2] != "validations":
        raise EvaluationParameterError(
            f"unsupported URN {urn!r}: only "
            "urn:great_expectations:validations:<suite>:<metric>"
            "[:<kwargs>] resolves against a checkpoint store"
        )
    suite_name, metric_name = parts[3], parts[4]
    metric_kwargs = parts[5] if len(parts) == 6 else None

    candidates = []
    for path in glob.glob(os.path.join(store_dir, "run=*", "result.json")):
        try:
            with open(path) as f:
                res = json.load(f)
        except (OSError, ValueError):
            continue
        meta = res.get("meta") or {}
        if meta.get("expectation_suite_name") == suite_name:
            candidates.append((os.path.getmtime(path), path, res))
    if not candidates:
        raise EvaluationParameterError(
            f"No value found for $PARAMETER {urn}: no stored result "
            f"for suite {suite_name!r} under {store_dir!r}"
        )
    candidates.sort()
    res = candidates[-1][2]

    name_parts = metric_name.split(".")
    expectation_type = name_parts[0]
    want_col = None
    if metric_kwargs:
        if not metric_kwargs.startswith("column="):
            raise EvaluationParameterError(
                f"unsupported metric_kwargs {metric_kwargs!r} in {urn!r}"
                " (only column=<name> is supported)"
            )
        want_col = metric_kwargs.split("=", 1)[1]
    for evr in res.get("results", []):
        cfg = evr.get("expectation_config") or {}
        if cfg.get("expectation_type") != expectation_type:
            continue
        col = (cfg.get("kwargs") or {}).get("column")
        if want_col is not None and str(col) != want_col:
            continue
        if len(name_parts) == 2 and name_parts[1] == "success":
            return evr.get("success")
        if len(name_parts) >= 3 and name_parts[1] == "result":
            r = evr.get("result") or {}
            if len(name_parts) == 3:
                return r.get(name_parts[2])
            if name_parts[2] == "details" and len(name_parts) == 4:
                return (r.get("details") or {}).get(name_parts[3])
        raise EvaluationParameterError(
            f"Unrecognized metric name {metric_name!r} in {urn!r} "
            "(expected <type>.success or <type>.result.<key>)"
        )
    raise EvaluationParameterError(
        f"No value found for $PARAMETER {urn}: suite "
        f"{suite_name!r} has no EVR for {expectation_type!r}"
        + (f" with column={want_col}" if want_col else "")
    )


def parse_evaluation_parameter(
    expression: str,
    evaluation_parameters: Optional[Dict[str, Any]] = None,
    urn_resolver: Optional[Callable[[str], Any]] = None,
) -> Any:
    """Resolve a $PARAMETER expression: a bare parameter name returns
    its value verbatim (complex types allowed, per the reference's
    single-substitution special case); otherwise the expression is
    evaluated with +,-,*,/,%,**, unary +/- and
    trunc/round/abs/ceil/floor/exp/sqrt/now/datetime/timedelta.
    `urn:great_expectations:validations:...` tokens are resolved
    through `urn_resolver` first (bare URN -> verbatim value; URN
    inside arithmetic -> substituted operand); without a resolver a
    URN raises the loud "No value found" error."""
    params = evaluation_parameters or {}
    expr = expression.strip()
    if expr in params:
        return params[expr]
    if urn_resolver is not None and _URN_RE.search(expr):
        if _URN_RE.fullmatch(expr):
            return urn_resolver(expr)
        params = dict(params)

        def _sub(m: "re.Match[str]") -> str:
            key = f"__urn_{len(params)}"
            params[key] = urn_resolver(m.group(0))
            return key

        expr = _URN_RE.sub(_sub, expr)
    try:
        tree = ast.parse(expr, mode="eval")
    except SyntaxError as exc:
        raise EvaluationParameterError(
            f"No value found for $PARAMETER {expression}"
        ) from exc
    return _eval_node(tree, params)


def build_evaluation_parameters(
    expectation_kwargs: Dict[str, Any],
    evaluation_parameters: Optional[Dict[str, Any]] = None,
    urn_resolver: Optional[Callable[[str], Any]] = None,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Replace every {"$PARAMETER": expr} kwarg value with its
    resolved value. An inline {"$PARAMETER.<expr>": value} entry (the
    reference's exploratory-override convention) wins over the
    parameter store. Returns (bound_kwargs, substituted)."""
    bound = copy.deepcopy(expectation_kwargs)
    substituted: Dict[str, Any] = {}
    for key, value in bound.items():
        if not (isinstance(value, dict) and "$PARAMETER" in value):
            continue
        raw = value["$PARAMETER"]
        override_key = f"$PARAMETER.{raw}"
        if override_key in value:
            bound[key] = value[override_key]
        else:
            bound[key] = parse_evaluation_parameter(
                raw, evaluation_parameters, urn_resolver=urn_resolver
            )
        substituted[key] = bound[key]
    return bound, substituted
