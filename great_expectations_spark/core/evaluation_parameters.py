"""evaluation_parameters binding: resolve {"$PARAMETER": ...} kwargs
at validate time.

Reference semantics: great_expectations/core/evaluation_parameters.py
:205-246 (build_evaluation_parameters) and :313+ (expression
evaluation with +,-,*,/ arithmetic and trunc()/round()/now()), bound
by validator.py:1727-1751 with runtime parameters taking priority
over the suite's stored evaluation_parameters. The data-context /
URN-store resolution paths are out of scope here (no metric stores in
this engine) and raise the same "No value found" error a detached GE
validator raises.

The expression evaluator uses Python's `ast` with a strict whitelist
instead of the reference's pyparsing stack machine: identical
arithmetic semantics, no eval() and no attribute/subscript access.
"""

from __future__ import annotations

import ast
import copy
import datetime
import math
import operator
from typing import Any, Dict, Optional, Tuple


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


def parse_evaluation_parameter(
    expression: str, evaluation_parameters: Optional[Dict[str, Any]] = None
) -> Any:
    """Resolve a $PARAMETER expression: a bare parameter name returns
    its value verbatim (complex types allowed, per the reference's
    single-substitution special case); otherwise the expression is
    evaluated with +,-,*,/,%,**, unary +/- and
    trunc/round/abs/ceil/floor/exp/sqrt/now/datetime/timedelta."""
    params = evaluation_parameters or {}
    expr = expression.strip()
    if expr in params:
        return params[expr]
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
                raw, evaluation_parameters
            )
        substituted[key] = bound[key]
    return bound, substituted
