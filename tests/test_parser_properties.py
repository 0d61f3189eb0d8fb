"""Property tests (hypothesis) for the GE row_condition mini-DSL and
the evaluation-parameter expression evaluator."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from great_expectations_spark.core.evaluation_parameters import (
    EvaluationParameterError,
    parse_evaluation_parameter,
)
from great_expectations_spark.functions.row_conditions import (
    ConditionParserError,
    parse_condition_to_spark,
)

idents = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,10}", fullmatch=True)
# dots create nested-field references; a trailing/doubled dot is
# invalid attribute syntax in F.col for us AND the reference alike,
# so generate only well-formed dotted names
colnames = st.from_regex(
    r"[A-Za-z][A-Za-z0-9_]{0,6}(\.[A-Za-z0-9_]{1,4}){0,2}",
    fullmatch=True,
)
numbers = st.one_of(
    st.integers(min_value=-10**9, max_value=10**9),
    st.floats(
        min_value=-1e6, max_value=1e6,
        allow_nan=False, allow_infinity=False,
    ),
)


@settings(max_examples=200, deadline=None)
@given(col=colnames, op=st.sampled_from([">", "<", ">=", "<=", "=="]),
       num=numbers)
def test_dsl_numeric_conditions_parse(spark, col, op, num):
    # every grammar-conforming numeric condition must parse to a
    # Column (Column construction needs an active SparkContext)
    c = parse_condition_to_spark(f'col("{col}"){op}{num!r}')
    assert c is not None


@settings(max_examples=200, deadline=None)
@given(col=colnames, word=st.from_regex(r"[A-Za-z0-9._]{1,12}",
                                        fullmatch=True),
       quote=st.sampled_from(['"', "'"]))
def test_dsl_string_equality_parses(spark, col, word, quote):
    c = parse_condition_to_spark(
        f'col("{col}")=={quote}{word}{quote}'
    )
    assert c is not None


@settings(max_examples=200, deadline=None)
@given(col=colnames, word=st.from_regex(r"[A-Za-z0-9._]{1,12}",
                                        fullmatch=True),
       op=st.sampled_from([">", "<", ">=", "<="]))
def test_dsl_string_with_ordering_op_rejected(col, word, op):
    # the reference refuses string literals with non-== operators
    with pytest.raises(ConditionParserError):
        parse_condition_to_spark(f'col("{col}"){op}"{word}"')


@settings(max_examples=300, deadline=None)
@given(a=numbers, b=numbers)
def test_eval_params_arithmetic_matches_python(a, b):
    params = {"a": a, "b": b}
    for expr, want in [
        ("a + b", a + b),
        ("a - b", a - b),
        ("a * b", a * b),
        ("-a", -a),
        ("abs(a)", abs(a)),
        ("trunc(a)", math.trunc(a)),
    ]:
        got = parse_evaluation_parameter(expr, params)
        if isinstance(want, float) and isinstance(got, float):
            assert got == pytest.approx(want, rel=1e-12, abs=1e-12)
        else:
            assert got == want


@settings(max_examples=100, deadline=None)
@given(name=idents)
def test_eval_params_bare_name_verbatim(name):
    # single-name substitution passes any value through unchanged
    sentinel = object()
    assert parse_evaluation_parameter(name, {name: sentinel}) is sentinel
    if name not in ("trunc", "round", "abs", "ceil", "floor",
                    "exp", "sqrt", "now", "datetime", "timedelta"):
        with pytest.raises(EvaluationParameterError):
            parse_evaluation_parameter(name, {})


@settings(max_examples=100, deadline=None)
@given(payload=st.text(min_size=1, max_size=40))
def test_eval_params_never_executes_arbitrary_code(payload):
    # anything outside the whitelist raises instead of evaluating
    try:
        parse_evaluation_parameter(
            f"__import__('os').system({payload!r})", {}
        )
        raise AssertionError("should have raised")
    except EvaluationParameterError:
        pass
