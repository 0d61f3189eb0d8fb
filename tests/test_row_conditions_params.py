"""GE row_condition mini-DSL (condition_parser="great_expectations")
and evaluation_parameters binding, exercised through ges.validate —
reference: row_conditions.py:31-146, evaluation_parameters.py:205-246,
validator.py:1727-1751."""

import pytest
from pyspark.sql import functions as F

import great_expectations_spark as ges
from great_expectations_spark.core.evaluation_parameters import (
    EvaluationParameterError,
    build_evaluation_parameters,
    parse_evaluation_parameter,
)
from great_expectations_spark.functions.row_conditions import (
    ConditionParserError,
    parse_condition_to_spark,
)


@pytest.fixture()
def tbl(spark):
    rows = [
        (1, "active", 10.0, "a"),
        (2, "active", 55.0, None),
        (3, "inactive", 20.0, "c"),
        (4, "active", None, "d"),
        (5, None, 70.0, "e"),
    ]
    return spark.createDataFrame(
        rows, "id long, status string, score double, tag string"
    )


# -- DSL parser unit behaviour (parity with reference row_conditions) --------

def test_dsl_ops(tbl):
    cases = {
        'col("score")>15': {2, 3, 5},    # NULL score rows excluded
        'col("score")<=20': {1, 3},
        'col("score")==55': {2},
        'col("status")=="active"': {1, 2, 4},
        "col(\"status\")=='active'": {1, 2, 4},
        'col("score").notnull()': {1, 2, 3, 5},
        'col("score").NOTNULL()': {1, 2, 3, 5},  # caseless, as in ref
    }
    for cond, want in cases.items():
        got = {
            r.id
            for r in tbl.where(parse_condition_to_spark(cond)).collect()
        }
        assert got == want, cond


def test_dsl_rejects_like_reference():
    # string literal with non-== operator: refused (ref :121-127)
    with pytest.raises(ConditionParserError):
        parse_condition_to_spark('col("status")>"active"')
    for bad in ["status > 5", 'col(status)>5', 'col("x") >', ""]:
        with pytest.raises(ConditionParserError):
            parse_condition_to_spark(bad)


def test_row_condition_through_validate(tbl):
    s = ges.suite("rc").expect(
        "expect_column_values_to_not_be_null",
        column="tag",
        row_condition='col("status")=="active"',
        condition_parser="great_expectations",
    )
    res = ges.validate(tbl, s, result_format="SUMMARY")
    r = res.results[0].result
    # domain = rows 1,2,4; tag null only on row 2
    assert r["element_count"] == 3
    assert r["unexpected_count"] == 1

    # same string under the spark parser is a SQL syntax error ->
    # exception EVR, not silent success
    s2 = ges.suite("rc2").expect(
        "expect_column_values_to_not_be_null",
        column="tag",
        row_condition='col("status")=="active"',
    )
    res2 = ges.validate(tbl, s2)
    assert res2.results[0].success is False
    assert res2.results[0].exception_info.get(
        "raised_exception", False
    )


# -- evaluation_parameters ---------------------------------------------------

def test_parse_evaluation_parameter():
    params = {"min_rows": 4, "upstream_max": 60.0}
    assert parse_evaluation_parameter("min_rows", params) == 4
    assert parse_evaluation_parameter("min_rows - 2", params) == 2
    assert parse_evaluation_parameter(
        "trunc(upstream_max / 7)", params
    ) == 8
    # bare-name substitution passes complex values through verbatim
    assert parse_evaluation_parameter(
        "vals", {"vals": ["a", "b"]}
    ) == ["a", "b"]
    with pytest.raises(EvaluationParameterError):
        parse_evaluation_parameter("missing_param", params)
    with pytest.raises(EvaluationParameterError):
        parse_evaluation_parameter("__import__('os')", params)


def test_build_evaluation_parameters_override():
    kwargs = {
        "min_value": {"$PARAMETER": "lo", "$PARAMETER.lo": 1},
        "max_value": {"$PARAMETER": "hi"},
        "column": "score",
    }
    bound, subbed = build_evaluation_parameters(kwargs, {"hi": 99, "lo": 5})
    assert bound["min_value"] == 1      # inline override wins
    assert bound["max_value"] == 99
    assert bound["column"] == "score"
    assert subbed == {"min_value": 1, "max_value": 99}


def test_evaluation_parameters_through_validate(tbl):
    s = ges.suite("ep")
    s.evaluation_parameters = {"max_score": 100.0}
    s.expect(
        "expect_column_values_to_be_between",
        column="score",
        min_value=0,
        max_value={"$PARAMETER": "max_score"},
    )
    assert ges.validate(tbl, s).results[0].success

    # runtime parameters take priority over the suite's stored ones
    res = ges.validate(
        tbl, s, evaluation_parameters={"max_score": 50.0}
    )
    r = res.results[0]
    assert r.success is False
    assert r.result["unexpected_count"] == 2  # 55.0 and 70.0

    # unresolvable parameter -> exception EVR under catch_exceptions
    s_bad = ges.suite("ep2").expect(
        "expect_column_values_to_be_between",
        column="score",
        min_value=0,
        max_value={"$PARAMETER": "nope"},
    )
    res_bad = ges.validate(tbl, s_bad)
    assert res_bad.results[0].success is False
    assert res_bad.results[0].exception_info.get("raised_exception")
