"""Map-condition expectation semantics, mirroring the reference's
tests/test_definitions fixture rules (SURVEY.md §5): COMPLETE result
format, sorted unexpected lists, mostly boundaries, vacuous truth.
"""

import pytest
from pyspark.sql import types as T

import great_expectations_spark as ges


def make_df(spark, data, schema):
    return spark.createDataFrame(data, schema)


@pytest.fixture(scope="module")
def df(spark):
    schema = T.StructType(
        [
            T.StructField("x", T.IntegerType()),
            T.StructField("y", T.DoubleType()),
            T.StructField("s", T.StringType()),
        ]
    )
    rows = [
        (1, 1.0, "aaa"),
        (2, 2.5, "abb"),
        (3, None, "acc"),
        (4, 4.5, None),
        (None, 5.0, "zzz"),
    ]
    return spark.createDataFrame(rows, schema)


def run_one(df, etype, rf="COMPLETE", **kwargs):
    s = ges.suite("t").expect(etype, **kwargs)
    res = ges.validate(df, s, result_format=rf)
    assert len(res.results) == 1
    evr = res.results[0]
    assert not evr.exception_info["raised_exception"], evr.exception_info[
        "exception_message"
    ]
    return evr


def test_not_be_null(df):
    evr = run_one(df, "expect_column_values_to_not_be_null", column="x")
    assert evr.success is False
    r = evr.result
    assert r["element_count"] == 5
    assert r["unexpected_count"] == 1
    assert r["unexpected_percent"] == 20.0
    # nonnull_count omitted for not_null (ref: nonnull_count=None)
    assert "missing_count" not in r
    assert r["unexpected_list"] == [None]


def test_not_be_null_mostly(df):
    evr = run_one(
        df, "expect_column_values_to_not_be_null", column="x", mostly=0.8
    )
    assert evr.success is True


def test_be_null(df):
    evr = run_one(df, "expect_column_values_to_be_null", column="x")
    assert evr.success is False
    assert evr.result["unexpected_count"] == 4


def test_be_in_set(df):
    evr = run_one(
        df, "expect_column_values_to_be_in_set", column="x", value_set=[1, 2, 3]
    )
    assert evr.success is False
    r = evr.result
    assert r["element_count"] == 5
    assert r["missing_count"] == 1
    assert r["unexpected_count"] == 1
    assert sorted(r["unexpected_list"]) == [4]
    assert r["unexpected_percent"] == 25.0  # 1/4 nonnull
    assert r["unexpected_percent_total"] == 20.0


def test_be_in_set_mostly(df):
    evr = run_one(
        df,
        "expect_column_values_to_be_in_set",
        column="x",
        value_set=[1, 2, 3],
        mostly=0.75,
    )
    assert evr.success is True
    assert evr.result["unexpected_count"] == 1


def test_not_be_in_set(df):
    evr = run_one(
        df, "expect_column_values_to_not_be_in_set", column="x", value_set=[2]
    )
    assert evr.success is False
    assert evr.result["unexpected_list"] == [2]


def test_be_between(df):
    evr = run_one(
        df,
        "expect_column_values_to_be_between",
        column="x",
        min_value=1,
        max_value=3,
    )
    assert evr.success is False
    assert evr.result["unexpected_list"] == [4]


def test_be_between_strict(df):
    evr = run_one(
        df,
        "expect_column_values_to_be_between",
        column="x",
        min_value=1,
        max_value=4,
        strict_max=True,
    )
    assert sorted(evr.result["unexpected_list"]) == [4]


def test_value_lengths(df):
    evr = run_one(
        df, "expect_column_value_lengths_to_equal", column="s", value=3
    )
    assert evr.success is True
    evr = run_one(
        df,
        "expect_column_value_lengths_to_be_between",
        column="s",
        min_value=1,
        max_value=2,
    )
    assert evr.success is False
    assert evr.result["unexpected_count"] == 4


def test_match_regex(df):
    evr = run_one(
        df, "expect_column_values_to_match_regex", column="s", regex="^a"
    )
    assert evr.success is False
    assert evr.result["unexpected_list"] == ["zzz"]


def test_regex_list_any_all(df):
    evr = run_one(
        df,
        "expect_column_values_to_match_regex_list",
        column="s",
        regex_list=["^a", "^z"],
        match_on="any",
    )
    assert evr.success is True
    evr = run_one(
        df,
        "expect_column_values_to_match_regex_list",
        column="s",
        regex_list=["^a", "a$"],
        match_on="all",
    )
    assert evr.success is False


def test_like_pattern(df):
    evr = run_one(
        df,
        "expect_column_values_to_match_like_pattern",
        column="s",
        like_pattern="a%",
    )
    assert evr.result["unexpected_list"] == ["zzz"]


def test_vacuous_empty_table(spark):
    schema = T.StructType([T.StructField("x", T.IntegerType())])
    empty = spark.createDataFrame([], schema)
    evr = run_one(
        empty, "expect_column_values_to_be_in_set", column="x", value_set=[1]
    )
    assert evr.success is True
    assert evr.result["element_count"] == 0


def test_vacuous_all_null(spark):
    schema = T.StructType([T.StructField("x", T.IntegerType())])
    allnull = spark.createDataFrame([(None,), (None,)], schema)
    evr = run_one(
        allnull, "expect_column_values_to_be_between", column="x", min_value=0,
        max_value=1,
    )
    assert evr.success is True


def test_summary_partial_counts(df):
    s = ges.suite("t").expect(
        "expect_column_values_to_be_in_set", column="x", value_set=[1]
    )
    res = ges.validate(df, s, result_format="SUMMARY")
    r = res.results[0].result
    assert "partial_unexpected_counts" in r
    counts = {d["value"]: d["count"] for d in r["partial_unexpected_counts"]}
    assert counts == {2: 1, 3: 1, 4: 1}
    assert "unexpected_list" not in r


def test_boolean_only(df):
    s = ges.suite("t").expect(
        "expect_column_values_to_be_in_set", column="x", value_set=[1]
    )
    res = ges.validate(df, s, result_format="BOOLEAN_ONLY")
    assert res.results[0].result == {}
    assert res.results[0].success is False


def test_row_condition(df):
    evr = run_one(
        df,
        "expect_column_values_to_be_between",
        column="x",
        min_value=1,
        max_value=2,
        row_condition="x < 3",
    )
    assert evr.success is True
    assert evr.result["element_count"] == 2


def test_strftime(spark):
    schema = T.StructType([T.StructField("d", T.StringType())])
    df = spark.createDataFrame(
        [("2024-01-01",), ("2024-13-45",), (None,)], schema
    )
    evr = run_one(
        df,
        "expect_column_values_to_match_strftime_format",
        column="d",
        strftime_format="%Y-%m-%d",
    )
    assert evr.success is False
    assert evr.result["unexpected_list"] == ["2024-13-45"]


def test_json_parseable(spark):
    schema = T.StructType([T.StructField("j", T.StringType())])
    df = spark.createDataFrame([('{"a": 1}',), ("not json",), (None,)], schema)
    evr = run_one(
        df, "expect_column_values_to_be_json_parseable", column="j"
    )
    assert evr.success is False
    assert evr.result["unexpected_list"] == ["not json"]


def test_match_json_schema(spark):
    schema = T.StructType([T.StructField("j", T.StringType())])
    df = spark.createDataFrame(
        [('{"a": 1}',), ('{"a": "x"}',), ('{"b": 2}',)], schema
    )
    evr = run_one(
        df,
        "expect_column_values_to_match_json_schema",
        column="j",
        json_schema={
            "type": "object",
            "properties": {"a": {"type": "integer"}},
            "required": ["a"],
        },
    )
    assert evr.success is False
    assert evr.result["unexpected_count"] == 2


def test_dateutil_parseable(spark):
    schema = T.StructType([T.StructField("d", T.StringType())])
    df = spark.createDataFrame([("Jan 01 1970 12:00:01",), ("nope!!",)], schema)
    evr = run_one(
        df, "expect_column_values_to_be_dateutil_parseable", column="d"
    )
    assert evr.success is False
    assert evr.result["unexpected_list"] == ["nope!!"]


def test_z_scores(spark):
    schema = T.StructType([T.StructField("v", T.DoubleType())])
    df = spark.createDataFrame(
        [(1.0,), (1.1,), (0.9,), (1.05,), (100.0,)], schema
    )
    evr = run_one(
        df,
        "expect_column_value_z_scores_to_be_less_than",
        column="v",
        threshold=1.5,
        double_sided=True,
    )
    assert evr.success is False
    assert evr.result["unexpected_list"] == [100.0]


def test_pair_equal(spark):
    schema = T.StructType(
        [
            T.StructField("a", T.IntegerType()),
            T.StructField("b", T.IntegerType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, 1), (2, 3), (None, None), (4, None)], schema
    )
    evr = run_one(
        df, "expect_column_pair_values_to_be_equal", column_A="a", column_B="b"
    )
    # considered: 3 rows (both-null ignored); unexpected: (2,3), (4,None)
    assert evr.success is False
    r = evr.result
    assert r["element_count"] == 4
    assert r["missing_count"] == 1
    assert r["unexpected_count"] == 2
    assert sorted(r["unexpected_list"], key=str) == [[2, 3], [4, None]]


def test_pair_greater(spark):
    schema = T.StructType(
        [
            T.StructField("a", T.IntegerType()),
            T.StructField("b", T.IntegerType()),
        ]
    )
    df = spark.createDataFrame([(2, 1), (1, 1), (0, 5)], schema)
    evr = run_one(
        df,
        "expect_column_pair_values_a_to_be_greater_than_b",
        column_A="a",
        column_B="b",
        or_equal=True,
        ignore_row_if="either_value_is_missing",
    )
    assert evr.result["unexpected_count"] == 1


def test_pair_in_set(spark):
    schema = T.StructType(
        [
            T.StructField("a", T.StringType()),
            T.StructField("b", T.IntegerType()),
        ]
    )
    df = spark.createDataFrame([("x", 1), ("y", 2), ("x", 2)], schema)
    evr = run_one(
        df,
        "expect_column_pair_values_to_be_in_set",
        column_A="a",
        column_B="b",
        value_pairs_set=[("x", 1), ("y", 2)],
    )
    assert evr.success is False
    assert evr.result["unexpected_list"] == [["x", 2]]


def test_multicolumn_sum(spark):
    schema = T.StructType(
        [
            T.StructField("a", T.IntegerType()),
            T.StructField("b", T.IntegerType()),
            T.StructField("c", T.IntegerType()),
        ]
    )
    df = spark.createDataFrame([(1, 2, 7), (5, 5, 0), (1, 1, 1)], schema)
    evr = run_one(
        df,
        "expect_multicolumn_sum_to_equal",
        column_list=["a", "b", "c"],
        sum_total=10,
    )
    assert evr.success is False
    assert evr.result["unexpected_count"] == 1
    assert evr.result["unexpected_list"] == [{"a": 1, "b": 1, "c": 1}]


def test_select_unique_within_record(spark):
    schema = T.StructType(
        [
            T.StructField("a", T.IntegerType()),
            T.StructField("b", T.IntegerType()),
        ]
    )
    df = spark.createDataFrame([(1, 2), (3, 3), (None, 1)], schema)
    evr = run_one(
        df,
        "expect_select_column_values_to_be_unique_within_record",
        column_list=["a", "b"],
        ignore_row_if="any_value_is_missing",
    )
    assert evr.success is False
    assert evr.result["unexpected_count"] == 1
    assert evr.result["unexpected_list"] == [{"a": 3, "b": 3}]


def test_multiple_expectations_one_suite(df):
    s = (
        ges.suite("multi")
        .expect("expect_column_values_to_not_be_null", column="x")
        .expect("expect_column_values_to_be_between", column="x", min_value=0, max_value=10)
        .expect("expect_column_values_to_match_regex", column="s", regex=".")
        .expect("expect_column_mean_to_be_between", column="y", min_value=0, max_value=10)
        .expect("expect_table_row_count_to_equal", value=5)
    )
    res = ges.validate(df, s, result_format="COMPLETE")
    assert res.statistics["evaluated_expectations"] == 5
    by_type = {
        r.expectation_config.expectation_type: r.success for r in res.results
    }
    assert by_type["expect_column_values_to_be_between"] is True
    assert by_type["expect_table_row_count_to_equal"] is True
