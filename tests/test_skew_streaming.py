"""Salted skew helpers (exact-equivalence vs unsalted plans) and
micro-batch streaming validation."""

import glob
import json

from pyspark.sql import functions as F

import great_expectations_spark as ges
from great_expectations_spark.operators.skew import (
    hot_keys,
    salted_group_agg,
    salted_join,
)


def skewed_df(spark, n=20000):
    # 60% of rows share one hot key
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 6, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 997).cast("string")))
        .alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
    )


def test_hot_key_detection(spark):
    df = skewed_df(spark)
    hot = hot_keys(df, "k", sample_fraction=0.05, min_share=0.05)
    assert hot == ["HOT"]


def test_salted_group_agg_matches_plain(spark):
    df = skewed_df(spark)
    plain = {
        r["k"]: (r["cnt"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("cnt"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        r["k"]: (r["cnt"], r["s"])
        for r in salted_group_agg(
            df,
            ["k"],
            partial_aggs={
                "cnt": F.count("*"),
                "s": F.sum("v"),
            },
            merge_aggs={
                "cnt": F.sum("cnt"),
                "s": F.sum("s"),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    left = skewed_df(spark, n=5000)
    right = spark.createDataFrame(
        [("HOT", 1), ("k1", 2), ("k2", 3)], "k string, dim int"
    )
    plain = sorted(
        tuple(r) for r in left.join(right, "k", "inner").collect()
    )
    salted = sorted(
        tuple(r)
        for r in salted_join(left, right, "k", n_salts=8).collect()
    )
    assert salted == plain


def test_streaming_validation(spark, tmp_path):
    from great_expectations_spark.streaming.validate_stream import (
        validate_stream,
    )

    src = str(tmp_path / "src")
    spark.range(500).select(
        F.col("id"),
        F.when(F.col("id") % 100 == 0, None)
        .otherwise(F.col("id") % 7)
        .alias("v"),
    ).write.parquet(src)

    stream = spark.readStream.schema("id long, v long").parquet(src)
    suite = (
        ges.suite("stream")
        .expect("expect_column_values_to_not_be_null", column="v",
                mostly=0.9)
        .expect("expect_column_values_to_be_between", column="v",
                min_value=0, max_value=6)
    )
    out = str(tmp_path / "results")
    q = validate_stream(
        stream, suite, out, str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q.awaitTermination(120)

    files = sorted(glob.glob(f"{out}/batch-*.json"))
    assert files
    recs = [json.loads(open(f).read()) for f in files]
    total = sum(
        r["results"][0]["result"]["element_count"] for r in recs
    )
    assert total == 500
    assert all(r["success"] for r in recs)
