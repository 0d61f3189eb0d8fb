"""Salted skew helpers (exact-equivalence vs unsalted plans) and
micro-batch streaming validation."""

import datetime
import glob
import json
import os

import pytest

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


def test_windowed_psi_drift_stream(spark, tmp_path):
    """Watermarked windowed PSI: a file stream whose later window
    shifts distribution must flag exactly that window, and the
    per-window PSI must match the batch PSI over the same rows."""
    import math

    from great_expectations_spark.streaming.windowed_drift import (
        start_windowed_drift_monitor,
        windowed_psi_drift,
    )

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)

    def rows(base_ts, n, lo, hi, seed):
        import random

        rnd = random.Random(seed)
        return [
            (
                datetime.datetime.fromtimestamp(
                    base_ts + rnd.uniform(0, 500),
                    tz=datetime.timezone.utc,
                ),
                rnd.uniform(lo, hi),
            )
            for _ in range(n)
        ]

    t0 = 1_700_000_400  # multiple of 600s: rows stay inside one window
    schema = "ts timestamp, v double"
    # window 1: values in [0, 10) (baseline-like)
    spark.createDataFrame(rows(t0, 400, 0, 10, 1), schema).write.mode(
        "overwrite"
    ).parquet(src + "/f1.parquet")
    # window 2 (t0 + 600s): values shifted to [5, 15)
    spark.createDataFrame(
        rows(t0 + 600, 400, 5, 15, 2), schema
    ).write.mode("overwrite").parquet(src + "/f2.parquet")

    baseline = {
        "bins": [0.0, 2.5, 5.0, 7.5, 10.0],
        "weights": [0.25, 0.25, 0.25, 0.25],
    }

    # a third file with one sentinel event advances the watermark so
    # window 2 can CLOSE (append mode emits a window only once the
    # watermark passes its end — the final window of a drained stream
    # otherwise never emits); maxFilesPerTrigger=1 forces one file
    # per micro-batch so the watermark advances between files
    spark.createDataFrame(
        rows(t0 + 1300, 1, 0, 10, 3), schema
    ).write.mode("overwrite").parquet(src + "/f3.parquet")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*.parquet")
    )
    q = start_windowed_drift_monitor(
        stream,
        "v",
        baseline,
        result_path=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        ts_col="ts",
        window_len="10 minutes",
        watermark="0 seconds",
        threshold=0.2,
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    got = {
        r.window_start.timestamp(): (r.n, r.psi, r.drifted)
        for r in out.collect()
    }
    assert len(got) == 2
    (n1, psi1, d1) = got[float(t0)]
    (n2, psi2, d2) = got[float(t0 + 600)]
    assert (n1, n2) == (400, 400)
    assert not d1 and psi1 < 0.2
    assert d2 and psi2 > 0.2

    # cross-check one window's PSI against a batch computation over
    # the identical rows
    batch = spark.read.parquet(src + "/f2.parquet")
    eps = 1e-6
    counts = [0] * 4
    vals = [r.v for r in batch.collect()]
    binned = 0
    for v in vals:
        for i, (lo, hi) in enumerate(
            zip(baseline["bins"], baseline["bins"][1:])
        ):
            last = i == 3
            if (v >= lo and v < hi) or (last and v >= lo and v <= hi):
                counts[i] += 1
                binned += 1
                break
    psi_ref = 0.0
    for i, w in enumerate(baseline["weights"]):
        a = max(counts[i] / max(binned, 1), eps)
        b = max(w, eps)
        psi_ref += (a - b) * math.log(a / b)
    assert psi2 == pytest.approx(round(psi_ref, 6), abs=2e-6)


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark-based exact dedup: duplicates
    inside the horizon are dropped (first occurrence survives),
    distinct documents all pass, and state keys on the content hash
    (bounded by the horizon), not the text."""
    from datetime import datetime, timedelta

    from great_expectations_spark.streaming.dedup_stream import (
        dedup_stream,
    )

    src = str(tmp_path / "dsrc")
    base = datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    # 30 distinct docs, each duplicated 3x within a few minutes
    for i in range(30):
        for k in range(3):
            rows.append(
                (
                    i * 10 + k,
                    f"document body number {i}",
                    base + timedelta(minutes=i, seconds=k * 10),
                )
            )
    # case-variant duplicate: normalized hashing must drop it
    rows.append((900, "DOCUMENT BODY NUMBER 0", base))
    spark.createDataFrame(
        rows, "doc_id long, text string, ts timestamp"
    ).write.parquet(src)

    stream = spark.readStream.schema(
        "doc_id long, text string, ts timestamp"
    ).parquet(src)
    out = str(tmp_path / "dout")
    q = (
        dedup_stream(stream, watermark="30 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "dckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out).collect()
    # one survivor per distinct normalized text
    assert len(got) == 30
    texts = sorted(r.text.lower() for r in got)
    assert texts == sorted(f"document body number {i}" for i in range(30))


def test_windowed_distinct_collapse_stream(spark, tmp_path):
    """Windowed approximate-distinct monitor: a window whose key
    cardinality collapses (stuck producer replaying 3 IDs) is
    flagged; a healthy window is not; estimates land within HLL++
    error of the exact per-window distinct counts."""
    from great_expectations_spark.streaming.windowed_drift import (
        windowed_distinct_stats,
    )

    src = str(tmp_path / "dsrc")
    os.makedirs(src, exist_ok=True)

    def rows(base_ts, ids, seed):
        import random

        rnd = random.Random(seed)
        return [
            (
                datetime.datetime.fromtimestamp(
                    base_ts + rnd.uniform(0, 500),
                    tz=datetime.timezone.utc,
                ),
                str(rnd.choice(ids)),
            )
            for _ in range(400)
        ]

    t0 = 1_700_000_400
    schema = "ts timestamp, key string"
    healthy = [f"id{i}" for i in range(1000)]
    spark.createDataFrame(rows(t0, healthy, 1), schema).write.mode(
        "overwrite"
    ).parquet(src + "/f1.parquet")
    spark.createDataFrame(
        rows(t0 + 600, ["a", "b", "c"], 2), schema
    ).write.mode("overwrite").parquet(src + "/f2.parquet")
    # sentinel advances the watermark past window 2's end
    # (t0+1200 + 5 min watermark => sentinel at t0+1600)
    spark.createDataFrame(
        [
            (
                datetime.datetime.fromtimestamp(
                    t0 + 1600, tz=datetime.timezone.utc
                ),
                "z",
            )
        ],
        schema,
    ).write.mode("overwrite").parquet(src + "/f3.parquet")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*.parquet")
    )
    out = windowed_distinct_stats(
        stream, "key", window_len="10 minutes", watermark="5 minutes",
        rsd=0.02, min_distinct_ratio=0.05,
    )
    res_path = str(tmp_path / "dres")
    q = (
        out.writeStream.format("parquet")
        .option("path", res_path)
        .option("checkpointLocation", str(tmp_path / "dchk"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["window_start"].timestamp(): r
        for r in spark.read.parquet(res_path).collect()
    }
    assert t0 in got and t0 + 600 in got
    w1, w2 = got[t0], got[t0 + 600]
    assert not w1["collapsed"] and w2["collapsed"]
    # batch parity within HLL++ rsd
    batch = spark.read.parquet(src + "/f1.parquet")
    exact1 = batch.select("key").distinct().count()
    assert abs(w1["distinct_est"] - exact1) <= 4 * 0.02 * exact1
    assert w2["distinct_est"] == 3
    assert w2["distinct_ratio"] < 0.05


def test_windowed_quantile_breach_stream(spark, tmp_path):
    """Windowed KLL quantiles: a window whose tail explodes (values
    x10) breaches its p99 bound; the healthy window's p50 matches the
    batch exact-rank window."""
    from great_expectations_spark.streaming.windowed_drift import (
        windowed_quantile_stats,
    )

    src = str(tmp_path / "qsrc")
    os.makedirs(src, exist_ok=True)

    def rows(base_ts, scale, seed):
        import random

        rnd = random.Random(seed)
        return [
            (
                datetime.datetime.fromtimestamp(
                    base_ts + rnd.uniform(0, 500),
                    tz=datetime.timezone.utc,
                ),
                rnd.uniform(0, 100) * scale,
            )
            for _ in range(500)
        ]

    t0 = 1_700_000_400
    schema = "ts timestamp, v double"
    spark.createDataFrame(rows(t0, 1.0, 1), schema).write.mode(
        "overwrite"
    ).parquet(src + "/f1.parquet")
    spark.createDataFrame(rows(t0 + 600, 10.0, 2), schema).write.mode(
        "overwrite"
    ).parquet(src + "/f2.parquet")
    spark.createDataFrame(
        [
            (
                datetime.datetime.fromtimestamp(
                    t0 + 1600, tz=datetime.timezone.utc
                ),
                1.0,
            )
        ],
        schema,
    ).write.mode("overwrite").parquet(src + "/f3.parquet")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*.parquet")
    )
    out = windowed_quantile_stats(
        stream, "v", quantiles=(0.5, 0.99),
        window_len="10 minutes", watermark="5 minutes",
        upper_bounds={0.99: 150.0},
    )
    res_path = str(tmp_path / "qres")
    q = (
        out.writeStream.format("parquet")
        .option("path", res_path)
        .option("checkpointLocation", str(tmp_path / "qchk"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["window_start"].timestamp(): r
        for r in spark.read.parquet(res_path).collect()
    }
    w1, w2 = got[t0], got[t0 + 600]
    assert not w1["breached"] and w2["breached"]
    assert w2["p99"] > 500
    batch = spark.read.parquet(src + "/f1.parquet")
    lo, hi = batch.approxQuantile("v", [0.45, 0.55], 0.0)
    assert lo <= w1["p50"] <= hi


def test_windowed_mix_stream(spark, tmp_path):
    """Windowed mix monitor: a window where one source floods the
    stream is flagged off-target for exactly the skewed values; a
    window matching the target mix is not; shares are exact
    (conditional counts, no sketch)."""
    from great_expectations_spark.streaming.windowed_drift import (
        windowed_mix_stats,
    )

    src = str(tmp_path / "mixsrc")
    os.makedirs(src, exist_ok=True)

    def rows(base_ts, sources, seed):
        import random

        rnd = random.Random(seed)
        return [
            (
                datetime.datetime.fromtimestamp(
                    base_ts + rnd.uniform(0, 500),
                    tz=datetime.timezone.utc,
                ),
                rnd.choice(sources),
            )
            for _ in range(600)
        ]

    t0 = 1_700_000_400
    schema = "ts timestamp, source string"
    balanced = ["web", "web", "books", "code"]  # ~0.5 / 0.25 / 0.25
    flooded = ["web"] * 19 + ["books"]  # books starves, code vanishes
    spark.createDataFrame(rows(t0, balanced, 1), schema).write.mode(
        "overwrite"
    ).parquet(src + "/f1.parquet")
    spark.createDataFrame(rows(t0 + 600, flooded, 2), schema).write.mode(
        "overwrite"
    ).parquet(src + "/f2.parquet")
    spark.createDataFrame(
        [
            (
                datetime.datetime.fromtimestamp(
                    t0 + 1600, tz=datetime.timezone.utc
                ),
                "z",
            )
        ],
        schema,
    ).write.mode("overwrite").parquet(src + "/f3.parquet")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*.parquet")
    )
    out = windowed_mix_stats(
        stream,
        "source",
        targets={"web": 0.5, "books": 0.25, "code": 0.25},
        window_len="10 minutes",
        watermark="5 minutes",
        tolerance=0.1,
    )
    res_path = str(tmp_path / "mixres")
    q = (
        out.writeStream.format("parquet")
        .option("path", res_path)
        .option("checkpointLocation", str(tmp_path / "mixchk"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"].timestamp(), r["value"]): r
        for r in spark.read.parquet(res_path).collect()
    }
    # window 1: balanced — every tracked value within tolerance
    for v in ("web", "books", "code"):
        r = got[(t0, v)]
        assert not r["off_target"], (v, r["share"])
        assert r["n"] == 600
    # window 2: flooded — all three off target (web over, others under)
    for v in ("web", "books", "code"):
        assert got[(t0 + 600, v)]["off_target"], v
    # shares are exact conditional counts: recompute from the source
    w2 = spark.read.parquet(src + "/f2.parquet").collect()
    n_web = sum(1 for r in w2 if r["source"] == "web")
    assert got[(t0 + 600, "web")]["share"] == round(n_web / len(w2), 6)
