"""Windowed heavy-hitter monitor (applyInPandasWithState): exact
per-window counts when vocabulary fits capacity, correct window
attribution and flush-on-watermark, token-sharded routing that never
splits a token's count, and the Misra-Gries guarantee under eviction
pressure."""

import collections
from datetime import datetime, timedelta

from great_expectations_spark.streaming.heavy_hitters_stream import (
    windowed_heavy_hitters,
)

BASE = datetime(2026, 1, 1, 12, 0, 0)
SCHEMA = "text string, ts timestamp"
OUT_SCHEMA = (
    "window_start timestamp, window_end timestamp, shard int, "
    "word string, count_lo long, rank int"
)


def _run_stream(spark, tmp_path, **kw):
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(tmp_path / "src"))
    out = str(tmp_path / "out")
    q = (
        windowed_heavy_hitters(stream, **kw)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.schema(OUT_SCHEMA).parquet(out)


def _feed(spark, tmp_path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(tmp_path / "src"))


def test_windowed_counts_exact_and_attributed(spark, tmp_path):
    win_a = [("alpha beta alpha", BASE + timedelta(minutes=1)),
             ("alpha gamma", BASE + timedelta(minutes=4))]
    win_b = [("beta beta delta", BASE + timedelta(minutes=12))]
    _feed(spark, tmp_path, win_a + win_b)
    # flusher: advances the watermark far past both window ends
    _feed(spark, tmp_path, [("flush", BASE + timedelta(hours=3))])

    got = _run_stream(
        spark, tmp_path, window_len="10 minutes", watermark="1 minute"
    ).collect()

    exact = collections.Counter()
    for text, ts in win_a:
        for w in text.split(" "):
            exact[(BASE, w)] += 1
    for text, ts in win_b:
        for w in text.split(" "):
            exact[(BASE + timedelta(minutes=10), w)] += 1
    assert {
        (r["window_start"], r["word"]): r["count_lo"] for r in got
    } == dict(exact)
    for r in got:
        assert r["window_end"] == r["window_start"] + timedelta(minutes=10)
    # the flusher's own window never closed -> absent
    assert all(r["window_start"] <= BASE + timedelta(minutes=10) for r in got)
    # token-sharded routing: a (window, token) count never splits
    keys = [(r["window_start"], r["word"]) for r in got]
    assert len(keys) == len(set(keys))
    # per-shard ranks are 1..n ordered by (count desc, word)
    by_shard = collections.defaultdict(list)
    for r in got:
        by_shard[(r["window_start"], r["shard"])].append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        order = [(-r["count_lo"], r["word"]) for r in rows]
        assert order == sorted(order)


def test_state_carries_across_microbatches(spark, tmp_path):
    # same window, two micro-batches (maxFilesPerTrigger=1): the
    # second batch must INCREMENT the sketch, not restart it
    _feed(spark, tmp_path, [("hot hot", BASE + timedelta(minutes=1))])
    _feed(spark, tmp_path, [("hot cold", BASE + timedelta(minutes=2))])
    _feed(spark, tmp_path, [("flush", BASE + timedelta(hours=3))])
    got = {
        r["word"]: r["count_lo"]
        for r in _run_stream(
            spark, tmp_path, window_len="10 minutes", watermark="1 minute"
        ).collect()
    }
    assert got == {"hot": 3, "cold": 1}


def test_eviction_pressure_keeps_heavy_region(spark, tmp_path):
    """Vocabulary 100 >> capacity 8 in one shard: the heavy token
    (count 50 > N/capacity ~ 19) must survive with a count_lo within
    the Misra-Gries error bound and rank 1; top_k truncation holds."""
    noise = [f"n{i:03d}" for i in range(100)]
    tokens = []
    for i, w in enumerate(noise):
        tokens.append(w)
        if i % 2 == 0:
            tokens.append("hot")
    text = " ".join(tokens)  # 100 noise + 50 hot
    _feed(spark, tmp_path, [(text, BASE + timedelta(minutes=1))])
    _feed(spark, tmp_path, [("flush", BASE + timedelta(hours=3))])
    got = _run_stream(
        spark, tmp_path, window_len="10 minutes", watermark="1 minute",
        capacity=8, top_k=5, n_shards=1,
    ).collect()
    got = [r for r in got if r["window_start"] == BASE]
    assert len(got) <= 5
    top = min(got, key=lambda r: r["rank"])
    assert top["word"] == "hot"
    n = len(tokens)
    assert 50 - n / 8 <= top["count_lo"] <= 50