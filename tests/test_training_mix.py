"""Training-mix operators: deterministic sampling + sequence packing.

Structural invariants plus an exact pandas recomputation of the
packing report — the oracle harness covers cross-engine parity; these
pin the semantics themselves.
"""

import math

import pandas as pd
import pytest

from great_expectations_spark import suite_queries as sq

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def mix(spark):
    return {
        r["source"]: r.asDict()
        for r in sq.source_mix_sample(spark, SF).collect()
    }


def test_source_mix_rates_bounded_and_deterministic(spark, mix):
    assert mix
    for r in mix.values():
        assert 0.25 <= r["target_rate"] < 0.75
        assert 0 <= r["sampled_docs"] <= r["total_docs"]
        assert 0.0 <= r["achieved_rate"] <= 1.0
    again = {
        r["source"]: r.asDict()
        for r in sq.source_mix_sample(spark, SF).collect()
    }
    assert again == mix  # content-addressed: no RNG state anywhere


def test_source_mix_matches_hashlib(spark, mix):
    # independent recomputation of one source's selection from the
    # definition (md5 prefixes), not from the Spark expressions
    import hashlib

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source"
    ).collect()
    src = docs[0]["source"]
    rate_bp = (
        int(hashlib.md5(src.encode()).hexdigest()[:4], 16) % 5000 + 2500
    )
    sampled = sum(
        1
        for d in docs
        if d["source"] == src
        and int(
            hashlib.md5(str(d["doc_id"]).encode()).hexdigest()[:4], 16
        )
        % 10000
        < rate_bp
    )
    assert mix[src]["target_rate"] == round(rate_bp / 10000.0, 4)
    assert mix[src]["sampled_docs"] == sampled


def test_seq_packing_matches_pandas(spark):
    got = {
        r["source"]: r.asDict()
        for r in sq.seq_packing_stats(spark, SF).collect()
    }
    pdf = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("source", "doc_id", "text")
        .toPandas()
    )
    pdf["tokens"] = pdf["text"].str.split(" ").str.len()
    pdf["shard"] = pdf["doc_id"] % sq._PACK_SHARDS
    ctx = sq._PACK_CTX
    for src, g in pdf.groupby("source"):
        bins = spans = 0
        for _, sh in g.groupby("shard"):
            sh = sh.sort_values("doc_id")
            cum = sh["tokens"].cumsum()
            bins += math.ceil(cum.iloc[-1] / ctx)
            spans += int(
                (((cum - sh["tokens"]) // ctx) != ((cum - 1) // ctx)).sum()
            )
        r = got[src]
        assert r["total_docs"] == len(g)
        assert r["total_tokens"] == int(g["tokens"].sum())
        assert r["n_bins"] == bins
        assert r["spanning_docs"] == spans
        assert r["fill_ratio"] == round(
            g["tokens"].sum() / (bins * ctx), 4
        )
        # a window is never overfilled on paper: utilization <= 1
        assert r["fill_ratio"] <= 1.0


def test_mix_sample_rates_and_determinism(spark):
    import hashlib

    from great_expectations_spark.suite_queries import mix_sample

    d = spark.read.parquet(f"{SF}/documents.parquet")
    targets = {"src0": 0.2, "src1": 0.8}
    got = mix_sample(d, "doc_id", "source", targets, default_rate=0.5)
    rows = got.select("doc_id", "source").collect()
    # exact recomputation from the definition
    alld = d.select("doc_id", "source").collect()
    expect = {
        r["doc_id"]
        for r in alld
        if int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:4], 16)
        < targets.get(r["source"], 0.5) * 65536
    }
    assert {r["doc_id"] for r in rows} == expect
    # stable across invocations (content-addressed)
    again = {r["doc_id"] for r in mix_sample(
        d, "doc_id", "source", targets, default_rate=0.5
    ).select("doc_id").collect()}
    assert again == expect


def test_pack_assignments_consistent_with_stats(spark):
    from great_expectations_spark import suite_queries as sq
    from great_expectations_spark.suite_queries import pack_assignments

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    import pyspark.sql.functions as F

    asg = pack_assignments(
        d,
        "doc_id",
        F.size(F.split(F.col("text"), " ")),
        group_col="source",
        ctx=sq._PACK_CTX,
        shards=sq._PACK_SHARDS,
    )
    # aggregate of per-doc assignments == the accounting query
    per_source = {
        r["source"]: r.asDict()
        for r in asg.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("total_docs"),
            F.sum(F.col("spans_boundary").cast("int")).alias(
                "spanning_docs"
            ),
        )
        .collect()
    }
    stats = {
        r["source"]: r.asDict()
        for r in sq.seq_packing_stats(spark, SF).collect()
    }
    assert set(per_source) == set(stats)
    for src, s in stats.items():
        assert per_source[src]["total_docs"] == s["total_docs"]
        assert per_source[src]["spanning_docs"] == s["spanning_docs"]
    # bin ids are dense from 0 within each (group, shard) stream
    first_bins = (
        asg.groupBy("source", "shard").agg(F.min("bin_id").alias("b0"))
        .collect()
    )
    assert all(r["b0"] == 0 for r in first_bins)
