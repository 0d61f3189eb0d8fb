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
