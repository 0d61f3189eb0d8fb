"""Corpus-audit semantics on planted corpora plus third-implementation
checks (pure-Python recomputation, independent of both Spark and the
DuckDB oracle) for the phash-derived audits on real test data."""

import hashlib
import math

import pytest

from great_expectations_spark import suite_queries as sq

SF = "/root/testdata/sf0.001"


# --- pure-Python twin of _phash_parts_sql ------------------------------------


def _phash_py(doc_id: int) -> int:
    grp = -1 if doc_id % 10 < 3 else doc_id % 211
    ws = []
    for i in range(4):
        h = hashlib.md5(f"ph{grp}:{i}".encode()).hexdigest()
        w = int(h[:4], 16)
        if i == 0:
            w %= 32768
        ws.append(w)
    if doc_id % 2 == 1:
        ws[3] ^= 2 ** (doc_id % 16)
    return (
        ws[0] * 281474976710656
        + ws[1] * 4294967296
        + ws[2] * 65536
        + ws[3]
    )


def _split_key_py(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 5


def _read_docs():
    import duckdb

    return duckdb.sql(
        f"SELECT doc_id, source FROM '{SF}/documents.parquet'"
    ).fetchall()


# --- segment_dedup_stats ------------------------------------------------------


@pytest.fixture()
def seg_dir(spark, tmp_path):
    shared = "a b c d e f g h"  # one exact 8-token segment
    loop8 = "x1 x2 x3 x4 x5 x6 x7 x8"
    rows = [
        # srcA: shared segment + 8 unique tokens -> 2 segments, 1 dup
        (1, shared + " u1 u2 u3 u4 u5 u6 u7 u8", "en", "srcA", 50),
        # srcB doc 2: exactly the shared segment -> 1 segment, dup,
        # majority-duplicated (docs_over_half)
        (2, shared, "en", "srcB", 15),
        # srcB doc 3: same 8-token block twice WITHIN the doc only ->
        # 2 segments, 0 dups (within-doc repetition is excluded)
        (3, loop8 + " " + loop8, "en", "srcB", 40),
        # srcC: under 8 tokens -> no segments, still counted in docs
        (4, "p q r s t", "en", "srcC", 9),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    d = str(tmp_path / "sfseg")
    df.coalesce(2).write.mode("overwrite").parquet(
        d + "/documents.parquet"
    )
    return d


def test_segment_dedup_planted(spark, seg_dir):
    out = {
        r.source: r
        for r in sq.segment_dedup_stats(spark, seg_dir).collect()
    }
    a, b, c = out["srcA"], out["srcB"], out["srcC"]
    assert (a.docs, a.docs_with_segments, a.segments) == (1, 1, 2)
    assert a.dup_segments == 1 and a.dup_rate == 0.5
    assert a.docs_over_half == 0  # 1*2 > 2 is false
    assert (b.docs, b.docs_with_segments, b.segments) == (2, 2, 3)
    # doc 2's lone segment is cross-doc duplicated; doc 3's two
    # identical segments live in one doc only -> not duplicated
    assert b.dup_segments == 1
    assert b.dup_rate == math.floor(1 * 10000 / 3) / 10000
    assert b.docs_over_half == 1  # doc 2: all segments duplicated
    assert (c.docs, c.docs_with_segments, c.segments) == (1, 0, 0)
    assert c.dup_segments == 0 and c.dup_rate == 0.0


# --- source_token_divergence ---------------------------------------------------


@pytest.fixture()
def jsd_dir(spark, tmp_path):
    rows = [
        # srcX and srcY have IDENTICAL token distributions
        (1, "w1 w2 w3 w1", "en", "srcX", 11),
        (2, "w1 w2 w3 w1", "en", "srcY", 11),
        # srcZ is a different register entirely
        (3, "zz zz zz zz", "en", "srcZ", 11),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    d = str(tmp_path / "sfjsd")
    df.coalesce(1).write.mode("overwrite").parquet(
        d + "/documents.parquet"
    )
    return d


def _jsd_py(counts: dict, glob: dict) -> float:
    st, gt = sum(counts.values()), sum(glob.values())
    acc = 0.0
    for tok, g in glob.items():
        c = counts.get(tok)
        q = g / gt
        p = (c or 0) / st
        m = (p + q) / 2
        if c is not None:
            acc += 0.5 * p * math.log(p / m)
        acc += 0.5 * q * math.log(q / m)
    return round(acc, 6)


def test_source_token_divergence_planted(spark, jsd_dir):
    out = {
        r.source: r
        for r in sq.source_token_divergence(spark, jsd_dir).collect()
    }
    glob = {"w1": 4, "w2": 2, "w3": 2, "zz": 4}
    xy = {"w1": 2, "w2": 1, "w3": 1}
    assert out["srcX"].jsd == out["srcY"].jsd == _jsd_py(xy, glob)
    assert out["srcZ"].jsd == _jsd_py({"zz": 4}, glob)
    # identical-to-each-other sources still diverge from the MIX;
    # the single-token source diverges more, and JSD <= ln 2
    assert 0.0 < out["srcX"].jsd < out["srcZ"].jsd <= math.log(2) + 1e-9
    assert out["srcX"].vocab == out["srcZ"].vocab == 4
    assert out["srcX"].src_vocab == 3 and out["srcZ"].src_vocab == 1
    assert out["srcX"].tokens == 4


# --- phash_split_leakage (third implementation on real data) ------------------


def test_phash_split_leakage_matches_python(spark):
    docs = _read_docs()
    train = {
        _phash_py(i) for i, _ in docs if _split_key_py(i) != 0
    }
    exp = {}
    for i, src in docs:
        if _split_key_py(i) != 0:
            continue
        e = exp.setdefault(src, [0, 0, set()])
        e[0] += 1
        ph = _phash_py(i)
        if ph in train:
            e[1] += 1
            e[2].add(ph)
    out = {
        r.source: r
        for r in sq.phash_split_leakage(spark, SF).collect()
    }
    assert set(out) == set(exp)
    for src, (n, leaked, phs) in exp.items():
        r = out[src]
        assert (r.eval_images, r.leaked_images, r.leaked_phashes) == (
            n,
            leaked,
            len(phs),
        ), src
        assert r.leak_rate == math.floor(leaked * 10000 / n) / 10000
    # the 80/20 split actually splits: both sides non-trivial
    total_eval = sum(e[0] for e in exp.values())
    assert 0 < total_eval < len(docs)


# --- phash_bit_balance (third implementation on real data) --------------------


def test_phash_bit_balance_matches_python(spark):
    docs = _read_docs()
    n = len(docs)
    ones = [0] * 63
    for i, _ in docs:
        ph = _phash_py(i)
        for b in range(63):
            ones[b] += (ph >> b) & 1
    out = {r.bit: r for r in sq.phash_bit_balance(spark, SF).collect()}
    assert set(out) == set(range(63))
    for b in range(63):
        r = out[b]
        assert (r.ones, r.n_images) == (ones[b], n), b
        rate = math.floor(ones[b] * 1000000 / n) / 1000000
        assert r.rate == rate
        assert r.degenerate == int(rate < 0.35 or rate > 0.65)
    # packed phash is 63 bits; the audit must cover every one exactly once
    assert len(out) == 63
