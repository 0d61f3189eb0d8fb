"""Perceptual-hash near-dup: banded hamming LSH must match the DuckDB
oracle, bound hot-group output to O(n) star pairs (never all-pairs),
and verify every emitted pair by bit_count(xor) radius. Also unit-tests
the shared _capped_band_pairs helper on hand-built buckets."""

import duckdb
import pytest
from pyspark.sql import functions as F

from great_expectations_spark import suite_queries as sq


def _group(doc_id: int) -> int:
    return -1 if doc_id % 10 < 3 else doc_id % 211


@pytest.fixture()
def phash_dir(spark, tmp_path):
    """documents.parquet whose doc_ids plant one hot phash group
    (30% of 500 docs) and many small groups; text is irrelevant to
    the phash derivation."""
    rows = [(i, f"doc {i}", "en", "s", 5) for i in range(500)]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "sfph")
    df.repartition(8).write.mode("overwrite").parquet(
        d + "/documents.parquet"
    )
    return d


def test_phash_neardup_matches_oracle_and_bounds_hot_group(
    spark, phash_dir
):
    sdf = sq.phash_hamming_neardup(spark, phash_dir)
    rows = sdf.collect()
    got = {(r.doc_a, r.doc_b) for r in rows}

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{phash_dir}/documents.parquet/*.parquet'"
    )
    want = {
        (r[0], r[1]) for r in con.sql(sq._phash_duck_sql()).fetchall()
    }
    assert got == want

    hot = [i for i in range(500) if i % 10 < 3]
    # bands 0-2 are identical across the whole hot group (>cap), so the
    # group degrades to star pairs from its hub — every member reachable
    assert {(hot[0], m) for m in hot[1:]} <= got
    # O(n) bound: star pairs + the small perturbed band-3 buckets,
    # nowhere near the C(150,2)=11175 all-pairs
    hot_pairs = [
        p for p in got if _group(p[0]) == -1 and _group(p[1]) == -1
    ]
    assert len(hot_pairs) < 6 * len(hot)

    # every pair is hamming-verified and intra-group (cross-group
    # band collisions must be killed by the verification)
    for r in rows:
        assert r.hamming <= sq._PHASH_HAMMING_MAX
        assert _group(r.doc_a) == _group(r.doc_b)


def test_phash_band_stats_accounts_for_hot_group(spark, phash_dir):
    """The accounting query must expose the hot group: bands 0-2 each
    contain the 150-doc boilerplate bucket (> cap of 64 -> counted as
    capped), band 3's bit-flip splits it below-or-near the cap; and it
    must match its DuckDB oracle."""
    rows = {
        r.band_idx: r
        for r in sq.phash_band_stats(spark, phash_dir).collect()
    }
    assert set(rows) == {0, 1, 2, 3}
    for b in (0, 1, 2):
        assert rows[b].capped_buckets >= 1
        assert rows[b].max_bucket == 150
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{phash_dir}/documents.parquet/*.parquet'"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(sq._phash_band_stats_duck_sql()).fetchall()
    }
    got = {
        b: (r.n_buckets, r.capped_buckets, r.max_bucket)
        for b, r in rows.items()
    }
    assert got == want


def test_phash_near_duplicate_rate_expectation(spark):
    """Declarative near-dup rate over an int64 phash column: 6 of 10
    rows sit in hamming<=4 pairs (one pair negative-valued, exercising
    the unsigned word split), 4 are far from everything. Rate = 0.6;
    bounds above/below flip success."""
    import great_expectations_spark as ges

    b1 = 0x123456789ABCDEF0
    b2 = 0x0F0E0D0C0B0A0908
    b3 = -0x7FF0123456789ABC  # top bit set
    hashes = [
        b1, b1 ^ 0b11,            # hamming 2
        b2, b2 ^ (1 << 17),       # hamming 1
        b3, b3 ^ 0b1001,          # hamming 2
        # all pairwise hamming > 10 from everything above and each other
        0x72A74DE452E6B438, -0x1AECD8F1D961F2C9,
        -0x73A3802F595C5BB0, 0x523F0824128B2F33,
    ]
    df = spark.createDataFrame([(h,) for h in hashes], "phash long")

    ok = ges.validate(
        df,
        ges.suite("ph").expect(
            "expect_column_phash_near_duplicate_rate_to_be_between",
            column="phash", max_value=0.6, max_hamming=4,
        ),
    ).results[0]
    assert ok.success
    assert abs(ok.result["observed_value"] - 0.6) < 1e-9
    assert ok.result["details"]["near_duplicate_rows"] == 6

    bad = ges.validate(
        df,
        ges.suite("ph").expect(
            "expect_column_phash_near_duplicate_rate_to_be_between",
            column="phash", max_value=0.5, max_hamming=4,
        ),
    ).results[0]
    assert not bad.success


def test_capped_band_pairs_unit(spark):
    """Hand-built buckets: size-3 bucket -> exact all-pairs, size-6
    bucket (cap 4) -> star pairs from the bucket min, singleton -> none;
    a doc id in two buckets dedups."""
    rows = (
        [(i, 0, 10) for i in (3, 1, 2)]  # small bucket, ids 1..3
        + [(i, 0, 20) for i in (5, 9, 6, 8, 7, 4)]  # hot bucket, ids 4..9
        + [(99, 1, 10)]  # singleton (band differs)
        + [(1, 1, 30), (2, 1, 30)]  # repeat pair across another band
    )
    bands = spark.createDataFrame(
        rows, "doc_id long, band_idx int, bv long"
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in sq._capped_band_pairs(bands, cap=4).collect()
    }
    small = {(1, 2), (1, 3), (2, 3)}
    star = {(4, m) for m in (5, 6, 7, 8, 9)}
    assert got == small | star


def test_multiprobe_dominates_single_probe(spark):
    """Probing 2 buckets can only improve each query's top-k: the
    rank-r similarity under multi-probe is >= the single-probe one,
    and every query probes its assigned bucket plus one more."""
    sf = "/root/testdata/sf0.001"
    single = {
        (r.query_id, r.rank): r.sim
        for r in sq.ann_ivf_topk(spark, sf).collect()
    }
    multi_rows = sq.ann_multiprobe_topk(spark, sf).collect()
    multi = {(r.query_id, r.rank): r.sim for r in multi_rows}
    assert single, "single-probe returned nothing"
    for key, sim in single.items():
        assert key in multi
        assert multi[key] >= sim - 1e-9
    probes = (
        sq.ann_multiprobe_topk(spark, sf)
        .groupBy("query_id")
        .agg(F.countDistinct("probe_label").alias("nl"))
        .collect()
    )
    assert all(r.nl <= 2 for r in probes)


def test_ann_recall_accounting(spark):
    """ann_recall is the ANN family's no-silent-caps mirror: one row
    per method with measured recall@3 vs the exact baseline.
    Multi-probe recall must dominate single-probe (it scans a
    superset of buckets), and every recall is a valid proportion
    backed by consistent counts."""
    sf = "/root/testdata/sf0.001"
    rows = {r.method: r for r in sq.ann_recall(spark, sf).collect()}
    assert set(rows) == {"ivf", "multiprobe", "kmeans"}
    for r in rows.values():
        assert 0.0 <= r.recall <= 1.0
        assert r.hits <= r.returned
        assert r.hits <= r.exact_neighbors
        assert r.recall == pytest.approx(
            r.hits / r.exact_neighbors, abs=1e-4
        )
    assert rows["multiprobe"].recall >= rows["ivf"].recall - 1e-9
