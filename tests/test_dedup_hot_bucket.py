"""LSH hot-bucket bound: a mega-bucket (here 150 near-identical docs,
cap 64) must produce star pairs — O(n) output, no unbounded
collect_list — while small buckets keep exact all-pairs, and the
DuckDB oracle (which encodes the same hybrid semantics) must agree
exactly at any bucket size."""

import duckdb
import pytest

from great_expectations_spark import suite_queries as sq


@pytest.fixture()
def hot_dir(spark, tmp_path):
    """documents.parquet with one 150-doc identical-text cluster
    (one hot bucket per band) plus distinct small-cluster docs."""
    hot = [
        (i, "the quick brown fox jumps over the lazy dog again", "en", "hot", 49)
        for i in range(150)
    ]
    # three 3-doc exact clusters -> small-bucket all-pairs
    small = [
        (1000 + 10 * c + j, f"cluster {c} text shared by three docs here", "en", "small", 40)
        for c in range(3)
        for j in range(3)
    ]
    # unique docs -> no pairs
    uniq = [
        (2000 + i, f"completely unique document number {i} with words {i*7} {i*13}", "en", "uniq", 60)
        for i in range(20)
    ]
    df = spark.createDataFrame(
        hot + small + uniq,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "sfhot")
    df.repartition(8).write.mode("overwrite").parquet(d + "/documents.parquet")
    return d


def test_hot_bucket_star_pairs_match_oracle(spark, hot_dir):
    sdf = sq.dedup_minhash_pairs(spark, hot_dir)
    got = {(r.doc_a, r.doc_b) for r in sdf.collect()}

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{hot_dir}/documents.parquet/*.parquet'"
    )
    want = {tuple(r) for r in con.sql(sq._MINHASH_DUCK_PAIRS).fetchall()}
    assert got == want

    # the hot cluster contributes star pairs: hub 0 -> members 1..149,
    # NOT the 150*149/2 all-pairs
    hot_pairs = {p for p in got if p[0] < 1000 and p[1] < 1000}
    assert hot_pairs == {(0, i) for i in range(1, 150)}

    # small clusters keep exact all-pairs
    for c in range(3):
        ids = [1000 + 10 * c + j for j in range(3)]
        expect = {
            (a, b) for a in ids for b in ids if a < b
        }
        assert expect <= got

    # connectivity: every hot doc reachable from the hub
    assert len({b for a, b in hot_pairs} | {0}) == 150


@pytest.fixture()
def hot_emb_dir(spark, tmp_path):
    """embeddings.parquet with one 150-vector hot label (near-identical
    vectors, far over the 64 cap) plus two small labels."""
    import math

    def vec(base, jitter):
        # unit-ish vectors; jitter keeps them distinct but cosine~1
        return [1.0 + (jitter * ((d % 7) - 3)) / 1000.0 if d < 8 else 0.01
                for d in range(16)]

    hot = [(i, vec(0, i), 0) for i in range(150)]
    small_a = [(1000 + j, vec(1, j), 1) for j in range(4)]
    # orthogonal-ish label: low cosine, below tau -> no pairs
    small_b = [
        (2000 + j, [0.01] * 8 + [1.0 + j / 100.0 * ((d % 5) - 2) for d in range(8)], 2)
        for j in range(3)
    ]
    df = spark.createDataFrame(
        hot + small_a + small_b,
        "vec_id long, embedding array<double>, label int",
    )
    d = str(tmp_path / "sfemb")
    df.repartition(8).write.mode("overwrite").parquet(
        d + "/embeddings.parquet"
    )
    return d


def test_hot_label_star_pairs_match_oracle(spark, hot_emb_dir):
    sdf = sq.dedup_embedding_neardup(spark, hot_emb_dir)
    rows = sdf.collect()
    got = {(r.vec_a, r.vec_b) for r in rows}

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{hot_emb_dir}/embeddings.parquet/*.parquet'"
    )
    want = {(r[0], r[1]) for r in con.sql(sq._EMB_NEARDUP_DUCK).fetchall()}
    assert got == want

    # hot label: hub-star pairs only (0 -> 1..149), NOT 150*149/2
    hot_pairs = {p for p in got if p[1] < 1000}
    assert hot_pairs == {(0, i) for i in range(1, 150)}

    # small label keeps exact all-pairs (cosine ~1 within label 1)
    ids = [1000 + j for j in range(4)]
    assert {(a, b) for a in ids for b in ids if a < b} <= got

    # accounting query sees exactly one capped bucket
    acct = sq.embedding_bucket_stats(spark, hot_emb_dir).first()
    assert acct.capped_buckets == 1
    assert acct.max_bucket == 150
    assert acct.n_buckets == 3
