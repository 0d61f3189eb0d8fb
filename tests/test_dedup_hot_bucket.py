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
