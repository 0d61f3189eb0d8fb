"""Connected-component clustering (large-star/small-star
contraction): exactness at the round budget's diameter boundary,
isolated vertices, the O(log n) round bound on a planted path graph,
and the end-to-end keep/drop query against the exact-closure oracle
(the oracle check itself runs in the driver gate; here the
contraction core is exercised on adversarial graph shapes LSH data
won't hit)."""

import duckdb

from great_expectations_spark import suite_queries as sq


def _components(spark, edges, nodes, rounds):
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    nd = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    got = sq.min_label_components(pairs, nd, rounds=rounds).collect()
    return {r.doc_id: r.cluster_id for r in got}


def test_path_graph_at_diameter_boundary(spark):
    # path 0-1-2-...-8: diameter 8 == default round budget -> exact
    edges = [(i, i + 1) for i in range(8)]
    labels = _components(spark, edges, range(9), sq._CC_ROUNDS)
    assert set(labels.values()) == {0}

    # diameter 11 with rounds=11 -> exact; shows rounds tracks
    # diameter, not node count
    edges = [(i, i + 1) for i in range(11)]
    labels = _components(spark, edges, range(12), 11)
    assert set(labels.values()) == {0}


def test_isolated_and_multi_component(spark):
    edges = [(1, 2), (2, 3), (10, 11)]
    labels = _components(spark, edges, [1, 2, 3, 10, 11, 99], 4)
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_dedup_clusters_matches_closure_oracle(spark, tmp_path):
    # identical-text cluster + unique docs through the FULL pipeline
    rows = [
        (i, "the quick brown fox jumps over the lazy dog again",
         "en", "hot", 49)
        for i in range(40)
    ] + [
        (100 + i, f"unique document number {i} with words {i*7} {i*13}",
         "en", "uniq", 60)
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    d = str(tmp_path / "sfcc")
    df.repartition(4).write.mode("overwrite").parquet(
        d + "/documents.parquet"
    )
    got = {
        (r.doc_id, r.cluster_id, r.keep, r.cluster_size)
        for r in sq.dedup_clusters(spark, d).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{d}/documents.parquet/*.parquet'"
    )
    want = {tuple(r) for r in con.sql(sq._CLUSTERS_DUCK).fetchall()}
    assert got == want
    # the hot cluster keeps exactly one canonical doc
    hot = [r for r in got if r[3] == 40]
    assert sum(1 for r in hot if r[2]) == 1
    assert all(r[1] == 0 for r in hot)


def test_path_graph_round_count_is_logarithmic(spark):
    """The 100x-scale property the r4 verdict asked for: a planted
    10k-node PATH graph (the worst case for one-hop propagation —
    diameter 9,999) must converge in <= c*log2(n) contraction rounds,
    not O(diameter). c = 2 leaves slack over the observed count while
    still failing loudly if anyone reverts to one-hop propagation."""
    import math

    from pyspark.sql import functions as F

    n = 10_000
    pairs = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    stats = {}
    labels = sq.min_label_components(
        pairs, nodes, driver_max_edges=None, stats=stats
    )
    assert stats["mode"] == "star_contraction"
    assert stats["rounds"] <= 2 * math.ceil(math.log2(n)), stats
    got = labels.agg(
        F.countDistinct("cluster_id").alias("k"),
        F.min("cluster_id").alias("m"),
    ).collect()[0]
    assert (got.k, got.m) == (1, 0)


def test_random_graphs_match_union_find(spark):
    """Distributed star contraction == driver union-find on seeded
    random graphs (Erdos-Renyi-ish sparse + two planted chains), the
    same exactness property the boundary tests check by hand."""
    import random

    rng = random.Random(7)
    n = 400
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(300)]
    edges += [(i, i + 1) for i in range(50, 90)]  # planted chain
    edges += [(i, i + 1) for i in range(300, 390)]  # longer chain
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    nodes = spark.createDataFrame(
        [(i,) for i in range(n)], "doc_id long"
    )
    dist = {
        (r.doc_id, r.cluster_id)
        for r in sq.min_label_components(
            pairs, nodes, driver_max_edges=None
        ).collect()
    }
    uf = {
        (r.doc_id, r.cluster_id)
        for r in sq.min_label_components(pairs, nodes).collect()
    }
    assert dist == uf


def test_union_find_matches_distributed_propagation(spark):
    """The driver union-find shortcut and the distributed min-label
    loop are the same function: identical (doc_id, cluster_id) output
    on a graph with chains (diameter > 1), a cycle, and isolated
    vertices."""
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10),
             (20, 21)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 12, 20, 21, 99]],
        "doc_id long",
    )
    fast = {
        (r["doc_id"], r["cluster_id"])
        for r in sq.min_label_components(pairs, nodes).collect()
    }
    slow = {
        (r["doc_id"], r["cluster_id"])
        for r in sq.min_label_components(
            pairs, nodes, driver_max_edges=None
        ).collect()
    }
    assert fast == slow
    assert (99, 99) in fast and (4, 1) in fast and (12, 10) in fast

    # cap exceeded -> falls back to the distributed loop (same result)
    capped = {
        (r["doc_id"], r["cluster_id"])
        for r in sq.min_label_components(
            pairs, nodes, driver_max_edges=3
        ).collect()
    }
    assert capped == fast


def test_pairs_subtree_executes_once_over_cap(spark):
    """The over-cap path (driver-shortcut probe overflows) must NOT
    pay the candidate pipeline twice: min_label_components
    materializes `pairs` before the probe and both the probe and the
    distributed edge table read the checkpoint. Counted with an
    accumulator inside the pairs subtree — one execution == one
    increment per pair row."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    acc = spark.sparkContext.accumulator(0)

    @pandas_udf("long")
    def counted(v: pd.Series) -> pd.Series:
        acc.add(len(v))
        return v

    # star graph 0-(i): diameter 2, converges well inside the
    # round budget regardless of n
    n = 40
    base = spark.range(1, n + 1).select(
        (F.col("id") * 0).alias("doc_a"),
        counted(F.col("id")).alias("doc_b"),
    )
    nodes = spark.range(n + 1).select(F.col("id").alias("doc_id"))

    # over-cap: probe collects cap+1, falls back to the loop
    labels = sq.min_label_components(
        base, nodes, driver_max_edges=5
    ).collect()
    assert {r.cluster_id for r in labels} == {0}  # one star component
    assert acc.value == n, "pairs subtree executed more than once"

    # under-cap: one execution there too
    acc2 = spark.sparkContext.accumulator(0)

    @pandas_udf("long")
    def counted2(v: pd.Series) -> pd.Series:
        acc2.add(len(v))
        return v

    base2 = spark.range(1, n + 1).select(
        (F.col("id") * 0).alias("doc_a"),
        counted2(F.col("id")).alias("doc_b"),
    )
    labels = sq.min_label_components(
        base2, nodes, driver_max_edges=10_000
    ).collect()
    assert {r.cluster_id for r in labels} == {0}
    assert acc2.value == n
