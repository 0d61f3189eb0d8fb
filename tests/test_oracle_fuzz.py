"""Differential fuzz gate: seeded random corpora pushed through every
documents-only registered query on BOTH engines — the Spark
implementation from `queries()` and its DuckDB `oracle_sql()` — and
compared with the driver gate's own comparator (tools/check_oracle's
norm_rows + strict dtype check). The fixed testdata corpus can only
exercise the value distributions its generator emits; these corpora
plant the adversarial shapes the audits exist for (exact/near dups,
quote-in-long-doc containment, within-doc repetition, shared 8-token
segments, 1-token docs, consecutive/leading spaces, unicode tokens,
skewed sources) on randomized ids/sources/langs, so any
engine-vs-oracle divergence that depends on data shape — rounding at
ties, empty-group handling, empty-token hashing, absent-source rows —
fails here before the driver gate can meet it.

The query list is derived, not hardcoded: every registered oracle
whose SQL references only the `documents` view joins the gate
automatically when added."""

import math
import os
import random
import re
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from tools.check_oracle import check_types, norm_rows  # noqa: E402

_OTHER_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "embeddings"
).split()


def _documents_only_queries():
    oracles = entry.oracle_sql()
    names = []
    for name, sql in oracles.items():
        if "documents" not in sql:
            continue
        if any(re.search(r"\b" + t + r"\b", sql) for t in _OTHER_TABLES):
            continue
        names.append(name)
    return names


_VOCAB = (
    "the a data spark table row column scan join merge sort hash "
    "filter window batch stream key value query group agg part line "
    "order small big fast slow dup vector customer"
).split()

# tokens that stress hashing/normalization symmetry between engines:
# unicode (multi-byte UTF-8 md5 input), case variants, punctuation
# glued to words, digits, and a long token
_ODD_TOKENS = [
    "naïve",
    "東京",
    "🙂",
    "UPPER",
    "MiXeD",
    "123",
    "comma,token",
    "dot.token",
    "x" * 48,
]

_LANGS = ["en", "es", "zh", "de", "fr"]
_SOURCES = ["src0", "src1", "src2", "src3"]


def _gen_corpus(seed: int):
    """~80 docs: structured plants + random filler, with the
    invariants the real generator keeps (n_chars == len(text),
    non-null text, src\\d+ source names)."""
    rng = random.Random(seed)
    ids = rng.sample(range(0, 5000), 200)
    next_id = iter(ids).__next__

    def rand_words(n):
        ws = []
        for _ in range(n):
            if rng.random() < 0.06:
                ws.append(rng.choice(_ODD_TOKENS))
            else:
                ws.append(rng.choice(_VOCAB))
        return ws

    texts = []

    # exact-duplicate pair and triple (cross-source)
    t_dup = " ".join(rand_words(rng.randint(12, 30)))
    texts += [t_dup, t_dup]
    t_tri = " ".join(rand_words(rng.randint(12, 30)))
    texts += [t_tri, t_tri, t_tri]

    # near-duplicate pair: one token substituted
    base = rand_words(rng.randint(20, 32))
    edited = list(base)
    edited[rng.randrange(len(edited))] = "EDITED"
    texts += [" ".join(base), " ".join(edited)]

    # containment plant: short doc quoted whole inside a long one
    quote = rand_words(9)
    long_doc = rand_words(25) + quote + rand_words(25)
    texts += [" ".join(quote), " ".join(long_doc)]

    # within-doc repetition (one token dominating)
    texts.append(" ".join(["loop"] * rng.randint(25, 45)))

    # shared 8-token segment across two otherwise-different docs
    seg = rand_words(8)
    texts.append(" ".join(seg + rand_words(10)))
    texts.append(" ".join(rand_words(7) + seg))

    # degenerate lengths and whitespace shapes: 1-token, 2-token,
    # consecutive spaces (empty token mid-split), leading space
    texts += ["solo", "two tokens", "a  b c", " lead token"]

    # unicode-heavy doc
    texts.append(" ".join(rng.choices(_ODD_TOKENS, k=12)))

    # random filler
    for _ in range(60):
        texts.append(" ".join(rand_words(rng.randint(3, 70))))

    rows = []
    for text in texts:
        rows.append(
            (
                next_id(),
                text,
                rng.choice(_LANGS),
                # skewed: src0 hot
                rng.choices(_SOURCES, weights=[5, 2, 2, 1])[0],
                len(text),
            )
        )
    rng.shuffle(rows)
    return rows


def _compare(name, sdf, con, oracle_sql):
    """One query, both engines, driver-gate comparison. Returns None
    on match, else a short failure description."""
    try:
        scols = sdf.columns
        sdtypes = sdf.dtypes
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as exc:  # noqa: BLE001
        return f"{name}: spark error: {exc}"
    try:
        res = con.sql(oracle_sql)
        dcols = res.columns
        dtypes_ = res.types
        drows = [tuple(r) for r in res.fetchall()]
    except Exception as exc:  # noqa: BLE001
        return f"{name}: duckdb error: {exc}"
    sc, sr = norm_rows(scols, srows)
    dc, dr = norm_rows(dcols, drows)
    if sc != dc:
        return f"{name}: columns {sc} vs {dc}"
    bad_types = check_types(name, scols, sdtypes, dcols, dtypes_)
    if bad_types:
        return f"{name}: dtypes {'; '.join(bad_types)}"
    if len(sr) != len(dr):
        return f"{name}: rows {len(sr)} vs {len(dr)}"
    mism = [(a, b) for a, b in zip(sr, dr) if a != b]
    if mism:
        return (
            f"{name}: {len(mism)}/{len(sr)} value mismatches; first "
            f"spark={mism[0][0]} duck={mism[0][1]}"
        )
    return None


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_fuzz_documents_queries(spark, tmp_path, seed):
    rows = _gen_corpus(seed)
    # sanity: the plants survived generation
    assert len(rows) >= 75
    assert len({r[0] for r in rows}) == len(rows)
    assert all(r[4] == len(r[1]) for r in rows)

    d = str(tmp_path / f"fuzz{seed}")
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    # several files so per-partition paths (minhash partials, segment
    # explodes) actually merge across partitions
    df.coalesce(3).write.mode("overwrite").parquet(
        d + "/documents.parquet"
    )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = _documents_only_queries()
    # the derivation must keep covering the audit families — if this
    # shrinks, the fuzz gate silently lost surface
    assert len(names) >= 35

    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB reads it via glob
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{d}/documents.parquet/*.parquet'"
    )
    failures = []
    for name in names:
        err = _compare(name, qs[name](spark, d), con, oracles[name])
        if err:
            failures.append(err)
    con.close()
    assert not failures, "\n".join(failures)


def _single_table_queries(table: str):
    others = [
        t
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split()
        if t != table
    ]
    out = []
    for name, sql in entry.oracle_sql().items():
        if not re.search(r"\b" + table + r"\b", sql):
            continue
        if any(re.search(r"\b" + t + r"\b", sql) for t in others):
            continue
        out.append(name)
    return out


def _gen_events(seed: int):
    """~350 events / 12 users with the boundary shapes the window
    queries decide on: identical timestamps (event_id tie-break),
    gaps of exactly 1800 s and 1801 s (the strict > 30-min session
    rule), exact hour-boundary timestamps (date_trunc edges), equal
    values within one event_type (top-k tie-break), negative and
    >500 values (bucket floor / cap paths), and malformed props."""
    import datetime as dt

    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    types = ["click", "view", "purchase", "signup", "error"]
    rows = []
    eid = 0

    def emit(ts, user, etype=None, value=None, props=None):
        nonlocal eid
        if etype is None:
            etype = rng.choices(types, weights=[30, 25, 20, 15, 10])[0]
        if value is None:
            r = rng.random()
            if r < 0.05:
                value = rng.uniform(-80, 0)
            elif r < 0.10:
                value = rng.uniform(500, 900)
            else:
                value = rng.uniform(0, 500)
        if props is None:
            r = rng.random()
            if r < 0.85:
                props = '{"k": %d}' % rng.randrange(1000)
            else:
                props = rng.choice(
                    ['oops', '{"k": -3}', '{"j": 5}', '{"k":7}',
                     '{"k": 12 }', '']
                )
        rows.append((eid, ts, user, etype, value, props))
        eid += 1

    # user 1: identical-timestamp pair (window order falls back to
    # event_id) and an exact hour-boundary event
    t = base + dt.timedelta(minutes=7)
    emit(t, 1)
    emit(t, 1)
    emit(dt.datetime(2024, 1, 1, 3, 0, 0), 1)
    # user 2: gap of exactly 1800 s (same session under strict >)
    # then exactly 1801 s (new session)
    t = base + dt.timedelta(hours=1)
    emit(t, 2)
    emit(t + dt.timedelta(seconds=1800), 2)
    emit(t + dt.timedelta(seconds=1800 + 1801), 2)
    # equal values inside one event_type: top-3 must tie-break
    for _ in range(4):
        emit(
            base + dt.timedelta(minutes=rng.randrange(10000)),
            rng.randrange(1, 13),
            etype="click",
            value=777.25,
        )
    # random bulk, per-user increasing timestamps
    for user in range(1, 13):
        t = base + dt.timedelta(minutes=rng.randrange(240))
        for _ in range(rng.randint(18, 32)):
            t = t + dt.timedelta(seconds=rng.randrange(10, 4000))
            emit(t, user)
    rng.shuffle(rows)
    return rows


def _gen_embeddings(seed: int, dim: int = 16):
    """~150 vectors: a hot label holding well over the 64-member
    hub-star cap, an exact-duplicate pair, a near-duplicate pair, a
    tiny-magnitude vector and a huge one. Zero vectors are excluded
    here (cosine against them is undefined; the engines' NULL vs
    -1.0 conventions differ) — test_zero_vector_does_not_crash
    covers that contract Spark-side."""
    import numpy as np

    rng = random.Random(seed)

    def vec(scale=0.15):
        return [
            float(np.float32(rng.gauss(0, scale))) for _ in range(dim)
        ]

    n = 150
    rows = []
    for vid in range(n):
        # label 0 hot: ~55% of rows -> > 64 members, hub-star path
        lab = 0 if rng.random() < 0.55 else rng.randrange(1, 8)
        rows.append((vid, vec(), lab))
    # exact duplicate pair inside the hot label
    rows[3] = (3, rows[77][1], 0)
    rows[77] = (77, rows[77][1], 0)
    # near-duplicate pair (perturb one coordinate by 1e-3)
    v = list(rows[88][1])
    v[0] = float(np.float32(v[0] + 1e-3))
    rows[5] = (5, v, rows[88][2])
    # magnitude extremes
    rows[120] = (120, [float(np.float32(1e-6))] * dim, 2)
    rows[121] = (121, [float(np.float32(50.0))] * dim, 3)
    return rows


def _run_table_fuzz(spark, tmp_path, table, schema, rows, seed):
    d = str(tmp_path / f"fuzz_{table}_{seed}")
    spark.createDataFrame(rows, schema).coalesce(3).write.mode(
        "overwrite"
    ).parquet(f"{d}/{table}.parquet")
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW {table} AS SELECT * FROM "
        f"'{d}/{table}.parquet/*.parquet'"
    )
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = _single_table_queries(table)
    failures = []
    for name in names:
        err = _compare(name, qs[name](spark, d), con, oracles[name])
        if err:
            failures.append(err)
    con.close()
    return names, failures


@pytest.mark.parametrize("seed", [5, 31])
def test_fuzz_events_queries(spark, tmp_path, seed):
    rows = _gen_events(seed)
    names, failures = _run_table_fuzz(
        spark,
        tmp_path,
        "events",
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
        rows,
        seed,
    )
    assert len(names) >= 8
    assert not failures, "\n".join(failures)


def _tpch_only_queries():
    """Queries whose oracle references only customer/orders/lineitem
    (any subset — this is the one fuzz family with a multi-table
    member, referential_violations)."""
    fam = {"customer", "orders", "lineitem"}
    others = [
        t
        for t in (
            "region nation supplier part events documents embeddings"
        ).split()
    ]
    out = []
    for name, sql in entry.oracle_sql().items():
        refs = {t for t in fam if re.search(r"\b" + t + r"\b", sql)}
        if not refs:
            continue
        if any(re.search(r"\b" + t + r"\b", sql) for t in others):
            continue
        out.append(name)
    return out


def _gen_tpch(seed: int):
    """Correlated customer/orders/lineitem corpus with the boundary
    shapes the table-metric queries decide on: o_totalprice exactly AT
    the between bounds (2000.0 / 450000.0 are NOT violations under
    inclusive BETWEEN), negative and zero prices (negative histogram
    buckets), exact 50000-multiples (bucket edges) and >500k (bucket
    cap), guaranteed o_custkey duplicates, planted orphans on BOTH fk
    edges (lineitem->orders, orders->customer), NULL l_quantity and
    NULL l_returnflag rows, duplicate (l_orderkey,l_linenumber) and
    (l_partkey,l_suppkey) groups, and a tie for the most common
    l_quantity."""
    import datetime as dt

    rng = random.Random(seed)
    base = dt.datetime(2023, 6, 1)

    customers = [
        (
            k,
            f"Customer#{k:09d}",
            rng.randrange(25),
            round(rng.uniform(-999.99, 9999.99), 2),
            rng.choice(
                ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD"]
            ),
        )
        for k in range(1, 31)
    ]

    price_plants = [
        2000.0, 450000.0, 1999.99, 450000.01, -5.25, 0.0,
        50000.0, 100000.0, 500001.5, 499999.99,
    ]
    orders = []
    for okey in range(1, 81):
        if okey <= len(price_plants):
            price = price_plants[okey - 1]
        else:
            price = round(rng.uniform(1000.0, 480000.0), 2)
        # custkey 29/30 never drawn -> guaranteed dup mass on 1..28;
        # okey 79/80 get the orphan custkey 999 (not in customer)
        cust = 999 if okey >= 79 else rng.randrange(1, 29)
        orders.append(
            (
                okey,
                cust,
                rng.choice(["O", "F", "P"]),
                price,
                base + dt.timedelta(hours=rng.randrange(2000)),
                rng.choice(["1-URGENT", "3-MEDIUM", "5-LOW"]),
            )
        )

    # tie-prone quantity palette: few distinct levels so the modal
    # value ties and percentile interpolation lands between repeats
    qty_palette = [1.0, 2.0, 5.0, 5.0, 10.0, 17.5, 25.0, 50.0]
    lineitems = []
    for okey in range(1, 81):
        for ln in range(1, rng.randint(2, 5)):
            lineitems.append(
                (
                    okey,
                    rng.randrange(1, 15),  # small key space ->
                    rng.randrange(1, 4),   # (partkey,suppkey) dups
                    ln,
                    rng.choice(qty_palette),
                    round(rng.uniform(900.0, 95000.0), 2),
                    round(rng.choice([0.0, 0.05, 0.1]), 2),
                    round(rng.choice([0.0, 0.04, 0.08]), 2),
                    rng.choices(["A", "N", "R"], weights=[5, 5, 1])[0],
                    rng.choice(["O", "F"]),
                    base + dt.timedelta(hours=rng.randrange(2000)),
                )
            )
    # planted: duplicate (l_orderkey, l_linenumber), orphan order key,
    # NULL quantity, NULL returnflag
    lineitems.append(tuple(lineitems[0]))
    orphan = list(lineitems[1])
    orphan[0] = 9999
    lineitems.append(tuple(orphan))
    nullq = list(lineitems[2])
    nullq[3] = 97
    nullq[4] = None
    lineitems.append(tuple(nullq))
    nullf = list(lineitems[3])
    nullf[3] = 98
    nullf[8] = None
    lineitems.append(tuple(nullf))
    rng.shuffle(orders)
    rng.shuffle(lineitems)
    return customers, orders, lineitems


@pytest.mark.parametrize("seed", [13, 41])
def test_fuzz_tpch_queries(spark, tmp_path, seed):
    """The table-metric + referential family over randomized
    correlated customer/orders/lineitem corpora — the 11 queries the
    single-table fuzz loops cannot reach (r4 verdict item 6)."""
    customers, orders, lineitems = _gen_tpch(seed)
    d = str(tmp_path / f"fuzz_tpch_{seed}")
    specs = {
        "customer": (
            customers,
            "c_custkey long, c_name string, c_nationkey int,"
            " c_acctbal double, c_mktsegment string",
        ),
        "orders": (
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp,"
            " o_orderpriority string",
        ),
        "lineitem": (
            lineitems,
            "l_orderkey long, l_partkey long, l_suppkey long,"
            " l_linenumber int, l_quantity double,"
            " l_extendedprice double, l_discount double, l_tax double,"
            " l_returnflag string, l_linestatus string,"
            " l_shipdate timestamp",
        ),
    }
    con = duckdb.connect()
    for table, (rows, schema) in specs.items():
        spark.createDataFrame(rows, schema).coalesce(3).write.mode(
            "overwrite"
        ).parquet(f"{d}/{table}.parquet")
        con.sql(
            f"CREATE VIEW {table} AS SELECT * FROM "
            f"'{d}/{table}.parquet/*.parquet'"
        )
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = _tpch_only_queries()
    assert len(names) >= 11
    failures = []
    for name in names:
        err = _compare(name, qs[name](spark, d), con, oracles[name])
        if err:
            failures.append(err)
    con.close()
    assert not failures, "\n".join(failures)


# queries intentionally outside the fuzz gate, with reasons; an entry
# here without a reason (or a query missing from every fuzz family AND
# from here) fails test_fuzz_surface_is_complete
_FUZZ_EXCLUSIONS: dict = {}


def test_fuzz_surface_is_complete():
    """Every registered oracle query is reachable by exactly one fuzz
    family (documents / events / embeddings / tpch) or carries a
    documented exclusion — the fuzz list is DERIVED from oracle_sql()
    minus nothing (r4 verdict item 6)."""
    covered = (
        set(_documents_only_queries())
        | set(_single_table_queries("events"))
        | set(_single_table_queries("embeddings"))
        | set(_tpch_only_queries())
    )
    registered = set(entry.oracle_sql())
    missing = registered - covered - set(_FUZZ_EXCLUSIONS)
    assert not missing, (
        f"queries outside every fuzz family with no documented "
        f"exclusion: {sorted(missing)}"
    )
    stale = set(_FUZZ_EXCLUSIONS) - registered
    assert not stale, f"stale fuzz exclusions: {sorted(stale)}"


@pytest.mark.parametrize("seed", [7, 29])
def test_fuzz_embeddings_queries(spark, tmp_path, seed):
    rows = _gen_embeddings(seed)
    names, failures = _run_table_fuzz(
        spark,
        tmp_path,
        "embeddings",
        "vec_id long, embedding array<float>, label int",
        rows,
        seed,
    )
    assert len(names) >= 8
    assert not failures, "\n".join(failures)


def test_zero_vector_does_not_crash(spark, tmp_path):
    """A dead (all-zero) embedding must not abort similarity queries
    under ANSI mode (try_divide -> NULL sim, sorts last in every
    desc top-k), must never rank as a neighbor, and must show up in
    embedding_norm_stats' zero-vector counter."""
    from great_expectations_spark import suite_queries as sq

    rows = _gen_embeddings(99)
    rows[60] = (60, [0.0] * 16, 4)
    d = str(tmp_path / "zerovec")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(2).write.mode("overwrite").parquet(
        d + "/embeddings.parquet"
    )
    topk = sq.embedding_cosine_topk(spark, d).collect()
    assert topk and all(r.neighbor_id != 60 for r in topk)
    assert sq.ann_ivf_topk(spark, d).count() > 0
    assert sq.ann_kmeans_topk(spark, d).count() > 0
    assert sq.dedup_embedding_neardup(spark, d).count() >= 0
    norm = sq.embedding_norm_stats(spark, d).collect()[0]
    assert norm.zero_vectors == 1


def test_zero_side_image_gate_does_not_crash(spark):
    """A corrupt metadata row (w=0) must FAIL the gate, not abort the
    job with an ANSI divide-by-zero in the aspect-ratio rule — both
    in the helper and in the declarative expectation."""
    import great_expectations_spark as ges
    from great_expectations_spark.suite_queries import image_gate_flags

    df = spark.createDataFrame(
        [
            (1, 0, 32, "jpeg", "c" * 200),
            (2, 32, 32, "jpeg", "c" * 200),
        ],
        "image_id long, w int, h int, fmt string, caption string",
    )
    out = {r.image_id: r for r in image_gate_flags(df).collect()}
    assert out[1].keep is False and out[1].f_min_side is True
    assert out[2].keep is True

    suite = ges.suite("gate").expect(
        "expect_image_metadata_to_pass_quality_gate", min_side=16
    )
    res = ges.validate(df, suite)
    evr = res.results[0]
    assert evr.result["unexpected_count"] == 1


def test_empty_cohort_drift_does_not_crash(spark, tmp_path):
    """psi_drift / ks_statistic with one cohort entirely absent must
    return the oracle's NULL metric, not abort; zscore on a constant
    value column must return zero violations."""
    import datetime as dt

    from great_expectations_spark import suite_queries as sq

    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), 1,
         "click", 100.0, '{"k": 1}')
        for i in range(20)
    ]
    d = str(tmp_path / "onecohort")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(d + "/events.parquet")
    psi = sq.psi_drift(spark, d).collect()
    assert len(psi) == 1 and psi[0].psi is None
    ks = sq.ks_statistic(spark, d).collect()
    assert len(ks) == 1 and ks[0].ks_stat is None
    assert sq.zscore_violations(spark, d).count() == 0


def test_fuzz_norm_rows_float_nan():
    """The comparator itself: NaN normalizes to a stable token and
    floats compare at 9 decimals (the driver hashes the same way)."""
    cols, rows = norm_rows(
        ["b", "a"], [(float("nan"), 1), (0.1234567894, 2)]
    )
    assert cols == ["a", "b"]
    assert rows[0] == (1, "NaN")
    assert rows[1][1] == round(0.1234567894, 9)
    assert not math.isnan(rows[1][1])
