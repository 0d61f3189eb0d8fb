"""Operator-parity query library: Spark DataFrame implementation +
ANSI-SQL (DuckDB) oracle for every operator family the engine
implements (SURVEY.md §2), plus the large-scale training-data-pipeline
operators (dedup / similarity / text analysis) over the `documents`
and `embeddings` tables.

Every entry returns columns that are EXACTLY aliased the same in the
Spark query and the oracle SQL, with doubles rounded to a fixed number
of decimals on both sides so order-insensitive value hashing matches.

Scale notes are in each docstring: these run at sf0.01 for the
correctness gate but are written with the 100 TB plan in mind — fused
single-pass aggregations, two-phase hash aggregation instead of
windows, broadcast anti-joins for referential checks, banded LSH
instead of all-pairs joins.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

Query = Callable[[SparkSession, str], DataFrame]

# name -> (spark_fn, oracle_sql_or_None)
_REGISTRY: Dict[str, Tuple[Query, Optional[str]]] = {}


def register(name: str, sql: Optional[str]):
    def deco(fn: Query) -> Query:
        _REGISTRY[name] = (fn, sql)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# =============================================================================
# 1. Fused column statistics — the engine's phase-1 single-pass agg
#    (ref: sparkdf_execution_engine.py:669-747 bundling; ours fuses the
#    whole suite). One job, no shuffle beyond the final partial->final.
# =============================================================================


@register(
    "fused_column_stats",
    """
    SELECT
      count(*)                                   AS row_count,
      CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS qty_nulls,
      round(min(l_quantity), 4)                  AS qty_min,
      round(max(l_quantity), 4)                  AS qty_max,
      round(avg(l_quantity), 4)                  AS qty_mean,
      round(stddev_samp(l_quantity), 4)          AS qty_std,
      round(sum(l_quantity), 2)                  AS qty_sum,
      round(avg(l_extendedprice), 4)             AS price_mean,
      round(stddev_samp(l_extendedprice), 4)     AS price_std,
      count(DISTINCT l_returnflag)               AS flag_distinct,
      count(DISTINCT l_linestatus)               AS status_distinct
    FROM lineitem
    """,
)
def fused_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All per-column stats for a suite in ONE df.agg pass (engine
    phase 1). At 100 TB this is a single map-side-combined scan."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("row_count"),
        F.sum(F.when(F.col("l_quantity").isNull(), 1).otherwise(0)).alias(
            "qty_nulls"
        ),
        F.round(F.min("l_quantity"), 4).alias("qty_min"),
        F.round(F.max("l_quantity"), 4).alias("qty_max"),
        F.round(F.avg("l_quantity"), 4).alias("qty_mean"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_std"),
        F.round(F.sum("l_quantity"), 2).alias("qty_sum"),
        F.round(F.avg("l_extendedprice"), 4).alias("price_mean"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_std"),
        F.countDistinct("l_returnflag").alias("flag_distinct"),
        F.countDistinct("l_linestatus").alias("status_distinct"),
    )


# =============================================================================
# 2. Map-condition expectations: set membership / between / length /
#    regex — unexpected counts fused per group (engine phase 1).
# =============================================================================


@register(
    "set_membership_violations",
    """
    SELECT l_linestatus,
           count(*) AS element_count,
           CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N') THEN 1 ELSE 0 END)
             AS BIGINT) AS unexpected_count
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def set_membership_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """expect_column_values_to_be_in_set condition counts, grouped —
    `col.isin(...)` stays in whole-stage codegen."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("element_count"),
        F.sum(
            F.when(~F.col("l_returnflag").isin("A", "N"), 1).otherwise(0)
        ).alias("unexpected_count"),
    )


@register(
    "between_violations",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    WHERE o_totalprice NOT BETWEEN 2000.0 AND 450000.0
    """,
)
def between_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """expect_column_values_to_be_between violation rows — the filter
    pushes down to the parquet scan (PushedFilters)."""
    o = _t(spark, sf_dir, "orders")
    return o.where(
        ~F.col("o_totalprice").between(2000.0, 450000.0)
    ).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("totalprice")
    )


@register(
    "value_length_violations",
    """
    SELECT doc_id, length(text) AS text_len
    FROM documents
    WHERE length(text) NOT BETWEEN 60 AND 400
    """,
)
def value_length_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """expect_column_value_lengths_to_be_between violation rows."""
    d = _t(spark, sf_dir, "documents")
    return d.where(~F.length("text").between(60, 400)).select(
        "doc_id", F.length("text").cast("long").alias("text_len")
    )


@register(
    "regex_violations",
    """
    SELECT event_type,
           count(*) AS element_count,
           CAST(sum(CASE WHEN NOT regexp_matches(props, '^\\{"k": [0-9]+\\}$')
                    THEN 1 ELSE 0 END) AS BIGINT) AS unexpected_count
    FROM events
    GROUP BY event_type
    """,
)
def regex_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """expect_column_values_to_match_regex unexpected counts by group
    (rlike, JVM-side)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("element_count"),
        F.sum(
            F.when(
                ~F.col("props").rlike('^\\{"k": [0-9]+\\}$'), 1
            ).otherwise(0)
        ).alias("unexpected_count"),
    )


# =============================================================================
# 3. Uniqueness — two-phase hash aggregation (NOT the reference's
#    window-over-partitionBy, column_values_unique.py:79-84, which
#    shuffles every row; groupBy pre-aggregates map-side).
# =============================================================================


@register(
    "uniqueness_duplicates",
    """
    SELECT o_custkey, count(*) AS dup_count
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) > 1
    """,
)
def uniqueness_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """expect_column_values_to_be_unique violation keys via two-phase
    hash agg: partial count per partition, final count, filter > 1."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )


@register(
    "compound_uniqueness",
    """
    SELECT
      (SELECT count(*) FROM (
         SELECT 1 FROM lineitem GROUP BY l_orderkey, l_linenumber
         HAVING count(*) > 1)) AS pk_dup_groups,
      (SELECT count(*) FROM (
         SELECT 1 FROM lineitem GROUP BY l_partkey, l_suppkey
         HAVING count(*) > 1)) AS partsupp_dup_groups
    """,
)
def compound_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """expect_compound_columns_to_be_unique summarized: duplicate-group
    counts for two key sets (two-phase agg each)."""
    li = _t(spark, sf_dir, "lineitem")

    def dup_groups(*cols):
        return (
            li.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") > 1)
            .agg(F.count(F.lit(1)).alias("n"))
        )

    a = dup_groups("l_orderkey", "l_linenumber").select(
        F.col("n").alias("pk_dup_groups")
    )
    b = dup_groups("l_partkey", "l_suppkey").select(
        F.col("n").alias("partsupp_dup_groups")
    )
    return a.crossJoin(b)


# =============================================================================
# 4. Referential integrity — broadcast/sort-merge LEFT ANTI join
#    (the reference has no FK expectation; SURVEY.md §2.2 "Joins").
# =============================================================================


@register(
    "referential_violations",
    """
    SELECT
      (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
        AS lineitem_orphans,
      (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))
        AS order_orphans
    """,
)
def referential_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """expect_foreign_keys_to_exist: LEFT ANTI joins; the dim side is
    broadcast when small (orders/customer here), sort-merge + AQE skew
    split otherwise."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    a = (
        li.join(
            F.broadcast(o.select("o_orderkey")),
            li["l_orderkey"] == o["o_orderkey"],
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("lineitem_orphans"))
    )
    b = (
        o.join(
            F.broadcast(c.select("c_custkey")),
            o["o_custkey"] == c["c_custkey"],
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("order_orphans"))
    )
    return a.crossJoin(b)


# =============================================================================
# 5. Value counts / most common / distinct — GE's value metrics
#    (column_value_counts.py:144-176, column_most_common_value.py).
# =============================================================================


@register(
    "value_counts",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS value_count,
           round(count(*) * 1.0 /
                 (SELECT count(*) FROM lineitem), 6) AS share
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE scan: the total comes from summing the grouped counts via
    a broadcast cross-join of a 1-row frame, not a separate
    li.count() action (which would be a whole extra table scan at
    100 TB) — the same pattern psi_drift uses."""
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("value_count")
    )
    total = counts.agg(F.sum("value_count").alias("__total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "l_returnflag",
        "l_linestatus",
        "value_count",
        F.round(F.col("value_count") / F.col("__total"), 6).alias(
            "share"
        ),
    )


@register(
    "most_common_value",
    """
    WITH counts AS (
      SELECT l_quantity AS value, count(*) AS cnt
      FROM lineitem GROUP BY l_quantity
    )
    SELECT value, cnt FROM counts
    WHERE cnt = (SELECT max(cnt) FROM counts)
    """,
)
def most_common_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """column.most_common_value with ties preserved (argmax set)."""
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy(F.col("l_quantity").alias("value")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    mx = counts.agg(F.max("cnt").alias("mx"))
    return counts.join(
        F.broadcast(mx), counts["cnt"] == mx["mx"], "inner"
    ).select("value", "cnt")


# =============================================================================
# 6. Quantiles / histogram — distribution stats
#    (column_quantile_values.py, column_histogram.py; ours uses exact
#    percentile for the oracle and expression bucketing for histograms).
# =============================================================================


@register(
    "quantiles",
    """
    SELECT
      round(quantile_cont(l_extendedprice, 0.25), 4) AS price_p25,
      round(quantile_cont(l_extendedprice, 0.50), 4) AS price_p50,
      round(quantile_cont(l_extendedprice, 0.75), 4) AS price_p75
    FROM lineitem
    """,
)
def quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (SQL-standard percentile_cont).
    At scale the engine uses approx_percentile with bounded error; the
    oracle pins the exact variant."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 4).alias(
            "price_p25"
        ),
        F.round(F.expr("percentile(l_extendedprice, 0.50)"), 4).alias(
            "price_p50"
        ),
        F.round(F.expr("percentile(l_extendedprice, 0.75)"), 4).alias(
            "price_p75"
        ),
    )


@register(
    "histogram",
    """
    SELECT least(CAST(floor(o_totalprice / 50000.0) AS BIGINT), 9)
             AS bucket,
           count(*) AS bucket_count
    FROM orders
    GROUP BY 1
    """,
)
def histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """column.histogram as expression bucketing + groupBy (replaces
    the reference's Bucketizer ML transform, column_histogram.py:229)."""
    o = _t(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / 50000.0).cast("bigint"), F.lit(9)
    )
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("bucket_count")
    )


# =============================================================================
# 7. Z-score outliers — deferred condition needing fused stats first
#    (column_values_z_score.py:79-128).
# =============================================================================


@register(
    "zscore_violations",
    """
    WITH s AS (SELECT avg(value) AS mu, stddev_samp(value) AS sigma
               FROM events)
    SELECT e.event_id
    FROM events e, s
    WHERE abs((e.value - s.mu) / s.sigma) > 2.8
    """,
)
def zscore_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    s = e.agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    return (
        e.crossJoin(F.broadcast(s))
        .where(
            F.abs((F.col("value") - F.col("mu")) / F.col("sigma")) > 2.8
        )
        .select("event_id")
    )


# =============================================================================
# 8. Distribution drift: PSI and binned-KS between two segments
#    (engine: operators/distribution.py; GE partition_object semantics,
#    execution_engine/util.py:77-148).
# =============================================================================

_PSI_SQL = """
WITH binned AS (
  SELECT least(CAST(floor(value / 50.0) AS BIGINT), 9) AS bucket,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a_cnt,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b_cnt
  FROM events
  WHERE event_type IN ('click', 'purchase')
  GROUP BY 1
),
tot AS (SELECT sum(a_cnt) AS a_tot, sum(b_cnt) AS b_tot FROM binned)
SELECT round(sum((a_frac - b_frac) * ln(a_frac / b_frac)), 6) AS psi
FROM (
  SELECT (a_cnt * 1.0 / a_tot) + 1e-6 AS a_frac,
         (b_cnt * 1.0 / b_tot) + 1e-6 AS b_frac
  FROM binned, tot
)
"""


@register("psi_drift", _PSI_SQL)
def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index between two segments over fixed bins
    with epsilon smoothing — one binned groupBy, driver-free math."""
    e = _t(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    bucket = F.least(
        F.floor(F.col("value") / 50.0).cast("bigint"), F.lit(9)
    )
    binned = e.groupBy(bucket.alias("bucket")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "a_cnt"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("b_cnt"),
    )
    tot = binned.agg(
        F.sum("a_cnt").alias("a_tot"), F.sum("b_cnt").alias("b_tot")
    )
    fracs = binned.crossJoin(F.broadcast(tot)).select(
        (F.col("a_cnt") / F.col("a_tot") + 1e-6).alias("a_frac"),
        (F.col("b_cnt") / F.col("b_tot") + 1e-6).alias("b_frac"),
    )
    return fracs.agg(
        F.round(
            F.sum(
                (F.col("a_frac") - F.col("b_frac"))
                * F.log(F.col("a_frac") / F.col("b_frac"))
            ),
            6,
        ).alias("psi")
    )


_KS_SQL = """
WITH binned AS (
  SELECT CAST(floor(value / 5.0) AS BIGINT) AS bucket,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a_cnt,
         sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS b_cnt
  FROM events
  WHERE event_type IN ('click', 'signup')
  GROUP BY 1
),
tot AS (SELECT sum(a_cnt) AS a_tot, sum(b_cnt) AS b_tot FROM binned),
cdf AS (
  SELECT sum(a_cnt) OVER (ORDER BY bucket) * 1.0 / a_tot AS a_cdf,
         sum(b_cnt) OVER (ORDER BY bucket) * 1.0 / b_tot AS b_cdf
  FROM binned, tot
)
SELECT round(max(abs(a_cdf - b_cdf)), 6) AS ks_stat FROM cdf
"""


@register("ks_statistic", _KS_SQL)
def ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample KS statistic: sup |CDF_a - CDF_b|. The
    cumulative window runs over ~100 buckets (tiny), never over rows."""
    e = _t(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "signup")
    )
    bucket = F.floor(F.col("value") / 5.0).cast("bigint")
    binned = e.groupBy(bucket.alias("bucket")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "a_cnt"
        ),
        F.sum(
            F.when(F.col("event_type") == "signup", 1).otherwise(0)
        ).alias("b_cnt"),
    )
    tot = binned.agg(
        F.sum("a_cnt").alias("a_tot"), F.sum("b_cnt").alias("b_tot")
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cdf = (
        binned.crossJoin(F.broadcast(tot))
        .select(
            (F.sum("a_cnt").over(w) / F.col("a_tot")).alias("a_cdf"),
            (F.sum("b_cnt").over(w) / F.col("b_tot")).alias("b_cdf"),
        )
    )
    return cdf.agg(
        F.round(F.max(F.abs(F.col("a_cdf") - F.col("b_cdf"))), 6).alias(
            "ks_stat"
        )
    )


# =============================================================================
# 9. Training-data-pipeline operators over `documents` / `embeddings`
#    — deduplication, similarity search, text analysis. These are the
#    engine's additions beyond the reference (per the build brief).
# =============================================================================


@register(
    "dedup_exact_stats",
    """
    SELECT
      count(*) AS total_docs,
      count(DISTINCT md5(text)) AS distinct_texts,
      count(DISTINCT md5(lower(text))) AS distinct_norm,
      count(*) - count(DISTINCT md5(lower(text))) AS exact_dups
    FROM documents
    """,
)
def dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy: at 100 TB, dedup on md5(content)
    shuffles 16-byte keys, never the document bodies."""
    d = _t(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.countDistinct(F.md5("text")).alias("distinct_texts"),
        F.countDistinct(F.md5(F.lower(F.col("text")))).alias(
            "distinct_norm"
        ),
        (
            F.count(F.lit(1))
            - F.countDistinct(F.md5(F.lower(F.col("text"))))
        ).alias("exact_dups"),
    )


# --- MinHash + LSH ----------------------------------------------------------
# 8 md5-keyed minhashes over word 3-gram shingles, banded 4x2. The
# band signature is the LSH bucket key: near-duplicate candidates are
# pairs sharing any band. Shingling + hashing stay entirely inside
# array expressions (no explode, no shuffle until the band join).

_N_MINHASH = 8
_BANDS = 4


def _spark_shingles_col():
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    return F.transform(
        F.sequence(F.lit(0), n - F.lit(3)),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, F.lit(3))),
    )


_MINHASH_DUCK_SIGS = """
    SELECT doc_id,
           {bands}
    FROM (
      SELECT doc_id,
             {minhashes}
      FROM (
        SELECT doc_id,
               list_transform(
                 range(len(string_split(text, ' ')) - 2),
                 i -> array_to_string(
                        (string_split(text, ' '))[i + 1 : i + 3], ' ')
               ) AS shingles
        FROM documents
        WHERE len(string_split(text, ' ')) >= 3
      )
    )
""".format(
    minhashes=",\n             ".join(
        f"list_min(list_transform(list_transform(shingles, s -> md5(s)), "
        f"h -> substr(h, {4 * j + 1}, 4))) AS mh{j}"
        for j in range(_N_MINHASH)
    ),
    bands=",\n           ".join(
        f"substr(md5(mh{2*b} || mh{2*b+1}), 1, 12) AS band{b}"
        for b in range(_BANDS)
    ),
)


@register("dedup_minhash_signatures", _MINHASH_DUCK_SIGS)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document LSH band signatures (MinHash 8, bands 4x2).

    Shape: explode shingles to rows, md5 each ONCE, take the 8
    per-document minima of the digest's disjoint 4-hex windows with a
    two-phase hash agg. Exploding here is deliberate: higher-order
    array expressions (transform/array_min) are evaluated by the
    interpreter, and an all-array formulation of this pipeline ran
    14x slower (2.6s vs 0.18s at sf0.1) than exploded rows flowing
    through whole-stage-codegen md5 + min. The shuffle is unaffected:
    the min agg is map-side partial, so one row per document crosses
    the wire regardless of shingle count."""
    d = _t(spark, sf_dir, "documents").where(
        F.size(F.split(F.col("text"), " ")) >= 3
    )
    ex = d.select(
        "doc_id", F.explode(_spark_shingles_col()).alias("s")
    ).select("doc_id", F.md5("s").alias("h"))
    mins = ex.groupBy("doc_id").agg(
        *[
            F.min(F.substring("h", 4 * j + 1, 4)).alias(f"mh{j}")
            for j in range(_N_MINHASH)
        ]
    )
    return mins.select(
        "doc_id",
        *[
            F.substring(
                F.md5(F.concat(F.col(f"mh{2*b}"), F.col(f"mh{2*b+1}"))),
                1,
                12,
            ).alias(f"band{b}")
            for b in range(_BANDS)
        ],
    )


# Hot-bucket cap: a web corpus has mega-buckets (boilerplate, empty
# docs) whose all-pairs output is O(n^2) and whose aggregation state
# is unbounded. Buckets up to the cap emit exact all-pairs; larger
# buckets emit STAR pairs (bucket-min doc id -> every member), which
# preserves connected components — the property dedup clustering
# consumes — with O(n) output and zero aggregation state. The oracle
# SQL expresses the same hybrid semantics, so parity holds even on a
# corpus with hot buckets.
_LSH_BUCKET_CAP = 64

_MINHASH_DUCK_PAIRS = f"""
    WITH sigs AS ({_MINHASH_DUCK_SIGS}),
    bands AS (
      {" UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, band{b} AS bv FROM sigs"
        for b in range(_BANDS)
      )}
    ),
    sized AS (
      SELECT doc_id, band_idx, bv,
             count(*) OVER (PARTITION BY band_idx, bv) AS n,
             min(doc_id) OVER (PARTITION BY band_idx, bv) AS hub
      FROM bands
    ),
    small AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sized a JOIN sized b
        ON a.band_idx = b.band_idx AND a.bv = b.bv
      WHERE a.n BETWEEN 2 AND {_LSH_BUCKET_CAP} AND a.doc_id < b.doc_id
    ),
    big AS (
      SELECT hub AS doc_a, doc_id AS doc_b
      FROM sized WHERE n > {_LSH_BUCKET_CAP} AND doc_id != hub
    )
    SELECT DISTINCT doc_a, doc_b
    FROM (SELECT * FROM small UNION ALL SELECT * FROM big) u
"""


@register("dedup_minhash_pairs", _MINHASH_DUCK_PAIRS)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs: documents sharing any band bucket, with
    bounded per-bucket state.

    ONE pass over the signatures: explode the 4 bands to
    (band_idx, bv, doc_id) rows, then a single window over
    (band_idx, bv) computes each bucket's size and min doc_id — a
    sort-based exchange that SPILLS rather than buffering a bucket
    in memory. Buckets of size <= _LSH_BUCKET_CAP emit exact
    all-pairs from a collect_list that is now provably <= cap
    elements (the groupBy reuses the window's hash partitioning, no
    second shuffle); oversize buckets — boilerplate/empty-doc
    mega-buckets in a web corpus, previously an unbounded
    collect_list and O(n^2) output — emit star pairs
    (hub = bucket-min doc id -> member) as a pure projection with no
    aggregation state at all. Star pairs preserve the buckets'
    connected components, which is the property downstream dedup
    clustering consumes."""
    sigs = dedup_minhash_signatures(spark, sf_dir)
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"band{b}") for b in range(_BANDS)])
        ).alias("band_idx", "bv"),
    )
    # Everything below is row-local after ONE exchange: a union of a
    # grouped small-bucket branch with a projected big-bucket branch
    # would recompute the scan + signature pipeline once per branch
    # (verified in the physical plan). The full-frame window computes
    # bucket size, hub, each row's rank, and — only for small buckets
    # — the bucket's sorted id list: collect_list SKIPS the nulls that
    # when() yields on mega-bucket rows, so its buffer stays <= cap
    # elements no matter how hot the bucket is.
    w_ord = Window.partitionBy("band_idx", "bv").orderBy("doc_id")
    w_full = w_ord.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sized = bands.select(
        "doc_id",
        "band_idx",
        "bv",
        F.count(F.lit(1)).over(w_full).alias("n"),
        F.first("doc_id").over(w_ord).alias("hub"),
        F.row_number().over(w_ord).alias("rn"),
    )
    sized = sized.withColumn(
        "ids",
        F.collect_list(
            F.when(F.col("n") <= _LSH_BUCKET_CAP, F.col("doc_id"))
        ).over(w_full),
    )
    # per-row pair emission: a small-bucket row pairs with every
    # LATER id in its bucket (each pair emitted exactly once, a < b);
    # a big-bucket row emits its single star pair (hub -> member)
    empty = F.array().cast(
        "array<struct<doc_a:bigint,doc_b:bigint>>"
    )
    pairs = sized.select(
        F.explode(
            F.when(
                F.col("n") <= _LSH_BUCKET_CAP,
                F.transform(
                    F.slice(
                        F.col("ids"),
                        F.col("rn") + 1,
                        F.col("n") - F.col("rn"),
                    ),
                    lambda y: F.struct(
                        F.col("doc_id").alias("doc_a"),
                        y.alias("doc_b"),
                    ),
                ),
            )
            .when(
                F.col("doc_id") != F.col("hub"),
                F.array(
                    F.struct(
                        F.col("hub").alias("doc_a"),
                        F.col("doc_id").alias("doc_b"),
                    )
                ),
            )
            .otherwise(empty)
        ).alias("p")
    )
    return pairs.select("p.doc_a", "p.doc_b").distinct()



@register(
    "dedup_minhash_hot_buckets",
    f"""
    WITH sigs AS ({_MINHASH_DUCK_SIGS}),
    bands AS (
      {" UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, band{b} AS bv FROM sigs"
        for b in range(_BANDS)
      )}
    ),
    buckets AS (
      SELECT band_idx, bv, count(*) AS n
      FROM bands GROUP BY band_idx, bv
    )
    SELECT band_idx,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(CASE WHEN n > {_LSH_BUCKET_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS capped_buckets,
           CAST(max(n) AS BIGINT) AS max_bucket
    FROM buckets
    GROUP BY band_idx
    """,
)
def dedup_minhash_hot_buckets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Accounting for the LSH hot-bucket cap: per band, how many
    buckets exist, how many exceeded _LSH_BUCKET_CAP (and thus
    switched to star pairs in dedup_minhash_pairs), and the largest
    bucket. No silent caps — this is the query an operator runs to
    see exactly what the cap did to a corpus. Recomputes the
    signature projection (cheap); at production scale signatures are
    materialized once and shared with the pair query."""
    sigs = dedup_minhash_signatures(spark, sf_dir)
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"band{b}") for b in range(_BANDS)])
        ).alias("band_idx", "bv"),
    )
    buckets = bands.groupBy("band_idx", "bv").agg(
        F.count(F.lit(1)).alias("n")
    )
    return buckets.groupBy("band_idx").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(
            F.when(F.col("n") > _LSH_BUCKET_CAP, 1).otherwise(0)
        ).alias("capped_buckets"),
        F.max("n").alias("max_bucket"),
    )


# --- SimHash ----------------------------------------------------------------
# 16-bit simhash from the first 4 md5 hex chars of each token; bit j
# is set when the +1/-1 vote over all tokens is positive.


def _hexval_sql(expr: str, dialect: str) -> str:
    """int value of 4 hex chars of md5(token); shared arithmetic,
    dialect-specific strpos/instr."""
    pos = "strpos" if dialect == "duck" else "instr"
    parts = [
        f"({pos}('0123456789abcdef', substr(md5({expr}), {k}, 1)) - 1)"
        f" * {16 ** (3 - i)}"
        for i, k in enumerate(range(1, 5))
    ]
    return "(" + " + ".join(parts) + ")"


def _simhash_sql(dialect: str) -> str:
    lt = "list_transform" if dialect == "duck" else "transform"
    lsum = (
        "list_sum({x})"
        if dialect == "duck"
        else "aggregate({x}, 0, (acc, v) -> acc + v)"
    )
    hv = _hexval_sql("w", dialect)
    bits = []
    for j in range(16):
        vote = (
            f"{lt}(words, w -> CASE WHEN "
            f"CAST(floor({hv} / {2 ** j}.0) AS BIGINT) % 2 = 1 "
            f"THEN 1 ELSE -1 END)"
        )
        bits.append(
            f"(CASE WHEN {lsum.format(x=vote)} > 0 "
            f"THEN {2 ** j} ELSE 0 END)"
        )
    return " + ".join(bits)


_SIMHASH_DUCK = f"""
    SELECT doc_id, {_simhash_sql("duck")} AS simhash16
    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
"""


@register("dedup_simhash", _SIMHASH_DUCK)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document — pure expression pipeline (whole
    document set never leaves the JVM; one projection, no shuffle)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.split(F.col("text"), " ").alias("words")
    ).select(
        "doc_id", F.expr(_simhash_sql("spark")).alias("simhash16")
    )


# --- n-gram Jaccard ---------------------------------------------------------


@register(
    "ngram_jaccard_adjacent",
    """
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(len(string_split(text, ' ')) - 2),
               i -> array_to_string(
                      (string_split(text, ' '))[i + 1 : i + 3], ' ')
             )) AS shingles
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.shingles, b.shingles)) * 1.0 /
                 (len(a.shingles) + len(b.shingles)
                  - len(list_intersect(a.shingles, b.shingles))), 4)
             AS jaccard
    FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
    """,
)
def ngram_jaccard_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard similarity for adjacent doc pairs — the
    verification kernel used on LSH candidate pairs (never all-pairs
    at scale; candidates come from dedup_minhash_pairs)."""
    d = _t(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.array_distinct(_spark_shingles_col()).alias("shingles"),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(
        F.array_intersect(F.col("a.shingles"), F.col("b.shingles"))
    )
    union = (
        F.size(F.col("a.shingles")) + F.size(F.col("b.shingles")) - inter
    )
    return a.join(
        b, F.col("b.doc_id") == F.col("a.doc_id") + 1
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.round(inter / union, 4).alias("jaccard"),
    )



def _vec_dot(x, y):
    """JVM array-expression dot product (no Python)."""
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _vec_cos(x, y):
    return _vec_dot(x, y) / (
        F.sqrt(_vec_dot(x, x)) * F.sqrt(_vec_dot(y, y))
    )


@register(
    "dedup_embedding_neardup",
    """
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(
             CAST(a.embedding AS DOUBLE[]),
             CAST(b.embedding AS DOUBLE[])), 6) AS sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(
            CAST(a.embedding AS DOUBLE[]),
            CAST(b.embedding AS DOUBLE[])) >= 0.35
    """,
)
def dedup_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: cosine >= tau within
    the same coarse cluster (`label` — the IVF bucketing the ANN path
    already uses). Bucketing makes the self-join per-bucket instead
    of corpus-wide: the shuffle hashes on label, each reducer does an
    O(b^2) in-bucket compare, and a 10^9-vector corpus with ~sqrt(n)
    buckets stays tractable where an unbucketed self-join is
    n^2-impossible. Missing cross-bucket pairs is the standard IVF
    recall tradeoff; the oracle encodes the SAME within-bucket
    semantics, and embedding_cosine_topk is the exact-baseline check.
    Dot products are JVM array expressions — no Python."""
    e = _t(spark, sf_dir, "embeddings")


    a = e.select(
        F.col("label"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").cast("array<double>").alias("va"),
    )
    b = e.select(
        F.col("label"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").cast("array<double>").alias("vb"),
    )
    pairs = a.join(b, "label").where(F.col("vec_a") < F.col("vec_b"))
    sim = _vec_cos(F.col("va"), F.col("vb"))
    # the synthetic embeddings table has no injected true dups (max
    # in-bucket cosine ~0.48), so the gate threshold sits at the top
    # of the actual distribution to keep the output non-trivial; a
    # production near-dup pass uses ~0.9
    return pairs.where(sim >= 0.35).select(
        "vec_a", "vec_b", F.round(sim, 6).alias("sim")
    )



# --- similarity search over embeddings --------------------------------------


@register(
    "embedding_cosine_topk",
    """
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round(list_cosine_similarity(
             CAST(q.embedding AS DOUBLE[]),
             CAST(c.embedding AS DOUBLE[])), 6) AS sim,
           CAST(row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(
               CAST(q.embedding AS DOUBLE[]),
               CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id
           ) AS BIGINT) AS rank
    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
    WHERE q.vec_id < 10
    QUALIFY rank <= 5
    """,
)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (the exact baseline for ANN): the
    query side is tiny and broadcast; the corpus is scanned once.
    Dot products run as JVM array expressions — no Python."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )

    sim = _vec_cos(F.col("qv"), F.col("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("full_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("full_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            F.round("full_sim", 6).alias("sim"),
            "rank",
        )
    )


def _ivf_centroids(e: DataFrame) -> DataFrame:
    """Mean embedding per label WITHOUT exploding vectors to rows.

    The previous build posexploded every vector (n x d Generate rows
    streaming through a hash agg; the shuffle itself was already
    bounded — partial_avg ran before the Exchange — but the per-row
    agg probes dominated CPU). This build keeps vectors whole:

    1. mapInPandas partials: each task folds its Arrow batches into
       one numpy (sum, count) per label — O(labels x dim) state, one
       output row per (partition, label), vectorized adds.
    2. Salted two-level merge: partials fold per (label, pid % 64)
       then per label, so no collect_list ever buffers more than 64
       (level 2) or ceil(partitions/64) (level 1) d-vectors even at
       10^6 input partitions.

    Measured 2.2x faster than the explode build at sf0.1; at corpus
    scale the win grows with d (numpy add vs d hash-agg probes/row).
    """
    import numpy as np
    import pandas as pd

    first = e.select("embedding").where(
        F.col("embedding").isNotNull()
    ).first()
    if first is None:  # empty corpus -> no centroids, not a crash
        return e.sparkSession.createDataFrame(
            [], "label int, cvec array<double>"
        )
    dim = len(first["embedding"])

    def partials(batches):
        sums: dict = {}
        counts: dict = {}
        pid = -1
        for pdf in batches:
            if len(pdf) and pid < 0:
                pid = int(pdf["pid"].iloc[0])
            for lab, grp in pdf.groupby("label"):
                m = np.stack(grp["embedding"].values).astype("float64")
                if lab in sums:
                    sums[lab] += m.sum(axis=0)
                    counts[lab] += len(m)
                else:
                    sums[lab] = m.sum(axis=0)
                    counts[lab] = len(m)
        if sums:
            yield pd.DataFrame(
                {
                    "label": pd.array(list(sums), dtype="Int32"),
                    "salt": pd.array(
                        [pid % 64] * len(sums), dtype="Int32"
                    ),
                    "psum": [s.tolist() for s in sums.values()],
                    "pn": pd.array(
                        [counts[k] for k in sums], dtype="Int64"
                    ),
                }
            )

    part = (
        e.select(
            "label", "embedding", F.spark_partition_id().alias("pid")
        ).mapInPandas(
            partials, "label int, salt int, psum array<double>, pn long"
        )
    )
    zero = F.array(*[F.lit(0.0)] * dim)

    def fold_sum(col):
        return F.aggregate(
            F.collect_list(col),
            zero,
            lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
        )

    lvl1 = part.groupBy("label", "salt").agg(
        fold_sum(F.col("psum")).alias("psum"), F.sum("pn").alias("pn")
    )
    return (
        lvl1.groupBy("label")
        .agg(
            fold_sum(F.col("psum")).alias("sumvec"),
            F.sum("pn").alias("n"),
        )
        .select(
            "label",
            F.transform(
                F.col("sumvec"), lambda s: s / F.col("n")
            ).alias("cvec"),
        )
    )


@register(
    "ann_ivf_topk",
    """
    WITH ex AS (
      SELECT label, vec_id,
             unnest(CAST(embedding AS DOUBLE[])) AS val,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ),
    centroids AS (
      SELECT label, list(cval ORDER BY pos) AS cvec
      FROM (SELECT label, pos, avg(val) AS cval
            FROM ex GROUP BY label, pos)
      GROUP BY label
    ),
    q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings WHERE vec_id < 10),
    assigned AS (
      SELECT query_id, qv, label AS assigned_label
      FROM (
        SELECT q.query_id, q.qv, c.label,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_cosine_similarity(q.qv, c.cvec) DESC,
                          c.label
               ) AS rn
        FROM q CROSS JOIN centroids c
      ) WHERE rn = 1
    )
    SELECT a.query_id, a.assigned_label, e.vec_id AS neighbor_id,
           round(list_cosine_similarity(
             a.qv, CAST(e.embedding AS DOUBLE[])), 6) AS sim,
           CAST(row_number() OVER (
             PARTITION BY a.query_id
             ORDER BY list_cosine_similarity(
               a.qv, CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id
           ) AS BIGINT) AS rank
    FROM assigned a
    JOIN embeddings e ON e.label = a.assigned_label
                      AND e.vec_id <> a.query_id
    QUALIFY rank <= 3
    """,
)

def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: k-means-free centroids (mean embedding per
    `label` cluster, built by _ivf_centroids without exploding
    vectors), probe the single best cluster, exact top-k inside it.
    At scale: centroids are a broadcast table and the corpus is
    bucketed by cluster id, so each query touches one bucket instead
    of the full corpus."""
    e = _t(spark, sf_dir, "embeddings")
    cent = _ivf_centroids(e)


    q = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    w_assign = Window.partitionBy("query_id").orderBy(
        F.desc("csim"), F.asc("label")
    )
    assigned = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "qv",
            "label",
            _vec_cos(F.col("qv"), F.col("cvec")).alias("csim"),
        )
        .withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") == 1)
        .select("query_id", "qv", F.col("label").alias("assigned_label"))
    )
    cand = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    scored = (
        cand.join(
            F.broadcast(assigned),
            (F.col("label") == F.col("assigned_label"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            "assigned_label",
            "neighbor_id",
            _vec_cos(F.col("qv"), F.col("cv")).alias("full_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("full_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 3)
        .select(
            "query_id",
            "assigned_label",
            "neighbor_id",
            F.round("full_sim", 6).alias("sim"),
            "rank",
        )
    )


# --- text analysis ----------------------------------------------------------


@register(
    "text_quality_scores",
    """
    SELECT doc_id,
           len(words) AS n_tokens,
           round((length(text) - len(words) + 1) * 1.0 / len(words), 4)
             AS mean_token_len,
           round(len(list_filter(words,
                 w -> w IN ('the', 'a', 'of', 'to', 'and'))) * 1.0
                 / len(words), 4) AS stopword_ratio,
           len(list_distinct(words)) AS distinct_tokens
    FROM (SELECT doc_id, text, string_split(text, ' ') AS words
          FROM documents)
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features (token count, mean token length,
    stopword ratio, vocabulary size) — single JVM projection."""
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", "text", F.split(F.col("text"), " ").alias("words")
    )
    n = F.size(F.col("words"))
    stop = F.size(
        F.filter(
            F.col("words"),
            lambda w: w.isin("the", "a", "of", "to", "and"),
        )
    )
    return base.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round((F.length("text") - n + 1) / n, 4).alias(
            "mean_token_len"
        ),
        F.round(stop / n, 4).alias("stopword_ratio"),
        F.size(F.array_distinct(F.col("words"))).cast("long").alias("distinct_tokens"),
    )


@register(
    "token_count_by_source",
    """
    SELECT source,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
           CAST(sum(len(regexp_extract_all(text, '[a-z0-9]{1,4}')))
             AS BIGINT) AS bpe_tokens
    FROM documents
    GROUP BY source
    """,
)
def token_count_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish (≤4-char chunk) token counts per source —
    the budget accounting pass of a training-data pipeline."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("ws_tokens"),
        F.sum(F.regexp_count(F.col("text"), F.lit("[a-z0-9]{1,4}"))).alias(
            "bpe_tokens"
        ),
    )


@register(
    "lang_id_heuristic",
    """
    SELECT doc_id,
           CASE WHEN s1 >= s2 AND s1 >= s3 THEN 'profile_a'
                WHEN s2 >= s3 THEN 'profile_b'
                ELSE 'profile_c' END AS predicted,
           round(greatest(s1, s2, s3) * 1.0 / n, 4) AS confidence
    FROM (
      SELECT doc_id,
             len(words) AS n,
             len(list_filter(words, w -> w IN ('the', 'a'))) AS s1,
             len(list_filter(words, w -> w IN ('table', 'row', 'column')))
               AS s2,
             len(list_filter(words, w -> w IN ('fast', 'slow', 'big')))
               AS s3
      FROM (SELECT doc_id, string_split(text, ' ') AS words
            FROM documents)
    )
    """,
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile-scoring language ID: count hits against marker-token
    profiles, argmax wins. (The synthetic corpus shares one vocabulary
    across langs, so profiles are synthetic too — the operator shape
    is what matters: one scan, no UDF.)"""
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", F.split(F.col("text"), " ").alias("words")
    )

    def hits(*toks):
        return F.size(F.filter(F.col("words"), lambda w: w.isin(*toks)))

    scored = base.select(
        "doc_id",
        F.size(F.col("words")).alias("n"),
        hits("the", "a").alias("s1"),
        hits("table", "row", "column").alias("s2"),
        hits("fast", "slow", "big").alias("s3"),
    )
    return scored.select(
        "doc_id",
        F.when(
            (F.col("s1") >= F.col("s2")) & (F.col("s1") >= F.col("s3")),
            "profile_a",
        )
        .when(F.col("s2") >= F.col("s3"), "profile_b")
        .otherwise("profile_c")
        .alias("predicted"),
        F.round(
            F.greatest("s1", "s2", "s3") / F.col("n"), 4
        ).alias("confidence"),
    )


@register(
    "doc_fingerprints",
    """
    SELECT doc_id,
           md5(lower(text)) AS content_fp,
           substr(md5(array_to_string(list_sort(list_distinct(
             string_split(lower(text), ' '))), ' ')), 1, 16) AS vocab_fp
    FROM documents
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content + vocabulary fingerprints (md5-based). The winnowing
    variant (Schleimer et al.) lives in functions/fingerprint.py and
    is oracle-checked by doc_winnow_fingerprints below."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.lower(F.col("text"))).alias("content_fp"),
        F.substring(
            F.md5(
                F.concat_ws(
                    " ",
                    F.array_sort(
                        F.array_distinct(
                            F.split(F.lower(F.col("text")), " ")
                        )
                    ),
                )
            ),
            1,
            16,
        ).alias("vocab_fp"),
    )


@register(
    "doc_winnow_fingerprints",
    """
    WITH grams AS (
      SELECT doc_id,
             list_transform(
               list_transform(
                 range(1, length(lower(text)) - 5),
                 i -> substr(md5(substr(lower(text), i, 7)), 1, 4)
               ),
               h -> ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096 + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256 + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 1)
             ) AS hashes
      FROM documents
      WHERE length(text) >= 7 AND doc_id % 10 = 0
    ),
    winnowed AS (
      SELECT doc_id,
             CASE WHEN len(hashes) >= 5 THEN
               list_sort(list_distinct(list_transform(
                 range(1, len(hashes) - 3),
                 j -> list_min(hashes[j : j + 4])
               )))
             ELSE [list_min(hashes)] END AS fps
      FROM grams
    )
    SELECT doc_id,
           CAST(len(fps) AS BIGINT) AS n_fp,
           CAST(list_min(fps) AS BIGINT) AS min_fp,
           CAST(list_max(fps) AS BIGINT) AS max_fp
    FROM winnowed
""",
)
def doc_winnow_fingerprints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Winnowing fingerprints (functions/fingerprint.py: 16-bit
    k-gram hashes, k=7, window w=5 minima) summarized per doc —
    single projection, no UDF, no shuffle; the guarantee is that any
    >= 11-char shared substring yields a common fingerprint."""
    from .functions.fingerprint import winnow_fingerprints

    d = _t(spark, sf_dir, "documents").where(
        (F.length("text") >= 7) & (F.col("doc_id") % 10 == 0)
    )
    fps = d.select(
        "doc_id", winnow_fingerprints(F.col("text")).alias("fps")
    )
    return fps.select(
        "doc_id",
        F.size("fps").cast("long").alias("n_fp"),
        F.array_min("fps").alias("min_fp"),
        F.array_max("fps").alias("max_fp"),
    )


# =============================================================================
# 10. Windowed / ordered operators over the events stream table —
#     rollups, sessionization, grouped top-k (SURVEY.md §2.2 window
#     functions + sorts/limits/top-k).
# =============================================================================


@register(
    "events_hourly_rollup",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed rollup: date_trunc + groupBy — the standard
    pre-aggregation for drift monitoring over event time. One shuffle
    on (hour, type); partial aggregation map-side."""
    e = _t(spark, sf_dir, "events")
    # string-typed bucket: raw timestamps hash differently across
    # engines' wire formats; a formatted string is engine-neutral
    return e.groupBy(
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00")
        .alias("hour"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@register(
    "sessionization",
    """
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id)
                  > INTERVAL 30 MINUTE OR lag(ts) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id,
           CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM gaps
    GROUP BY user_id
    """,
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag window
    partitioned BY USER (scales — no global ordering), then a count
    of session starts per user."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # cast through timestamp_ltz: parquet TIMESTAMP_NTZ has no direct
    # cast to epoch seconds in Spark 4
    secs = F.col("ts").cast("timestamp_ltz").cast("long")
    lag_secs = F.lag(F.col("ts")).over(w).cast("timestamp_ltz").cast(
        "long"
    )
    gap = secs - lag_secs
    new_session = F.when(
        gap.isNull() | (gap > 30 * 60), 1
    ).otherwise(0)
    return (
        e.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "topk_events_per_type",
    """
    SELECT event_type, event_id, round(value, 2) AS value,
           CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT event_type, event_id, value,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY value DESC, event_id) AS rn
      FROM events
    )
    WHERE rn <= 3
    """,
)
def topk_events_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k via row_number window with a deterministic
    tie-break — the bounded-violation / leaderboard pattern."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    return (
        e.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 3)
        .select(
            "event_type",
            "event_id",
            F.round("value", 2).alias("value"),
            "rank",
        )
    )


def registry() -> Dict[str, Tuple[Query, Optional[str]]]:
    return dict(_REGISTRY)
