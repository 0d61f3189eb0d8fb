"""Declarative ANN-recall gate: ``expect_ann_recall_to_be_greater_than``.

The ann_recall audit query (suite_queries.py) exposed a real failure
mode — bucketing an ANN probe by a NON-geometric label column gives
recall@3 ≈ 0.17 while learned k-means buckets give ≈ 0.80 — but an
audit query can only be *looked at*. This expectation makes recall a
suite-failable contract: a checkpoint carrying it goes red when an
index/bucketing change quietly destroys retrieval quality.

Semantics: over the validated DataFrame (an embeddings-shaped table),
compute exact brute-force cosine top-k for a small deterministic query
sample, compute the ANN candidate top-k for the configured method, and
require recall@k strictly greater than ``min_recall``.

Methods:
- ``bucket``  — IVF-style probe of ONE existing bucket column: bucket
  centroids are per-bucket mean embeddings, the query probes its
  max-cosine centroid's bucket only. This is the production shape of
  an IVF index whose partitions already exist (and the shape that
  fails when the column is not geometric).
- ``kmeans``  — learn the buckets first: deterministic fixed-iteration
  Lloyd (seed = the K lowest-id vectors), then probe as above.

Scale: the query sample is tiny and broadcast everywhere; the exact
baseline is the only corpus-wide scan (one broadcast-nested-loop pass
— at 10^12 rows you bound it by sampling queries exactly as here, the
denominator is queries × k, never corpus-sized). The ANN side touches
one bucket per query. Centroid means use the no-vector-explosion
mapInPandas machinery shared with the audit queries.

Reference: the reference has no ANN surface (engine-original
expectation); EVR shape follows its aggregate expectations
(expect_column_quantile_values_to_be_between-style observed_value +
details), so render/store actions treat it like any other EVR.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .checks import JobCheck, MetricCache


def _kernels():
    """suite_queries owns the shared vector kernels (_vec_cos,
    _ivf_centroids, _kmeans_assign, _kmeans_update); import lazily so
    operators.registry -> ann_gate import never pays (or cycles on)
    the full query-library import at package-import time."""
    from .. import suite_queries as sq

    return sq


def _exact_topk(
    e: DataFrame, q: DataFrame, k: int
) -> DataFrame:
    """Brute-force cosine top-k: one corpus scan against the broadcast
    query sample. Dead (zero-norm) vectors score NULL via try_divide
    and are dropped before ranking — they never occupy a top-k slot."""
    sq = _kernels()
    scored = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("nid") != F.col("qid"))
        .select(
            "qid",
            "nid",
            sq._vec_cos(F.col("qv"), F.col("v")).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return (
        scored.where(F.col("sim").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "nid")
    )


def _bucket_probe_topk(
    e: DataFrame, q: DataFrame, cent: DataFrame, k: int
) -> DataFrame:
    """IVF probe: assign each query to its max-cosine centroid, then
    exact top-k INSIDE that one bucket. `e` carries (nid, bid, v),
    `cent` (bid, cvec); both query sample and centroids broadcast, so
    the corpus-side join is bucket-pruned and shuffle-free."""
    sq = _kernels()
    w_assign = Window.partitionBy("qid").orderBy(
        F.desc("csim"), F.asc("bid")
    )
    assigned = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "qid",
            "qv",
            "bid",
            sq._vec_cos(F.col("qv"), F.col("cvec")).alias("csim"),
        )
        .withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") == 1)
        .select("qid", "qv", F.col("bid").alias("qbid"))
    )
    scored = (
        e.join(
            F.broadcast(assigned),
            (F.col("bid") == F.col("qbid"))
            & (F.col("nid") != F.col("qid")),
        )
        .select(
            "qid",
            "nid",
            sq._vec_cos(F.col("qv"), F.col("v")).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return (
        scored.where(F.col("sim").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "nid")
    )


def ann_recall_at_k(
    df: DataFrame,
    id_column: str = "vec_id",
    embedding_column: str = "embedding",
    bucket_column: str = "label",
    method: str = "bucket",
    k: int = 3,
    query_ids: Optional[List[Any]] = None,
    n_queries: int = 10,
    kmeans_k: int = 8,
    kmeans_iters: int = 2,
) -> Dict[str, Any]:
    """recall@k of the configured ANN method vs the exact baseline
    over `df`. Returns {recall, hits, exact_neighbors, queries,
    returned, method, k}. recall is None when the query sample has no
    live (non-zero-norm) exact neighbors."""
    sq = _kernels()
    if method not in ("bucket", "kmeans"):
        raise ValueError(f"unknown ANN method {method!r}")
    base = df.select(
        F.col(id_column).alias("nid"),
        F.col(embedding_column).cast("array<double>").alias("v"),
        *([F.col(bucket_column).alias("bid")] if method == "bucket" else []),
    )
    if query_ids is None:
        # deterministic sample: the n smallest ids (one slim sort-
        # limit job over the id column only; at corpus scale pass
        # explicit query_ids instead)
        query_ids = [
            r.nid
            for r in base.select("nid").orderBy("nid").limit(n_queries).collect()
        ]
    q = base.where(F.col("nid").isin(query_ids)).select(
        F.col("nid").alias("qid"), F.col("v").alias("qv")
    )
    # the exact set feeds two branches (hit join + denominator count);
    # localCheckpoint so the brute-force pass executes once. It is
    # queries × k rows — tiny.
    exact = _exact_topk(base.select("nid", "v"), q, k).localCheckpoint()

    if method == "bucket":
        cent = sq._ivf_centroids(
            base.select(
                F.col("bid").alias("label"), F.col("v").alias("embedding")
            )
        ).select(F.col("label").alias("bid"), "cvec")
        ann = _bucket_probe_topk(base, q, cent, k)
    else:  # kmeans: learn geometric buckets, then the same probe
        ev = base.select(F.col("nid").alias("vec_id"), "v")
        w0 = Window.orderBy("vec_id")
        cent = (
            ev.orderBy("vec_id")
            .limit(kmeans_k)
            .select(
                (F.row_number().over(w0) - 1).cast("int").alias("cid"),
                F.col("v").alias("cvec"),
            )
        )
        assigned = None
        for i in range(kmeans_iters):
            assigned = sq._kmeans_assign(ev, cent)
            if i < kmeans_iters - 1:
                cent = sq._kmeans_update(assigned)
        e_assigned = assigned.select(
            F.col("vec_id").alias("nid"),
            F.col("cid").alias("bid"),
            "v",
        )
        cent_k = cent.select(F.col("cid").alias("bid"), "cvec")
        ann = _bucket_probe_topk(e_assigned, q, cent_k, k)

    exact_n = exact.count()
    returned = ann.count()
    hits = ann.join(exact, ["qid", "nid"], "left_semi").count()
    recall = round(hits / exact_n, 4) if exact_n else None
    return {
        "method": method,
        "k": k,
        "queries": len(query_ids),
        "returned": returned,
        "hits": hits,
        "exact_neighbors": exact_n,
        "recall": recall,
    }


def compile_ann_recall_greater_than(index, cfg, schema) -> JobCheck:
    """expect_ann_recall_to_be_greater_than: recall@k of the
    configured ANN probe vs exact brute force must be STRICTLY greater
    than ``min_recall``. kwargs: min_recall (required), method
    ('bucket'|'kmeans'), k, id_column, embedding_column,
    bucket_column, query_ids | n_queries, kmeans_k, kmeans_iters.
    A sample with zero live exact neighbors fails (recall None):
    a gate that cannot measure must not pass."""
    kw = cfg.kwargs
    min_recall = float(kw["min_recall"])

    def run(df: DataFrame, stats: Dict[str, Any], cache: MetricCache):
        out = ann_recall_at_k(
            df,
            id_column=kw.get("id_column", "vec_id"),
            embedding_column=kw.get("embedding_column", "embedding"),
            bucket_column=kw.get("bucket_column", "label"),
            method=kw.get("method", "bucket"),
            k=int(kw.get("k", 3)),
            query_ids=kw.get("query_ids"),
            n_queries=int(kw.get("n_queries", 10)),
            kmeans_k=int(kw.get("kmeans_k", 8)),
            kmeans_iters=int(kw.get("kmeans_iters", 2)),
        )
        recall = out["recall"]
        success = recall is not None and recall > min_recall
        details = dict(out)
        details["min_recall"] = min_recall
        return success, {
            "observed_value": recall,
            "details": details,
        }

    return JobCheck(index=index, config=cfg, run=run)


ANN_COMPILERS = {
    "expect_ann_recall_to_be_greater_than": compile_ann_recall_greater_than,
}
