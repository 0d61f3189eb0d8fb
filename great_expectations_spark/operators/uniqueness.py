"""Two-phase hash-aggregation uniqueness checks.

The reference marks duplicates with a window count over
``Window.partitionBy(col)`` (column_values_unique.py:79-84,
compound_columns_unique.py:149-155) which shuffles every row and skews
on hot keys. We instead aggregate ``groupBy(keys).count()`` (map-side
partial aggregation, AQE-coalesced shuffle), keep only groups with
count > 1, and reconstruct violation values driver-side from
(value, count) pairs — no join-back scan is needed for value lists,
and the shuffle payload is one row per *distinct* key, not per row.
"""

from __future__ import annotations

from typing import Any, Dict, List

from pyspark.sql import functions as F

from ..core.config import parse_result_format, result_format_at_least
from ..core.result import format_map_output, mostly_success
from .checks import JobCheck, MetricCache
from .common import get_mostly, multi_consider


def _dup_groups(df, key_cols: List[str], consider, cap: int):
    """(values..., count) rows for groups with count > 1, plus total
    duplicated-row count — ONE Spark job: groupBy shuffle, then a
    per-shuffle-partition sample (slice(collect_list)) merged with
    the totals in a final tiny agg; the shuffle never re-executes
    (the old two-action form re-ran the groupBy for the sample).
    EMITTED sample is O(cap x shuffle partitions); the in-scan
    collect_list buffer is bounded by the duplicate groups in one
    shuffle partition (not by cap) — acceptable because dup groups
    are a post-aggregation set, already far smaller than the input,
    and shuffle partition sizing keeps each partition's share in
    memory (see single_pass.py module docstring for the general
    caveat)."""
    base = df.where(consider) if consider is not None else df
    grouped = base.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    dups = grouped.where(F.col("__cnt") > 1)
    sample = F.struct(
        *[F.col(c) for c in key_cols], F.col("__cnt")
    )
    partials = dups.groupBy(F.spark_partition_id().alias("__pid")).agg(
        F.sum("__cnt").alias("__s"),
        F.slice(F.collect_list(sample), 1, cap).alias("__v"),
    )
    rows = partials.collect()
    total = sum(r["__s"] or 0 for r in rows)
    pairs: List[Any] = []
    for r in sorted(rows, key=lambda r: r["__pid"]):
        pairs.extend(r["__v"])
        if len(pairs) >= cap:
            break
    return int(total), pairs[:cap]


def _rf_and_cap(cfg, cache: MetricCache):
    rf = parse_result_format(
        cfg.kwargs.get("result_format", cache.result_format)
    )
    cap = (
        cache.complete_cap
        if result_format_at_least(rf, "COMPLETE")
        else rf["partial_unexpected_count"]
    )
    return rf, max(cap, 1)


def compile_values_unique(index, cfg, schema) -> JobCheck:
    """expect_column_values_to_be_unique."""
    column = cfg.kwargs["column"]
    mostly = get_mostly(cfg.kwargs)
    c = F.col(column)

    def spark_work(df, cache: MetricCache):
        _, cap = _rf_and_cap(cfg, cache)
        return cache._get(
            f"dup_groups:{column}:{cap}",
            lambda: _dup_groups(df, [column], c.isNotNull(), cap),
        )

    def run(df, stats: Dict[str, Any], cache: MetricCache):
        rf, cap = _rf_and_cap(cfg, cache)
        element_count = stats["table.row_count"]
        nonnull = stats[f"nonnull:{column}"]
        want_lists = rf["result_format"] != "BOOLEAN_ONLY"
        unexpected_count, pairs = spark_work(df, cache)
        unexpected_list = None
        if want_lists:
            unexpected_list = []
            for row in pairs:
                unexpected_list.extend([row[0]] * row["__cnt"])
                if len(unexpected_list) >= cap:
                    break
            unexpected_list = unexpected_list[:cap]
        success = (
            True
            if element_count == 0 or nonnull == 0
            else mostly_success(nonnull, unexpected_count, mostly)
        )
        out = format_map_output(
            result_format=rf,
            success=success,
            element_count=element_count,
            nonnull_count=nonnull,
            unexpected_count=unexpected_count,
            unexpected_list=unexpected_list,
        )
        return out["success"], out.get("result", {})

    return JobCheck(
        index=index,
        config=cfg,
        needs={
            "table.row_count": F.count(F.lit(1)),
            f"nonnull:{column}": F.sum(F.when(c.isNotNull(), 1).otherwise(0)),
        },
        run=run,
        prefetch=spark_work,
    )


def compile_compound_unique(index, cfg, schema) -> JobCheck:
    """expect_compound_columns_to_be_unique; groupBy over the column
    tuple replaces the reference's struct-window
    (compound_columns_unique.py:149-155)."""
    cols = list(cfg.kwargs["column_list"])
    ignore_row_if = cfg.kwargs.get("ignore_row_if", "all_values_are_missing")
    mostly = get_mostly(cfg.kwargs)
    consider_key = f"multi:{':'.join(cols)}:{ignore_row_if}"

    def spark_work(df, cache: MetricCache):
        _, cap = _rf_and_cap(cfg, cache)
        return cache._get(
            f"dup_groups:{':'.join(cols)}:{ignore_row_if}:{cap}",
            lambda: _dup_groups(
                df, cols, multi_consider(cols, ignore_row_if), cap
            ),
        )

    def run(df, stats: Dict[str, Any], cache: MetricCache):
        rf, cap = _rf_and_cap(cfg, cache)
        element_count = stats["table.row_count"]
        filtered = stats[f"considered:{consider_key}"]
        want_lists = rf["result_format"] != "BOOLEAN_ONLY"
        unexpected_count, rows = spark_work(df, cache)
        unexpected_list = None
        if want_lists:
            unexpected_list = []
            for row in rows:
                rec = {c: row[c] for c in cols}
                unexpected_list.extend([rec] * row["__cnt"])
                if len(unexpected_list) >= cap:
                    break
            unexpected_list = unexpected_list[:cap]
        success = (
            True
            if element_count == 0 or filtered == 0
            else mostly_success(filtered, unexpected_count, mostly)
        )
        out = format_map_output(
            result_format=rf,
            success=success,
            element_count=element_count,
            nonnull_count=filtered,
            unexpected_count=unexpected_count,
            unexpected_list=unexpected_list,
        )
        return out["success"], out.get("result", {})

    consider = multi_consider(cols, ignore_row_if)
    return JobCheck(
        index=index,
        config=cfg,
        needs={
            "table.row_count": F.count(F.lit(1)),
            f"considered:{consider_key}": F.sum(
                F.when(consider, 1).otherwise(0)
            ),
        },
        run=run,
        prefetch=spark_work,
    )


def compile_phash_near_duplicate_rate(index, cfg, schema) -> JobCheck:
    """expect_column_phash_near_duplicate_rate_to_be_between: the
    fraction of rows whose 64-bit perceptual hash lies within
    ``max_hamming`` bits of another row's — near-duplicate images by
    content, not byte equality. No reference counterpart (its Spark
    uniqueness checks are exact-match only, column_values_unique.py);
    this is the declarative face of the phash_hamming_neardup
    pipeline over the north-rule ``phash:int64`` column.

    Plan (scale-safe, never all-pairs): split each hash into its four
    16-bit words (two hashes within hamming<=3 ALWAYS share a word;
    within the default 6, overwhelmingly), band-LSH on the words with
    the capped-bucket hybrid (suite_queries._capped_band_pairs: hot
    boilerplate buckets degrade to O(n) star pairs — in a capped
    bucket membership is decided against the hub only, the documented
    approximation), verify candidates with bit_count(xor), count
    DISTINCT involved rows. kwargs: max_hamming (default 6),
    bucket_cap (default 64), min_value/max_value bounds on the rate.
    """
    from ..core.result import validate_metric_value_between

    column = cfg.kwargs["column"]
    max_hamming = int(cfg.kwargs.get("max_hamming", 6))
    bucket_cap = int(cfg.kwargs.get("bucket_cap", 64))
    kw = {
        "min_value": cfg.kwargs.get("min_value"),
        "max_value": cfg.kwargs.get("max_value"),
        "strict_min": bool(cfg.kwargs.get("strict_min", False)),
        "strict_max": bool(cfg.kwargs.get("strict_max", False)),
    }

    def run(df, stats: Dict[str, Any], cache: MetricCache):
        from ..suite_queries import _capped_band_pairs

        # persist pins the monotonically_increasing_id assignment: the
        # frame is consumed by three subtrees (bands + both verify
        # sides), and without materialization a re-planned recompute
        # could assign different ids per subtree, joining pairs to the
        # wrong hashes. 16 bytes/row, MEMORY_AND_DISK, freed below.
        ids = (
            df.select(F.col(column).cast("long").alias("ph"))
            .where(F.col("ph").isNotNull())
            .withColumn("doc_id", F.monotonically_increasing_id())
            .persist()
        )
        try:
            words = F.array(
                *[
                    F.shiftrightunsigned(
                        F.col("ph"), 48 - 16 * w
                    ).bitwiseAND(F.lit(0xFFFF))
                    for w in range(4)
                ]
            )
            bands = ids.select(
                "doc_id", F.posexplode(words).alias("band_idx", "bv")
            )
            pairs = _capped_band_pairs(bands, cap=bucket_cap)
            a = ids.select(
                F.col("doc_id").alias("doc_a"), F.col("ph").alias("pa")
            )
            b = ids.select(
                F.col("doc_id").alias("doc_b"), F.col("ph").alias("pb")
            )
            verified = (
                pairs.join(a, "doc_a")
                .join(b, "doc_b")
                .where(
                    F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
                    <= max_hamming
                )
            )
            agg = verified.select(
                F.explode(F.array("doc_a", "doc_b")).alias("d")
            ).agg(F.count_distinct("d").alias("involved"))
            involved = agg.first()["involved"]
            element_count = ids.count()
        finally:
            ids.unpersist()
        rate = involved / element_count if element_count else 0.0
        out = validate_metric_value_between(rate, **kw)
        return out["success"], {
            "observed_value": rate,
            "element_count": element_count,
            "details": {
                "near_duplicate_rows": involved,
                "max_hamming": max_hamming,
            },
        }

    return JobCheck(index=index, config=cfg, run=run)


def compile_duplicate_segment_rate(index, cfg, schema) -> JobCheck:
    """expect_column_duplicate_segment_rate_to_be_between: the
    fraction of non-overlapping ``segment_tokens``-token segments of
    a text column that also occur in at least one OTHER row — the
    declarative face of the segment_dedup_stats corpus audit
    (RefinedWeb-style exact-substring duplication pressure).
    Within-row repetition deliberately does not count (a looping doc
    is a repetition problem, not a corpus-dedup one).

    Plan (scale-safe): rows get a monotonic id; segments are built
    with per-row array slices (no shuffle) and md5-hashed AFTER the
    explode (whole-stage codegen); corpus state is two hash aggs on
    16-byte keys and one slim join. The (hash, row) aggregate is
    persisted because it feeds both the rows-per-hash agg and the
    join probe — without materialization the two subtrees would each
    re-run the tokenize/explode/hash scan. The final sums are
    invariant under monotonic-id relabeling (ids are only ever
    grouped on, never compared across recomputations), so the
    persist is a cost choice, not a correctness pin. kwargs: column,
    segment_tokens (default 8), min_value/max_value bounds.
    """
    from ..core.result import validate_metric_value_between

    column = cfg.kwargs["column"]
    seg_len = int(cfg.kwargs.get("segment_tokens", 8))
    if seg_len < 1:
        raise ValueError("segment_tokens must be >= 1")
    kw = {
        "min_value": cfg.kwargs.get("min_value"),
        "max_value": cfg.kwargs.get("max_value"),
        "strict_min": bool(cfg.kwargs.get("strict_min", False)),
        "strict_max": bool(cfg.kwargs.get("strict_max", False)),
    }

    def run(df, stats: Dict[str, Any], cache: MetricCache):
        ids = (
            df.select(F.col(column).cast("string").alias("txt"))
            .where(F.col("txt").isNotNull())
            .withColumn("rid", F.monotonically_increasing_id())
        )
        words = ids.select(
            "rid", F.split(F.col("txt"), " ").alias("w")
        )
        inst = (
            words.where(F.size("w") >= seg_len)
            .select(
                "rid",
                F.explode(
                    F.expr(
                        f"transform(sequence(0, CAST(floor(size(w) "
                        f"/ {seg_len}) AS INT) - 1), "
                        f"i -> concat_ws(' ', slice(w, "
                        f"i * {seg_len} + 1, {seg_len})))"
                    )
                ).alias("s"),
            )
            .select("rid", F.md5("s").alias("h"))
        )
        g1 = inst.groupBy("h", "rid").agg(
            F.count(F.lit(1)).alias("c")
        ).persist()
        try:
            hd = g1.groupBy("h").agg(F.count(F.lit(1)).alias("nrows"))
            agg = (
                g1.join(hd, "h")
                .agg(
                    F.sum("c").alias("total"),
                    F.sum(
                        F.when(
                            F.col("nrows") >= 2, F.col("c")
                        ).otherwise(0)
                    ).alias("dup"),
                )
                .first()
            )
        finally:
            g1.unpersist()
        total = int(agg["total"] or 0)
        dup = int(agg["dup"] or 0)
        rate = dup / total if total else 0.0
        out = validate_metric_value_between(rate, **kw)
        return out["success"], {
            "observed_value": rate,
            "element_count": total,
            "details": {
                "duplicate_segments": dup,
                "segment_tokens": seg_len,
            },
        }

    return JobCheck(index=index, config=cfg, run=run)


UNIQUE_COMPILERS = {
    "expect_column_values_to_be_unique": compile_values_unique,
    "expect_column_phash_near_duplicate_rate_to_be_between": (
        compile_phash_near_duplicate_rate
    ),
    "expect_column_duplicate_segment_rate_to_be_between": (
        compile_duplicate_segment_rate
    ),
    "expect_compound_columns_to_be_unique": compile_compound_unique,
    # "unique together" with all duplicate instances failed — identical
    # evaluation to the compound check
    # (ref expect_multicolumn_values_to_be_unique.py: ColumnMapExpectation
    # over column_list; ours shares the two-phase hash-agg plan)
    "expect_multicolumn_values_to_be_unique": compile_compound_unique,
}
