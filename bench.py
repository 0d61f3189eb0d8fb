"""Benchmark harness: headline operator queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the
flagship image+caption suite validation at TWO parallelism levels
(local[8] vs local[32]) over the same materialized table — the
sandbox stand-in for the north rule's N-vs-4N-executor scaling
criterion (BASELINE.json). Prints ONE JSON line.

Usage: python bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
IMG_ROWS = int(os.environ.get("SPARK_GRAFT_IMG_ROWS", "100000"))
IMG_PATH = "/tmp/ges_bench_images"

HEADLINE = [
    "fused_column_stats",
    "set_membership_violations",
    "uniqueness_duplicates",
    "compound_uniqueness",
    "referential_violations",
    "value_counts",
    "quantiles",
    "histogram",
    "zscore_violations",
    "psi_drift",
    "ks_statistic",
    "dedup_exact_stats",
    "dedup_minhash_pairs",
    "dedup_simhash",
    "ngram_jaccard_adjacent",
    "embedding_cosine_topk",
    "ann_ivf_topk",
    "text_quality_scores",
    "token_count_by_source",
    "doc_fingerprints",
]


def make_session(cores: int) -> SparkSession:
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"ges-bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        # the synthetic payloads are ~0.5 KB, so the whole 100k-row
        # table is ~45 MB; with the production 128 MB split size the
        # scan would plan 1-3 tasks and cap parallelism. 2 MB splits
        # give ~24 tasks — the same files-per-executor ratio a real
        # 10^12-row table gets with 128 MB splits.
        .config("spark.sql.files.maxPartitionBytes", "512k")
        .config("spark.sql.files.openCostInBytes", "64k")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def image_suite():
    import great_expectations_spark as ges

    return (
        ges.suite("images-bench")
        .expect("expect_table_columns_to_match_set",
                column_set=["image_id", "bytes", "w", "h", "fmt",
                            "caption", "phash"])
        .expect("expect_column_values_to_not_be_null", column="caption",
                mostly=0.99)
        .expect("expect_column_values_to_be_in_set", column="fmt",
                value_set=["jpeg", "png", "webp"], mostly=0.99)
        .expect("expect_column_values_to_be_between", column="w",
                min_value=1, max_value=64)
        .expect("expect_column_values_to_be_between", column="h",
                min_value=1, max_value=64)
        .expect("expect_column_value_lengths_to_be_between",
                column="caption", min_value=1, max_value=200, mostly=0.99)
        .expect("expect_column_mean_to_be_between", column="w",
                min_value=8, max_value=40)
        .expect("expect_column_unique_value_count_to_be_between",
                column="fmt", min_value=1, max_value=10)
        .expect("expect_column_values_to_be_unique", column="image_id",
                mostly=0.99)
        .expect("expect_image_bytes_to_be_decodable", column="bytes",
                mostly=0.99)
        .expect("expect_image_dimensions_to_match_metadata", column="bytes",
                mostly=0.99)
        .expect("expect_image_format_to_match_metadata", column="bytes",
                mostly=0.99)
        .expect("expect_image_phash_to_match", column="bytes",
                max_hamming_distance=0, mostly=0.95)
    )


def run_suite_at(cores: int) -> dict:
    """Validate the materialized image table at a parallelism level."""
    import great_expectations_spark as ges

    spark = make_session(cores)
    try:
        df = spark.read.parquet(IMG_PATH)
        n = df.count()
        # warm up JIT + Python worker pool so the timed run measures
        # steady-state throughput, not process spawn
        ges.validate(df.limit(2000), image_suite(), result_format="BASIC")
        t0 = time.time()
        res = ges.validate(df, image_suite(), result_format="SUMMARY")
        dt = time.time() - t0
        ok = res.statistics["evaluated_expectations"]
        return {
            "cores": cores,
            "rows": n,
            "sec": round(dt, 2),
            "rows_per_sec": round(n / dt, 1),
            "expectations": ok,
        }
    finally:
        spark.stop()


def main() -> None:
    import __spark_entry__ as entry
    from great_expectations_spark.data.images import write_images_table

    qs = entry.queries()

    # -- materialize the image table once (deterministic, seed=42) ----
    spark = make_session(CPUS)
    if not os.path.isdir(IMG_PATH):
        write_images_table(spark, IMG_PATH, n_rows=IMG_ROWS, seed=42)

    # -- headline operator queries at full parallelism ----------------
    # each query runs twice: first pass warms codegen/JIT + parquet
    # footer cache, the second (reported) measures steady-state
    per_query = {}
    for name in HEADLINE:
        fn = qs[name]
        fn(spark, SF_DIR).count()
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        per_query[name] = round(time.time() - t0, 3)
    spark.stop()

    # -- scaling: same suite, same table, 8 vs 32 threads -------------
    low = run_suite_at(8)
    high = run_suite_at(CPUS)
    speedup = high["rows_per_sec"] / low["rows_per_sec"]
    efficiency = speedup / (CPUS / 8)

    total = round(sum(per_query.values()) + low["sec"] + high["sec"], 2)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "suite+operator bench total wall time",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "image_suite": {
            "rows": high["rows"],
            "expectations": high["expectations"],
            "local8": low,
            f"local{CPUS}": high,
            "speedup_8_to_%d" % CPUS: round(speedup, 3),
            "scaling_efficiency": round(efficiency, 3),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
