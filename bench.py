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
IMG_ROWS = int(os.environ.get("SPARK_GRAFT_IMG_ROWS", "800000"))
IMG_PATH = f"/tmp/ges_bench_images_{IMG_ROWS}"
# N vs 4N parallelism for the scaling-efficiency figure. Both levels
# must be fully backed by physical cores (the box has 32): 4 vs 16
# keeps 4N <= cores with headroom for Python UDF workers, mirroring
# N-executor vs 4N-executor clusters where each executor has real CPUs.
SCALE_LEVELS = tuple(
    int(x)
    for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "4,16").split(",")
)
SCALE_REPEATS = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "3"))

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


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def make_session(cores: int, data_path: str = None) -> SparkSession:
    # Size input splits so a scan plans ~6 tasks per core — the same
    # split-to-executor ratio a 10^12-row table gets from 128 MB
    # splits on a real cluster. A fixed split size either caps
    # parallelism (too big) or drowns the job in task-scheduling
    # overhead (too small) as the table size changes.
    data_path = data_path or IMG_PATH
    size = _dir_bytes(data_path) if os.path.isdir(data_path) else 0
    mpb = min(max(size // (6 * cores), 1 << 20), 128 << 20)
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"ges-bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.files.maxPartitionBytes", str(mpb))
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
    """Validate the materialized image table at a parallelism level.

    Reports the MIN of SCALE_REPEATS timed runs: this sandbox is a
    shared VM with heavy host steal (observed 5x run-to-run swings on
    an idle box), and the minimum is the least-contaminated estimate
    of the engine's actual throughput at that parallelism.
    """
    import great_expectations_spark as ges

    spark = make_session(cores)
    try:
        df = spark.read.parquet(IMG_PATH)
        n = df.count()
        # warm up JIT + Python worker pool so the timed runs measure
        # steady-state throughput, not process spawn
        ges.validate(df.limit(2000), image_suite(), result_format="BASIC")
        times = []
        phases = None
        for _ in range(SCALE_REPEATS):
            t0 = time.time()
            res = ges.validate(df, image_suite(), result_format="SUMMARY")
            dt = time.time() - t0
            if not times or dt < min(times):
                phases = res.meta.get("phase_times")
            times.append(dt)
        dt = min(times)
        ok = res.statistics["evaluated_expectations"]
        return {
            "cores": cores,
            "rows": n,
            "sec": round(dt, 2),
            "all_runs_sec": [round(t, 2) for t in times],
            "rows_per_sec": round(n / dt, 1),
            "expectations": ok,
            "phase_times": phases,
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

    # -- scaling: same suite, same table, N vs 4N threads -------------
    n_lo, n_hi = SCALE_LEVELS
    low = run_suite_at(n_lo)
    high = run_suite_at(n_hi)
    speedup = high["rows_per_sec"] / low["rows_per_sec"]
    efficiency = speedup / (n_hi / n_lo)

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
            f"local{n_lo}": low,
            f"local{n_hi}": high,
            "speedup_%d_to_%d" % (n_lo, n_hi): round(speedup, 3),
            "scaling_efficiency": round(efficiency, 3),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
