"""Iceberg source with snapshot pinning (the production path of the
target architecture: validate a 10^12-row image table AS OF a
snapshot, so a resumed checkpoint run sees the identical batch).

The Iceberg runtime jars are not present in this environment, so
every entry point degrades with a clear capability error rather than
an ImportError at module import. The checkpoint runner uses the
parquet-listing fingerprint (checkpoint/runner.py) when Iceberg
pinning is unavailable — same contract, weaker identity.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath."""
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def _require(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not available: add "
            "org.apache.iceberg:iceberg-spark-runtime to spark.jars."
        )


def read_table(
    spark: SparkSession,
    identifier: str,
    snapshot_id: Optional[int] = None,
    as_of_timestamp_ms: Optional[int] = None,
) -> DataFrame:
    """Read an Iceberg table, optionally pinned to a snapshot.

    ``VERSION AS OF`` semantics: a pinned read is immutable — exactly
    what a resumable validation run needs (the checkpoint stores the
    snapshot id in batch.json and every resumed group reads the same
    data regardless of concurrent commits).
    """
    _require(spark)
    reader = spark.read.format("iceberg")
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", str(snapshot_id))
    elif as_of_timestamp_ms is not None:
        reader = reader.option("as-of-timestamp", str(as_of_timestamp_ms))
    return reader.load(identifier)


def current_snapshot_id(
    spark: SparkSession, identifier: str
) -> Optional[int]:
    """Snapshot id of the table head (None for an empty table)."""
    _require(spark)
    rows = (
        spark.read.format("iceberg")
        .load(f"{identifier}.snapshots")
        .orderBy("committed_at", ascending=False)
        .select("snapshot_id")
        .limit(1)
        .collect()
    )
    return int(rows[0][0]) if rows else None


def pin_batch(spark: SparkSession, identifier: str) -> Dict[str, Any]:
    """Fingerprint dict for checkpoint/batch.json (Iceberg variant of
    checkpoint.runner.fingerprint_parquet_dir)."""
    sid = current_snapshot_id(spark, identifier)
    return {
        "kind": "iceberg_snapshot",
        "table": identifier,
        "snapshot_id": sid,
        "fingerprint": f"iceberg:{identifier}@{sid}",
    }
