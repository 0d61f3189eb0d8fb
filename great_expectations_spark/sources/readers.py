"""Batch sources: path/method reader dispatch + runtime DataFrames.

Mirrors the reference's batch-spec surface
(sparkdf_execution_engine.py:259-436): a batch is either a runtime
in-memory DataFrame, or a path read with a reader method inferred
from the extension (csv / tsv / parquet / json / delta) or given
explicitly, with reader options and an optional schema. String
schemas are rejected exactly like the reference (:304-319) — pass a
StructType or a StructType JSON dict.

Iceberg (the production source in the target architecture) lives in
sources/iceberg.py behind a capability check, since the runtime jars
are not present in every environment.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_EXTENSION_METHODS = {
    ".csv": "csv",
    ".tsv": "tsv",
    ".parquet": "parquet",
    ".pq": "parquet",
    ".json": "json",
    ".jsonl": "json",
    ".delta": "delta",
}


def _normalize_schema(schema: Any) -> Optional[StructType]:
    if schema is None:
        return None
    if isinstance(schema, StructType):
        return schema
    if isinstance(schema, dict):
        return StructType.fromJson(schema)
    # ref rejects string schemas (sparkdf_execution_engine.py:304-319)
    raise ValueError(
        "schema must be a StructType or a StructType JSON dict; "
        "string schemas are not accepted"
    )


def infer_reader_method(path: str) -> str:
    base = path.rstrip("/")
    _, ext = os.path.splitext(base)
    method = _EXTENSION_METHODS.get(ext.lower())
    if method is None:
        # a bare directory defaults to parquet (the common lake layout)
        if ext == "":
            return "parquet"
        raise ValueError(
            f"cannot infer reader method from path {path!r}; "
            f"pass reader_method explicitly "
            f"(one of {sorted(set(_EXTENSION_METHODS.values()))})"
        )
    return method


def read_batch(
    spark: SparkSession,
    path: Optional[str] = None,
    df: Optional[DataFrame] = None,
    reader_method: Optional[str] = None,
    reader_options: Optional[Dict[str, Any]] = None,
    schema: Union[StructType, dict, None] = None,
) -> DataFrame:
    """Obtain a batch DataFrame from a runtime df or a path."""
    if df is not None:
        if path is not None:
            raise ValueError("pass either df or path, not both")
        return df
    if path is None:
        raise ValueError("either df or path is required")

    method = (reader_method or infer_reader_method(path)).lower()
    options = dict(reader_options or {})
    st = _normalize_schema(schema)

    reader = spark.read
    if st is not None:
        reader = reader.schema(st)

    if method == "csv":
        options.setdefault("header", "true")
        if st is None:
            options.setdefault("inferSchema", "true")
        return reader.options(**options).csv(path)
    if method == "tsv":
        options.setdefault("header", "true")
        options.setdefault("sep", "\t")
        if st is None:
            options.setdefault("inferSchema", "true")
        return reader.options(**options).csv(path)
    if method == "parquet":
        return reader.options(**options).parquet(path)
    if method == "json":
        return reader.options(**options).json(path)
    if method == "delta":
        try:
            return reader.options(**options).format("delta").load(path)
        except Exception as exc:  # noqa: BLE001
            raise RuntimeError(
                "delta reader unavailable in this Spark build "
                "(delta-spark jars not on the classpath)"
            ) from exc
    raise ValueError(f"unknown reader method {method!r}")
