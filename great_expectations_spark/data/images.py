"""Deterministic synthetic image+caption table generator.

Produces the engine's target input shape (BASELINE.json input_hint):
(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64), partitioned by fmt, with seeded
injected defects for every check family (FIXTURES.md §1):
~0.1% duplicate image_ids, ~0.05% corrupted payloads, ~0.1%
w/h inconsistencies, ~0.1% fmt values outside the set, ~0.5% null
captions, ~0.1% phash mismatches, and a hot-key phash cluster for
skew tests.

No real image codecs exist in this container, so payloads use the
deterministic fake codec in payload/codec.py: a tiny self-describing
header + seeded pixel bytes. The Spark-side plumbing (schema,
partitioning, Arrow UDF batch shapes) is real; only the
encode/decode byte format is synthetic.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..payload.codec import encode_image, phash64

FORMATS = ["jpeg", "png", "webp"]
# heavy jpeg skew to exercise salting (FIXTURES.md: ~90% jpeg)
FORMAT_WEIGHTS = [0.90, 0.07, 0.03]

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)

_WORDS = (
    "cat dog tree sky mountain river city street portrait sunset "
    "macro bird flower ocean forest desert night day snow rain"
).split()


def _make_pdf(start: int, end: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    n = end - start
    ids = np.arange(start, end)

    # base attributes
    fmt_idx = rng.choice(len(FORMATS), size=n, p=FORMAT_WEIGHTS)
    widths = rng.choice([8, 16, 24, 32], size=n)
    heights = rng.choice([8, 16, 24, 32], size=n)

    recs = []
    for k in range(n):
        i = int(ids[k])
        fmt = FORMATS[fmt_idx[k]]
        w, h = int(widths[k]), int(heights[k])
        image_id = f"img_{i:012d}"
        r = rng.random()

        payload = encode_image(seed=i, w=w, h=h, fmt=fmt)
        ph = phash64(payload)
        caption = " ".join(
            _WORDS[int(x)] for x in rng.integers(0, len(_WORDS), 1 + i % 8)
        )

        # injected defects (rates from FIXTURES.md §1)
        if r < 0.001:
            image_id = f"img_{max(0, i - 1):012d}"  # duplicate id
        elif r < 0.0015:
            payload = payload[: max(4, len(payload) // 2)]  # truncated
        elif r < 0.0025:
            w = w + 1  # w/h inconsistent with payload
        elif r < 0.0035:
            fmt = "tiff"  # outside the allowed set
        elif r < 0.0085:
            caption = None
        elif r < 0.0095:
            ph = ph ^ 0xFF  # phash mismatch
        if 0.02 < r < 0.03:
            ph = 0x5A5A5A5A5A5A5A5A  # hot phash key cluster (skew)

        recs.append((image_id, payload, w, h, fmt, caption, ph))

    return pd.DataFrame(
        recs, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    )


def images_df(
    spark: SparkSession,
    n_rows: int = 1000,
    seed: int = 42,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Distributed deterministic generation: the row-id range is
    parallelized and each partition synthesizes its slice inside
    mapInPandas (Arrow-batched) — the generator itself scales to any
    n_rows without driver materialization."""
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 4)
    bounds = spark.range(0, n_rows, 1, num_partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            start, end = int(pdf["id"].min()), int(pdf["id"].max()) + 1
            yield _make_pdf(start, end, seed=seed + start)

    return bounds.mapInPandas(gen, IMAGES_SCHEMA)


def write_images_table(
    spark: SparkSession,
    path: str,
    n_rows: int = 1000,
    seed: int = 42,
) -> None:
    """Write the synthetic table partitioned by fmt (parquet; stands in
    for the Iceberg table at scale — partition pruning and
    per-partition lineage work the same way)."""
    images_df(spark, n_rows=n_rows, seed=seed).write.mode(
        "overwrite"
    ).partitionBy("fmt").parquet(path)
