"""Streaming exact deduplication with watermark-bounded state.

The reference has no streaming support (SURVEY.md §2.2); this is the
streaming face of the batch exact-dedup operator
(suite_queries.dedup_exact_stats): content-hash the document, drop
duplicates within the event-time watermark horizon via Spark's
dropDuplicatesWithinWatermark — state holds one 16-byte key per
distinct document seen inside the horizon and is EVICTED as the
watermark advances, so state size is O(distinct keys per horizon),
not O(stream lifetime). A duplicate arriving after its original has
aged past the horizon passes through — the standard bounded-state
recall tradeoff, the same one the batch LSH cap makes explicit.

Emitted rows keep the input schema (first occurrence wins, in arrival
order within the micro-batch engine's semantics).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEY = "__dedup_key"


def dedup_stream(
    stream: DataFrame,
    content_col: str = "text",
    event_time_col: str = "ts",
    watermark: str = "10 minutes",
    key_cols: Optional[List[str]] = None,
    normalize: bool = True,
) -> DataFrame:
    """Drop exact-duplicate documents from a stream.

    The dedup key is md5(lower(content)) (set ``normalize=False`` for
    byte-exact matching), or the explicit ``key_cols`` when given —
    e.g. ["image_id"] for a payload stream keyed upstream. The state
    store keys on the hash, never the document body, so a 100 TB/day
    stream holds horizon-sized 16-byte keys, not text.
    """
    if key_cols:
        keyed = stream.withColumn(
            _KEY, F.md5(F.concat_ws("\x00", *key_cols))
        )
    else:
        content = F.col(content_col)
        if normalize:
            content = F.lower(content)
        keyed = stream.withColumn(_KEY, F.md5(content))
    return (
        keyed.withWatermark(event_time_col, watermark)
        .dropDuplicatesWithinWatermark([_KEY])
        .drop(_KEY)
    )
