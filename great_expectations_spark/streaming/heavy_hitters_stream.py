"""Windowed heavy-hitter monitor: per-event-time-window top-k tokens
with bounded sketch state (applyInPandasWithState).

The streaming twin of the batch heavy_hitters query
(suite_queries.py): the batch operator sketches per partition and
recounts exactly; a stream has no second pass, so each window's
result IS the Misra-Gries summary — counts are lower bounds that
undercount by at most N_group / capacity, and they are exact whenever
the group's observed vocabulary stays within capacity (no decrement
ever fires). The production read: "which tokens dominated this
10-minute window" for stuck-producer / template-flood / spam-burst
detection, alongside the windowed cardinality (HLL), quantile (KLL),
PSI-drift, and mix monitors.

Scale shape: tokens are exploded and routed by content hash — state
is keyed by (window_start, shard) with shard =
pmod(xxhash64(word), n_shards) — so every occurrence of a token lands
in exactly ONE shard per window: counts never split, the union of
shard summaries has each token at most once, and a hot window spreads
over n_shards parallel sketches instead of funneling through one task
(the shard-or-serialize reasoning of PLANS.md §14). Each shard's
state is O(capacity) regardless of traffic; windows are flushed and
evicted by an event-time timeout when the watermark passes the window
end. The stateful exchange carries token-level rows — that is the
price of a complete per-token count without a second pass; the
per-shard guarantee is: any token with (window, shard) count
> N_shard/capacity is present, with count_lo undercounting by at most
N_shard/capacity. Consumers union the <= n_shards * k rows per window
(tiny) and re-rank by count_lo for a global top-k.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.mg import mg_update
from .lsh_stream import _interval_ms

_OUT_SCHEMA = (
    "window_start timestamp, window_end timestamp, shard int, "
    "word string, count_lo long, rank int"
)
_STATE_SCHEMA = "words array<string>, counts array<long>"


def _make_window_fn(capacity: int, top_k: int, window_ms: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        win_start, shard = key
        if state.hasTimedOut:
            words, counts = state.get
            state.remove()
            top = sorted(
                zip(counts, words), key=lambda cw: (-cw[0], cw[1])
            )[:top_k]
            if top:
                k = len(top)
                yield pd.DataFrame(
                    {
                        "window_start": pd.Series([win_start] * k),
                        "window_end": pd.Series(
                            [win_start + pd.Timedelta(milliseconds=window_ms)]
                            * k
                        ),
                        "shard": pd.Series([shard] * k, dtype="int32"),
                        "word": pd.Series(
                            [w for _, w in top], dtype="object"
                        ),
                        "count_lo": pd.Series(
                            [c for c, _ in top], dtype="int64"
                        ),
                        "rank": pd.Series(
                            range(1, k + 1), dtype="int32"
                        ),
                    }
                )
            return
        if state.exists:
            words, counts = state.get
            counters = dict(zip(words, (int(c) for c in counts)))
        else:
            counters = {}
        for pdf in pdfs:
            mg_update(counters, pdf["word"], capacity)
        state.update((list(counters.keys()), list(counters.values())))
        # flush when the watermark passes the window end; if the
        # watermark is already past (late-but-admitted rows), the
        # timeout must still be strictly in the watermark's future
        win_end_ms = int(win_start.timestamp() * 1000) + window_ms
        state.setTimeoutTimestamp(
            max(win_end_ms, state.getCurrentWatermarkMs() + 1)
        )

    return fn


def windowed_heavy_hitters(
    stream: DataFrame,
    text_col: str = "text",
    event_time_col: str = "ts",
    window_len: str = "10 minutes",
    watermark: str = "5 minutes",
    capacity: int = 256,
    top_k: int = 20,
    n_shards: int = 8,
) -> DataFrame:
    """Per-window top-k tokens from token-sharded Misra-Gries
    sketches.

    Input: streaming DataFrame with (``text_col`` string,
    ``event_time_col`` timestamp). Output (append mode, one batch of
    rows per (window, shard) when the watermark closes the window):
    window_start, window_end, shard, word, count_lo, rank.

    ``count_lo`` is exact when the (window, shard) token vocabulary
    stays within ``capacity``, otherwise a lower bound off by at most
    N_shard/capacity — the heavy region is always present. Each token
    appears in at most one shard per window (content-hashed routing),
    so a consumer's global top-k is a union + re-rank, never a sum.
    """
    window_ms = _interval_ms(window_len)
    keyed = (
        stream.withWatermark(event_time_col, watermark)
        .select(
            F.window(F.col(event_time_col), window_len)
            .start.alias("win_start"),
            F.col(event_time_col).alias("ts"),
            F.explode(F.split(F.col(text_col), " ")).alias("word"),
        )
        .select(
            "win_start",
            "ts",  # keeps the watermark column in the child plan
            "word",
            F.pmod(F.xxhash64(F.col("word")), F.lit(n_shards))
            .cast("int")
            .alias("shard"),
        )
    )
    return keyed.groupBy("win_start", "shard").applyInPandasWithState(
        _make_window_fn(capacity, top_k, window_ms),
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
