"""Misra-Gries frequent-items summary (Misra & Gries 1982), shared by
the batch heavy_hitters query (suite_queries.py) and the windowed
streaming monitor (streaming/heavy_hitters_stream.py).

The summary holds at most ``capacity`` counters. Guarantee: any item
with true count > N / capacity over the summarized stream is present,
and each stored count is a lower bound undercounting by at most
N / capacity. When the observed vocabulary never exceeds the
capacity, no decrement ever fires and the counts are exact.
"""

from __future__ import annotations

from typing import Dict, Iterable


def mg_update(
    counters: Dict[str, int], items: Iterable[str], capacity: int
) -> None:
    """Fold ``items`` into the summary in place. Amortized O(1) per
    item: each decrement sweep is paid for by the arrivals that
    filled the summary."""
    for t in items:
        if t in counters:
            counters[t] += 1
        elif len(counters) < capacity:
            counters[t] = 1
        else:
            dead = []
            for k in counters:
                counters[k] -= 1
                if counters[k] == 0:
                    dead.append(k)
            for k in dead:
                del counters[k]
