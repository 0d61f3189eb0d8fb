"""Fixed-work frequency/contention probe backing BENCH.md's scaling-
level choice (2-vs-8 instead of 4-vs-16).

Measures single-process throughput of a fixed numpy workload (shaped
like the image-decode path: uint8 -> float32, mean-pool, threshold)
while N background burner processes keep other cores busy. On this
host the per-process rate drops measurably once total active cores
approach 32 — an all-core frequency / shared-resource effect that is
invisible to guest frequency counters and NOT attributable to steal
(the burners are our own). A real N-vs-4N-executor comparison runs
both cluster sizes under identical per-node conditions, so a
single-box scaling measurement should likewise keep both levels in
the same frequency regime.

Usage: python tools/freq_probe.py [burner counts, default 0 4 12 28]
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time


def _burner(stop_t: float) -> None:
    x = 1
    while time.time() < stop_t:
        for _ in range(100_000):
            x = (x * 1103515245 + 12345) % 2147483648


def work_rate(dur: float = 4.0) -> float:
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (64, 64), dtype=np.uint8)
    t0 = time.time()
    cnt = 0
    while time.time() - t0 < dur:
        f = a.astype(np.float32)
        g = f.reshape(8, 8, 8, 8).mean(axis=(1, 3))
        _ = (g > g.mean()).sum()
        cnt += 1
    return cnt / dur


def main() -> None:
    counts = [int(x) for x in sys.argv[1:]] or [0, 4, 12, 28]
    # interleave and repeat so host weather hits every level
    results = {c: [] for c in counts}
    for _ in range(3):
        for c in counts:
            stop = time.time() + 6
            procs = [
                mp.Process(target=_burner, args=(stop,)) for _ in range(c)
            ]
            for p in procs:
                p.start()
            time.sleep(0.5)
            results[c].append(work_rate(4.0))
            for p in procs:
                p.join()
    base = max(max(v) for v in results.values())
    for c in counts:
        best = max(results[c])
        print(
            f"burners={c:3d}  best_rate={best:8.0f} ops/s "
            f"({100 * best / base:.0f}% of peak)  "
            f"all={[round(x) for x in results[c]]}"
        )


if __name__ == "__main__":
    main()
