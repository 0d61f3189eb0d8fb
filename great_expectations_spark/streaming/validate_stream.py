"""Micro-batch streaming validation via foreachBatch.

The reference has NO streaming support (SURVEY.md §2.2) and the
target architecture is batch-with-resume; this module is the thin
bridge for teams feeding the same suites from a stream: each
micro-batch is validated with the normal engine (single-pass fused
agg per batch) and the per-batch suite results are appended to a
results sink, giving a continuously-updating validation log with
exactly the same EVR schema as batch runs.

No stateful operators are used here — validation is per-micro-batch
by design (a suite over "the stream so far" would require unbounded
state). Event-time windowed drift lives in windowed_drift.py, built
on watermarked windowed aggregation."""

from __future__ import annotations

import json
import time
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame

from ..core.config import ExpectationSuite
from ..plans.planner import compile_suite


def validation_foreach_batch(
    suite: ExpectationSuite,
    result_path: Optional[str] = None,
    result_format: Any = "BASIC",
    on_result: Optional[Callable[[int, Any], None]] = None,
):
    """Build a foreachBatch callback that validates every micro-batch.

    The suite is COMPILED ONCE on the first batch (CompiledSuite) and
    the compiled plan is reused for every subsequent micro-batch —
    expression construction (~0.45 s of driver py4j traffic for a wide
    suite) would otherwise recur per batch, which dominates small
    micro-batches. A schema change mid-stream triggers a recompile.

    Results go to ``result_path`` as appended JSON-line files (one
    line per batch: {batch_id, ts, statistics, results}) and/or to the
    ``on_result(batch_id, suite_result)`` callback.
    """
    # keyed by batch schema so one callback attached to several
    # queries (or a query whose schema evolves) holds one compiled
    # plan per schema instead of thrashing a single slot; bounded
    # FIFO. dict item ops are atomic under the GIL — worst case two
    # query threads compile the same schema once each and one wins.
    compiled_by_schema: dict = {}

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        key = batch_df.schema.json()
        compiled = compiled_by_schema.get(key)
        if compiled is None:
            if len(compiled_by_schema) >= 8:
                compiled_by_schema.pop(next(iter(compiled_by_schema)))
            compiled = compile_suite(
                suite,
                batch_df.schema,
                batch_df.sparkSession,
                result_format=result_format,
            )
            compiled_by_schema[key] = compiled
        result = compiled.validate(batch_df)
        if result_path is not None:
            line = json.dumps(
                {
                    "batch_id": batch_id,
                    "ts": time.time(),
                    "success": result.success,
                    "statistics": result.statistics,
                    "results": [
                        r.to_json_dict() for r in result.results
                    ],
                },
                default=str,
            )
            # one file per batch id — idempotent under micro-batch
            # replay (Spark may re-run a batch after failure; same id
            # overwrites the same file instead of duplicating lines)
            with open(f"{result_path}/batch-{batch_id:012d}.json", "w") as f:
                f.write(line + "\n")
        if on_result is not None:
            on_result(batch_id, result)

    return _process


def validate_stream(
    stream_df: DataFrame,
    suite: ExpectationSuite,
    result_path: str,
    checkpoint_dir: str,
    result_format: Any = "BASIC",
    trigger_available_now: bool = True,
):
    """Attach suite validation to a streaming DataFrame; returns the
    StreamingQuery. With trigger_available_now the query drains the
    currently-available input and stops (backfill / test mode);
    otherwise it runs continuously per micro-batch."""
    import os

    os.makedirs(result_path, exist_ok=True)
    writer = (
        stream_df.writeStream.foreachBatch(
            validation_foreach_batch(
                suite, result_path=result_path, result_format=result_format
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
