"""Concurrent validation execution.

The reference runs a checkpoint's validations through an
AsyncExecutor thread pool (checkpoint/checkpoint.py:389-401,
core/async_executor.py:63-138) — on its own 100-table benchmark that
was worth ~16x wall time (BASELINE.md). The Spark analogue: one
SparkSession accepts job submissions from many driver threads, and
with ``spark.scheduler.mode=FAIR`` plus per-thread scheduler pools
the cluster time-slices fairly across them. Each validation here is
driver-phase-light (plan compilation, py4j expression construction)
and cluster-phase-heavy (the fused single-pass scan); running
validations strictly sequentially leaves the cluster idle during
every driver-side phase and leaves scheduler slots idle whenever one
validation's final stages taper below total capacity. A bounded
thread pool overlaps them.

PySpark >= 3.2 pins each Python thread to its own JVM thread
(PYSPARK_PIN_THREAD=true is the default), so
``setLocalProperty("spark.scheduler.pool", ...)`` is genuinely
thread-local and one validation's pool assignment can't leak into
another's jobs.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, List, Optional, Sequence

from ..core.result import ExpectationSuiteValidationResult

__all__ = ["run_validations", "FAIR_SCHEDULER_CONFS"]

# Session confs for fair time-slicing across concurrent validations.
# Apply at session build time (scheduler mode is fixed at context
# start): SparkSession.builder.config(k, v) for each.
FAIR_SCHEDULER_CONFS: Dict[str, str] = {
    "spark.scheduler.mode": "FAIR",
}


def run_validations(
    validations: Sequence[Callable[[], ExpectationSuiteValidationResult]],
    max_concurrency: int = 4,
    spark=None,
    pool_prefix: str = "ges-validation",
) -> List[Any]:
    """Run independent validation thunks through a bounded thread
    pool, returning results in input order.

    Each element of ``validations`` is a zero-arg callable producing
    one suite result (e.g. ``lambda: ges.validate(df, suite)`` or
    ``runner.run``) — the same submit-a-closure shape as the
    reference's ``async_executor.submit(validation_operator.run, ...)``
    (checkpoint/checkpoint.py:389-401). Thunks must be independent:
    no shared mutable state beyond the SparkSession, which accepts
    concurrent job submission by design.

    With ``spark`` supplied, each worker thread tags its jobs with a
    scheduler pool (``<pool_prefix>-<i>``) and a job group, so a FAIR
    scheduler time-slices validations instead of head-of-line
    blocking behind the largest one, and the Spark UI attributes
    stages per validation. Under the default FIFO scheduler the jobs
    still interleave (later jobs use slots the earlier ones leave
    idle); FAIR just makes the sharing proportional.

    Exceptions propagate per-slot: a failed validation's slot holds
    the exception object instead of a result, and the other slots
    complete — per-validation isolation, matching the reference's
    per-validation CheckpointError scoping.
    """
    if max_concurrency <= 1 or len(validations) <= 1:
        out: List[Any] = []
        for fn in validations:
            try:
                out.append(fn())
            except Exception as exc:  # noqa: BLE001 - per-slot isolation
                out.append(exc)
        return out

    sc = spark.sparkContext if spark is not None else None

    def _run(i_fn):
        i, fn = i_fn
        if sc is not None:
            sc.setLocalProperty(
                "spark.scheduler.pool", f"{pool_prefix}-{i}"
            )
            sc.setJobGroup(
                f"{pool_prefix}-{i}", f"concurrent validation {i}"
            )
        try:
            return i, fn()
        except Exception as exc:  # noqa: BLE001 - per-slot isolation
            return i, exc
        finally:
            if sc is not None:
                sc.setLocalProperty("spark.scheduler.pool", None)
                # clear the job group too — half-cleaned thread-local
                # state would attribute (and expose to cancelJobGroup)
                # a later thread-reuser's jobs under this slot's id
                sc.setLocalProperty("spark.jobGroup.id", None)
                sc.setLocalProperty("spark.job.description", None)

    results: List[Optional[Any]] = [None] * len(validations)
    with ThreadPoolExecutor(
        max_workers=min(max_concurrency, len(validations)),
        thread_name_prefix=pool_prefix,
    ) as pool:
        for i, res in pool.map(_run, enumerate(validations)):
            results[i] = res
    return results
