"""Post-run checkpoint actions — the pluggable hook the reference
runs after each validation (checkpoint/actions.py:762-1170:
StoreValidationResultAction, StoreEvaluationParametersAction,
UpdateDataDocsAction, notification actions).

One interface: an action is anything with
``run(result, runner) -> json-serializable`` (a plain callable works
too). Actions run AFTER the run's own durable outputs (result.json,
lineage/metrics parquet) are committed, in declaration order; each
action's return value — or its error — is recorded under
``result.meta["actions_results"]``. A failing action never aborts the
run or the remaining actions (matching the reference's per-action
isolation).
"""

from __future__ import annotations

import json
import os
import traceback
from typing import Any, Callable, Dict, List, Optional, Union


class ValidationAction:
    """Base class: subclass and override run()."""

    #: name recorded in meta["actions_results"]; defaults to class name
    name: Optional[str] = None

    def run(self, result, runner) -> Any:  # pragma: no cover - interface
        raise NotImplementedError


class CallbackAction(ValidationAction):
    """Wrap a plain callable(result, runner) as an action."""

    def __init__(self, fn: Callable[[Any, Any], Any], name: str = None):
        self.fn = fn
        self.name = name or getattr(fn, "__name__", "callback")

    def run(self, result, runner) -> Any:
        return self.fn(result, runner)


class CopyResultAction(ValidationAction):
    """Write the suite result JSON to an extra destination (the
    store-validation-result shape without a DataContext store)."""

    def __init__(self, dest_dir: str):
        self.dest_dir = dest_dir

    def run(self, result, runner) -> str:
        os.makedirs(self.dest_dir, exist_ok=True)
        path = os.path.join(
            self.dest_dir, f"{runner.run_id}.json"
        )
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(result.to_json_dict(), f, default=str)
        os.replace(tmp, path)
        return path


class FailureSummaryAction(ValidationAction):
    """Notification-hook stand-in: append one line per failed run to
    a log file (swap for a webhook/Slack client at deployment)."""

    def __init__(self, log_path: str):
        self.log_path = log_path

    def run(self, result, runner) -> Dict[str, Any]:
        failed = [
            r.expectation_config.expectation_type
            for r in result.results
            if not r.success
        ]
        if failed:
            with open(self.log_path, "a") as f:
                f.write(
                    json.dumps(
                        {"run_id": runner.run_id, "failed": failed}
                    )
                    + "\n"
                )
        return {"failed_count": len(failed)}


ActionLike = Union[ValidationAction, Callable[[Any, Any], Any]]


def run_actions(
    actions: List[ActionLike], result, runner
) -> List[Dict[str, Any]]:
    """Run actions in order with per-action error isolation; returns
    the list recorded in result.meta["actions_results"]."""
    out: List[Dict[str, Any]] = []
    for a in actions:
        action = a if isinstance(a, ValidationAction) else CallbackAction(a)
        name = action.name or type(action).__name__
        try:
            value = action.run(result, runner)
            out.append({"action": name, "success": True, "result": value})
        except Exception as exc:  # noqa: BLE001 - per-action isolation
            out.append(
                {
                    "action": name,
                    "success": False,
                    "error": str(exc),
                    "traceback": traceback.format_exc(),
                }
            )
    return out
