"""Project-level DataContext: named suite/checkpoint stores + config.

The reference organizes everything around a filesystem DataContext
(data_context/data_context.py — ``great_expectations/`` project dir,
``expectations/`` suite store, ``checkpoints/`` YAML configs,
``uncommitted/validations`` result store, ``uncommitted/data_docs``
site) driven by a CLI (``great_expectations checkpoint run <name>``,
cli/checkpoint.py). This module is that layer reduced to what a
Spark pipeline engine needs — named stores and runnable checkpoint
configs, no marshmallow schemas, no usage telemetry:

    project/
      suites/<name>.json          suite store (ExpectationSuite JSON)
      checkpoints/<name>.yaml     checkpoint configs (see below)
      state/<checkpoint>/         resumable CheckpointRunner state
                                  (also the URN validation store)
      validations/<run_id>.json   mirrored suite results
      data_docs/                  static HTML site (render/)

Checkpoint config (YAML or JSON; ref checkpoint/checkpoint.py +
data_context/types/base.py CheckpointConfig, minus batch_request
indirection — the table path is explicit):

    table_path: /data/images
    suite_name: nightly
    group_col: fmt            # optional, group-grained resume
    result_format: SUMMARY    # optional
    actions:                  # optional; defaults to all three
      - type: store_validation_result
      - type: update_data_docs
      - type: failure_summary

Everything here is driver-side file bookkeeping; Spark is only
touched inside ``run_checkpoint``, which delegates to the existing
:class:`CheckpointRunner` (so resume/pinning/lineage semantics are
identical to the flag-based ``python -m
great_expectations_spark.checkpoint`` entrypoint).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

from .checkpoint.actions import (
    CopyResultAction,
    FailureSummaryAction,
    ValidationAction,
)
from .checkpoint.runner import CheckpointRunner
from .core.config import ExpectationSuite
from .render import UpdateDataDocsAction, build_index


def _load_config_text(text: str, path: str) -> Dict[str, Any]:
    """Parse a checkpoint config: YAML when PyYAML is available (the
    reference's format), JSON always (JSON is a YAML subset, so a
    .json file parses either way)."""
    try:
        import yaml

        data = yaml.safe_load(text)
    except ImportError:  # pragma: no cover - yaml is baked in here
        data = json.loads(text)
    if not isinstance(data, dict):
        raise ValueError(f"checkpoint config {path!r} must be a mapping")
    return data


class DataContext:
    """Filesystem-backed project context (ref
    data_context/data_context.py:BaseDataContext, reduced)."""

    SUITES_DIR = "suites"
    CHECKPOINTS_DIR = "checkpoints"
    STATE_DIR = "state"
    VALIDATIONS_DIR = "validations"
    DATA_DOCS_DIR = "data_docs"

    def __init__(self, root_dir: str):
        self.root_dir = os.path.abspath(root_dir)
        if not os.path.isdir(self.root_dir):
            raise FileNotFoundError(
                f"no project at {self.root_dir!r}; run "
                f"DataContext.create({root_dir!r}) first"
            )

    @classmethod
    def create(cls, root_dir: str) -> "DataContext":
        """Scaffold the project layout (ref cli/init's directory
        tree); idempotent on an existing project."""
        for sub in (
            cls.SUITES_DIR,
            cls.CHECKPOINTS_DIR,
            cls.STATE_DIR,
            cls.VALIDATIONS_DIR,
            cls.DATA_DOCS_DIR,
        ):
            os.makedirs(os.path.join(root_dir, sub), exist_ok=True)
        return cls(root_dir)

    # -- suite store ---------------------------------------------------

    def _suite_path(self, name: str) -> str:
        return os.path.join(self.root_dir, self.SUITES_DIR, f"{name}.json")

    def save_suite(self, suite: ExpectationSuite) -> str:
        path = self._suite_path(suite.name)
        suite.save(path)
        return path

    def get_suite(self, name: str) -> ExpectationSuite:
        path = self._suite_path(name)
        if not os.path.isfile(path):
            raise FileNotFoundError(
                f"no suite {name!r} in {self.root_dir}/{self.SUITES_DIR} "
                f"(have: {self.list_suites()})"
            )
        return ExpectationSuite.load(path)

    def list_suites(self) -> List[str]:
        d = os.path.join(self.root_dir, self.SUITES_DIR)
        return sorted(
            f[: -len(".json")] for f in os.listdir(d) if f.endswith(".json")
        )

    # -- checkpoint store ----------------------------------------------

    def _checkpoint_path(self, name: str) -> Optional[str]:
        base = os.path.join(self.root_dir, self.CHECKPOINTS_DIR, name)
        for ext in (".yaml", ".yml", ".json"):
            if os.path.isfile(base + ext):
                return base + ext
        return None

    def add_checkpoint(
        self,
        name: str,
        table_path: str,
        suite_name: str,
        group_col: Optional[str] = None,
        result_format: str = "SUMMARY",
        actions: Optional[List[Dict[str, Any]]] = None,
    ) -> str:
        config: Dict[str, Any] = {
            "table_path": table_path,
            "suite_name": suite_name,
            "result_format": result_format,
        }
        if group_col is not None:
            config["group_col"] = group_col
        if actions is not None:
            config["actions"] = actions
        path = os.path.join(
            self.root_dir, self.CHECKPOINTS_DIR, f"{name}.yaml"
        )
        try:
            import yaml

            text = yaml.safe_dump(config, sort_keys=True)
        except ImportError:  # pragma: no cover
            text = json.dumps(config, indent=2, sort_keys=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)
        return path

    def get_checkpoint(self, name: str) -> Dict[str, Any]:
        path = self._checkpoint_path(name)
        if path is None:
            raise FileNotFoundError(
                f"no checkpoint {name!r} in "
                f"{self.root_dir}/{self.CHECKPOINTS_DIR} "
                f"(have: {self.list_checkpoints()})"
            )
        with open(path) as f:
            return _load_config_text(f.read(), path)

    def list_checkpoints(self) -> List[str]:
        d = os.path.join(self.root_dir, self.CHECKPOINTS_DIR)
        out = []
        for f in os.listdir(d):
            base, ext = os.path.splitext(f)
            if ext in (".yaml", ".yml", ".json"):
                out.append(base)
        return sorted(set(out))

    # -- running -------------------------------------------------------

    def _build_actions(
        self, specs: Optional[List[Dict[str, Any]]], suite_name: str
    ) -> List[ValidationAction]:
        """Config action specs → action objects. Default (no
        ``actions`` key) is the reference's stock checkpoint action
        list (checkpoint/checkpoint.py default_action_list:
        store result + update data docs), plus the failure log."""
        if specs is None:
            specs = [
                {"type": "store_validation_result"},
                {"type": "update_data_docs"},
                {"type": "failure_summary"},
            ]
        built: List[ValidationAction] = []
        for spec in specs:
            kind = spec.get("type")
            if kind == "store_validation_result":
                built.append(
                    CopyResultAction(
                        spec.get("dest_dir")
                        or os.path.join(self.root_dir, self.VALIDATIONS_DIR)
                    )
                )
            elif kind == "update_data_docs":
                built.append(
                    UpdateDataDocsAction(
                        spec.get("site_dir")
                        or os.path.join(self.root_dir, self.DATA_DOCS_DIR),
                        suite_name=suite_name,
                    )
                )
            elif kind == "failure_summary":
                built.append(
                    FailureSummaryAction(
                        spec.get("log_path")
                        or os.path.join(self.root_dir, "failures.log")
                    )
                )
            else:
                raise ValueError(
                    f"unknown checkpoint action type {kind!r} "
                    "(known: store_validation_result, update_data_docs, "
                    "failure_summary)"
                )
        return built

    def checkpoint_state_dir(self, name: str) -> str:
        return os.path.join(self.root_dir, self.STATE_DIR, name)

    def run_checkpoint(
        self,
        name: str,
        run_id: str,
        spark,
        base_run_id: Optional[str] = None,
        evaluation_parameters: Optional[Dict[str, Any]] = None,
    ):
        """The CLI's ``checkpoint run <name>`` body: load the config
        and its named suite from the stores, build the configured
        actions, and hand off to CheckpointRunner (identical
        resume/pinning semantics to the flag-based entrypoint). The
        per-checkpoint state dir doubles as the URN validation store,
        so cross-suite ``urn:great_expectations:validations:`` params
        resolve against this checkpoint's own history."""
        config = self.get_checkpoint(name)
        suite = self.get_suite(config["suite_name"])
        runner = CheckpointRunner(
            spark,
            table_path=config["table_path"],
            suite=suite,
            state_dir=self.checkpoint_state_dir(name),
            run_id=run_id,
            group_col=config.get("group_col"),
            result_format=config.get("result_format", "SUMMARY"),
            actions=self._build_actions(
                config.get("actions"), config["suite_name"]
            ),
            evaluation_parameters=evaluation_parameters,
            base_run_id=base_run_id,
        )
        return runner.run()

    # -- docs ----------------------------------------------------------

    def build_data_docs(self) -> str:
        """Rebuild the site index over already-rendered pages (ref
        data_context.build_data_docs)."""
        return build_index(os.path.join(self.root_dir, self.DATA_DOCS_DIR))
