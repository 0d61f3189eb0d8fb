"""Suite / expectation configuration model.

Mirrors the declarative surface of the reference
(`great_expectations/core/expectation_configuration.py`,
`great_expectations/core/expectation_suite.py`) without any of its
registry/graph machinery: a suite is a named list of
(expectation_type, kwargs) pairs, serializable to/from JSON.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Optional, Union


# Reference: great_expectations/core/expectation_configuration.py:47-73
def parse_result_format(result_format: Union[str, dict, None]) -> dict:
    """Normalize a result_format into the internal dict form.

    Levels: BOOLEAN_ONLY < BASIC < SUMMARY < COMPLETE.
    """
    if result_format is None:
        result_format = "BASIC"
    if isinstance(result_format, str):
        return {
            "result_format": result_format,
            "partial_unexpected_count": 20,
            "include_unexpected_rows": False,
        }
    rf = dict(result_format)
    rf.setdefault("result_format", "BASIC")
    rf.setdefault("partial_unexpected_count", 20)
    rf.setdefault("include_unexpected_rows", False)
    if rf["include_unexpected_rows"] and rf["result_format"] == "BOOLEAN_ONLY":
        # unexpected rows require at least BASIC detail
        rf["include_unexpected_rows"] = False
    return rf


RESULT_FORMAT_LEVELS = ["BOOLEAN_ONLY", "BASIC", "SUMMARY", "COMPLETE"]


def result_format_at_least(rf: dict, level: str) -> bool:
    return RESULT_FORMAT_LEVELS.index(rf["result_format"]) >= RESULT_FORMAT_LEVELS.index(level)


@dataclass
class ExpectationConfiguration:
    """One declarative constraint: (expectation_type, kwargs, meta).

    Reference: great_expectations/core/expectation_configuration.py.
    """

    expectation_type: str
    kwargs: dict = field(default_factory=dict)
    meta: dict = field(default_factory=dict)

    def to_json_dict(self) -> dict:
        return {
            "expectation_type": self.expectation_type,
            "kwargs": self.kwargs,
            "meta": self.meta,
        }

    @classmethod
    def from_json_dict(cls, d: dict) -> "ExpectationConfiguration":
        return cls(
            expectation_type=d["expectation_type"],
            kwargs=dict(d.get("kwargs", {})),
            meta=dict(d.get("meta", {})),
        )


@dataclass
class ExpectationSuite:
    """Named list of expectation configurations.

    Reference: great_expectations/core/expectation_suite.py.
    """

    name: str = "default"
    expectations: list = field(default_factory=list)
    meta: dict = field(default_factory=dict)
    evaluation_parameters: dict = field(default_factory=dict)

    def add_expectation(self, config: ExpectationConfiguration) -> "ExpectationSuite":
        self.expectations.append(config)
        return self

    def expect(self, expectation_type: str, **kwargs: Any) -> "ExpectationSuite":
        self.expectations.append(
            ExpectationConfiguration(expectation_type=expectation_type, kwargs=kwargs)
        )
        return self

    def to_json_dict(self) -> dict:
        return {
            "expectation_suite_name": self.name,
            "expectations": [e.to_json_dict() for e in self.expectations],
            "meta": self.meta,
            "evaluation_parameters": self.evaluation_parameters,
        }

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_json_dict(), f, indent=2, default=str)

    @classmethod
    def from_json_dict(cls, d: dict) -> "ExpectationSuite":
        return cls(
            name=d.get("expectation_suite_name", d.get("name", "default")),
            expectations=[
                ExpectationConfiguration.from_json_dict(e)
                for e in d.get("expectations", [])
            ],
            meta=dict(d.get("meta", {})),
            evaluation_parameters=dict(d.get("evaluation_parameters", {})),
        )

    @classmethod
    def load(cls, path: str) -> "ExpectationSuite":
        with open(path) as f:
            return cls.from_json_dict(json.load(f))


def suite(name: str = "default") -> ExpectationSuite:
    return ExpectationSuite(name=name)
