"""Run the reference's golden corpus (62 fixture files / 658 cases)
against this engine — the compatibility oracle (SURVEY.md §5)."""

from __future__ import annotations

import json
import os

import pytest

import great_expectations_spark as ges
from great_expectations_spark.core.config import ExpectationConfiguration

from fixture_harness import (
    build_df,
    compare_out,
    fixture_files,
    spark_applicable,
)

FILES = fixture_files()

# Documented divergences: (file basename, test title) -> reason.
KNOWN_DIVERGENCES: dict = {}


@pytest.mark.skipif(not FILES, reason="reference checkout not present")
@pytest.mark.parametrize(
    "path", FILES, ids=[os.path.basename(p)[:-5] for p in FILES]
)
def test_reference_fixture(spark, path):
    with open(path) as f:
        fixture = json.load(f)
    expectation_type = fixture["expectation_type"]
    if expectation_type not in ges.list_expectation_types():
        pytest.skip(f"{expectation_type} not implemented")

    ran = 0
    skipped = 0
    failures = []
    for ds_i, ds in enumerate(fixture.get("datasets", [])):
        tests = [
            t for t in ds.get("tests", []) if spark_applicable(t) is None
        ]
        if not tests:
            skipped += len(ds.get("tests", []))
            continue
        schemas = ds.get("schemas") or {}
        try:
            df = build_df(spark, ds["data"], schemas.get("spark"))
        except Exception as exc:  # noqa: BLE001
            failures.append(f"dataset {ds_i}: build failed: {exc}")
            continue
        for t in ds["tests"]:
            if spark_applicable(t) is not None:
                skipped += 1
                continue
            key = (os.path.basename(path), t.get("title"))
            if key in KNOWN_DIVERGENCES:
                skipped += 1
                continue
            cfg = ExpectationConfiguration(
                expectation_type=expectation_type,
                kwargs=dict(t.get("in", {})),
            )
            suite = ges.ExpectationSuite(
                name="fixture", expectations=[cfg]
            )
            try:
                res = ges.validate(
                    df, suite, result_format="COMPLETE"
                ).results[0]
            except Exception as exc:  # noqa: BLE001
                failures.append(f"{t.get('title')}: engine raised {exc}")
                continue
            problems = compare_out(
                t.get("out") or {}, res, res.result or {}
            )
            ran += 1
            if problems:
                failures.append(
                    f"{t.get('title')}: " + "; ".join(problems)
                )
    assert not failures, (
        f"{len(failures)} of {ran} cases diverge:\n  "
        + "\n  ".join(failures[:20])
    )
