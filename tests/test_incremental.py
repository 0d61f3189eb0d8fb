"""Incremental checkpoint runs: validate only appended files, merge
with the base run's persisted partials, and produce results identical
to a fresh full run over the cumulative table.

The parquet file-listing diff is the stand-in for an Iceberg
incremental APPEND scan between two snapshots; any rewrite/removal of
a base file voids the append-only contract and must fail loud (the
Iceberg analogue: incremental reads refuse replace/overwrite
snapshots)."""

import json
import os

import pytest

import great_expectations_spark as ges
from great_expectations_spark.checkpoint import CheckpointRunner
from great_expectations_spark.data.images import images_df


def the_suite():
    # spans every execution family the incremental merge must get
    # right: additive map counts, mean/stddev Chan merges, a deferred
    # z-score check (full-scan count at finalize), a row_condition
    # domain (separate group grid + inherited partials per tag), a
    # leftover exact distinct count, and a two-phase uniqueness job
    return (
        ges.suite("incr")
        .expect("expect_column_values_to_not_be_null", column="caption",
                mostly=0.5)
        .expect("expect_column_mean_to_be_between", column="w",
                min_value=1, max_value=60)
        .expect("expect_column_stdev_to_be_between", column="h",
                min_value=0, max_value=100)
        .expect("expect_column_values_to_be_in_set", column="fmt",
                value_set=["jpeg", "png", "webp"], mostly=0.5)
        .expect("expect_column_value_z_scores_to_be_less_than",
                column="w", threshold=4, double_sided=True, mostly=0.9)
        .expect("expect_column_values_to_not_be_null", column="caption",
                mostly=0.25,
                row_condition='col("fmt")=="jpeg"',
                condition_parser="great_expectations")
        .expect("expect_column_unique_value_count_to_be_between",
                column="fmt", min_value=1, max_value=10)
        # approximate=True -> mergeable Datasketches HLL partials:
        # base sketches union with delta sketches (order-insensitive,
        # so incremental == full exactly), base64 round-tripped
        # through the JSON state files
        .expect("expect_column_unique_value_count_to_be_between",
                column="image_id", min_value=1, max_value=10**9,
                approximate=True)
        .expect("expect_column_values_to_be_unique", column="image_id",
                mostly=0.5)
    )


def write_base(spark, tmp_path, n=1500):
    path = str(tmp_path / "images")
    images_df(spark, n_rows=n, seed=1).write.mode(
        "overwrite"
    ).partitionBy("fmt").parquet(path)
    return path


def append_batch(spark, path, n=800, seed=7):
    images_df(spark, n_rows=n, seed=seed).write.mode(
        "append"
    ).partitionBy("fmt").parquet(path)


def assert_same_results(expected, got):
    assert expected.success == got.success
    assert len(expected.results) == len(got.results)
    for e, g in zip(expected.results, got.results):
        typ = e.expectation_config.expectation_type
        assert e.success == g.success, typ
        er, gr = e.result or {}, g.result or {}
        for k in ("element_count", "unexpected_count"):
            if k in er:
                assert er[k] == gr[k], (typ, k)
        ov = er.get("observed_value")
        if isinstance(ov, float):
            assert gr["observed_value"] == pytest.approx(
                ov, rel=1e-9
            ), typ
        elif "observed_value" in er:
            assert gr["observed_value"] == ov, typ


def test_incremental_matches_full_run(spark, tmp_path):
    path = write_base(spark, tmp_path)
    state = str(tmp_path / "state")
    CheckpointRunner(
        spark, path, the_suite(), state, "full1", group_col="fmt"
    ).run()

    append_batch(spark, path)
    got = CheckpointRunner(
        spark, path, the_suite(), state, "incr1", group_col="fmt",
        base_run_id="full1",
    ).run()
    expected = CheckpointRunner(
        spark, path, the_suite(), state, "fullref", group_col="fmt"
    ).run()

    assert_same_results(expected, got)
    inc = got.meta["incremental"]
    assert inc["base_run_id"] == "full1"
    assert 0 < inc["files_delta"] < inc["files_total"]

    # the partial grid scanned ONLY the appended files: the pin's
    # delta listing excludes every base file, and the base partials
    # arrived via the consolidated inherited state
    with open(os.path.join(state, "run=incr1", "batch.json")) as f:
        pin = json.load(f)
    with open(os.path.join(state, "run=full1", "batch.json")) as f:
        base_pin = json.load(f)
    base_files = {rel for rel, _ in base_pin["files"]}
    assert all(rel not in base_files for rel, _ in pin["delta_files"])
    inherited = os.path.join(
        state, "run=incr1", "groups", "__inherited.json"
    )
    assert os.path.exists(inherited)
    with open(inherited) as f:
        st = json.load(f)
    assert st["status"] == "inherited" and st["partition_rows"]


def test_incremental_resume_replays_pinned_delta(spark, tmp_path):
    path = write_base(spark, tmp_path, n=600)
    state = str(tmp_path / "state")
    CheckpointRunner(
        spark, path, the_suite(), state, "full1", group_col="fmt"
    ).run()
    append_batch(spark, path, n=300)
    first = CheckpointRunner(
        spark, path, the_suite(), state, "incr1", group_col="fmt",
        base_run_id="full1",
    ).run()
    # resume without re-passing base_run_id: the pin is authoritative
    resumed = CheckpointRunner(
        spark, path, the_suite(), state, "incr1", group_col="fmt"
    ).run()
    assert resumed.meta["groups_computed"] == 0
    assert resumed.meta["groups_resumed"] == first.meta["groups_computed"]
    assert resumed.meta["incremental"]["base_run_id"] == "full1"
    assert_same_results(first, resumed)


def test_chained_incremental_flattens_base_state(spark, tmp_path):
    path = write_base(spark, tmp_path, n=600)
    state = str(tmp_path / "state")
    CheckpointRunner(
        spark, path, the_suite(), state, "full1", group_col="fmt"
    ).run()
    append_batch(spark, path, n=300, seed=7)
    CheckpointRunner(
        spark, path, the_suite(), state, "incr1", group_col="fmt",
        base_run_id="full1",
    ).run()
    append_batch(spark, path, n=300, seed=13)
    got = CheckpointRunner(
        spark, path, the_suite(), state, "incr2", group_col="fmt",
        base_run_id="incr1",
    ).run()
    expected = CheckpointRunner(
        spark, path, the_suite(), state, "fullref", group_col="fmt"
    ).run()
    assert_same_results(expected, got)
    # incr2 inherited from incr1's consolidated state (which already
    # folded full1) — O(1) chain depth, no walk back to full1
    with open(
        os.path.join(state, "run=incr2", "groups", "__inherited.json")
    ) as f:
        st = json.load(f)
    assert st["base_run_id"] == "incr1"


def test_empty_delta_reproduces_base(spark, tmp_path):
    path = write_base(spark, tmp_path, n=600)
    state = str(tmp_path / "state")
    base = CheckpointRunner(
        spark, path, the_suite(), state, "full1", group_col="fmt"
    ).run()
    got = CheckpointRunner(
        spark, path, the_suite(), state, "incr1", group_col="fmt",
        base_run_id="full1",
    ).run()
    assert got.meta["incremental"]["files_delta"] == 0
    assert got.meta["groups_computed"] == 0
    assert_same_results(base, got)


def test_append_only_contract_violation_fails_loud(spark, tmp_path):
    path = write_base(spark, tmp_path, n=600)
    state = str(tmp_path / "state")
    CheckpointRunner(
        spark, path, the_suite(), state, "full1", group_col="fmt"
    ).run()
    # rewrite (compaction/overwrite) — same schema, different files
    images_df(spark, n_rows=500, seed=2).write.mode(
        "overwrite"
    ).partitionBy("fmt").parquet(path)
    with pytest.raises(RuntimeError, match="append-only"):
        CheckpointRunner(
            spark, path, the_suite(), state, "incr1", group_col="fmt",
            base_run_id="full1",
        ).run()


def test_changed_suite_rejected(spark, tmp_path):
    path = write_base(spark, tmp_path, n=600)
    state = str(tmp_path / "state")
    CheckpointRunner(
        spark, path, the_suite(), state, "full1", group_col="fmt"
    ).run()
    append_batch(spark, path, n=200)
    other = ges.suite("other").expect(
        "expect_column_values_to_not_be_null", column="caption"
    )
    with pytest.raises(RuntimeError, match="identical suite"):
        CheckpointRunner(
            spark, path, other, state, "incr1", group_col="fmt",
            base_run_id="full1",
        ).run()


def test_incomplete_base_rejected(spark, tmp_path):
    path = write_base(spark, tmp_path, n=600)
    state = str(tmp_path / "state")
    runner = CheckpointRunner(
        spark, path, the_suite(), state, "full1", group_col="fmt"
    )
    runner.run()
    os.remove(os.path.join(state, "run=full1", "result.json"))
    append_batch(spark, path, n=200)
    with pytest.raises(RuntimeError, match="did not complete"):
        CheckpointRunner(
            spark, path, the_suite(), state, "incr1", group_col="fmt",
            base_run_id="full1",
        ).run()


def test_incremental_kll_quantiles(spark, tmp_path):
    """approximate=True quantile expectations merge across incremental
    runs via KLL sketch union (base sketches + delta sketches,
    base64 round-tripped through the JSON state). Unlike HLL
    (register-max, exactly order-insensitive), KLL compaction is
    randomized, so incremental and full agree within the sketch's
    rank error — assert both land inside the exact-rank window of the
    cumulative table."""
    qsuite = (
        ges.suite("incr-kll")
        .expect("expect_column_quantile_values_to_be_between",
                column="w", approximate=True,
                quantile_ranges={"quantiles": [0.25, 0.75],
                                 "value_ranges": [[None, None]] * 2})
    )
    path = write_base(spark, tmp_path)
    state = str(tmp_path / "state")
    CheckpointRunner(
        spark, path, qsuite, state, "base", group_col="fmt"
    ).run()
    append_batch(spark, path)
    got = CheckpointRunner(
        spark, path, qsuite, state, "incr", group_col="fmt",
        base_run_id="base",
    ).run()
    full = CheckpointRunner(
        spark, path, qsuite, state, "full", group_col="fmt"
    ).run()

    cum = spark.read.parquet(path).selectExpr("cast(w as double) as w")
    slack = 0.05
    los = cum.approxQuantile("w", [0.25 - slack, 0.75 - slack], 0.0)
    his = cum.approxQuantile("w", [0.25 + slack, 0.75 + slack], 0.0)
    for run in (got, full):
        vals = run.results[0].result["observed_value"]["values"]
        for v, lo, hi in zip(vals, los, his):
            assert lo <= v <= hi, (vals, los, his)


def test_failed_base_domain_rejected(spark, tmp_path):
    """A base run that completed WITH a failed row_condition domain
    writes result.json but no group state for that domain's tag; an
    incremental run building on it would silently inherit EMPTY
    partials and report delta-only stats as full-table results.
    _compute_delta must reject such bases loudly."""
    path = write_base(spark, tmp_path)
    state = str(tmp_path / "state")
    bad_suite = the_suite().expect(
        "expect_column_values_to_not_be_null",
        column="w",
        row_condition="no_such_column > 0",
        condition_parser="spark",
    )
    base = CheckpointRunner(
        spark, path, bad_suite, state, "badbase", group_col="fmt"
    ).run()
    assert base.meta["groups_failed"] > 0  # the hazard is real

    append_batch(spark, path)
    with pytest.raises(RuntimeError, match="failed group"):
        CheckpointRunner(
            spark, path, bad_suite, state, "incr_on_bad",
            group_col="fmt", base_run_id="badbase",
        ).run()


def test_missing_base_domain_state_rejected(spark, tmp_path):
    """Second guard: even past the groups_failed gate, a domain tag
    matching ZERO base group files (state deleted/corrupted) must
    fail loud instead of inheriting nothing."""
    import glob
    import os

    path = write_base(spark, tmp_path)
    state = str(tmp_path / "state")
    CheckpointRunner(
        spark, path, the_suite(), state, "full1", group_col="fmt"
    ).run()
    # destroy the row_condition domain's state files in the base
    victims = glob.glob(
        os.path.join(state, "run=full1", "groups", "*__d*.json")
    )
    assert victims
    for v in victims:
        os.remove(v)

    append_batch(spark, path)
    got = CheckpointRunner(
        spark, path, the_suite(), state, "incr1", group_col="fmt",
        base_run_id="full1",
    ).run()
    # per-domain isolation: the broken domain surfaces as exception
    # EVRs naming the missing state, other domains stay green
    bad = [
        e for e in got.results
        if e.expectation_config.kwargs.get("row_condition")
    ]
    assert bad and all(
        e.exception_info.get("raised_exception") for e in bad
    )
    assert any(
        "no group state" in str(e.exception_info) for e in bad
    )
    ok = [
        e for e in got.results
        if not e.expectation_config.kwargs.get("row_condition")
    ]
    assert ok and all(e.result for e in ok)


def test_result_meta_carries_slim_pin(spark, tmp_path):
    """result.json meta embeds fingerprint + file COUNTS, never the
    file listing — at 10^6-file scale the verbatim pin would bloat
    every stored result and degrade URN resolution, which json-loads
    each run's result.json."""
    import json as _json
    import os

    path = write_base(spark, tmp_path)
    state = str(tmp_path / "state")
    CheckpointRunner(
        spark, path, the_suite(), state, "full1", group_col="fmt"
    ).run()
    append_batch(spark, path)
    got = CheckpointRunner(
        spark, path, the_suite(), state, "incr1", group_col="fmt",
        base_run_id="full1",
    ).run()

    for run_id in ("full1", "incr1"):
        with open(
            os.path.join(state, f"run={run_id}", "result.json")
        ) as f:
            meta = _json.load(f)["meta"]
        assert "files" not in meta["batch"]
        assert "delta_files" not in meta["batch"]
        assert meta["batch"]["files_count"] > 0
        assert meta["batch"]["fingerprint"]
        # the full manifest still lives in batch.json (the pin file)
        with open(
            os.path.join(state, f"run={run_id}", "batch.json")
        ) as f:
            pin = _json.load(f)
        assert len(pin["files"]) == meta["batch"]["files_count"]
    assert got.meta["batch"]["delta_files_count"] > 0


def test_empty_grouped_base_inherits_zero_rows(spark, tmp_path):
    """A grouped base over an EMPTY table enumerates zero groups and
    writes zero state files while completing green — an incremental
    run on it must inherit zero rows (delta == full table), not be
    rejected by the missing-state guard."""
    import pyspark.sql.functions as F  # noqa: F401

    path = str(tmp_path / "images")
    # unpartitioned layout: an empty partitionBy write emits no data
    # files at all (unreadable), while this writes one zero-row file
    # with schema — the realistic empty-snapshot shape
    empty = images_df(spark, n_rows=100, seed=1).limit(0)
    empty.repartition(1).write.parquet(path)
    state = str(tmp_path / "state")
    base = CheckpointRunner(
        spark, path, the_suite(), state, "empty0", group_col="fmt"
    ).run()
    assert base.meta["groups_total"] == 0
    assert base.meta["groups_failed"] == 0

    images_df(spark, n_rows=400, seed=3).write.mode("append").parquet(
        path
    )
    got = CheckpointRunner(
        spark, path, the_suite(), state, "incr1", group_col="fmt",
        base_run_id="empty0",
    ).run()
    expected = CheckpointRunner(
        spark, path, the_suite(), state, "fullref", group_col="fmt"
    ).run()
    assert_same_results(expected, got)


def test_sequential_group_failure_fails_fast(spark, tmp_path, monkeypatch):
    """With the default max_concurrent_groups=1, the FIRST group
    error aborts the domain — later groups are never scanned (the
    pre-r4 inline behavior, preserved alongside the pool path)."""
    from great_expectations_spark.checkpoint import runner as runner_mod

    path = write_base(spark, tmp_path)
    state = str(tmp_path / "state")
    calls = {"n": 0}

    def boom(self, *a, **k):
        calls["n"] += 1
        raise RuntimeError("storage down")

    monkeypatch.setattr(runner_mod.CheckpointRunner, "_run_group", boom)
    res = CheckpointRunner(
        spark, path, the_suite(), state, "r1", group_col="fmt"
    ).run()
    # per-domain isolation still yields exception EVRs...
    assert not res.success
    # ...but each domain attempted exactly ONE group before aborting
    n_domains = 2  # the suite has one row_condition domain + default
    assert calls["n"] == n_domains, calls["n"]
