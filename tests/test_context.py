"""DataContext project layer: named stores, YAML checkpoint configs,
CLI verbs — the reference's data_context/ + cli/ surface reduced to
what run_checkpoint needs (context.py)."""

import json
import os

import pytest

import great_expectations_spark as ges
from great_expectations_spark.__main__ import main as cli_main
from great_expectations_spark.context import DataContext
from great_expectations_spark.data.images import images_df


def _project(tmp_path):
    return DataContext.create(str(tmp_path / "proj"))


def _small_suite(name="nightly"):
    return (
        ges.suite(name)
        .expect("expect_column_values_to_not_be_null", column="caption",
                mostly=0.99)
        .expect("expect_column_mean_to_be_between", column="w",
                min_value=8, max_value=40)
        .expect("expect_column_values_to_be_in_set", column="fmt",
                value_set=["jpeg", "png", "webp"], mostly=0.99)
    )


def test_create_and_suite_store_roundtrip(tmp_path):
    ctx = _project(tmp_path)
    for sub in ("suites", "checkpoints", "state", "validations",
                "data_docs"):
        assert os.path.isdir(os.path.join(ctx.root_dir, sub))
    # create is idempotent; missing project fails loud
    DataContext.create(ctx.root_dir)
    with pytest.raises(FileNotFoundError, match="no project"):
        DataContext(str(tmp_path / "nowhere"))

    assert ctx.list_suites() == []
    ctx.save_suite(_small_suite())
    ctx.save_suite(_small_suite("weekly"))
    assert ctx.list_suites() == ["nightly", "weekly"]
    loaded = ctx.get_suite("nightly")
    assert [e.expectation_type for e in loaded.expectations] == [
        e.expectation_type for e in _small_suite().expectations
    ]
    with pytest.raises(FileNotFoundError, match="no suite 'ghost'"):
        ctx.get_suite("ghost")


def test_checkpoint_config_store(tmp_path):
    ctx = _project(tmp_path)
    path = ctx.add_checkpoint(
        "imgs", table_path="/data/images", suite_name="nightly",
        group_col="fmt",
    )
    assert path.endswith("checkpoints/imgs.yaml")
    cfg = ctx.get_checkpoint("imgs")
    assert cfg == {
        "table_path": "/data/images",
        "suite_name": "nightly",
        "result_format": "SUMMARY",
        "group_col": "fmt",
    }
    # JSON configs load through the same reader (JSON ⊂ YAML)
    jpath = os.path.join(ctx.root_dir, "checkpoints", "jority.json")
    with open(jpath, "w") as f:
        json.dump({"table_path": "/t", "suite_name": "s"}, f)
    assert ctx.get_checkpoint("jority")["table_path"] == "/t"
    assert ctx.list_checkpoints() == ["imgs", "jority"]
    with pytest.raises(FileNotFoundError, match="no checkpoint"):
        ctx.get_checkpoint("ghost")
    with pytest.raises(ValueError, match="unknown checkpoint action"):
        ctx._build_actions([{"type": "page_the_oncall"}], "s")


def test_run_checkpoint_end_to_end(spark, tmp_path):
    ctx = _project(tmp_path)
    table = str(tmp_path / "images")
    images_df(spark, n_rows=600, seed=5).write.mode(
        "overwrite"
    ).partitionBy("fmt").parquet(table)
    ctx.save_suite(_small_suite())
    ctx.add_checkpoint(
        "imgs", table_path=table, suite_name="nightly", group_col="fmt"
    )

    res = ctx.run_checkpoint("imgs", run_id="r1", spark=spark)
    assert res.statistics["evaluated_expectations"] == 3

    # default action list fired: stored result + data docs page+index
    assert os.path.isfile(
        os.path.join(ctx.root_dir, "validations", "r1.json")
    )
    page = os.path.join(ctx.root_dir, "data_docs", "validations", "r1.html")
    assert os.path.isfile(page)
    assert "nightly" in open(page).read()
    assert os.path.isfile(os.path.join(ctx.root_dir, "data_docs",
                                       "index.html"))
    # runner state landed under the per-checkpoint state dir
    assert os.path.isdir(
        os.path.join(ctx.checkpoint_state_dir("imgs"), "run=r1")
    )
    # parity with direct validation of the same table + suite
    direct = ges.validate(
        spark.read.parquet(table), _small_suite(), result_format="SUMMARY"
    )
    assert res.success == direct.success
    assert [r.success for r in res.results] == [
        r.success for r in direct.results
    ]


def test_cli_verbs(spark, tmp_path, capsys):
    root = str(tmp_path / "cli_proj")
    assert cli_main(["--root", root, "init"]) == 0
    ctx = DataContext(root)
    ctx.save_suite(_small_suite())

    assert cli_main(["--root", root, "suite", "list"]) == 0
    assert "nightly" in capsys.readouterr().out
    assert cli_main(["--root", root, "suite", "show", "nightly"]) == 0
    shown = json.loads(capsys.readouterr().out)
    assert shown["expectation_suite_name"] == "nightly"
    assert cli_main(["--root", root, "suite", "show", "ghost"]) == 1
    assert "no suite" in capsys.readouterr().err

    table = str(tmp_path / "images_cli")
    images_df(spark, n_rows=400, seed=6).write.mode(
        "overwrite"
    ).parquet(table)
    ctx.add_checkpoint("imgs", table_path=table, suite_name="nightly")
    assert cli_main(["--root", root, "checkpoint", "list"]) == 0
    assert "imgs" in capsys.readouterr().out

    # run reuses the live session (getOrCreate inside main picks up
    # the test session; --master omitted on purpose)
    code = cli_main(
        ["--root", root, "checkpoint", "run", "imgs", "--run-id", "c1"]
    )
    out = json.loads(capsys.readouterr().out)
    assert code in (0, 2)
    assert out["run_id"] == "c1"
    assert out["statistics"]["evaluated_expectations"] == 3
    assert (code == 0) == out["success"]

    assert cli_main(["--root", root, "docs", "build"]) == 0
    assert capsys.readouterr().out.strip().endswith("index.html")
