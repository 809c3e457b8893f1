"""CLI tests (⇐ reference tests/test_cli.py:18-50, click CliRunner)."""

from __future__ import annotations

import pandas as pd
from click.testing import CliRunner

from mini_etl_spark.cli import main


def test_help():
    result = CliRunner().invoke(main, ["--help"])
    assert result.exit_code == 0
    assert "run" in result.output and "validate" in result.output


def test_version():
    result = CliRunner().invoke(main, ["--version"])
    assert result.exit_code == 0


def test_info():
    result = CliRunner().invoke(main, ["info"])
    assert result.exit_code == 0
    assert "pyspark" in result.output


def test_init_and_validate(tmp_path):
    cfg = tmp_path / "sample.yaml"
    result = CliRunner().invoke(main, ["init", "-o", str(cfg)])
    assert result.exit_code == 0 and cfg.exists()
    # init refuses to overwrite
    again = CliRunner().invoke(main, ["init", "-o", str(cfg)])
    assert again.exit_code == 1
    result = CliRunner().invoke(main, ["validate", str(cfg)])
    assert result.exit_code == 0
    assert "valid" in result.output


def test_validate_bad_config(tmp_path):
    cfg = tmp_path / "bad.yaml"
    cfg.write_text("name: x\nsource: {type: fax}\nsink: {type: csv, path: y}\n")
    result = CliRunner().invoke(main, ["validate", str(cfg)])
    assert result.exit_code == 1


def test_run_dry_run(tmp_path, sample_pdf):
    src = tmp_path / "in.csv"
    sample_pdf.to_csv(src, index=False)
    cfg = tmp_path / "p.yaml"
    cfg.write_text(
        f"name: dry\nsource: {{type: csv, path: '{src}'}}\n"
        f"sink: {{type: csv, path: '{tmp_path}/out'}}\n"
    )
    result = CliRunner().invoke(main, ["run", str(cfg), "--dry-run"])
    assert result.exit_code == 0
    assert "dry run" in result.output


def test_run_full_pipeline(tmp_path, sample_pdf, spark):
    """Full (non-dry) CLI run: compiles config, executes on Spark, writes
    output readable back — the complete declarative path end-to-end."""
    src = tmp_path / "in.csv"
    sample_pdf.to_csv(src, index=False)
    out = tmp_path / "out"
    cfg = tmp_path / "full.yaml"
    cfg.write_text(
        f"name: full\n"
        f"source: {{type: csv, path: '{src}'}}\n"
        f"transformers:\n"
        f"  - {{type: filter, condition: 'value > 150'}}\n"
        f"sink: {{type: parquet, path: '{out}', mode: overwrite}}\n"
    )
    result = CliRunner().invoke(main, ["run", str(cfg), "--explain"])
    assert result.exit_code == 0, result.output
    assert "done: 49 rows" in result.output
    assert spark.read.parquet(str(out)).count() == 49


def test_run_audit_and_stats(tmp_path, sample_pdf, spark):
    """--audit surfaces the plan audit (pushdown/joins/exchanges) for config
    pipelines; --stats-json/--stats-html leave inspectable run artifacts."""
    src = tmp_path / "in.parquet"
    spark.createDataFrame(sample_pdf).write.parquet(str(src))
    out = tmp_path / "out"
    cfg = tmp_path / "audited.yaml"
    cfg.write_text(
        f"name: audited\n"
        f"source: {{type: parquet, path: '{src}'}}\n"
        f"transformers:\n"
        f"  - {{type: filter, condition: 'value > 150'}}\n"
        f"sink: {{type: parquet, path: '{out}', mode: overwrite}}\n"
    )
    sj, sh = tmp_path / "stats.json", tmp_path / "stats.html"
    result = CliRunner().invoke(
        main,
        ["run", str(cfg), "--audit", "--stats-json", str(sj), "--stats-html", str(sh)],
    )
    assert result.exit_code == 0, result.output
    assert "audit:" in result.output
    assert "pushed_filters" in result.output  # predicate reached the scan
    import json

    history = json.loads(sj.read_text())
    assert len(history) == 1 and history[0]["rows"] == 49
    assert "audited" in sh.read_text() and "<table>" in sh.read_text()


def test_run_audit_dry_run(tmp_path, sample_pdf):
    """--audit composes with --dry-run: plan is audited, nothing executes."""
    src = tmp_path / "in.csv"
    sample_pdf.to_csv(src, index=False)
    cfg = tmp_path / "p.yaml"
    cfg.write_text(
        f"name: dryaudit\nsource: {{type: csv, path: '{src}'}}\n"
        f"sink: {{type: csv, path: '{tmp_path}/out'}}\n"
    )
    result = CliRunner().invoke(main, ["run", str(cfg), "--dry-run", "--audit"])
    assert result.exit_code == 0, result.output
    assert "audit:" in result.output and "dry run" in result.output


def test_profile_command(spark):
    result = CliRunner().invoke(
        main,
        [
            "profile",
            "/root/testdata/sf0.001/orders.parquet",
            "--columns",
            "o_orderkey,o_orderstatus",
        ],
    )
    assert result.exit_code == 0, result.output
    import json as _json

    lines = [_json.loads(l) for l in result.output.strip().splitlines()]
    assert "layout" in lines[0] and lines[0]["layout"]["n_files"] >= 1
    by_col = {l["column"]: l for l in lines[1:]}
    assert set(by_col) == {"o_orderkey", "o_orderstatus"}
    assert by_col["o_orderkey"]["null_count"] == 0
    assert by_col["o_orderkey"]["row_count"] == by_col["o_orderkey"]["distinct_count"]


def test_cli_card(tmp_path, spark):
    from click.testing import CliRunner

    from mini_etl_spark.cli import main

    src = tmp_path / "d"
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, tag string").write.parquet(str(src))
    out = tmp_path / "card.md"
    res = CliRunner().invoke(main, ["card", str(src), "--name", "toy", "--out", str(out)])
    assert res.exit_code == 0, res.output
    card = out.read_text()
    assert "# Data card: toy" in card and "- rows: 2" in card
    res2 = CliRunner().invoke(main, ["card", str(src)])
    assert res2.exit_code == 0 and "## Columns" in res2.output
