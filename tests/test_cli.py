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
