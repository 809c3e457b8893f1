"""Pipeline end-to-end tests — mirrors the reference's pipeline suite
(tests/test_pipeline.py:15-217): golden 49-row flow, fluent chaining,
callbacks, error modes, copy/clear."""

from __future__ import annotations

import pandas as pd
import pytest

from mini_etl_spark import Pipeline, PipelineBuilder
from mini_etl_spark import operators as ops
from mini_etl_spark.sources import from_memory, read_csv
from mini_etl_spark.sinks import null_sink, to_csv


def test_golden_csv_filter_rename(spark, sample_pdf, tmp_path):
    # ⇐ reference tests/test_pipeline.py:18-49
    src = tmp_path / "in.csv"
    sample_pdf.to_csv(src, index=False)
    out = tmp_path / "out"
    stats = (
        Pipeline("golden")
        .set_source(read_csv(str(src)))
        .add_transformer(ops.filter_rows("value > 150"))
        .add_transformer(ops.rename_columns({"value": "amount"}))
        .set_sink(to_csv(str(out)))
        .run(spark)
    )
    assert stats["rows"] == 49
    assert stats["errors"] == 0
    assert stats["rows_per_second"] > 0
    back = read_csv(str(out))(spark)
    assert back.count() == 49
    assert "amount" in back.columns
    vals = sorted(int(r.amount) for r in back.collect())
    assert vals == list(range(151, 200))


def test_builder_fluent(spark, sample_pdf, tmp_path):
    src = tmp_path / "in.csv"
    sample_pdf.to_csv(src, index=False)
    out = tmp_path / "out"
    p = (
        PipelineBuilder("fluent")
        .from_csv(str(src))
        .filter("value > 150")
        .rename({"value": "amount"})
        .select(["id", "amount"])
        .to_csv(str(out))
        .build()
    )
    stats = p.run(spark)
    assert stats["rows"] == 49
    assert read_csv(str(out))(spark).columns == ["id", "amount"]


def test_callbacks(spark, sample_pdf):
    events: list[str] = []
    p = (
        Pipeline("cb")
        .set_source(from_memory(sample_pdf))
        .set_sink(null_sink())
        .on_start(lambda: events.append("start"))
        .on_complete(lambda s: events.append(f"done:{s['rows']}"))
    )
    p.run(spark)
    assert events == ["start", "done:100"]


def test_error_mode_raise(spark, sample_pdf):
    p = (
        Pipeline("boom", on_error="raise")
        .set_source(from_memory(sample_pdf))
        .add_transformer(ops.filter_rows("ghost > 1"))
        .set_sink(null_sink())
    )
    with pytest.raises(Exception):
        p.run(spark)


def test_error_mode_skip_and_callback(spark, sample_pdf):
    errors: list[Exception] = []
    p = (
        Pipeline("skippy", on_error="skip")
        .set_source(from_memory(sample_pdf))
        .add_transformer(ops.filter_rows("ghost > 1"))
        .set_sink(null_sink())
    )
    p.on_error(lambda e: errors.append(e))
    stats = p.run(spark)
    assert stats["errors"] == 1
    assert len(errors) == 1


def test_copy_and_clear(spark, sample_pdf):
    p = (
        Pipeline("orig")
        .set_source(from_memory(sample_pdf))
        .add_transformer(ops.filter_rows("value > 150"))
        .set_sink(null_sink())
    )
    clone = p.copy()
    clone.add_transformer(ops.filter_rows("value > 190"))
    assert len(p._transforms) == 1 and len(clone._transforms) == 2
    s1, s2 = p.run(spark), clone.run(spark)
    assert (s1["rows"], s2["rows"]) == (49, 9)
    p.clear()
    with pytest.raises(ValueError):
        p.run(spark)


def test_history_accumulates(spark, sample_pdf):
    p = Pipeline("h").set_source(from_memory(sample_pdf)).set_sink(null_sink())
    p.run(spark)
    p.run(spark)
    assert len(p.history) == 2


def test_dataframe_without_sink(spark, sample_pdf):
    p = Pipeline("lazy").set_source(from_memory(sample_pdf)).add_transformer(
        ops.filter_rows("value > 197")
    )
    df = p.dataframe(spark)
    assert df.count() == 2


def test_with_schema_stage(spark):
    """Schema validation wired into the pipeline stream (reference
    validate_schema=True, pipeline.py:134-135)."""
    import pandas as pd

    pdf = pd.DataFrame({"id": ["1", "2", "zz"], "value": [1.0, 2.0, 3.0]})
    p = (
        Pipeline("schema")
        .set_source(from_memory(pdf))
        .with_schema({"id": "int", "value": "float", "extra": {"dtype": "str", "default": "x"}})
        .set_sink(null_sink())
    )
    stats = p.run(spark)
    assert stats["rows"] == 3
    df = p.dataframe(spark)
    assert df.columns == ["id", "value", "extra"]
    assert [r.id for r in df.orderBy("value").collect()] == [1, 2, None]
