"""High-water-mark incremental processing: only-new rows per run, cursor
advanced on the processed job itself (observe), atomic state file."""

from __future__ import annotations

import pytest

from mini_etl_spark.incremental import IncrementalBatch, load_watermark


def test_incremental_three_runs(spark, tmp_path):
    src = str(tmp_path / "events")
    state = str(tmp_path / "state.json")

    def append(lo, hi):
        spark.range(lo, hi).withColumnRenamed("id", "seq").write.mode(
            "append"
        ).parquet(src)

    def run():
        inc = IncrementalBatch(state, cursor_col="seq")
        fresh = inc.filter_new(spark.read.parquet(src))
        rows = fresh.count()  # the caller's action (stand-in for a sink)
        inc.commit()
        return rows

    append(0, 100)
    assert run() == 100
    assert load_watermark(state) == 99

    append(100, 250)
    assert run() == 150  # only the new rows
    assert load_watermark(state) == 249

    # no new data: empty batch, watermark unchanged
    assert run() == 0
    assert load_watermark(state) == 249


def test_incremental_filter_reaches_scan(spark, tmp_path):
    """The watermark predicate must be pushed into the parquet scan."""
    src = str(tmp_path / "ds")
    state = str(tmp_path / "s.json")
    spark.range(1000).withColumnRenamed("id", "seq").write.parquet(src)

    inc = IncrementalBatch(state, cursor_col="seq")
    first = inc.filter_new(spark.read.parquet(src))
    first.count()
    inc.commit()

    inc2 = IncrementalBatch(state, cursor_col="seq")
    df = inc2.filter_new(spark.read.parquet(src))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThan(seq,999)" in plan


def test_commit_before_action_raises(spark, tmp_path):
    inc = IncrementalBatch(str(tmp_path / "x.json"), cursor_col="seq")
    with pytest.raises(RuntimeError):
        inc.commit()


def test_timestamp_cursor(spark, tmp_path):
    src = str(tmp_path / "ts_ds")
    state = str(tmp_path / "ts.json")
    spark.sql(
        "SELECT timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts"
        " FROM range(60)"
    ).write.parquet(src)

    inc = IncrementalBatch(state, cursor_col="ts")
    assert inc.filter_new(spark.read.parquet(src)).count() == 60
    inc.commit()
    assert load_watermark(state) == "2024-01-01 00:00:59"

    inc2 = IncrementalBatch(state, cursor_col="ts")
    assert inc2.filter_new(spark.read.parquet(src)).count() == 0
