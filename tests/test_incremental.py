"""High-water-mark incremental processing: only-new rows per run, cursor
advanced on the processed job itself (observe), atomic state file."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def test_rollup_partial_merge_equals_direct(spark):
    """Algebraic-aggregation contract: partial states over arbitrary
    slices, merged, finalize to exactly the direct aggregate."""
    from pyspark.sql import functions as F

    from mini_etl_spark.incremental import (
        rollup_merge,
        rollup_partial,
        rollup_result,
    )

    df = spark.range(1000).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 3 % 101).cast("double").alias("v"),
    )
    keys, aggs = ["k"], {"v": ["sum", "mean", "min", "max", "count"]}
    slices = [
        df.filter("id % 3 = 0"), df.filter("id % 3 = 1"), df.filter("id % 3 = 2")
    ]
    merged = rollup_result(
        rollup_merge([rollup_partial(s, keys, aggs) for s in slices], keys),
        keys,
        aggs,
    )
    direct = df.groupBy("k").agg(
        F.sum("v").alias("v_sum"),
        F.mean("v").alias("v_mean"),
        F.min("v").alias("v_min"),
        F.max("v").alias("v_max"),
        F.count("v").alias("v_count"),
    )
    m = {r["k"]: r for r in merged.collect()}
    d = {r["k"]: r for r in direct.collect()}
    assert set(m) == set(d)
    for k in d:
        for c in ["v_sum", "v_mean", "v_min", "v_max", "v_count"]:
            assert abs(m[k][c] - d[k][c]) < 1e-9, (k, c)


def test_rollup_nunique_sketch_merges_and_estimates(spark):
    """COUNT(DISTINCT) maintained incrementally via HLL sketch state: the
    merged-slice estimate and the single-pass estimate must BOTH track the
    exact distinct count within HLL error (±~2% at default lgConfigK; a
    looser 5% bound asserted). The two estimates need not be identical —
    Datasketches unions may settle in a different sketch representation
    than a one-shot build."""
    from mini_etl_spark.incremental import (
        rollup_merge,
        rollup_partial,
        rollup_result,
    )

    df = spark.range(0, 30000).selectExpr(
        "id % 3 AS k", "CAST(id % 2000 AS STRING) AS user"
    )
    keys, aggs = ["k"], {"user": ["nunique"]}
    slices = [
        df.filter(f"id % 4 = {i}") for i in range(4)
    ]  # every user appears in several slices → union must dedup
    merged = rollup_result(
        rollup_merge([rollup_partial(s, keys, aggs) for s in slices], keys),
        keys,
        aggs,
    )
    direct = rollup_result(rollup_partial(df, keys, aggs), keys, aggs)
    m = {r["k"]: r["user_nunique"] for r in merged.collect()}
    d = {r["k"]: r["user_nunique"] for r in direct.collect()}
    exact = {
        r["k"]: r["x"]
        for r in df.groupBy("k").agg(F.countDistinct("user").alias("x")).collect()
    }
    assert set(m) == set(d) == set(exact)
    for k in exact:
        assert abs(m[k] - exact[k]) / exact[k] < 0.05
        assert abs(d[k] - exact[k]) / exact[k] < 0.05


def test_rollup_rejects_non_mergeable(spark):
    import pytest as _pytest

    from mini_etl_spark.incremental import rollup_partial

    df = spark.range(10).selectExpr("id as k", "id as v")
    with _pytest.raises(ValueError, match="not mergeable"):
        rollup_partial(df, ["k"], {"v": ["stddev"]})
