"""Tests for the surviving parallel-layer utilities (core/parallel.py parity)."""

from __future__ import annotations

import pandas as pd

from mini_etl_spark.parallel import parallel_map, rebalance


def test_parallel_map(spark, sample_df):
    def enrich(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["id"]].copy()
        out["squared"] = pdf["value"] ** 2
        return out

    out = parallel_map(sample_df, enrich, "id bigint, squared bigint")
    got = {r.id: r.squared for r in out.collect()}
    assert got[1] == 100 * 100 and len(got) == 100


def test_rebalance_shrink_grow_key(spark, sample_df):
    grown = rebalance(sample_df, 16)
    assert grown.rdd.getNumPartitions() == 16
    shrunk = rebalance(grown, 2)
    assert shrunk.rdd.getNumPartitions() == 2
    keyed = rebalance(sample_df, 8, by="category")
    assert keyed.rdd.getNumPartitions() == 8
    assert keyed.count() == 100


def test_zorder_write_bounds_both_columns(spark, tmp_path):
    """Z-order clustering: after a z-order write on (x, y), every file
    covers a compact range of BOTH columns — the per-file y-span shrinks
    by >2x vs a linear sort on x (where each file spans all of y)."""
    import glob as globmod

    from pyspark.sql import functions as F

    from mini_etl_spark.maintenance import zorder_write

    n = 20_000
    df = spark.range(n).select(
        F.col("id").alias("x"),
        ((F.col("id") * 7919) % n).alias("y"),
    )
    linear = str(tmp_path / "linear")
    zordered = str(tmp_path / "zorder")
    (
        df.repartitionByRange(8, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zorder_write(spark, df, zordered, ["x", "y"], n_files=8)

    def mean_y_span(path: str) -> float:
        spans = []
        for f in globmod.glob(f"{path}/part-*.parquet"):
            row = spark.read.parquet(f).agg(
                (F.max("y") - F.min("y")).alias("s")
            ).first()
            spans.append(row["s"])
        return sum(spans) / len(spans)

    lin_span, z_span = mean_y_span(linear), mean_y_span(zordered)
    assert z_span * 2 < lin_span, (lin_span, z_span)
    # and the z-ordered rows are still all there
    assert spark.read.parquet(zordered).count() == n


def test_zorder_value_validation(spark):
    import pytest as _pytest

    from mini_etl_spark.maintenance import zorder_value

    df = spark.range(10).selectExpr("id as a", "id as b", "id as c")
    with _pytest.raises(ValueError):
        zorder_value(df, ["a"])
    with _pytest.raises(ValueError):
        zorder_value(df, ["a", "b", "c"], bits=32)
