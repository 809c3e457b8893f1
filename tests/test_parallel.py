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
