"""Focused plan-shape locks for the round-12 optimizations.

Each test pins the STRUCTURAL property the optimization bought, so a later
refactor cannot silently re-introduce the removed work:

- ``simhash_pairs``: hamming is verified inside the band self-join — the
  plan must not join back to the signature frame (pre-r12 it carried two
  extra verify joins and a candidate-wide dedup exchange);
- ``profile``: exact distincts are unioned per-column aggregates — the plan
  must not contain an Expand (pre-r12 the four countDistincts restreamed
  the input ×5 through two SortAggregate passes);
- ``robust_outliers``: the per-group median frame is persisted — the plan
  must reference it through InMemoryRelation so the scan + exact-percentile
  subtree executes once, not once per broadcast join (pre-r12: 4 scans,
  the median aggregate twice).

Result-level correctness of all three is separately pinned bit-exactly by
tests/test_oracle.py (mad_outliers, simhash_pairs, profile keys).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mini_etl_spark import plans  # noqa: E402


def test_simhash_pairs_verifies_inside_band_join(spark, sample_df):
    from pyspark.sql import functions as F

    from mini_etl_spark.functions import dedup as dd

    docs = sample_df.select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", "name", "category").alias("text"),
    )
    import re

    plan = plans.physical_plan(dd.simhash_pairs(docs, max_hamming=3))
    # exactly ONE join NODE in the whole plan: the band self-join. The
    # pre-r12 shape had three (band join + two signature re-joins). Count
    # detail headers — the tree section repeats operator names.
    joins = re.findall(
        r"^\(\d+\) (SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)",
        plan,
        re.M,
    )
    assert len(joins) == 1, plan
    # the hamming verification must sit in the join condition, not in a
    # post-dedup filter stage fed by signature re-joins
    assert "bit_count" in plan, plan


def test_profile_plans_without_expand(spark, sample_df):
    from mini_etl_spark.maintenance import profile

    plan = plans.physical_plan(profile(sample_df, ["id", "category", "name"]))
    # no Expand: the input is never restreamed once per distinct column
    # (string min/max may still legitimately pick SortAggregate for the
    # single stats pass — the removed tax was Expand × SortAggregate)
    assert "Expand" not in plan, plan


def test_robust_outliers_reuses_cached_median(spark, sample_df):
    from pyspark.sql import functions as F

    from mini_etl_spark.maintenance import robust_outliers

    df = sample_df.select("category", F.col("value").cast("double").alias("v"))
    out = robust_outliers(df, "v", group_col="category", k=3.0)
    plan = plans.physical_plan(out)
    # the median frame is persisted: every reference reads the cache
    assert "InMemoryRelation" in plan, plan
    # ...so the exact-percentile aggregate subtree appears once per stats
    # pass (median inside the cache + the MAD aggregate), never duplicated
    # per broadcast consumer: the table itself is scanned at most 3 times
    # (median build, MAD pass, output pass) instead of the pre-r12 four.
    n_scans = plan.count("Scan ExistingRDD") + plan.count("Scan parquet")
    assert n_scans <= 3, plan
