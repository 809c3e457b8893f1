"""merge_upsert / scd2_apply unit coverage (ADVICE round-2 items).

The oracle queries (`upsert`, `scd2` in __spark_entry__.py) exercise the
broadcast happy path on TPC-H-shaped data; these tests pin the corner
semantics: matched-only delete, duplicate delta keys, out-of-order deltas,
and broadcast_delta=False plan equivalence.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_etl_spark.operators.merge import merge_upsert, scd2_apply


def _target(spark):
    return spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0), (3, "carol", 30.0)],
        "k int, name string, bal double",
    )


def _delta(spark):
    # k=2 matched+update, k=3 matched+delete-eligible, k=9 new key that ALSO
    # satisfies the delete predicate (must still be inserted).
    return spark.createDataFrame(
        [(2, "bob2", 999.0), (3, "carol", 999.0), (9, "zed", 999.0)],
        "k int, name string, bal double",
    )


def test_upsert_delete_only_applies_to_matched_rows(spark):
    out = merge_upsert(
        _target(spark), _delta(spark), keys="k", delete_condition="bal > 500"
    )
    rows = {r["k"]: (r["name"], r["bal"]) for r in out.collect()}
    # k=1 untouched, k=2 and k=3 matched-and-deleted, k=9 new → inserted
    # even though it satisfies the delete predicate.
    assert rows == {1: ("alice", 10.0), 9: ("zed", 999.0)}


def test_upsert_matched_non_deleted_row_is_updated(spark):
    out = merge_upsert(
        _target(spark), _delta(spark), keys="k", delete_condition="bal > 5000"
    )
    rows = {r["k"]: (r["name"], r["bal"]) for r in out.collect()}
    assert rows == {
        1: ("alice", 10.0),
        2: ("bob2", 999.0),
        3: ("carol", 999.0),
        9: ("zed", 999.0),
    }


def test_upsert_broadcast_false_matches_broadcast_true(spark):
    kw = dict(keys="k", delete_condition="bal > 500")
    a = merge_upsert(_target(spark), _delta(spark), broadcast_delta=True, **kw)
    b = merge_upsert(_target(spark), _delta(spark), broadcast_delta=False, **kw)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def _scd2_target(spark):
    return spark.createDataFrame(
        [(1, "A", "2020-01-01 00:00:00", None, True),
         (2, "B", "2020-01-01 00:00:00", None, True)],
        "k int, seg string, valid_from string, valid_to string, is_current boolean",
    ).select(
        "k", "seg",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
        "is_current",
    )


def test_scd2_duplicate_delta_keys_deduped_to_latest(spark):
    delta = spark.createDataFrame(
        [(1, "X", "2021-01-01 00:00:00"), (1, "Y", "2021-06-01 00:00:00")],
        "k int, seg string, eff string",
    ).withColumn("eff", F.col("eff").cast("timestamp"))
    out = scd2_apply(
        _scd2_target(spark), delta, keys="k",
        compare_cols=["seg"], effective_col="eff",
    )
    cur = {r["k"]: r["seg"] for r in out.filter("is_current").collect()}
    assert cur == {1: "Y", 2: "B"}  # latest-per-key wins, exactly one current
    assert out.filter("is_current").count() == 2
    closed = out.filter("NOT is_current").collect()
    assert len(closed) == 1 and str(closed[0]["valid_to"]).startswith("2021-06-01")


def test_scd2_out_of_order_delta_raises(spark):
    delta = spark.createDataFrame(
        [(1, "X", "2019-06-01 00:00:00")],  # earlier than valid_from 2020-01-01
        "k int, seg string, eff string",
    ).withColumn("eff", F.col("eff").cast("timestamp"))
    out = scd2_apply(
        _scd2_target(spark), delta, keys="k",
        compare_cols=["seg"], effective_col="eff",
    )
    with pytest.raises(Exception, match="out-of-order"):
        out.collect()


def test_scd2_broadcast_false_matches_broadcast_true(spark):
    delta = spark.createDataFrame(
        [(1, "X", "2021-01-01 00:00:00"), (3, "C", "2021-01-01 00:00:00")],
        "k int, seg string, eff string",
    ).withColumn("eff", F.col("eff").cast("timestamp"))
    kw = dict(keys="k", compare_cols=["seg"], effective_col="eff")
    a = scd2_apply(_scd2_target(spark), delta, broadcast_delta=True, **kw)
    b = scd2_apply(_scd2_target(spark), delta, broadcast_delta=False, **kw)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_snapshot_diff_labels_and_values(spark):
    from mini_etl_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0), (3, "carol", None),
         (4, "dave", 40.0)],
        "k int, name string, bal double",
    )
    new = spark.createDataFrame(
        [(1, "alice", 10.0),        # unchanged → dropped
         (2, "bob", 25.0),          # update (value change)
         (3, "carol", None),        # unchanged incl. null == null → dropped
         (5, "erin", 50.0)],        # insert; 4 missing → delete
        "k int, name string, bal double",
    )
    out = {r.k: (r.change_type, r.name, r.bal)
           for r in snapshot_diff(old, new, "k").collect()}
    assert out == {
        2: ("update", "bob", 25.0),   # new side's values
        4: ("delete", "dave", 40.0),  # old side's values
        5: ("insert", "erin", 50.0),
    }
    # restricting compare columns hides the bal-only update
    only_name = {r.k for r in
                 snapshot_diff(old, new, "k", compare_columns=["name"]).collect()}
    assert only_name == {4, 5}
    with pytest.raises(ValueError):
        snapshot_diff(old, new, "k", compare_columns=["nope"])
