"""Row-level validation / quarantine (operators.validate) and the SCD-2
point-in-time snapshot (operators.merge.scd2_snapshot)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from mini_etl_spark.operators.merge import scd2_snapshot
from mini_etl_spark.operators.validate import (
    quarantine_stats,
    split_valid,
    validate_rows,
)

RULES = {
    "amount_positive": "amount > 0",
    "name_present": "name IS NOT NULL AND length(name) > 0",
    "qty_bounded": "qty BETWEEN 0 AND 100",
}


def _frame(spark):
    return spark.createDataFrame(
        [
            (1, "ok", 10.0, 5),
            (2, "", 3.0, 5),  # name_present fails
            (3, "neg", -1.0, 5),  # amount_positive fails
            (4, None, None, 500),  # all three fail (NULLs count as violations)
            (5, "fine", 0.5, 100),
        ],
        "id int, name string, amount double, qty int",
    )


def test_validate_rows_labels_in_rule_order(spark):
    out = validate_rows(_frame(spark), RULES)
    got = {r["id"]: r["violations"] for r in out.collect()}
    assert got == {
        1: [],
        2: ["name_present"],
        3: ["amount_positive"],
        4: ["amount_positive", "name_present", "qty_bounded"],
        5: [],
    }


def test_validate_rows_null_expression_is_violation(spark):
    # amount IS NULL → `amount > 0` is NULL → violation, not pass.
    out = validate_rows(_frame(spark), {"pos": "amount > 0"})
    assert out.filter("id = 4").first()["violations"] == ["pos"]


def test_split_valid_partitions_rows_and_preserves_schema(spark):
    df = _frame(spark)
    valid, quarantine = split_valid(df, RULES)
    assert valid.columns == df.columns  # label dropped on the clean side
    assert "violations" in quarantine.columns
    assert sorted(r["id"] for r in valid.collect()) == [1, 5]
    assert sorted(r["id"] for r in quarantine.collect()) == [2, 3, 4]
    # no row lost, no row duplicated
    assert valid.count() + quarantine.count() == df.count()


def test_quarantine_stats_one_pass_counts(spark):
    out = quarantine_stats(_frame(spark), RULES)
    got = {r["rule"]: (r["violation_count"], r["row_count"]) for r in out.collect()}
    assert got == {
        "amount_positive": (2, 5),
        "name_present": (2, 5),
        "qty_bounded": (1, 5),
    }


def test_validate_rows_empty_rules_raises(spark):
    with pytest.raises(ValueError):
        validate_rows(_frame(spark), {})


def test_validate_is_pure_projection(spark):
    plan = validate_rows(
        _frame(spark), RULES
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle for labeling


def test_config_validate_modes(spark, tmp_path):
    from mini_etl_spark.config import ConfigLoader

    src = str(tmp_path / "in.parquet")
    _frame(spark).write.parquet(src)
    out = str(tmp_path / "out.parquet")
    cfg = {
        "pipeline": {
            "name": "validate-e2e",
            "source": {"type": "parquet", "path": src},
            "transformers": [
                {"type": "validate", "rules": dict(RULES), "mode": "filter"}
            ],
            "sink": {"type": "parquet", "path": out, "mode": "w"},
        }
    }
    loader = ConfigLoader()
    loader.build_pipeline(loader.parse(cfg)).run(spark)
    got = spark.read.parquet(out)
    assert sorted(r["id"] for r in got.collect()) == [1, 5]


# ---------------------------------------------------------------- scd2 snapshot


def _dim(spark):
    d = datetime.date
    return spark.createDataFrame(
        [
            # key 1: two closed versions + one current
            (1, "a-v1", d(2020, 1, 1), d(2021, 1, 1), False),
            (1, "a-v2", d(2021, 1, 1), d(2022, 6, 1), False),
            (1, "a-v3", d(2022, 6, 1), None, True),
            # key 2: appears mid-2021
            (2, "b-v1", d(2021, 7, 1), None, True),
        ],
        "k int, val string, valid_from date, valid_to date, is_current boolean",
    )


def test_scd2_snapshot_picks_covering_version(spark):
    snap = scd2_snapshot(_dim(spark), datetime.date(2021, 3, 1))
    got = {r["k"]: r["val"] for r in snap.collect()}
    assert got == {1: "a-v2"}  # key 2 not yet effective


def test_scd2_snapshot_boundary_is_from_inclusive_to_exclusive(spark):
    # at exactly 2021-01-01, v1 (closed AT that date) is superseded by v2
    snap = scd2_snapshot(_dim(spark), datetime.date(2021, 1, 1))
    assert {r["val"] for r in snap.filter("k = 1").collect()} == {"a-v2"}


def test_scd2_snapshot_current_and_drop_validity(spark):
    snap = scd2_snapshot(
        _dim(spark), datetime.date(2024, 1, 1), drop_validity=True
    )
    assert set(snap.columns) == {"k", "val"}
    assert {r["k"]: r["val"] for r in snap.collect()} == {1: "a-v3", 2: "b-v1"}


def test_scd2_snapshot_at_most_one_version_per_key(spark):
    # property: on a well-formed dimension, every as-of yields ≤1 row/key
    for day in [datetime.date(2020, 6, 1), datetime.date(2021, 12, 31),
                datetime.date(2022, 6, 1)]:
        snap = scd2_snapshot(_dim(spark), day)
        dup = snap.groupBy("k").count().filter("count > 1").count()
        assert dup == 0
