"""Operator unit tests — golden assertions on tiny frames, mirroring the
reference's per-transformer tests (tests/test_transformers.py:25-373)."""

from __future__ import annotations

import pandas as pd
import pytest

from mini_etl_spark import operators as ops


def test_filter_golden(spark):
    # ⇐ reference: small_df filter value > 15 yields 2 rows (test_transformers.py:28-34)
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3], "value": [10, 20, 30], "name": ["a", "b", "c"]})
    )
    out = ops.filter_rows("value > 15")(df)
    assert out.count() == 2
    assert {r.name for r in out.collect()} == {"b", "c"}


def test_filter_sample_100(spark, sample_df):
    # canonical golden invariant: value > 150 → 49 rows (test_pipeline.py:18-31)
    assert ops.filter_rows("value > 150")(sample_df).count() == 49


def test_rename_and_missing_tolerance(spark, sample_df):
    out = ops.rename_columns({"value": "amount", "nope": "x"})(sample_df)
    assert "amount" in out.columns and "value" not in out.columns
    assert "x" not in out.columns


def test_select_drop(spark, sample_df):
    out = ops.select_columns(["id", "value"])(sample_df)
    assert out.columns == ["id", "value"]
    out2 = ops.drop_columns(["category", "ghost"])(sample_df)
    assert "category" not in out2.columns
    with pytest.raises(ValueError):
        ops.drop_columns(["ghost"], ignore_missing=False)(sample_df)


def test_cast_lenient_coerce_to_null(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"v": ["1", "2", "oops", None], "f": ["1.5", "x", "2.5", "3"]})
    )
    out = ops.cast_types({"v": "int", "f": "float"})(df)
    rows = out.collect()
    assert [r.v for r in rows] == [1, 2, None, None]
    assert [r.f for r in rows] == [1.5, None, 2.5, 3.0]
    assert dict(out.dtypes)["v"] == "bigint"
    assert dict(out.dtypes)["f"] == "double"


def test_cast_datetime(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"d": ["2024-01-02 03:04:05", "not a date"]})
    )
    out = ops.cast_types({"d": "datetime"})(df).collect()
    assert out[0].d is not None and out[1].d is None


def test_fillna_scalar_dict_subset(spark, nulls_df):
    filled = ops.fill_na(0.0)(nulls_df).collect()
    assert all(r.id is not None and r.value is not None for r in filled)
    filled2 = ops.fill_na({"value": -1.0, "name": "missing"})(nulls_df).collect()
    assert sorted(r.value for r in filled2) == [-1.0, -1.0, 10.0, 30.0, 50.0]
    assert "missing" in {r.name for r in filled2}
    filled3 = ops.fill_na(0.0, columns=["value"])(nulls_df).collect()
    assert any(r.id is None for r in filled3)  # id untouched
    assert all(r.value is not None for r in filled3)


def test_fillna_bfill(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"o": [1, 2, 3], "v": [None, None, 30.0]})
    )
    out = ops.fill_na(method="bfill", columns=["v"], order_by="o")(df)
    assert [r.v for r in out.orderBy("o").collect()] == [30.0, 30.0, 30.0]


def test_expression_derive_and_filter(spark):
    df = spark.createDataFrame(pd.DataFrame({"price": [2.0, 3.0], "qty": [5, 10]}))
    out = ops.with_expression("total = price * qty")(df).collect()
    assert [r.total for r in out] == [10.0, 30.0]
    flt = ops.with_expression("price > 2.5", filter_mode=True)(df)
    assert flt.count() == 1


def test_group_agg_names_and_values(spark, sample_df):
    out = ops.group_agg("category", {"value": ["sum", "mean"], "id": "count"})(sample_df)
    assert set(out.columns) == {"category", "value_sum", "value_mean", "id_count"}
    row = {r.category: r for r in out.collect()}
    # category A holds values 100,105,...,195
    assert row["A"].id_count == 20
    assert row["A"].value_sum == sum(range(100, 200, 5))


def test_group_agg_global(spark, sample_df):
    out = ops.group_agg(None, {"value": "sum"})(sample_df).collect()
    assert out[0].value_sum == sum(range(100, 200))


def test_dedup_modes(spark):
    pdf = pd.DataFrame({"k": [1, 1, 2, 3, 3, 3], "o": [2, 1, 9, 5, 4, 6], "x": list("badcef")})
    df = spark.createDataFrame(pdf)
    assert ops.deduplicate(["k"])(df).count() == 3
    first = {(r.k, r.x) for r in ops.deduplicate(["k"], keep="first", order_by="o")(df).collect()}
    assert first == {(1, "a"), (2, "d"), (3, "e")}
    last = {(r.k, r.x) for r in ops.deduplicate(["k"], keep="last", order_by="o")(df).collect()}
    assert last == {(1, "b"), (2, "d"), (3, "f")}
    only = ops.deduplicate(["k"], keep=False)(df)
    assert [r.k for r in only.collect()] == [2]


def test_dedup_full_row(spark):
    df = spark.createDataFrame(pd.DataFrame({"a": [1, 1, 2], "b": ["x", "x", "y"]}))
    assert ops.deduplicate()(df).count() == 2


def test_sort_multi_direction(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"g": [1, 1, 2], "v": [5, 9, 1]})
    )
    rows = ops.sort_rows(["g", "v"], ascending=[True, False])(df).collect()
    assert [(r.g, r.v) for r in rows] == [(1, 9), (1, 5), (2, 1)]


def test_map_batches(spark, sample_df):
    def double(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["id"]].copy()
        out["doubled"] = pdf["value"] * 2
        return out

    out = ops.map_batches(double, "id bigint, doubled bigint")(sample_df)
    got = {r.id: r.doubled for r in out.collect()}
    assert got[1] == 200 and got[100] == 398


def test_limit(spark, sample_df):
    assert ops.limit(7)(sample_df).count() == 7


def test_join_broadcast(spark):
    left = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]}))
    right = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "name": ["a", "b"]}))
    out = ops.join(right, on="k", how="inner", broadcast=True)(left)
    assert out.count() == 2
    outer = ops.join(right, on="k", how="outer")(left)
    assert outer.count() == 3
    anti = ops.join(right, on="k", how="left_anti")(left)
    assert [r.k for r in anti.collect()] == [3]


def test_asof_join(spark):
    from mini_etl_spark.operators import asof_join

    trades = spark.createDataFrame(
        pd.DataFrame({"sym": ["A", "A", "B"], "t": [3, 7, 5], "px": [1.0, 2.0, 3.0]})
    )
    quotes = spark.createDataFrame(
        pd.DataFrame({"sym": ["A", "A", "B", "B"], "t": [2, 6, 1, 9], "bid": [0.9, 1.9, 2.9, 3.9]})
    )
    out = asof_join(trades, quotes, on="t", by="sym").orderBy("sym", "t").collect()
    assert [(r.sym, r.t, r.bid) for r in out] == [("A", 3, 0.9), ("A", 7, 1.9), ("B", 5, 2.9)]
    fwd = asof_join(trades, quotes, on="t", by="sym", direction="forward").orderBy("sym", "t").collect()
    assert [(r.sym, r.t, r.bid) for r in fwd] == [("A", 3, 1.9), ("A", 7, None), ("B", 5, 3.9)]


def test_range_join(spark):
    from mini_etl_spark.operators import range_join

    points = spark.createDataFrame(pd.DataFrame({"x": [1.0, 5.0, 12.0]}))
    ranges = spark.createDataFrame(
        pd.DataFrame({"lo": [0.0, 4.0], "hi": [2.0, 11.0], "tag": ["low", "mid"]})
    )
    out = range_join(points, ranges, "x", "lo", "hi", bucket_width=5.0)
    got = sorted((r.x, r.tag) for r in out.collect())
    assert got == [(1.0, "low"), (5.0, "mid")]


def test_apply_by_group(spark):
    from mini_etl_spark.operators import apply_by_group

    df = spark.createDataFrame(
        pd.DataFrame({"g": [1, 1, 2, 2, 2], "v": [1.0, 3.0, 10.0, 20.0, 30.0]})
    )

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.copy()
        out["v"] = pdf["v"] - pdf["v"].mean()
        return out

    out = apply_by_group("g", demean, "g bigint, v double")(df)
    got = sorted((r.g, r.v) for r in out.collect())
    assert got == [(1, -1.0), (1, 1.0), (2, -10.0), (2, 0.0), (2, 10.0)]


def test_explode_column(spark):
    from mini_etl_spark import operators as ops
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, []), (3, None)], "id int, tags array<string>"
    )
    inner = ops.explode_column("tags", "tag")(df)
    assert sorted((r.id, r.tag) for r in inner.collect()) == [(1, "a"), (1, "b")]
    assert inner.columns == ["id", "tag"]
    outer = ops.explode_column("tags", "tag", outer=True)(df)
    got = sorted((r.id, r.tag) for r in outer.collect())
    assert got == [(1, "a"), (1, "b"), (2, None), (3, None)]


def test_resample_fill_modes(spark):
    """Dense-grid resample over a hand series: bucket flooring, gap
    materialization, and each fill mode's contract."""
    from pyspark.sql import functions as F

    from mini_etl_spark.operators.timeseries import resample

    rows = [
        ("g", "2024-01-01 00:00:30", 10.0),   # bucket :00
        ("g", "2024-01-01 00:00:45", 20.0),   # same bucket → avg 15
        ("g", "2024-01-01 00:04:10", 55.0),   # bucket :04, 3-bucket gap
        ("h", "2024-01-01 00:00:00", 1.0),    # second group, single bucket
    ]
    df = spark.createDataFrame(rows, "g string, ts string, v double") \
        .withColumn("ts", F.to_timestamp("ts"))

    def run(fill):
        out = resample(df, "ts", "v", 60, ["g"], agg="avg", fill=fill)
        return {
            (r.g, r.bucket_ts.strftime("%M")): (r.value, r.n_events)
            for r in out.collect()
        }

    lin = run("linear")
    assert lin[("g", "00")] == (15.0, 2)
    assert lin[("g", "01")] == (25.0, 0)   # 15 → 55 over 4 steps
    assert lin[("g", "02")] == (35.0, 0)
    assert lin[("g", "03")] == (45.0, 0)
    assert lin[("g", "04")] == (55.0, 1)
    assert lin[("h", "00")] == (1.0, 1)
    assert len(lin) == 6                   # grid spans min..max per group

    ff = run("ffill")
    assert ff[("g", "02")] == (15.0, 0)
    zero = run("zero")
    assert zero[("g", "02")] == (0.0, 0)
    none = run("none")
    assert none[("g", "02")] == (None, 0)
    with pytest.raises(ValueError):
        resample(df, "ts", "v", 60, fill="bogus")
    with pytest.raises(ValueError):
        resample(df, "ts", "v", 60, agg="median")


def test_asof_join_carries_whole_row_with_nulls(spark):
    """The attached right row must be atomic: a NULL field in the most
    recent right row must NOT fall back to an older row's value (the
    per-column ignorenulls stitch bug)."""
    from mini_etl_spark.operators.joins import asof_join

    left = spark.createDataFrame([(3, "L")], "t bigint, tag string")
    right = spark.createDataFrame(
        [(1, 10.0, 5), (2, None, 7)], "t bigint, price double, qty bigint"
    )
    row = asof_join(left, right, on="t").first()
    # most recent right row at t<=3 is (2, NULL, 7) — price must be NULL
    assert row.qty == 7 and row.price is None

    # forward direction: earliest right row >= t, atomically
    left2 = spark.createDataFrame([(0, "L")], "t bigint, tag string")
    row2 = asof_join(left2, right, on="t", direction="forward").first()
    assert row2.price == 10.0 and row2.qty == 5


def test_rolling_window_time_range(spark):
    """Trailing time-RANGE frame on a hand series: inclusive 1h boundary,
    peers share a frame, per-partition isolation."""
    from pyspark.sql import functions as F

    from mini_etl_spark.operators.timeseries import rolling_window

    rows = [
        (1, "u", "2024-01-01 00:00:00", 10.0),
        (2, "u", "2024-01-01 00:30:00", 20.0),
        (3, "u", "2024-01-01 01:00:00", 5.0),   # exactly 1h after row 1 → includes it
        (4, "u", "2024-01-01 02:30:01", 7.0),   # everything else out of range
        (5, "u", "2024-01-01 02:30:01", 3.0),   # peer timestamp → shared frame
        (6, "v", "2024-01-01 00:45:00", 100.0), # other partition untouched
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r.event_id: (r.value_rolling_sum, r.value_rolling_count)
        for r in rolling_window(
            df, "ts", "value", 3600, ["user_id"], aggs=("sum", "count")
        ).collect()
    }
    assert out[1] == (10.0, 1)
    assert out[2] == (30.0, 2)
    assert out[3] == (35.0, 3)       # 1h-ago row included (inclusive bound)
    assert out[4] == (10.0, 2)       # peers 4+5 share the frame
    assert out[5] == (10.0, 2)
    assert out[6] == (100.0, 1)
    with pytest.raises(ValueError):
        rolling_window(df, "ts", "value", 3600, aggs=("median",))


def test_key_skew_stats(spark):
    """Heavy-hitter diagnostic: counts, shares, ordering, top-n cut."""
    from pyspark.sql import functions as F

    from mini_etl_spark.operators.skew import key_skew_stats

    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1, "k string"
    )
    out = key_skew_stats(df, "k", top_n=2).collect()
    assert [(r.k, r.key_count, r.key_share) for r in out] == [
        ("a", 6, 0.6),
        ("b", 3, 0.3),
    ]
    with pytest.raises(ValueError):
        key_skew_stats(df, "k", top_n=0)
