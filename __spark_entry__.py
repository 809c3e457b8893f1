"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H Q1 shape) on sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query key.

Column-name discipline: every computed column is aliased identically in the
Spark code and the oracle SQL; float aggregates are rounded on both sides;
temporal outputs are formatted to strings so value hashing is
representation-stable across engines.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mini_etl_spark import operators as ops
from mini_etl_spark.sources import read_parquet


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Defensive runtime confs: the driver may run these queries in its own
    # session. UTC keeps temporal output stable vs the DuckDB oracle;
    # non-ANSI keeps casts lenient (the engine's documented semantics).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    # events.ts is TIMESTAMP(NANOS) parquet, which Spark's reader rejects;
    # read as int64 nanos and convert (see sources.files.read_parquet).
    ns_cols = ["ts"] if name == "events" else None
    return read_parquet(f"{sf_dir}/{name}.parquet", ns_timestamp_columns=ns_cols)(spark)


#: per-(kind, sf_dir) temp index dirs — see _per_process_index_dir
_TMP_INDEX_DIRS: dict = {}


def _per_process_index_dir(kind: str, sf_dir: str) -> tuple[str, bool]:
    """Temp dir for an index-backed query, unique to THIS process (no
    cross-process fixed-path race) and allocated at most once per
    process — bench/scale sweeps call each query several times
    (warm + timed + re-measure) and a fresh mkdtemp per call leaked one
    full index of parquet per invocation. Registered for removal at
    interpreter exit. Returns (path, fresh): build the index only when
    fresh (the probes are read-only, so reuse is result-identical)."""
    key = (kind, sf_dir)
    if key in _TMP_INDEX_DIRS:
        return _TMP_INDEX_DIRS[key], False
    import atexit
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix=f"mini_etl_{kind}_")
    _TMP_INDEX_DIRS[key] = path
    atexit.register(shutil.rmtree, path, True)
    return path, True


# ---------------------------------------------------------------------------
# Reference-parity queries (SURVEY §2.2/§2.3 operators)
# ---------------------------------------------------------------------------

def q_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_agg (global) — TPC-H Q1 shape; names follow the reference's
    `{col}_{fn}` flattening (transformers.py:371-377)."""
    df = _t(spark, sf_dir, "lineitem")
    df = ops.filter_rows("l_shipdate <= timestamp'1998-09-02 00:00:00'")(df)
    df = ops.group_agg(
        ["l_returnflag", "l_linestatus"],
        {"l_quantity": ["sum", "mean"], "l_extendedprice": "sum", "l_orderkey": "count"},
    )(df)
    return df.select(
        "l_returnflag",
        "l_linestatus",
        F.round("l_quantity_sum", 2).alias("l_quantity_sum"),
        F.round("l_quantity_mean", 4).alias("l_quantity_mean"),
        F.round("l_extendedprice_sum", 2).alias("l_extendedprice_sum"),
        "l_orderkey_count",
    )


def q_filter_expression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter_rows + with_expression — TPC-H Q6 shape (revenue aggregate)."""
    df = _t(spark, sf_dir, "lineitem")
    df = ops.filter_rows(
        "l_discount >= 0.05 and l_discount <= 0.07 and l_quantity < 24"
    )(df)
    df = ops.with_expression("revenue = l_extendedprice * l_discount")(df)
    df = ops.group_agg(None, {"revenue": "sum", "l_orderkey": "count"})(df)
    return df.select(
        F.round("revenue_sum", 2).alias("revenue_sum"),
        F.col("l_orderkey_count").alias("n_rows"),
    )


def q_select_rename_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """select_columns + rename_columns + with_expression projection."""
    df = _t(spark, sf_dir, "orders")
    df = ops.select_columns(["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])(df)
    df = ops.rename_columns({"o_totalprice": "total_price"})(df)
    df = ops.with_expression("order_month = date_format(o_orderdate, 'yyyy-MM')")(df)
    df = ops.drop_columns(["o_orderdate"])(df)
    return df


def q_cast_lenient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cast_types — lenient coerce-to-null semantics (try_cast): a
    non-numeric string column casts to null, never errors."""
    df = _t(spark, sf_dir, "orders")
    df = ops.select_columns(["o_orderkey", "o_orderpriority", "o_totalprice"])(df)
    df = ops.cast_types({"o_orderpriority": "int", "o_totalprice": "int"})(df)
    df = ops.rename_columns(
        {"o_orderpriority": "priority_as_int", "o_totalprice": "price_as_int"}
    )(df)
    return df


def q_fillna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fill_na — scalar fill on a derived nullable column."""
    df = _t(spark, sf_dir, "orders")
    df = ops.with_expression(
        "big_price = if(o_totalprice > 150000, o_totalprice, null)"
    )(df)
    df = ops.select_columns(["o_orderkey", "big_price"])(df)
    df = ops.fill_na(-1.0, columns=["big_price"])(df)
    df = ops.with_expression("big_price = round(big_price, 2)")(df)
    return df


def q_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """deduplicate keep='first' with explicit ordering (SURVEY §4.3.3)."""
    df = _t(spark, sf_dir, "orders")
    df = ops.deduplicate(subset=["o_custkey"], keep="first", order_by="o_orderkey")(df)
    df = ops.select_columns(["o_custkey", "o_orderkey", "o_orderstatus"])(df)
    return df


def q_dedup_unique_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """deduplicate keep=False — keep keys appearing exactly once."""
    df = _t(spark, sf_dir, "orders")
    df = ops.deduplicate(subset=["o_custkey"], keep=False)(df)
    df = ops.select_columns(["o_custkey", "o_orderkey"])(df)
    return df


def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sort_rows — global sort (range partition + local sort)."""
    df = _t(spark, sf_dir, "customer")
    df = ops.sort_rows(["c_acctbal", "c_custkey"], ascending=[False, True])(df)
    df = ops.select_columns(["c_custkey", "c_name", "c_acctbal"])(df)
    return df


def q_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join — star-schema join with broadcast dimensions (customer ⋈ nation
    ⋈ region), then group-agg. The fact side never shuffles for the joins."""
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    df = ops.join(
        nation.withColumnRenamed("n_nationkey", "c_nationkey"),
        on="c_nationkey", how="inner", broadcast=True,
    )(customer)
    df = ops.join(
        region.withColumnRenamed("r_regionkey", "n_regionkey"),
        on="n_regionkey", how="inner", broadcast=True,
    )(df)
    df = ops.group_agg("r_name", {"c_acctbal": ["sum", "mean"], "c_custkey": "count"})(df)
    return df.select(
        "r_name",
        F.round("c_acctbal_sum", 2).alias("c_acctbal_sum"),
        F.round("c_acctbal_mean", 4).alias("c_acctbal_mean"),
        "c_custkey_count",
    )


def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join how='outer' — the reference DAG's only join type (dag.py:356-365):
    customers full-outer joined to their order counts."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = ops.group_agg("o_custkey", {"o_orderkey": "count", "o_totalprice": "sum"})(orders)
    per_cust = per_cust.withColumnRenamed("o_custkey", "c_custkey")
    df = ops.join(per_cust, on="c_custkey", how="outer")(customer)
    df = ops.fill_na(0, columns=["o_orderkey_count"])(df)
    return df.select(
        "c_custkey",
        F.col("o_orderkey_count").alias("n_orders"),
        F.round("o_totalprice_sum", 2).alias("total_spent"),
    )


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way fact join (customer ⋈ orders ⋈ lineitem) with
    selective filters + revenue agg + top-10. The two fact joins are
    sort-merge on their keys; the final top-k is TakeOrderedAndProject."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    df = (
        customer.filter("c_mktsegment = 'BUILDING'")
        .join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .filter("o_orderdate < timestamp'1995-03-15 00:00:00'")
        .filter("l_shipdate > timestamp'1995-03-15 00:00:00'")
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )
    return df


def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join (lineitem ⋈ orders ⋈ customer ⋈
    supplier ⋈ nation ⋈ region) with broadcast dimensions."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    df = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .filter(customer.c_nationkey == supplier.s_nationkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    return df


def q_union_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAG CONCAT (unionByName, dag.py:349-354) + UNION (concat+dedup,
    dag.py:60 — declared but unimplemented in the reference; implemented
    properly here): re-concatenate two overlapping slices of supplier."""
    supplier = _t(spark, sf_dir, "supplier")
    lo = ops.filter_rows("s_suppkey <= 60")(supplier)
    hi = ops.filter_rows("s_suppkey > 40")(supplier)
    both = lo.unionByName(hi).dropDuplicates(["s_suppkey"])
    return both.select("s_suppkey", "s_name", "s_nationkey")


def q_expression_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """with_expression row-level derive — revenue per lineitem row."""
    # revenue in integer cents: floor(x*100 + 0.5) is bit-deterministic across
    # engines given identical double inputs, unlike round() whose half-tie
    # behavior differs (Spark HALF_UP vs pandas half-even vs libm).
    df = _t(spark, sf_dir, "lineitem")
    df = ops.with_expression(
        "revenue_cents = cast(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) as bigint)"
    )(df)
    df = ops.select_columns(["l_orderkey", "l_linenumber", "revenue_cents"])(df)
    return df


def q_map_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_batches (LambdaTransformer / mapInPandas) — pandas logic per Arrow
    batch, verified against the equivalent SQL expression."""
    import pandas as pd

    import numpy as np

    def _derive(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["l_orderkey", "l_linenumber"]].copy()
        charge = pdf["l_extendedprice"] * (1 - pdf["l_discount"]) * (1 + pdf["l_tax"])
        # integer cents via floor(x*100+0.5): deterministic across engines
        out["charge_cents"] = np.floor(charge * 100 + 0.5).astype("int64")
        return out

    df = _t(spark, sf_dir, "lineitem")
    df = ops.map_batches(
        _derive, "l_orderkey bigint, l_linenumber int, charge_cents bigint"
    )(df)
    return df


def q_schema_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SchemaValidator coercion (schema.py): lenient casts + injected
    default column + schema-ordered projection."""
    from mini_etl_spark.schema import Schema, SchemaValidator

    df = _t(spark, sf_dir, "supplier")
    schema = Schema.from_dict(
        {
            "s_suppkey": "int",
            "s_name": "str",
            "s_acctbal": "int",                       # double→int lenient cast (truncates)
            "s_region": {"dtype": "str", "default": "UNKNOWN"},  # injected
        },
        strict=True,
    )
    return SchemaValidator(schema, coerce=True).validate(df)


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators (Spark superset; the reference only had concat):
    INTERSECT and EXCEPT of two supplier slices, tagged and unioned."""
    supplier = _t(spark, sf_dir, "supplier")
    lo = supplier.filter("s_suppkey <= 60").select("s_suppkey", "s_name")
    hi = supplier.filter("s_suppkey > 40").select("s_suppkey", "s_name")
    both = lo.intersect(hi).withColumn("tag", F.lit("both"))
    only_lo = lo.exceptAll(hi).withColumn("tag", F.lit("lo_only"))
    return both.unionByName(only_lo)


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (nunique → countDistinct)."""
    df = _t(spark, sf_dir, "lineitem")
    df = ops.group_agg(
        "l_returnflag", {"l_orderkey": "nunique", "l_suppkey": "nunique"}
    )(df)
    return df


def q_group_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score of order totals within each customer's order history.

    Was an `ops.apply_by_group` (applyInPandas) demo: ~100k tiny customer
    groups each paid the per-group pandas call + frame construction toll —
    14.7s of pure Python-boundary overhead at sf0.1 for a computation the
    window engine does in 0.38s (optimization guide §4.1: grouped UDF →
    built-ins). The native form replicates the pandas float chain exactly:
    `rint(z*1e4)/1e4` is numpy's scale-rint-descale half-even round, and
    non-finite z (single-row group → NULL stddev_samp; zero variance →
    ±inf) maps to NULL like the old `where(isfinite)` — bit-identical on
    all 150k rows at sf0.1. `apply_by_group` itself stays in the library
    for genuinely non-relational group transforms (pytest-covered)."""
    from pyspark.sql import Window

    df = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    raw = (
        F.col("o_totalprice") - F.avg("o_totalprice").over(w)
    ) / F.stddev_samp("o_totalprice").over(w)
    z = F.rint(raw * F.lit(10000.0)) / F.lit(10000.0)
    return df.select(
        "o_orderkey",
        "o_custkey",
        F.when(F.isnan(z) | (F.abs(z) == float("inf")), F.lit(None).cast("double"))
        .otherwise(z)
        .alias("z"),
    )


def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregation over the events table (batch form of the
    streaming tumbling window)."""
    df = _t(spark, sf_dir, "events")
    df = df.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("value_sum"),
    )
    return df


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (window function extension): top 3 customers by
    account balance per nation."""
    from pyspark.sql import Window

    df = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    # row_number is int in Spark but BIGINT in SQL engines — align width
    df = df.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= 3
    )
    return df.select("c_nationkey", "rank", "c_custkey", "c_acctbal")


# ---------------------------------------------------------------------------
# Window / time-series / advanced-join queries (Spark supersets of the
# reference, each with a DuckDB oracle)
# ---------------------------------------------------------------------------

def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (lag + gap cumsum) over events — the bounded
    twin of the streaming session window (streaming/events.py)."""
    from mini_etl_spark.streaming import batch_sessionize

    events = _t(spark, sf_dir, "events")
    out = batch_sessionize(events, gap_minutes=30)
    return out.select(
        "user_id",
        "session_seq",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
        "value_sum",
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/joins.py): each click event picks up the value
    of the user's most recent purchase at-or-before it. One shuffle on
    (user_id, ts) — Spark has no native as-of join; DuckDB's ASOF JOIN is
    the oracle."""
    from mini_etl_spark.operators import asof_join

    events = _t(spark, sf_dir, "events")
    clicks = events.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    purchases = (
        events.filter("event_type = 'purchase'")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 2).alias("purchase_value"))
    )
    joined = asof_join(clicks, purchases, on="ts", by="user_id")
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "purchase_value",
    )


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketized range join (operators/joins.py): lineitem quantities into
    static bands — the equi-join-on-bucket decomposition, verified against
    DuckDB's plain BETWEEN join."""
    from mini_etl_spark.operators import range_join

    lineitem = _t(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        [(0.0, 9.999, "low"), (10.0, 24.999, "mid"), (25.0, 100.0, "high")],
        "lo double, hi double, band string",
    )
    joined = range_join(lineitem, bands, "l_quantity", "lo", "hi", bucket_width=10.0)
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("qty_sum"),
    )


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: l_linestatus values to columns (reference has no pivot; free
    superset via DataFrame API)."""
    df = _t(spark, sf_dir, "lineitem")
    out = (
        df.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_filled")
    )
    return out.na.fill({"qty_open": 0.0, "qty_filled": 0.0})


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (flag → flag+status → grand total)."""
    df = _t(spark, sf_dir, "lineitem")
    return (
        df.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.round(F.sum("l_quantity"), 2).alias("qty_sum"))
        .na.fill({"l_returnflag": "(all)", "l_linestatus": "(all)"})
    )


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) — all four grouping-set combos in
    one pass (Expand + single hash aggregate, not four scans)."""
    df = _t(spark, sf_dir, "lineitem")
    return (
        df.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 2).alias("price_sum"),
        )
        .na.fill({"l_returnflag": "(all)", "l_linestatus": "(all)"})
    )


def q_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation + distribution window functions: per customer, each
    order's gap in days from the previous order (lag), the next total
    (lead), and the spend quartile (ntile) — one window partitioned by
    customer, single shuffle."""
    from pyspark.sql import Window

    df = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return df.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            "o_orderdate", F.lag("o_orderdate").over(w)
        ).cast("long").alias("days_since_prev"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_total"),
        F.ntile(4).over(
            Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
        ).cast("long").alias("spend_quartile"),
    )


def q_running_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-supplier quantity cumsum ordered by ship date — frame-
    bounded window function (reference has no window functions at all)."""
    from pyspark.sql import Window

    df = _t(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w), 2).alias("running_qty"),
    )


def q_fillna_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional fill (fill_na method='ffill') with explicit ordering and
    partitioning — the order-dependent operator done right (SURVEY §4.3.3)."""
    events = _t(spark, sf_dir, "events")
    sparse = events.withColumn(
        "purchase_value",
        F.when(F.col("event_type") == "purchase", F.round("value", 2)),
    )
    filled = ops.fill_na(
        method="ffill",
        columns=["purchase_value"],
        order_by=["ts", "event_id"],
        partition_by="user_id",
    )(sparse)
    return filled.select("event_id", "user_id", "purchase_value")


def q_part_type_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dimension revenue rollup through the part table (broadcast
    dim join; the fact side never shuffles for the join) — TPC-H Q14/Q17
    flavor over the available columns."""
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    df = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_type", "p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_retail"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    return df


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti-join (TPC-H Q22 flavor): high-balance customers with NO
    orders, past a scalar-subquery threshold (global mean of positive
    balances). Plans as scalar subquery + broadcast/shuffle LeftAnti —
    plan shapes none of the other queries exercise."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = (
        customer.filter("c_acctbal > 0.0")
        .agg(F.avg("c_acctbal").alias("a"))
        .first()["a"]
    )
    rich = customer.filter(F.col("c_acctbal") > avg_bal)
    out = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return out.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
    )


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi-join: customers having ≥1 large-quantity order line
    (EXISTS shape) — the dedup-free existence test."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    big = lineitem.filter("l_quantity >= 49")
    big_orders = orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
    out = customer.join(
        big_orders, customer.c_custkey == big_orders.o_custkey, "left_semi"
    )
    return out.select("c_custkey", "c_name")


def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS rewritten as a left-semi join with a
    compound (equi + range) condition — orders in a quarter that had at
    least one line shipped after the order date. The semi join shuffles
    once on the order key and never materializes lineitem columns."""
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    o = orders.filter(
        "o_orderdate >= timestamp'1996-01-01 00:00:00'"
        " and o_orderdate < timestamp'1996-04-01 00:00:00'"
    )
    df = (
        o.join(
            lineitem,
            (o.o_orderkey == lineitem.l_orderkey)
            & (lineitem.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )
    return df


def q_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item reporting — customers ranked by
    revenue lost to returns in a half-year window. Fact joins are
    sort-merge on their keys, nation is broadcast, final top-20 is
    TakeOrderedAndProject (no global sort)."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    nation = _t(spark, sf_dir, "nation")
    df = (
        lineitem.filter("l_returnflag = 'R'")
        .join(
            orders.filter(
                "o_orderdate >= timestamp'1996-01-01 00:00:00'"
                " and o_orderdate < timestamp'1996-07-01 00:00:00'"
            ),
            lineitem.l_orderkey == orders.o_orderkey,
        )
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )
    return df


def q_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: no l_shipmode column — grouped by
    l_linestatus): conditional CASE aggregation splitting shipped lines
    into high/low order-priority counts within a ship-date year."""
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    df = (
        lineitem.filter(
            "l_shipdate >= timestamp'1997-01-01 00:00:00'"
            " and l_shipdate < timestamp'1998-01-01 00:00:00'"
        )
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )
    return df


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share for one ship month —
    conditional revenue ratio over the lineitem ⋈ part join. part is a
    true dimension-to-fact join on the part key (AQE picks the strategy:
    broadcast at test scale, shuffle join at 100 TB)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    df = (
        lineitem.filter(
            "l_shipdate >= timestamp'1997-09-01 00:00:00'"
            " and l_shipdate < timestamp'1997-10-01 00:00:00'"
        )
        .join(part, lineitem.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )
    return df


def q_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    ranges as a join residual — the classic constraint-propagation probe
    (Catalyst extracts the common p_brand IN / quantity range predicates
    and pushes them below the join)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = lineitem.join(part, lineitem.l_partkey == part.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(20, 30)
        )
    )
    df = j.filter(clause).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return df


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume — supplier nation vs customer
    nation for two fixed nations, by ship year. The same broadcast
    dimension (nation) joins twice under different aliases; the
    nation-pair disjunction is a post-join residual on broadcast columns."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    df = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), supplier.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), customer.c_nationkey == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return df


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) whose revenue equals the maximum
    supplier revenue — aggregate → scalar max (SQL scalar subquery, a
    separate tiny job) → equality filter, ties kept like the SQL."""
    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    rev = (
        lineitem.filter(
            "l_shipdate >= timestamp'1996-01-01 00:00:00'"
            " and l_shipdate < timestamp'1996-04-01 00:00:00'"
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    rev.createOrReplaceTempView("v_q15_revenue")
    supplier.createOrReplaceTempView("v_q15_supplier")
    return spark.sql(
        """
        SELECT s_suppkey, s_name, total_revenue
        FROM v_q15_supplier
        JOIN v_q15_revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM v_q15_revenue)
        """
    )


def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer — left outer
    join (customers with zero orders kept) → per-customer count → count
    histogram. Two aggregates; the second one's input is already tiny."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier-nation's share of PROMO-part volume
    sold into one region, by order year — two nation roles (customer side
    restricts to the region, supplier side labels the share), conditional
    ratio aggregate."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    part = _t(spark, sf_dir, "part")
    n1 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    df = (
        lineitem.join(
            F.broadcast(part.filter("p_type = 'PROMO'")),
            lineitem.l_partkey == F.col("p_partkey"),
        )
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), customer.c_nationkey == F.col("cn_key"))
        .join(
            F.broadcast(region.filter("r_name = 'EUROPE'")),
            F.col("cn_region") == F.col("r_regionkey"),
        )
        .join(F.broadcast(n2), supplier.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )
    return df


def q_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: lateness = shipped >60 days after the
    order date): suppliers who were the SOLE late shipper in a
    multi-supplier order. The gnarliest subquery pattern — correlated
    EXISTS (another supplier in the order) AND NOT EXISTS (another LATE
    supplier) over the same fact — expressed through the SQL surface so
    Catalyst decorrelates them into one semi and one anti join."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supplier = _t(spark, sf_dir, "supplier")
    lineitem.join(
        orders.select("o_orderkey", "o_orderdate"),
        lineitem.l_orderkey == F.col("o_orderkey"),
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate").createOrReplaceTempView(
        "v_q21_lines"
    )
    supplier.createOrReplaceTempView("v_q21_supplier")
    return spark.sql(
        """
        SELECT s_name, count(*) AS numwait
        FROM v_q21_lines l1
        JOIN v_q21_supplier ON l1.l_suppkey = s_suppkey
        WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM v_q21_lines l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM v_q21_lines l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l3.o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
        """
    )


def q_cheapest_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp table — lineitem stands in): rows whose
    price equals the per-part minimum, i.e. a correlated scalar subquery
    hand-decorrelated the way Catalyst itself would: per-key aggregate +
    equi join back on (key, min). Ties keep all rows, matching the SQL."""
    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    mins = lineitem.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    df = (
        lineitem.join(
            mins,
            (lineitem.l_partkey == mins.mk)
            & (lineitem.l_extendedprice == mins.min_price),
        )
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            "s_name",
            F.round("l_extendedprice", 2).alias("best_price"),
        )
    )
    return df


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lines below 20% of their part's average quantity —
    the correlated avg subquery decorrelated into a per-part aggregate
    joined back, then a single global sum. Output is one row."""
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    avgs = lineitem.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cap")
    )
    df = (
        lineitem.join(F.broadcast(part.filter("p_brand = 'Brand#12'")),
                      lineitem.l_partkey == F.col("p_partkey"))
        .join(avgs, lineitem.l_partkey == avgs.ak)
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    return df


def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a
    threshold (HAVING over a pre-aggregate), joined back to orders and
    customer. The quantity rollup shuffles once on the order key; the
    HAVING filter shrinks the join input before the fact join."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    big = (
        lineitem.groupBy(F.col("l_orderkey").alias("bk"))
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    df = (
        orders.join(big, orders.o_orderkey == big.bk)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
    )
    return df


def q_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders, counted per nation — expressed through the SQL surface so
    Catalyst plans the scalar avg as a true scalar subquery (a separate
    tiny job whose result is injected as a literal — no join, no driver
    collect) and decorrelates NOT EXISTS into a broadcast anti join."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    customer.createOrReplaceTempView("v_dorm_customer")
    orders.createOrReplaceTempView("v_dorm_orders")
    return spark.sql(
        """
        SELECT c_nationkey, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM v_dorm_customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM v_dorm_customer
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM v_dorm_orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= timestamp'2001-01-01 00:00:00')
        GROUP BY c_nationkey
        """
    )


def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp table — supply cost stands in as 60% of
    the part's retail price): profit per supplier nation per order year over
    parts whose name contains 'red'. The part filter broadcasts, nation
    broadcasts, and the orders join carries only (orderkey, orderdate) —
    the wide fact never shuffles more than the needed columns."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    df = (
        lineitem.join(
            F.broadcast(
                part.filter(F.col("p_name").contains("red")).select(
                    "p_partkey", "p_retailprice"
                )
            ),
            lineitem.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              lineitem.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(orders.select("o_orderkey", "o_orderdate"),
              lineitem.l_orderkey == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
    )
    return df


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value restricted to three
    supplier nations, keeping parts above a fraction of the scoped total —
    a scalar subquery inside HAVING. Through the SQL surface the shared
    scoped relation is computed once per side, the threshold runs as a
    separate tiny job, and the HAVING is a literal comparison on the
    aggregate — no join against the total."""
    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    lineitem.createOrReplaceTempView("v_q11_lineitem")
    supplier.createOrReplaceTempView("v_q11_supplier")
    nation.createOrReplaceTempView("v_q11_nation")
    return spark.sql(
        """
        WITH scoped AS (
          SELECT l_partkey, l_extendedprice * l_quantity AS v
          FROM v_q11_lineitem JOIN v_q11_supplier ON l_suppkey = s_suppkey
          WHERE s_nationkey IN (SELECT n_nationkey FROM v_q11_nation
                                WHERE n_name IN ('NATION_1','NATION_2','NATION_3')))
        SELECT l_partkey, round(sum(v), 2) AS value
        FROM scoped GROUP BY l_partkey
        HAVING sum(v) > (SELECT sum(v) * 0.001 FROM scoped)
        """
    )


def q_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem's distinct (part, supplier) pairs stand in
    for partsupp): supplier count per (brand, type, size) bucket, excluding
    one brand, one type family, and suppliers with negative balances via
    NOT IN. Catalyst plans the NOT IN as a null-aware broadcast anti join
    (single-column key, tiny build side) and the distinct + count(distinct)
    as two hash aggregates on the same shuffle key."""
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    lineitem.createOrReplaceTempView("v_q16_lineitem")
    part.createOrReplaceTempView("v_q16_part")
    supplier.createOrReplaceTempView("v_q16_supplier")
    return spark.sql(
        """
        SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM v_q16_lineitem) ps
        JOIN v_q16_part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#12' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM v_q16_supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        """
    )


def q_dominant_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than 40% of some
    'small *' part's 1995 volume — nested IN subqueries (part-name filter
    feeding a grouped HAVING feeding a semi join on supplier). Catalyst
    decorrelates both INs into semi joins; the per-part total reuses the
    grouped relation rather than rescanning the fact."""
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    lineitem.createOrReplaceTempView("v_q20_lineitem")
    part.createOrReplaceTempView("v_q20_part")
    supplier.createOrReplaceTempView("v_q20_supplier")
    return spark.sql(
        """
        WITH shipped AS (
          SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
          FROM v_q20_lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM v_q20_part
                              WHERE p_name LIKE 'small%')
            AND l_shipdate >= timestamp'1995-01-01 00:00:00'
            AND l_shipdate <  timestamp'1996-01-01 00:00:00'
          GROUP BY l_suppkey, l_partkey),
        tot AS (SELECT l_partkey, sum(qty) AS total_qty
                FROM shipped GROUP BY l_partkey)
        SELECT s_suppkey, s_name FROM v_q20_supplier
        WHERE s_suppkey IN (SELECT l_suppkey
                            FROM shipped JOIN tot USING (l_partkey)
                            WHERE qty > 0.4 * total_qty)
        """
    )


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (the other canonical event-analytics shape next to
    the funnel): users grouped by first-activity day, distinct active
    users per (cohort, day-offset). Two hash aggregates + one equi join,
    all shuffling on user_id — the cohort join reuses the first
    aggregate's partitioning, so the fact table hashes once."""
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        days.join(firsts, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel (view → click → purchase): per user, the first
    view, the first click strictly after it, the first purchase strictly
    after that — three keyed aggregates + equi joins on user_id (every
    shuffle on the same key), left-joined into per-user funnel depth and
    step latencies. The product-analytics shape done relationally."""
    ev = _t(spark, sf_dir, "events")
    views = (
        ev.filter("event_type = 'view'")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    clicks = (
        ev.filter("event_type = 'click'")
        .join(views, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    purchases = (
        ev.filter("event_type = 'purchase'")
        .join(clicks, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        views.join(clicks, "user_id", "left")
        .join(purchases, "user_id", "left")
        .select(
            "user_id",
            (
                F.lit(1)
                + F.col("t_click").isNotNull().cast("int")
                + F.col("t_purchase").isNotNull().cast("int")
            ).cast("long").alias("funnel_depth"),
            (F.unix_timestamp("t_click") - F.unix_timestamp("t_view"))
            .cast("long")
            .alias("secs_view_to_click"),
            (F.unix_timestamp("t_purchase") - F.unix_timestamp("t_view"))
            .cast("long")
            .alias("secs_view_to_purchase"),
        )
    )


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (melt): three measure columns unpivoted into
    (metric, value) rows — an Expand node, rows×3 with no shuffle."""
    df = _t(spark, sf_dir, "lineitem")
    return df.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric",
        valueColumnName="value",
    ).select(
        "l_orderkey",
        "l_linenumber",
        "metric",
        F.round("value", 2).alias("value"),
    )


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured path: serialize a struct to a JSON payload column
    (the shape of an ingested event blob), then parse fields back out with
    get_json_object (path extraction) and from_json (typed schema parse).
    All JVM-side; the DuckDB twin round-trips the same payloads with its
    json_extract functions."""
    orders = _t(spark, sf_dir, "orders")
    payloads = orders.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.col("o_totalprice").alias("total"),
                F.col("o_orderpriority").alias("priority"),
            )
        ).alias("payload"),
    )
    parsed = payloads.select(
        "o_orderkey",
        F.get_json_object("payload", "$.status").alias("status"),
        F.from_json(
            "payload", "status string, total double, priority string"
        ).alias("rec"),
    )
    return parsed.select(
        "o_orderkey",
        "status",
        F.round(F.col("rec.total"), 2).alias("total"),
        F.col("rec.priority").alias("priority"),
    )


def q_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates — the 100 TB cardinality/quantile path:
    approx_count_distinct (HyperLogLog++) and approx_percentile (KLL-style
    quantile sketch) per return flag, one partial+final aggregate, fixed
    sketch memory per group regardless of data size.

    Raw sketch values are implementation-defined, so the hashable output
    is a BOUND CERTIFICATE: exact answers (engine-replayable) plus one
    boolean per sketch asserting it landed within its documented error of
    the exact value (rsd=0.02 -> |approx-exact|/exact <= 0.05, i.e. 2.5σ;
    accuracy=10000 -> approx p50 within the exact p45..p55 envelope). The
    DuckDB oracle computes the same exact values and TRUE literals — a
    sketch drifting out of bound flips a boolean and fails the hash, so
    the driver gate covers the sketch path instead of recording
    `no_oracle` (VERDICT r4 #3)."""
    df = _t(spark, sf_dir, "lineitem")
    # count_distinct is kept OUT of the sketch aggregate: mixing an exact
    # distinct with non-distinct aggregates makes Catalyst rewrite the whole
    # thing as a 4-level aggregate whose first level groups by
    # (l_returnflag, l_orderkey) — every one of the ~N_orders groups then
    # carries its own HLL + KLL + two exact-percentile buffers, all
    # serialized through the exchange (measured 33s -> 2.9s at sf0.1 when
    # split; guide §2.3/§5). Two 2-level aggregates + a 3-row join compute
    # the same per-flag values; the KLL sketch sees a different merge order,
    # which the bound-certificate output is invariant to by design (raw
    # sketch values are implementation-defined, only the boolean is
    # declared).
    sk = df.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("__acd"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("__ap50"),
        F.expr("percentile(l_extendedprice, 0.45)").alias("__p45"),
        F.expr("percentile(l_extendedprice, 0.55)").alias("__p55"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    cd = df.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("exact_orders")
    )
    agg = sk.join(cd, "l_returnflag")
    return agg.select(
        "l_returnflag",
        "exact_orders",
        "n_rows",
        (
            F.abs(F.col("__acd") - F.col("exact_orders"))
            / F.col("exact_orders")
            <= 0.05
        ).alias("cd_within_bound"),
        (
            (F.col("__ap50") >= F.col("__p45"))
            & (F.col("__ap50") <= F.col("__p55"))
        ).alias("p50_within_bound"),
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped percentiles (median / p90, linear interpolation) —
    core analytics op absent from the reference. At 100 TB you would reach
    for approx_percentile (t-digest, mergeable); the exact form is the
    oracle-matched baseline."""
    df = _t(spark, sf_dir, "lineitem")
    return df.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("qty_p50"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("qty_p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("price_p50"),
    )


# ---------------------------------------------------------------------------
# Scale extensions: text analysis, dedup, similarity (mini_etl_spark.functions)
# ---------------------------------------------------------------------------

def q_text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis battery: whitespace/BPE-ish token counts, stopword
    language-ID, quality score, md5 set-fingerprint — all JVM-side column
    expressions (functions/text.py), verified 1:1 against the DuckDB twin."""
    from mini_etl_spark.functions import text as tx

    docs = _t(spark, sf_dir, "documents")
    return tx.add_text_features(docs).select(
        "doc_id", "ws_tokens", "bpe_tokens", "lang_id", "quality", "fingerprint"
    )


def q_vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary by document frequency (the vocab-building pass of
    a tokenizer pipeline): distinct tokens per doc → explode → one count
    aggregate → top-50 (TakeOrderedAndProject, no global sort)."""
    from mini_etl_spark.functions import text as tx

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn("__terms", F.array_distinct(tx.tokens("text")))
        # explode_outer + null filter: keeps Catalyst from pushing an
        # inferred size()>0 filter below the projection and re-running
        # the tokenizer per row (see text.exploded_tokens)
        .select(F.explode_outer("__terms").alias("term"))
        .filter(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("term").asc())
        .limit(50)
    )


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with ADC scoring — the billion-scale
    compression path (dim float32 → m uint8 codes, 32× at dim=64/m=8):
    per-subspace nearest-centroid codes (pure codegen distance
    expressions + struct argmin), query-side lookup tables, distance =
    m array lookups per row, TakeOrderedAndProject top-10. Seeded random
    codebooks so the FULL chain (codes + LUT + ranking) replays in
    DuckDB — a complete hash oracle; k-means-trained codebooks are the
    quality path, pytest-gated (tests/test_functions.py)."""
    from mini_etl_spark.functions import similarity as sim

    emb = _t(spark, sf_dir, "embeddings")
    cb = sim.pq_random_codebooks(64, m=8, k=8, seed=13)
    # method="expr" pinned: the DuckDB oracle replays the pinned-order
    # float chain bit-for-bit. Library default is the 12× faster "arrow".
    return sim.pq_adc_topk(
        emb, _query_vector(spark, sf_dir), cb, k=10, method="expr"
    )


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension int8 scalar quantization of the embeddings table —
    the 4× storage lever for 100 TB embedding stores. One posexplode
    aggregate for per-dim min/max (dimension-sized, broadcast back as
    literals), then a pure codegen projection; floor(+0.5) half-up codes
    replay bit-for-bit in DuckDB (full hash oracle). Flattened to
    (vec_id, pos, code) scalar rows for engine-portable comparison."""
    from mini_etl_spark.functions import similarity as sim

    emb = _t(spark, sf_dir, "embeddings")
    q = sim.quantize_embeddings(emb, levels=256)
    return q.select(
        "vec_id", F.posexplode("codes").alias("pos", "code")
    ).withColumn("pos", F.col("pos") + 1)


def q_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (the merge table as data): ONE distributed
    pass reduces the corpus to a (word, count) histogram — the only
    corpus-sized stage, map-side combined, output vocabulary-bounded —
    then the classic merge loop runs driver-side over the histogram (its
    working set is the vocabulary, never the corpus; frequency ties break
    lexicographically so the result is a pure function of the histogram).
    Iterative algorithm — no SQL oracle (rows-only driver check); the
    cross-engine differential (DuckDB histogram → same loop) is
    tests/test_bpe.py."""
    from mini_etl_spark.functions import bpe

    docs = _t(spark, sf_dir, "documents")
    hist = [(r.word, r["count"]) for r in bpe.word_histogram(docs).collect()]
    merges = bpe.train_bpe_merges(hist, 50)
    return bpe.merges_df(spark, merges)


def q_word_histogram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded BPE corpus histogram (bpe.word_histogram with the round-6
    driver-collect rails): frequency floor executor-side (min_count=2 —
    singleton noise never reaches the driver) + deterministic top-k
    (max_vocab=25 — BINDING at sf0.01, so the count-desc/word-asc tiebreak is exercised under the hash compare), which Spark plans
    as TakeOrderedAndProject — per-partition heaps, no global sort. The
    oracle replays the same HAVING floor + ORDER/LIMIT; the compare is
    order-insensitive, so the deterministic tiebreak makes the SET
    identical."""
    from mini_etl_spark.functions import bpe

    docs = _t(spark, sf_dir, "documents")
    return bpe.word_histogram(docs, min_count=2, max_vocab=25).select(
        "word", F.col("count").cast("long").alias("count")
    )


def q_chat_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL-chat ingestion round trip: synthesized 2-turn conversations
    → to_json (Spark's JSON writer, arbitrary content incl. quotes) →
    parse_chat_json (from_json on-ramp) → to_turns flat rows. The oracle
    emits the synthesized flat rows directly — the round trip must be
    IDENTITY on every role/content byte, which verifies the parser
    against Spark's own serializer with the raw document text as
    payload."""
    from mini_etl_spark.functions import conversations as cv

    docs = _t(spark, sf_dir, "documents")
    flat = docs.select(
        F.col("doc_id").alias("conv_id"),
        F.explode(F.sequence(F.lit(0), F.lit(1))).alias("turn_idx"),
        "text",
    ).select(
        "conv_id",
        "turn_idx",
        F.when(F.col("turn_idx") == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        F.when(
            F.col("turn_idx") == 0,
            F.concat(F.lit('ask "about" \\ '), F.substring("text", 1, 30)),
        )
        .otherwise(F.concat(F.lit("reply re "), F.substring("text", 11, 30)))
        .alias("content"),
    )
    convs = cv.from_turns(flat)
    as_json = convs.select("conv_id", F.to_json("messages").alias("chat_json"))
    parsed = cv.parse_chat_json(as_json)
    return cv.to_turns(parsed)


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-corpus subset containment (dedup.containment_dedup_pairs):
    shared shingles over the SMALLER doc's set ≥ 0.8 — catches a short
    document quoted whole inside a long one, which symmetric Jaccard
    never sees. Inverted-index plan; brute-force list_intersect oracle
    (viable at oracle scale only, same pattern as jaccard_pairs)."""
    from mini_etl_spark.functions import dedup as dd

    docs = _t(spark, sf_dir, "documents")
    return dd.containment_dedup_pairs(docs, threshold=0.8)


def q_set_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic set-Jaccard join (dedup.set_jaccard_pairs) — the
    modality-agnostic core behind frame-hash video dedup: element sets
    here are the distinct tokens of each document's first 60 chars
    (stand-ins for per-frame fingerprints; the real video path decodes
    frames executor-side and is pytest-gated on PPM-stream fixtures).
    Inverted-index join through the DEFAULT candidate-volume budget cap
    (``"auto:10000000"`` since r11 — the fixed-1000 default was the
    one standing superlinear 20× sweep row, 90× vs 1.73× budgeted). At
    the oracle SF nothing binds: Σdf² ≈ 7e5 « 1e7 and the quantile cap
    (max(64, 4·p99.9) ≈ 692) sits above the max df (173), so results
    equal the uncapped SQL twin bit-for-bit while the driver exercises
    the budget-fit path end-to-end. Full hash oracle."""
    from mini_etl_spark.functions import dedup as dd
    from mini_etl_spark.functions import text as tx

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_distinct(tx.tokens(F.substring("text", 1, 60))).alias("tags"),
    )
    return dd.set_jaccard_pairs(docs, "tags", threshold=0.5)


def q_set_jaccard_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered EXACT set-Jaccard join
    (dedup.set_jaccard_pairs_exact — AllPairs candidate generation,
    Bayardo et al. WWW'07): elements ranked by ascending global document
    frequency, candidates only where the RAREST |s|−⌈t·|s|⌉+1 elements
    intersect, then exact verification over full postings. Unlike
    `set_jaccard` (budget-capped, lower-bound scores when the cap
    binds), this is bit-equal to the uncapped SQL truth AT ANY SCALE by
    construction — it is the plan that computes the 20× sweep's
    "uncapped truth" where the naive Σdf² inverted index is a
    single-reducer hazard (SCALE20_SJ_BUDGET.json). Full hash oracle
    (same SQL as set_jaccard: there the equality is an oracle-SF
    adjudication, here it is the algorithm's contract)."""
    from mini_etl_spark.functions import dedup as dd
    from mini_etl_spark.functions import text as tx

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_distinct(tx.tokens(F.substring("text", 1, 60))).alias("tags"),
    )
    # naive_volume_limit=0 pins the PREFIX branch: the cost-based
    # dispatcher would pick the naive inverted index at this Σdf² (same
    # exact result, cheaper constants — already oracled via set_jaccard),
    # and the novel plan is the one this key exists to verify
    return dd.set_jaccard_pairs_exact(docs, "tags", threshold=0.5,
                                      naive_volume_limit=0)


def q_jaccard_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted EXACT-Jaccard prefix index
    (functions/jaccard_index.py): even-doc_id documents are indexed
    once (frozen-frequency prefix postings, build-once serve-many —
    the exact member of the minhash/bloom/ivf index family), odd
    documents probe it; output is every (batch, indexed) pair with
    TRUE 3-gram shingle Jaccard ≥ 0.5. Exactness is the algorithm's
    contract (prefix lemma under the frozen order + full-postings
    verification), so the brute-force SQL truth matches at any scale.
    Index built in a per-process temp dir — the build is part of what
    is verified, mirroring `ivf_topk_indexed`. Full hash oracle."""
    from mini_etl_spark.functions import jaccard_index as ji

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    path, fresh = _per_process_index_dir("jacc_idx", sf_dir)
    if fresh:
        ji.jaccard_index_write(docs.filter("doc_id % 2 = 0"), path)
    return ji.jaccard_index_dedup(
        docs.filter("doc_id % 2 = 1"), path, threshold=0.5
    )


def q_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced shard assignment (splits.token_balanced_shard_ids):
    deterministic md5 layout cut every 2000 tokens via a DISTRIBUTED
    prefix sum (md5-hex-prefix buckets carry contiguous runs of the
    global order; per-bucket offsets from a 256-row collect + parallel
    in-bucket window cumsum) — never a single-partition global window.
    The oracle is the plain global-window cumsum the distributed form
    must equal value-for-value."""
    from mini_etl_spark.functions import splits as sp

    docs = _t(spark, sf_dir, "documents")
    return sp.token_balanced_shard_ids(docs, tokens_per_shard=2000, seed=5)


def q_semantic_decontaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level train/eval decontamination
    (similarity.semantic_decontaminate): every 25th vector plays the
    eval set; training rows whose max cosine to any eval row (within 2
    probed cells) reaches 0.42 are dropped — the semantic sibling of the
    n-gram `decontaminated` query, catching paraphrase-style leakage.
    method="expr" pinned for the bit-replayable float chain; the oracle
    replays cell assignment, k=1 retrieval and the anti-join."""
    from mini_etl_spark.functions import similarity as sim

    emb = _t(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("vec_id") % 25 == 0)
    tr = emb.filter(F.col("vec_id") % 25 != 0)
    cents = sim.random_unit_centroids(dim=64, k=32, seed=7)
    out = sim.semantic_decontaminate(
        tr, ev, cents, threshold=0.42, nprobe=2, method="expr"
    )
    return out.select("vec_id", "label")


def q_conversation_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction inside the nested messages array
    (conversations.redact_conversations): synthesized 2-turn
    conversations carry an email, phone, IP and SSN; the nested
    transform must rewrite every turn in place and attach the per-
    conversation PII hit count — flattened back to turn rows for the
    oracle, which replays the same RE2-safe chain on the flat form."""
    from mini_etl_spark.functions import conversations as cv

    docs = _t(spark, sf_dir, "documents")
    flat = docs.select(
        F.col("doc_id").alias("conv_id"),
        F.explode(F.sequence(F.lit(0), F.lit(1))).alias("turn_idx"),
        "text",
    ).select(
        "conv_id",
        "turn_idx",
        F.when(F.col("turn_idx") == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        F.when(
            F.col("turn_idx") == 0,
            F.concat(
                F.lit("contact user"), F.col("conv_id").cast("string"),
                F.lit("@mail.example or call 555-123-4567 from 10.1.2.3"),
            ),
        )
        .otherwise(
            F.concat(F.lit("noted ssn 123-45-6789 re "), F.substring("text", 1, 40))
        )
        .alias("content"),
    )
    convs = cv.from_turns(flat)
    red = cv.redact_conversations(convs)
    return red.select(
        "conv_id", "n_pii", F.posexplode("messages").alias("turn_idx", "m")
    ).select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        F.col("m")["role"].alias("role"),
        F.col("m")["content"].alias("content"),
        "n_pii",
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the generalized rollup/cube surface (arbitrary
    aggregation lattices in ONE pass via Expand, not one scan per
    grouping): per-(flag,status), per-flag, per-status, and grand-total
    rows with grouping() indicators distinguishing real NULLs from
    subtotal rows. Full hash oracle (identical ANSI SQL in DuckDB)."""
    df = _t(spark, sf_dir, "lineitem")
    df.createOrReplaceTempView("l_gsets")
    return spark.sql("""
        SELECT coalesce(l_returnflag, 'ALL') AS flag,
               coalesce(l_linestatus, 'ALL') AS status,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS n_rows
        FROM l_gsets
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus), ())
    """)


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier detection (maintenance.robust_outliers):
    planted 10× price spikes (every 97th order) must be the rows flagged
    by |x − median| > 3·MAD per return flag. Values fixed to integer
    cents first so every percentile interpolation lands on exactly-
    representable .0/.5 doubles — the boundary comparison (hence the
    row set) is bit-stable across engines. Full hash oracle."""
    from mini_etl_spark.maintenance import robust_outliers

    df = _t(spark, sf_dir, "lineitem").withColumn(
        "amount",
        F.col("l_extendedprice")
        * F.when(F.col("l_orderkey") % 97 == 0, F.lit(10.0)).otherwise(F.lit(1.0)),
    )
    out = robust_outliers(df, "amount", group_col="l_returnflag", k=3.0)
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.col("__v").alias("amount_c"),
        "group_median",
        "group_mad",
    )


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters (text.heavy_hitters_cm): one-pass
    depth×width md5-bucketed frequency table (constant memory, mergeable
    by addition — the streaming/daily-rollup frequency shape), probed at
    the exact top-20 tokens with truth riding along. md5 bucketing makes
    the ENTIRE sketch engine-replayable — full hash oracle, unlike the
    implementation-defined HLL/KLL sketches which certify bounds."""
    from mini_etl_spark.functions import text as tx

    docs = _t(spark, sf_dir, "documents")
    return tx.heavy_hitters_cm(docs, depth=4, width=1024, top_k=20, seed=1000)


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING under the driver gate: train 50 merges on the full
    corpus histogram (as q_bpe_vocab), then apply them to every 10th
    document through bpe.apply_bpe — the Arrow-batched mapInPandas
    encoder whose per-word priority loop is exactly replayed by the
    oracle's rank-sequential SQL stages (see _d_bpe_encode_sql for the
    equivalence argument). This differentially verifies the PYTHON
    executor path, not just a JVM expression chain: (doc_id, pos, sym)
    subword rows must match a pure-SQL second implementation."""
    from mini_etl_spark.functions import bpe

    full = _t(spark, sf_dir, "documents")
    hist = [(r["word"], r["count"]) for r in bpe.word_histogram(full).collect()]
    merges = bpe.train_bpe_merges(hist, 50)
    docs = full.filter(F.col("doc_id") % 10 == 0)
    enc = bpe.apply_bpe(docs, merges)
    return enc.select(
        "doc_id", F.posexplode("bpe_tokens").alias("pos", "sym")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "sym")


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/boilerplate signals: duplicate bigram and
    trigram fractions, mean word length, duplicate-line ratio (columnar,
    zero-shuffle), plus top-token fraction (explode + two hash aggregates)
    joined back on doc_id. All metrics have exact DuckDB twins."""
    from mini_etl_spark.functions import text as tx

    docs = _t(spark, sf_dir, "documents")
    feats = tx.add_repetition_features(docs).select(
        "doc_id",
        "rep_bigram_ratio",
        "rep_trigram_ratio",
        "mean_word_len",
        "dup_line_ratio",
    )
    top = tx.top_token_fraction(docs)
    return feats.join(top, "doc_id", "left")


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window document chunking (64-token windows every 48 tokens —
    the context-window prep step before training): sequence → posexplode →
    slice, one codegen stage, zero shuffles, zero UDFs. Exact DuckDB twin
    via the shared tokenizer contract."""
    from mini_etl_spark.functions import chunking as ck

    docs = _t(spark, sf_dir, "documents")
    return ck.chunk_documents(docs, window=64, stride=48)


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing into 256-token bins, distributed over
    deterministic id-range groups (bins never span groups) — the padding
    eliminator every pretraining pipeline runs. Arrow-batched
    applyInPandas inside each group; the DuckDB oracle replays the same
    greedy walk as a recursive CTE."""
    from mini_etl_spark.functions import chunking as ck

    docs = _t(spark, sf_dir, "documents")
    return ck.pack_sequences(docs, max_tokens=256, group_size=100)


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval (Lucene-style idf): top-15 documents for
    ['vector','hash','merge']. Postings built for query terms only,
    scalar stats broadcast, TakeOrderedAndProject top-k."""
    from mini_etl_spark.functions import chunking as ck

    docs = _t(spark, sf_dir, "documents")
    return ck.bm25_topk(docs, ["vector", "hash", "merge"], k=15)


def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group spherical mean embeddings (pseudo-clusters = vec_id % 4),
    flattened to (grp, pos, value) rows for engine-portable comparison.
    Pooling is posexplode → hash-aggregate → position-sorted re-assembly —
    no UDF, two shuffles; the pooling primitive behind cluster-scoped
    semantic dedup."""
    from mini_etl_spark.functions import similarity as sim

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "grp", F.pmod("vec_id", F.lit(4)).cast("long")
    )
    cents = sim.embedding_centroids(emb, "grp")
    return cents.select(
        "grp", "n_members", F.posexplode("centroid").alias("pos", "value")
    ).select("grp", F.col("pos").cast("long").alias("pos"), "value", "n_members")


def q_hashed_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick document vectors (64 md5 buckets, L2-normalized) —
    the model-free featurizer that opens every embedding operator to a
    plain text corpus. Flattened to (doc_id, pos, weight_e6) scalar rows
    for engine-portable comparison; weight_e6 = round(weight * 1e6) as a
    LONG, computed from the exact IEEE quotient (scale=10**6), because two
    engines' round(x, 6) DOUBLEs can differ in the binary tail and fail a
    bit-level hash even when every printed value agrees (the r4 escape)."""
    from mini_etl_spark.functions import text as tx

    docs = _t(spark, sf_dir, "documents")
    vecs = tx.hashed_doc_vectors(docs, dim=64, scale=10**6)
    return vecs.select(
        "doc_id", "n_tokens", F.posexplode("embedding").alias("pos", "weight_e6")
    ).select(
        "doc_id", F.col("pos").cast("long").alias("pos"), "weight_e6", "n_tokens"
    )


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram log-likelihood quality proxy (KenLM-style filter without a
    model): corpus-fit add-one-smoothed unigram LM, mean token log-prob
    per document. One explode feeds both the vocabulary aggregate and the
    per-doc join; scalar totals broadcast."""
    from mini_etl_spark.functions import text as tx

    docs = _t(spark, sf_dir, "documents")
    return tx.unigram_logprob_score(docs)


def q_normalized_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-tokenization normalization (CCNet/Dolma cleanup stage): smart
    quotes/dashes/ellipsis → ASCII, unicode spaces → plain, control chars
    stripped, CRLF unified, whitespace/blank-line runs collapsed. The
    synthetic corpus is clean ASCII, so the query injects the mess
    deterministically (same construction in the oracle) and normalizes
    it — a pure codegen regexp_replace chain, full hash oracle generated
    from the SAME ordered step list the operator applies."""
    from mini_etl_spark.functions import text as tx

    docs = _t(spark, sf_dir, "documents")
    mess = F.concat(
        F.lit("\u201cquote\u201d\u00a0and\u2003x\u2026"),  # curly quotes, NBSP, EM space, ellipsis
        F.lit("\x07\r\n"),
        F.substring("text", 1, 40),
        F.lit("  two   spaces\tand\ttabs"),
        F.lit("\n\n\n\n\n"),
        F.lit("–dash— ’end‘"),
    )
    return docs.select(
        "doc_id", tx.normalize_text(mess).alias("text_norm")
    )


def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity filter (CCNet-style, order-aware): fit an
    add-one-smoothed bigram model on the even-doc_id half of the corpus,
    score the held-out odd half — unseen bigrams/contexts exercise the
    smoothing paths. Train = one pass + bigram-sized shuffle; score =
    equi-joins on the bigram key, vocab total broadcast."""
    from mini_etl_spark.functions import lm

    docs = _t(spark, sf_dir, "documents")
    model = lm.train_bigram_lm(docs.filter(F.col("doc_id") % 2 == 0))
    return lm.bigram_logprob_score(docs.filter(F.col("doc_id") % 2 == 1), model)


def q_line_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level corpus hygiene, composed: each document is synthesized
    into a 5-line page with an in-page duplicate banner and corpus-wide
    banner+footer chrome (built identically in the DuckDB oracle) →
    dedup_lines drops the repeat, strip_boilerplate_lines drops the
    corpus-wide chrome (doc-frequency > 30%), leaving only the two
    content lines — CCNet/C4-style cleaning as relational operators."""
    from mini_etl_spark.functions import text as tx

    docs = _t(spark, sf_dir, "documents")
    synth = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("cookie banner ok"),
            F.substring("text", 1, 40),
            F.lit("cookie banner ok"),
            F.substring("text", 41, 40),
            F.lit("copyright footer"),
        ).alias("text"),
    )
    cleaned = tx.strip_boilerplate_lines(
        tx.dedup_lines(synth), max_doc_frac=0.3
    )
    return cleaned.select(
        "doc_id",
        "text",
        F.size(F.split("text", "\n")).cast("long").alias("n_lines"),
    )


def q_quality_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative quality gate: keep each language's top 40% of documents by
    quality score (absolute thresholds drift across languages; percentile
    gates are how mixed corpora are actually filtered). One window per
    (lang, quality) — a single shuffle; deterministic tie-break on doc_id."""
    from pyspark.sql import Window

    from mini_etl_spark.functions import text as tx

    docs = _t(spark, sf_dir, "documents")
    feats = tx.add_text_features(docs).select("doc_id", "lang_id", "quality")
    w = Window.partitionBy("lang_id").orderBy("quality", "doc_id")
    return (
        feats.withColumn("pr", F.round(F.percent_rank().over(w), 6))
        .filter(F.col("pr") >= 0.6)
        .select("doc_id", "lang_id", "quality", "pr")
    )


def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-aggregate maintenance: the orders table arrives as
    three deterministic hash slices; each slice is aggregated to mergeable
    per-key state (sum/count/min/max — mean decomposes to sum+count), the
    states merge, and the finalized result must equal a direct aggregate
    over everything — the algebraic-aggregation contract that lets a 100 TB
    rollup update in O(new data) instead of O(history)."""
    from mini_etl_spark.functions import splits as sp
    from mini_etl_spark.incremental import (
        rollup_merge,
        rollup_partial,
        rollup_result,
    )

    orders = _t(spark, sf_dir, "orders")
    keys = ["o_orderstatus", "o_orderpriority"]
    aggs = {"o_totalprice": ["sum", "mean", "max"], "o_orderkey": ["count"]}
    bucket = sp.hash_bucket("o_orderkey")
    slices = [
        orders.filter(bucket < 3333),
        orders.filter((bucket >= 3333) & (bucket < 6666)),
        orders.filter(bucket >= 6666),
    ]
    state = rollup_merge([rollup_partial(s, keys, aggs) for s in slices], keys)
    out = rollup_result(state, keys, aggs)
    return out.select(
        *keys,
        F.round("o_totalprice_sum", 2).alias("price_sum"),
        F.round("o_totalprice_mean", 4).alias("price_mean"),
        F.col("o_totalprice_max").alias("price_max"),
        F.col("o_orderkey_count").alias("n_orders"),
    )


def q_token_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture sampling under per-source token budgets (the corpus-assembly
    weighting step): deterministic md5-order greedy take per source — one
    window over (source, hash) — budgets sized so every source's cutoff
    binds at the oracle SF."""
    from mini_etl_spark.functions import mixing as mx

    docs = _t(spark, sf_dir, "documents")
    return mx.mix_by_token_budget(
        docs, {"src0": 800, "src1": 400, "src2": 2000}
    ).select("doc_id", "source", "n_tokens")


def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle: global rank by md5(seed|id) —
    same permutation every run and engine. Range-partitioned sort; at
    scale, write ordered shards keyed by rank div shard_size."""
    from mini_etl_spark.functions import mixing as mx

    docs = _t(spark, sf_dir, "documents")
    return mx.shuffle_order(docs).select("doc_id", "shuffle_order")


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mT5-style temperature sampling (alpha on source sizes): per-source
    quotas ∝ n^0.5 of a 600-doc budget, epoch replication for sources whose
    boosted quota exceeds their size. Quota float chain (pow → pinned
    left-assoc cumulative sum → floor) and the per-epoch md5 draw replay
    exactly in the DuckDB oracle."""
    from mini_etl_spark.functions import mixing as mx

    docs = _t(spark, sf_dir, "documents")
    return mx.temperature_mix(docs, budget=600, alpha=0.5, repeat=True).select(
        "doc_id", "source", "epoch"
    )


def q_conversation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation (SFT) operators end-to-end: a deterministic turn log is
    synthesized from documents (4 turns of 6 tokens each; every 7th doc is
    all-'user' to trip validation), then from_turns → stats → validation →
    rendered-transcript fingerprint — one grouped aggregate + projections.
    The DuckDB oracle replays the synthesis and the whole chain on the
    flat form (lag window for role adjacency, ordered string_agg for the
    rendering)."""
    from mini_etl_spark.functions import conversations as cv
    from mini_etl_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    flat = (
        docs.withColumn("__toks", tokens("text"))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("pos"),
            "__toks",
        )
        .filter(F.size("__toks") > F.col("pos") * 6)
        .select(
            F.col("doc_id").alias("conv_id"),
            F.col("pos").alias("turn_idx"),
            F.when(F.col("doc_id") % 7 == 0, F.lit("user"))
            .when(F.col("pos") % 2 == 0, F.lit("user"))
            .otherwise(F.lit("assistant"))
            .alias("role"),
            F.concat_ws(
                " ", F.slice("__toks", F.col("pos") * 6 + 1, 6)
            ).alias("content"),
        )
    )
    convs = cv.from_turns(flat)
    out = cv.render_chat(
        cv.validate_conversations(cv.conversation_stats(convs))
    )
    return out.select(
        "conv_id",
        F.col("n_turns").cast("long").alias("n_turns"),
        F.col("n_user").cast("long").alias("n_user"),
        F.col("n_assistant").cast("long").alias("n_assistant"),
        "n_tokens",
        "first_role",
        "last_role",
        F.array_join("conv_errors", ",").alias("errors"),
        F.col("conv_valid").alias("valid"),
        F.md5(F.col("text").cast("binary")).alias("render_fp"),
    )


def q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO pair construction: documents play scored completions (prompt =
    doc_id % 97, score = n_chars as a quality proxy) → per-prompt
    (chosen, rejected) via one max_by/min_by hash aggregate with opposite
    tie-breaks. The oracle replays the ranking as two row_number windows."""
    from mini_etl_spark.functions import conversations as cv

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        (F.col("doc_id") % 97).alias("prompt_id"),
        F.col("doc_id").alias("completion_id"),
        F.col("n_chars").cast("double").alias("score"),
    )
    return cv.preference_pairs(scored, min_margin=1.0)


def q_common_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide repeated 3-gram census (memorization/boilerplate audit):
    explode n-gram postings → (ngram, doc) partial agg → (ngram) final,
    deterministic top-k via TakeOrderedAndProject."""
    from mini_etl_spark.functions import text as tx

    docs = _t(spark, sf_dir, "documents")
    return tx.common_ngrams(docs, n=3, min_docs=2, top_k=50)


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: the corpus text is clean by construction, so each row is
    augmented with deterministic doc_id-derived PII (email/phone/SSN/IP) —
    built identically in the DuckDB oracle — then redacted and counted.
    One codegen projection of chained regexp_replace, RE2-safe patterns."""
    from mini_etl_spark.functions import text as tx

    docs = _t(spark, sf_dir, "documents")
    id_s = F.col("doc_id").cast("string")
    pad3 = F.lpad(F.pmod("doc_id", F.lit(1000)).cast("string"), 3, "0")
    pad4 = F.lpad(F.pmod("doc_id", F.lit(10000)).cast("string"), 4, "0")
    raw = F.concat_ws(
        " ",
        F.lit("contact"),
        F.concat(F.lit("user"), id_s, F.lit("@example.com")),
        F.lit("tel"),
        F.concat(F.lit("555-"), pad3, F.lit("-"), pad4),
        F.lit("ssn"),
        F.concat(F.lit("123-45-"), pad4),
        F.lit("ip"),
        F.concat(F.lit("10.0."), F.pmod("doc_id", F.lit(256)).cast("string"), F.lit(".7")),
        F.substring("text", 1, 40),
    )
    synth = docs.select("doc_id", raw.alias("raw"))
    return synth.select(
        "doc_id",
        tx.redact_pii("raw").alias("clean"),
        tx.pii_count("raw").alias("n_pii"),
    )


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by md5 hash bucket of the
    stable key — reproducible across runs AND engines (row-level oracle
    replays the exact same md5 arithmetic in DuckDB). The at-scale path is
    a pushed-down filter on the split label."""
    from mini_etl_spark.functions import splits as sp

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        sp.hash_bucket("doc_id").alias("bucket"),
        sp.split_assign(
            "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}
        ).alias("split"),
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic downsampling (rebalance a multilingual
    corpus): en→50%, de→100%, fr→25%, everything else dropped. One codegen
    filter, no sampleBy randomness, same verdict per key in both engines."""
    from mini_etl_spark.functions import splits as sp

    docs = _t(spark, sf_dir, "documents")
    sampled = sp.stratified_sample(
        docs.select("doc_id", "lang"),
        key_col="doc_id",
        strata_col="lang",
        fractions={"en": 0.5, "de": 1.0, "fr": 0.25},
        seed=7,
    )
    return sampled.select("doc_id", "lang")


def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source frequency cap (the C4 per-host move): at most 10 docs per
    source, selected by deterministic md5 order so both engines pick the
    identical subset. One shuffle on source; full hash oracle."""
    from mini_etl_spark.functions import splits as sp

    docs = _t(spark, sf_dir, "documents")
    return sp.cap_per_group(
        docs.select("doc_id", "source"),
        group_col="source",
        key_col="doc_id",
        cap=10,
        seed=11,
    )


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact distributed k-means (similarity.kmeans_int): Lloyd
    iterations over quantized codes where every distance and centroid
    update is exact integer arithmetic — the clustering primitive that
    IS cross-engine replayable (float k-means never is: mean() is an
    order-dependent float sum). k=8, 3 update iterations, 256 levels;
    output (vec_id, cluster, dist). Full chained-CTE DuckDB oracle
    re-runs the identical iterations."""
    from mini_etl_spark.functions import similarity as sim

    emb = _t(spark, sf_dir, "embeddings")
    return sim.kmeans_int(emb, k=8, iters=3, levels=256)


def q_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse count-vector cosine join (functions/dedup.py
    count_cosine_pairs): bag-of-words cosine ≥ 0.8 via an inverted-index
    join with the hot-token doc-frequency cap — the term-frequency-aware
    complement to jaccard_pairs. Output is exact longs only
    (dot, norm²) and the threshold test is integer-exact doubles with a
    fixed expression shape, so the DuckDB replay hashes bit-for-bit."""
    from mini_etl_spark.functions import dedup as dd

    docs = _t(spark, sf_dir, "documents")
    return dd.count_cosine_pairs(docs, threshold=0.8)


def q_psl_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain frequency cap with the BUNDLED public-suffix
    snapshot (assets.public_suffixes): synthesized multi-suffix hosts
    (co.uk / com.au / co.jp / github.io / io / com zones) resolve to
    their PSL-exact registrable domain through the broadcast
    longest-suffix join, then at most 5 docs survive per domain by
    deterministic md5 order (the C4 per-host cap, keyed correctly:
    grouping by raw host would split a site across subdomains).
    Host side never shuffles until the cap window. Full hash oracle —
    DuckDB replays the suffix join against the same embedded snapshot."""
    from mini_etl_spark.functions import splits as sp
    from mini_etl_spark.functions.web import with_registered_domain

    docs = _t(spark, sf_dir, "documents")
    zones = ["co.uk", "com.au", "co.jp", "github.io", "io", "com"]
    host = F.lower(
        F.concat(
            F.lit("www."), F.col("source"), F.lit("."),
            F.element_at(
                F.array(*[F.lit(s) for s in zones]),
                (F.pmod("doc_id", F.lit(6)) + 1).cast("int"),
            ),
        )
    )
    hosts = docs.select("doc_id", host.alias("host"))
    dom = with_registered_domain(hosts, "host", "psl", out_col="domain")
    capped = sp.cap_per_group(
        dom, group_col="domain", key_col="doc_id", cap=5, seed=7
    )
    return capped.select("doc_id", "host", "domain")


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing, oracle-checked: documents' text bytes stand in
    for opaque asset payloads (modality assigned by id), pushed through the
    REAL mapInPandas Arrow-batch feature-extraction path. The sha256/byte
    counts the kernel computes on executors are recomputed by DuckDB on the
    same bytes — a full hash oracle over the binary pipeline (the fake
    embedding array is deliberately dropped: it exists for shape tests)."""
    from mini_etl_spark.functions import multimodal as mm

    docs = _t(spark, sf_dir, "documents")
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode("text", "UTF-8").alias("content"),
    )
    feats = mm.extract_features(assets)
    return feats.select("asset_id", "modality", "n_bytes", "content_sha256")


def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED training-data hygiene pipeline — quality filter →
    language filter → exact dedup (min-id per fingerprint) → near-dup
    removal (Jaccard pairs → connected components → drop) — as one lazy
    plan, with a full DuckDB oracle replicating all four stages (recursive
    CTE for the component stage)."""
    from mini_etl_spark.functions.corpus import clean_corpus

    docs = _t(spark, sf_dir, "documents")
    return clean_corpus(docs, min_quality=0.3, languages=("en",))


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content fingerprint: one hash-aggregate."""
    from mini_etl_spark.functions import dedup as dd

    docs = _t(spark, sf_dir, "documents")
    return dd.exact_dedup(docs)


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard similarity join (inverted index — no O(N²)).
    Hot-shingle cap explicit: at the oracle SF no shingle approaches the
    cap, so results equal the uncapped SQL twin; at corpus scale the cap
    bounds the posting-list join."""
    from mini_etl_spark.functions import dedup as dd

    docs = _t(spark, sf_dir, "documents")
    return dd.jaccard_pairs(docs, threshold=0.5, max_shingle_freq=1000)


def q_jaccard_pairs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered EXACT 3-gram Jaccard join
    (dedup.jaccard_pairs_exact): no shingle-frequency cap at all —
    candidates come from the rarest |s|−⌈t·|s|⌉+1 shingles of each
    document (AllPairs, Bayardo et al. WWW'07), verified exactly over
    the full postings. Bit-equal to the uncapped SQL truth at ANY scale
    by the algorithm's contract — the capped `jaccard_pairs` twin is
    equal only because nothing binds at oracle SF."""
    from mini_etl_spark.functions import dedup as dd

    docs = _t(spark, sf_dir, "documents")
    # force the prefix branch — see q_set_jaccard_exact's note
    return dd.jaccard_pairs_exact(docs, threshold=0.5, naive_volume_limit=0)


def q_jaccard_pairs_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same exact Jaccard join through the CANDIDATE-VOLUME BUDGET cap
    path (`max_shingle_freq="auto:<budget>"` →
    operators/skew.py auto_frequency_cap(max_candidate_volume=...)): the
    cap is fitted so the surviving posting-list join work Σdf² stays
    inside the budget — the 100 TB-default form of the hot-shingle
    guard. At the oracle SF the whole distribution fits the budget
    (max shingle df ≈ 7, Σdf² ≈ 5e4 « 1e9) and no shingle reaches the
    floor cap, so results equal the uncapped SQL twin bit-for-bit while
    the driver exercises the budget fit (pre-aggregated
    distinct-count-value frame, never a per-key global window —
    plan-asserted in tests/test_round8_hardening.py) end-to-end."""
    from mini_etl_spark.functions import dedup as dd

    docs = _t(spark, sf_dir, "documents")
    return dd.jaccard_pairs(
        docs, threshold=0.5, max_shingle_freq="auto:1000000000"
    )


def q_budget_cap_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The candidate-volume budget FIT itself, with a BINDING budget
    (round-8 VERDICT minor #2: the jaccard budget oracle proves the
    plumbing but its budget never binds at oracle SF). Key frequencies
    of lineitem.l_partkey give a spread count distribution (26-36
    distinct count values at the test SFs); a 20 000 candidate-volume
    budget binds well below the max count at every SF, so the derived
    cap comes from the budget fit (operators/skew.py:auto_frequency_cap
    → _budget_fit_frame: groupBy(count) → Σcount² → cumulative window →
    largest fitting count value), not the quantile rule (multiplier 1e9
    pushes the quantile cap out of range) or the floor (1). The DuckDB
    twin replays the fit math itself — the derived cap, the admitted
    post-cap volume Σcount² (exact: integer-valued doubles « 2^53, so
    summation order cannot flip a bit), and the surviving key count are
    all bit-level locked."""
    from mini_etl_spark.operators.skew import auto_frequency_cap

    li = _t(spark, sf_dir, "lineitem")
    freq = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("__f"))
    cap = auto_frequency_cap(
        freq, count_col="__f", quantile=0.999, multiplier=1e9,
        floor=1, max_candidate_volume=20_000,
    )
    return (
        freq.filter(F.col("__f") <= F.lit(cap))
        .agg(
            F.coalesce(
                F.sum(F.col("__f").cast("double") * F.col("__f")),
                F.lit(0.0),
            ).alias("admitted_volume"),
            F.count(F.lit(1)).alias("surviving_keys"),
        )
        .select(
            F.lit(cap).cast("long").alias("derived_cap"),
            "admitted_volume",
            "surviving_keys",
        )
    )


def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate token-span detection (substring-dedup family): doc
    pairs sharing identical 5-token spans, with the count of shared spans
    and the longest contiguous shared run (diagonal gaps-and-islands over
    positional posting lists). Full hash oracle — the md5 span hashing,
    first-occurrence dedup, and island arithmetic replay in DuckDB."""
    from mini_etl_spark.functions import dedup as dd

    docs = _t(spark, sf_dir, "documents")
    return dd.duplicate_span_pairs(docs, width=5, max_span_freq=1000)


def q_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample of the events stream, per event type:
    hash-aggregate rollup, executor-side dense grid (sequence+explode),
    linear interpolation across empty buckets. agg='max' (not avg) so the
    bucket values are float-order-independent — the interpolation then
    replays bit-for-bit in DuckDB for a full hash oracle (avg's partial
    sums differ in the last ulp between engines and flip round-4 at
    boundaries; exactness beats showcase here)."""
    from mini_etl_spark.operators.timeseries import resample

    ev = _t(spark, sf_dir, "events")
    return resample(
        ev, "ts", "value", 3600, ["event_type"], agg="max", fill="linear"
    )


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two snapshots: a synthetic 'today'
    customer table (10%-of-keys deleted, every-7th balance bumped,
    every-13th key re-inserted under a new id) diffed against the stored
    snapshot — one full-outer join, labeled insert/update/delete rows.
    Full hash oracle (the synthetic mutation replays in SQL)."""
    from mini_etl_spark.operators.merge import snapshot_diff

    cust = _t(spark, sf_dir, "customer")
    modified = cust.filter(F.col("c_custkey") % 10 != 0).withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 100
        ).otherwise(F.col("c_acctbal")),
    )
    inserts = cust.filter(F.col("c_custkey") % 13 == 0).withColumn(
        "c_custkey", F.col("c_custkey") + 1000000
    )
    return snapshot_diff(cust, modified.unionByName(inserts), "c_custkey")


def q_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup, the action: duplicated 5-token-or-longer
    passages are excised from the later document (earliest stays whole).
    The positional rebuild — index-aware token filter against the excision
    ranges — replays in DuckDB for a full hash oracle over the cleaned
    text itself."""
    from mini_etl_spark.functions import dedup as dd

    docs = _t(spark, sf_dir, "documents")
    return dd.remove_duplicate_spans(docs, width=5, max_span_freq=1000).select(
        "doc_id", "clean_text", "n_removed_tokens"
    )


def _contamination_splits(spark: SparkSession, sf_dir: str):
    """50/50 deterministic hash split of the documents table — the
    train/test halves every contamination query scans. A filter on the
    md5-bucket projection, so both sides prune at the scan."""
    from mini_etl_spark.functions import splits as sp

    docs = _t(spark, sf_dir, "documents")
    bucket = sp.hash_bucket("doc_id")
    train = docs.filter(bucket < 5000)
    test = docs.filter(bucket >= 5000)
    return train, test


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test n-gram contamination scan (the decontamination primitive
    every eval-hygiene pipeline needs): test docs whose 3-gram CONTAINMENT
    in some train doc ≥ 0.5, via the inverted-index join — never the
    |train|×|test| pair space. Split is the deterministic md5 hash bucket,
    so the DuckDB oracle replays the identical partition."""
    from mini_etl_spark.functions import dedup as dd

    train, test = _contamination_splits(spark, sf_dir)
    return dd.contamination_pairs(train, test, threshold=0.5, max_shingle_freq=1000)


def q_decontaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontaminated training corpus: train docs that leak ≥ 0.5 of any
    test doc's 3-grams are anti-joined away; survivors keep their metadata.
    The output is the corpus you'd actually train on."""
    from mini_etl_spark.functions import dedup as dd

    train, test = _contamination_splits(spark, sf_dir)
    out = dd.decontaminate(train, test, threshold=0.5, max_shingle_freq=1000)
    return out.select("doc_id", "lang", "source", "n_chars")


def q_bloom_decontaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-gram MEMBERSHIP decontamination, Bloom-accelerated (the
    GPT-3 recipe): drop every train doc sharing ANY 5-gram with the test
    split. The benchmark side folds into a broadcast bitmask
    (functions/bloom.py), the corpus side is tested map-side — k
    broadcast joins, zero shuffles of the training grams — and the tiny
    might-contain remainder is exact-verified, so the result is
    independent of the filter sizing and the plain exact-membership SQL
    is a full oracle. Complements `decontaminated` (containment-ratio
    criterion via the inverted-index join)."""
    from mini_etl_spark.functions import bloom as bl

    train, test = _contamination_splits(spark, sf_dir)
    out = bl.bloom_decontaminate(train, test, n=5)
    return out.select("doc_id", "lang", "source", "n_chars")


def q_bloom_decontaminated_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same membership screen as `bloom_decontaminated`, but against a
    PERSISTED decontamination index (functions/bloom.py
    decontamination_index_write — the production shape: benchmark grams
    + Bloom words + params built once, nightly batches screened without
    re-reading the benchmark). Result contract is identical and
    sizing-independent, so the same exact-membership SQL is a full
    oracle; differing from `bloom_decontaminated` only in WHERE the
    benchmark side lives makes the pair a persistence-roundtrip
    differential test."""
    from mini_etl_spark.functions import bloom as bl

    train, test = _contamination_splits(spark, sf_dir)
    # per-process unique dir (no cross-process fixed-path race), built
    # once per process and cleaned at exit — see _per_process_index_dir
    path, fresh = _per_process_index_dir("bloom_index", sf_dir)
    if fresh:
        bl.decontamination_index_write(test, path, n=5)
    out = bl.bloom_decontaminate_indexed(train, path)
    return out.select("doc_id", "lang", "source", "n_chars")


def q_bloom_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom word table ITSELF over the test split's distinct
    5-grams — bit-level lock on the filter construction (one md5 per
    gram, Kirsch–Mitzenmacher double hashing, 62-bit words so every mask
    is a positive long in both engines). The DuckDB twin replays hex →
    int halves, the odd-stride positions, and the bit_or fold word for
    word. Small n_bits keeps the oracle's group count readable; the
    construction is sizing-independent."""
    from mini_etl_spark.functions import bloom as bl
    from mini_etl_spark.functions.text import exploded_shingles

    _, test = _contamination_splits(spark, sf_dir)
    grams = (
        exploded_shingles(test, "text", "doc_id", "__id", "gram", 5)
        .select("gram")
        .distinct()
    )
    return bl.bloom_build(grams, "gram", n_bits=62 * 64, k=5, seed=42)


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates, exact-verified. The verify stage
    re-scores candidates with TRUE Jaccard, and the pytest recall gate
    (LSH(verify) == exact) holds on this corpus — so the exact
    inverted-index Jaccard SQL is a full hash oracle for this query, even
    though the banding itself is xxhash64-based."""
    from mini_etl_spark.functions import dedup as dd

    docs = _t(spark, sf_dir, "documents")
    return dd.minhash_lsh_pairs(docs, threshold=0.5)


def q_simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash64 grouping in engine-portable (md5) signature mode: the
    DuckDB oracle recomputes every 64-bit signature — shingle hash halves,
    per-bit votes, sign packing — in SQL and hash-matches the groups.
    Production uses the default xxhash64 mode (same machinery, faster
    hash); the md5 mode exists precisely so the machinery is
    differentially testable."""
    from mini_etl_spark.functions import dedup as dd

    docs = _t(spark, sf_dir, "documents")
    return dd.simhash_dedup(docs, hash_fn="md5")


def q_near_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair list → duplicate GROUPS: distributed connected components
    (iterative min-label propagation, one shuffle per round) over the exact
    Jaccard pairs, with per-component sizes. The DuckDB oracle computes the
    same components via a recursive transitive-closure CTE — an O(V·E)
    formulation that is only viable at oracle scale, which is exactly why
    the engine-side algorithm is the iterative one."""
    from pyspark.sql import Window

    from mini_etl_spark.functions import dedup as dd

    docs = _t(spark, sf_dir, "documents")
    pairs = dd.jaccard_pairs(docs, threshold=0.5, max_shingle_freq=1000)
    comp = dd.connected_components(pairs)
    w = Window.partitionBy("component")
    return comp.select(
        F.col("node").alias("doc_id"),
        "component",
        F.count(F.lit(1)).over(w).alias("group_size"),
    )


def q_near_dup_groups_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same duplicate-GROUPS query via the alternating large-star/
    small-star contraction (`connected_components(algorithm="star")`) —
    the O(log n)-round, adversarial-diameter-safe mode. Components are
    identical to label propagation, so the SAME recursive-CTE oracle
    hash-checks this algorithm end-to-end."""
    from pyspark.sql import Window

    from mini_etl_spark.functions import dedup as dd

    docs = _t(spark, sf_dir, "documents")
    pairs = dd.jaccard_pairs(docs, threshold=0.5, max_shingle_freq=1000)
    comp = dd.connected_components(pairs, algorithm="star")
    w = Window.partitionBy("component")
    return comp.select(
        F.col("node").alias("doc_id"),
        "component",
        F.count(F.lit(1)).over(w).alias("group_size"),
    )


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash hamming-≤3 near-dup pairs via pigeonhole banding (4 chunks of
    16 bits; a pair within hamming 3 must agree on ≥1 chunk — recall 1.0 by
    construction, so the brute-force all-pairs popcount join IS an exact
    oracle, not an approximation bound). md5 signature mode makes the
    signatures SQL-recomputable; pytest additionally checks banding ==
    brute-force in the fast xxhash64 mode."""
    from mini_etl_spark.functions import dedup as dd

    docs = _t(spark, sf_dir, "documents")
    return dd.simhash_pairs(docs, max_hamming=3, hash_fn="md5")


def _query_vector(spark: SparkSession, sf_dir: str) -> list[float]:
    emb = _t(spark, sf_dir, "embeddings")
    return list(emb.filter("vec_id = 0").first().embedding)


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-20 around the vec_id=0 embedding —
    TakeOrderedAndProject, no global sort."""
    from mini_etl_spark.functions import similarity as sim

    emb = _t(spark, sf_dir, "embeddings")
    return sim.cosine_topk(emb, _query_vector(spark, sf_dir), k=20)


def q_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding near-dup pairs (cosine ≥ 0.3; the synthetic vectors
    are near-orthogonal, so higher thresholds return nothing)."""
    from mini_etl_spark.functions import dedup as dd

    emb = _t(spark, sf_dir, "embeddings")
    return dd.embedding_cosine_pairs(emb, threshold=0.3)


def q_cosine_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via banded hyperplane LSH + exact-cosine
    verification — the at-scale path (equi-joins only, vs the O(N²) theta
    join of ``cosine_pairs``). The seeded hyperplanes are folded into both
    the Spark plan and the DuckDB oracle as literals, so the bucketing is
    replicated bit-for-bit and the oracle is a FULL hash check, not
    rows-only. Threshold 0.3 because the synthetic vectors are
    near-orthogonal; recall vs the exact join is by the LSH S-curve and is
    pytest-gated on planted clusters (test_functions.py). 8 planes × 8
    tables: 256 buckets/table keeps the candidate volume ~N²/256 — the
    corpus-size tuning the docstring prescribes."""
    from mini_etl_spark.functions import dedup as dd

    emb = _t(spark, sf_dir, "embeddings")
    return dd.embedding_cosine_pairs_lsh(
        emb, threshold=0.3, num_planes=8, num_tables=8, dim=64
    )


def q_semantic_cell_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-scoped semantic near-dup pairs (SemDeDup shape): seeded
    random-projection cells bound the pair space to Σ|cell|²; exact cosine
    verification within cells. Centroids are reproducible from (dim, k,
    seed), so the DuckDB oracle replays the identical assignment — a full
    hash oracle for a cluster-scoped dedup."""
    from mini_etl_spark.functions import similarity as sim

    emb = _t(spark, sf_dir, "embeddings")
    cents = sim.random_unit_centroids(dim=64, k=32, seed=7)
    # method="expr" pinned: sequential-sum float order the DuckDB oracle
    # replays bit-for-bit. Library default is the faster "arrow" path.
    return sim.cell_cosine_pairs(emb, cents, threshold=0.3, method="expr")


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched approximate k-NN join (the RAG retrieval primitive): every
    25th vector is a query; top-5 cosine neighbors searched in the query's
    2 nearest random-projection cells. Deterministic centroids fold the
    identical assignment into the DuckDB oracle — full hash check of an
    ANN *join* (recall vs the exact scan is pytest-gated separately)."""
    from mini_etl_spark.functions import similarity as sim

    emb = _t(spark, sf_dir, "embeddings")
    cents = sim.random_unit_centroids(dim=64, k=32, seed=7)
    q = emb.filter(F.col("vec_id") % 25 == 0)
    # method="expr" pinned: sequential-sum float order the DuckDB oracle
    # replays bit-for-bit. Library default is the faster "arrow" path.
    return sim.knn_join(
        q, emb, cents, k=5, nprobe=2, exclude_self=True, method="expr"
    )


def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN top-10 (rows-only: approximate by design;
    recall vs brute force is asserted in pytest on planted clusters)."""
    from mini_etl_spark.functions import similarity as sim

    emb = _t(spark, sf_dir, "embeddings")
    return sim.lsh_topk(emb, _query_vector(spark, sf_dir), k=10)


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-10 with a SEEDED coarse quantizer: nprobe=3 cells of a
    deterministic random-projection codebook are scanned, exact cosine
    within them. Seeded centroids make the whole chain — assignment,
    probe-cell selection (stable (−dot, index) order), ranking — replay
    in DuckDB: a full hash oracle for an inverted-file ANN search. The
    k-means-trained quantizer (`ivf_centroids_kmeans`, iterative float
    state — not SQL-expressible) is the quality path, pytest-gated on
    planted clusters (tests/test_functions.py)."""
    from mini_etl_spark.functions import similarity as sim

    emb = _t(spark, sf_dir, "embeddings")
    cents = sim.random_unit_centroids(dim=64, k=8, seed=7)
    return sim.ivf_topk(emb, _query_vector(spark, sf_dir), cents, k=10, nprobe=3)


def q_ivf_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED-index form of `ivf_topk` — the build-once serve-many
    100 TB shape: centroids + cell-PARTITIONED vectors written to parquet
    once, then the probe reads ONLY the nprobe cells' hive partitions
    (file-listing-time pruning, ~nprobe/k of the files). Same seeded
    codebook as `ivf_topk`, so the SAME DuckDB oracle hash-checks the
    served result — the driver verifies the index lifecycle end-to-end.
    (Index built in a temp dir per call: the build is part of what's
    being verified, mirroring `incremental_dedup`.)"""
    from mini_etl_spark.functions import similarity as sim

    emb = _t(spark, sf_dir, "embeddings")
    cents = sim.random_unit_centroids(dim=64, k=8, seed=7)
    # per-process unique dir, built once, cleaned at exit
    path, fresh = _per_process_index_dir("ivf_idx", sf_dir)
    if fresh:
        sim.build_ivf_index(emb, path, centroids=cents)
    return sim.ivf_topk_indexed(
        spark, path, _query_vector(spark, sf_dir), k=10, nprobe=3
    )


def q_diverse_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-capped corpus sampling: at most 25 vectors per seeded
    random-projection cell, chosen in md5(seed, id) order — the
    embedding-space per-mode frequency cap (dense semantic clusters
    contribute boundedly, no pair computation). Seeded centroids + hash
    order make the whole selection a full hash oracle: DuckDB replays
    cell assignment and the md5 window identically."""
    from mini_etl_spark.functions import similarity as sim

    emb = _t(spark, sf_dir, "embeddings")
    cents = sim.random_unit_centroids(dim=64, k=32, seed=7)
    return sim.diversity_cap(
        emb, cents, cap=25, seed=11, keep_cell=True
    ).select("vec_id", "ivf_cell")


def q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-1 keyed merge (warehouse MERGE shape, beyond the reference's
    if_exists= vocabulary): customers active since 1998-06-01 get their
    account balance replaced by their recent spend and segment 'UPDATED';
    big spenders (>400k) are deleted; everyone else passes through. The
    delta is broadcast — the customer table never shuffles (two
    BroadcastHashJoins + union)."""
    from mini_etl_spark.operators.merge import merge_upsert

    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    recent = (
        orders.filter("o_orderdate >= TIMESTAMP '1998-06-01 00:00:00'")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
    )
    delta = (
        recent.join(customer, recent.o_custkey == customer.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            F.col("spend").alias("c_acctbal"),
            F.lit("UPDATED").alias("c_mktsegment"),
        )
    )
    return merge_upsert(
        customer, delta, keys="c_custkey", delete_condition="c_acctbal > 400000"
    )


def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 history merge: a current-only customer dimension (valid_from
    1995-01-01) receives a delta re-labelling 1998 heavy spenders as
    segment 'BIG98' effective 1998-06-01 — superseded rows are closed out
    (valid_to stamped, is_current false), new versions appended, unchanged
    keys untouched. One broadcast join against current rows + union; the
    history side never shuffles."""
    from mini_etl_spark.operators.merge import scd2_apply

    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    target = (
        customer.withColumn(
            "valid_from", F.lit("1995-01-01 00:00:00").cast("timestamp")
        ).withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )
    big98 = (
        orders.filter("o_orderdate >= TIMESTAMP '1998-06-01 00:00:00'")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
        .filter("spend > 300000")
    )
    delta = (
        big98.join(customer, big98.o_custkey == customer.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            "c_acctbal",
            F.lit("BIG98").alias("c_mktsegment"),
            F.lit("1998-06-01 00:00:00").cast("timestamp").alias("eff"),
        )
    )
    return scd2_apply(
        target,
        delta,
        keys="c_custkey",
        compare_cols=["c_mktsegment"],
        effective_col="eff",
    )


def q_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time view of the SCD-2 dimension built by q_scd2, as of the
    1998-06-01 effective instant: changed keys show their new BIG98 version
    (valid_from inclusive), unchanged keys their original row — the
    boundary semantics (valid_to exclusive) differentially checked. Pure
    filter on top of the merge plan: no extra shuffle."""
    from mini_etl_spark.operators.merge import scd2_snapshot

    return scd2_snapshot(q_scd2(spark, sf_dir), "1998-06-01 00:00:00")


_VALIDATE_RULES = {
    "discount_low": "l_discount <= 0.05",
    "qty_small": "l_quantity <= 30",
    "tax_bounded": "l_tax <= 0.06",
}


def q_validated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level validation with quarantine routing: every lineitem row is
    scored against three named rules in ONE codegen projection (NULL-safe:
    an unknown verdict is a violation), and the quarantined rows come back
    labeled with exactly the rules they failed. The full-hash oracle
    replays the per-rule CASE chain and the label aggregation."""
    from mini_etl_spark.operators.validate import split_valid

    li = _t(spark, sf_dir, "lineitem")
    _, quarantine = split_valid(
        li.select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"
        ),
        _VALIDATE_RULES,
    )
    return quarantine.select(
        "l_orderkey",
        "l_linenumber",
        F.array_join("violations", ",").alias("violated"),
    )


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup against a PERSISTED MinHash index (continuous-
    ingestion shape: the historical text is hashed once at index build and
    never re-read). Corpus = doc_id % 10 != 0, batch = the rest; md5
    signature mode (16 hashes / 4 bands) so DuckDB replays the entire
    chain — signatures, band buckets, candidate join, and the agreement
    estimator — bit-for-bit. est_jaccard = agreeing-component fraction."""
    from mini_etl_spark.functions.dedup_index import (
        minhash_index_dedup,
        minhash_index_write,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter("doc_id % 10 != 0")
    batch = docs.filter("doc_id % 10 = 0")
    # per-process unique dir, built once, cleaned at exit
    path, fresh = _per_process_index_dir("mh_index", sf_dir)
    if fresh:
        minhash_index_write(
            corpus, path, num_hashes=16, bands=4, hash_fn="md5"
        )
    return minhash_index_dedup(spark, path, batch, threshold=0.5)


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide paragraph dedup (the Dolma move): documents synthesized
    into 3-paragraph pages — a corpus-wide intro, unique content, and a
    paragraph shared within groups of 25 docs (built identically in the
    oracle). Every shared paragraph survives only in its global first
    (doc_id, position) occurrence; exact relational plan, full hash
    oracle."""
    from mini_etl_spark.functions import text as tx

    docs = _t(spark, sf_dir, "documents")
    synth = docs.select(
        "doc_id",
        F.concat_ws(
            "\n\n",
            F.lit("shared introduction paragraph for every page"),
            F.substring("text", 1, 60),
            F.concat(
                F.lit("group paragraph "), (F.col("doc_id") % 25).cast("string")
            ),
        ).alias("text"),
    )
    out = tx.dedup_paragraphs(synth, min_chars=5)
    return out.select(
        "doc_id",
        "text",
        F.size(F.split("text", "\n\n")).cast("long").alias("n_paras"),
    )


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis–
    Spirakis exponential race, md5-seeded): take 500 documents preferring
    long ones (weight = n_chars) — the "sample by quality score" move of
    corpus curation, reproducible across engines. One TakeOrderedAndProject,
    no global sort; full hash oracle replays the md5 + ln float chain."""
    from mini_etl_spark.functions import splits as sp

    docs = _t(spark, sf_dir, "documents")
    return sp.weighted_sample(
        docs.select("doc_id", "source", "n_chars"),
        key_col="doc_id",
        weight_col="n_chars",
        n=500,
        seed=13,
    )


def q_rolling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-hour RANGE window over irregular events (max +
    count of `value` in the last 3600s including the current event) — the
    sliding metric a rows-frame cannot express. Epoch-microsecond range
    frame, ANSI peer semantics; max/count (order-independent) so the
    oracle replays bit-for-bit. One shuffle on user_id."""
    from mini_etl_spark.operators.timeseries import rolling_window

    ev = _t(spark, sf_dir, "events")
    return rolling_window(
        ev.select("event_id", "user_id", "ts", "value"),
        ts_col="ts",
        value_col="value",
        window_seconds=3600,
        partition_cols=["user_id"],
        aggs=("max", "count"),
        round_to=None,
    ).select(
        "event_id", "user_id", "value_rolling_max", "value_rolling_count"
    )


def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by blocked edit-distance join: supplier names vs a
    deterministically typo'd copy (char 5 substituted, ids offset) —
    suffix blocking because these names discriminate at the tail, so the
    mid-string typo stays inside the block and every planted pair is
    recovered at distance 1. Candidates are one suffix-equi join + length
    band, levenshtein only on survivors; the DuckDB oracle replays the
    identical normalize/block/verify chain (same levenshtein)."""
    from mini_etl_spark.functions.fuzzy import fuzzy_join

    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    typos = sup.select(
        (F.col("s_suppkey") + 100000).alias("t_id"),
        F.concat(
            F.substring("s_name", 1, 4), F.lit("x"), F.expr("substring(s_name, 6)")
        ).alias("t_name"),
    )
    return fuzzy_join(
        sup, typos, "s_name", "t_name", max_distance=2, block_on="suffix",
        block_len=3,
    )


def q_script_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode script detection for multilingual-corpus triage: per-doc
    script-letter counts (strip-and-subtract regexp trick, one codegen
    projection) and the dominant-script label. The DuckDB oracle replays
    the same character classes in RE2 syntax."""
    from mini_etl_spark.functions.text import dominant_script, script_counts

    docs = _t(spark, sf_dir, "documents")
    sc = script_counts("text")
    return docs.select(
        "doc_id",
        sc["latin"].alias("latin"),
        sc["cjk"].alias("cjk"),
        sc["letters"].alias("letters"),
        dominant_script("text").alias("script"),
    )


def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (price, quantity) — the
    multi-column file-skipping layout (`maintenance.zorder_write` sorts by
    it; Delta/Iceberg OPTIMIZE ZORDER effect from plain expressions). The
    min-max bucketing + bit interleave is pure arithmetic, so DuckDB
    replays the identical key for every row (the bucket formula's float
    division chain is written identically in both engines)."""
    from mini_etl_spark.maintenance import zorder_value

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"
    )
    z = zorder_value(li, ["l_extendedprice", "l_quantity"], bits=8)
    return li.select("l_orderkey", "l_linenumber", z.alias("zval"))


def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of the orders table (count / nulls / exact
    distincts / min / max per column, long format) — the data-quality
    snapshot run before every big ingest. Exact distincts make the plan an
    Expand (documented cost); columns chosen so string-casts of min/max
    are engine-portable (longs + strings — double repr differs across
    engines and is excluded from the oracle query on purpose)."""
    from mini_etl_spark.maintenance import profile

    orders = _t(spark, sf_dir, "orders")
    return profile(
        orders, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    )


def q_top_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profiler companion: top-5 most frequent values for three orders
    columns in ONE melt pass (single explode projection → one count
    aggregate → one k-bounded window) — never a per-column job. Ties
    break on the value string, so the ranking is deterministic and the
    DuckDB oracle replays it exactly."""
    from mini_etl_spark.maintenance import profile_top_values

    orders = _t(spark, sf_dir, "orders")
    return profile_top_values(
        orders, ["o_orderstatus", "o_orderpriority", "o_custkey"], k=5
    )


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bin histogram of l_extendedprice — one partial+final
    aggregate over the bucket index (exchange carries ≤ bins rows/task).
    Bounds come from the data; the bucket chain and the bin-edge float
    arithmetic replay identically in DuckDB (same width_bucket formula as
    zorder_key)."""
    from mini_etl_spark.maintenance import histogram

    li = _t(spark, sf_dir, "lineitem")
    return histogram(li, "l_extendedprice", bins=20)


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer→supplier order graph (3 power
    iterations, damping 0.85) — the link-graph quality prior of web-corpus
    curation, as joins + aggregates. Fixed iterations and a shared
    left-associated float chain let DuckDB replay the whole power method
    as unrolled CTEs; ranks rounded to 6 at the very end only."""
    from mini_etl_spark.functions.graph import pagerank

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 100000).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(edges, iterations=3)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def q_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSONALIZED PageRank: the whole teleport mass lands on seed
    customers 1-5, so ranks measure proximity to the seed set (the
    'more like these sites' crawl-expansion prior). Same unrolled-CTE
    replay with a CASE teleport term; float chain ((1-d)·N)/|S| written
    in the identical order both sides; ranks rounded to 6 at the end."""
    from mini_etl_spark.functions.graph import pagerank

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 100000).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(edges, iterations=3, personalized=[1, 2, 3, 4, 5])
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def q_domain_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive-Bayes domain classifier (the CCNet/GPT-3 quality-filter slot,
    relationally): train multinomial NB with add-one smoothing on the
    documents' own `source` labels, then classify every document —
    (doc_id, label, score), best class per doc, rounded log-posterior.
    Training is exact integer counts + one ln() chain, scoring one
    explode + model equi-join + hash aggregate — the ENTIRE train+score
    pipeline replays in DuckDB as one SQL statement (full hash oracle).
    DSIR-style importance weights (`classify.log_ratio_weights`) are the
    two-class log-ratio of the same scores, pytest-gated."""
    from mini_etl_spark.functions import classify as cl

    docs = _t(spark, sf_dir, "documents")
    model = cl.nb_train(docs, label_col="source")
    return cl.nb_classify(model, docs)


def q_pagerank_redistribute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank with dangling-mass redistribution: every supplier node is
    a sink in the customer→supplier graph, so each iteration spreads the
    sinks' aggregate rank uniformly (rank = (1−d) + d·(Σ_in + S/N)) — the
    mass-conserving formulation (Σ rank stays ~N; pytest-asserted). Same
    unrolled-CTE replay as `pagerank`, plus one 1-row dangling-sum CTE
    per iteration; ranks rounded to 6 at the very end only."""
    from mini_etl_spark.functions.graph import pagerank

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 100000).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(edges, iterations=3, dangling="redistribute")
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the supplier co-occurrence graph (suppliers
    sharing an order are linked): ordered two-path join closed against the
    edge set — each triangle built once, no bidirectional edge blowup.
    Exact integer, full hash oracle."""
    from mini_etl_spark.functions.graph import triangle_count

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst")
        )
        .distinct()
    )
    return triangle_count(edges)


def q_k_anonymized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity enforcement (suppress mode): customers whose
    (nation, market-segment) quasi-identifier combination is shared by
    fewer than 8 customers are dropped — no row can be singled out by
    joining those two columns externally. One map-side-combined QI count
    + one broadcast anti-join; the fact side never shuffles."""
    from mini_etl_spark.functions.privacy import k_anonymize

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    return k_anonymize(cust, ["c_nationkey", "c_mktsegment"], k=8)


def q_group_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag OLS trend of extended price against quantity
    (maintenance.group_linear_trend): five exact-integer sums per group
    in one hash aggregate, slope/intercept through a fixed-shape float
    chain, emitted as integer-scaled longs — regression output an
    external engine replays bit-for-bit. Full hash oracle."""
    from mini_etl_spark.maintenance import group_linear_trend

    li = _t(spark, sf_dir, "lineitem")
    return group_linear_trend(
        li, "l_quantity", "l_extendedprice", ["l_returnflag"]
    )


def q_column_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two epochs of the events
    stream (event_id parity split — deterministic, both sides scan-
    prunable): per-bin counts/fractions and PSI contributions over 10
    shared equi-width bins (maintenance.distribution_drift — same
    width_bucket chain the histogram/zorder oracles replay
    bit-identically). The ops-side "did the new batch shift the
    distribution" monitor; Σ psi_contrib is the PSI. Floats rounded to
    6 (cross-engine ln/division ulp contract, same as pagerank)."""
    from mini_etl_spark import maintenance as mt

    ev = _t(spark, sf_dir, "events")
    out = mt.distribution_drift(
        ev.filter("event_id % 2 = 0"), ev.filter("event_id % 2 = 1"),
        "value", bins=10,
    )
    return out.select(
        "bin",
        F.round("lo", 6).alias("lo"),
        F.round("hi", 6).alias("hi"),
        "count_a",
        "count_b",
        F.round("frac_a", 6).alias("frac_a"),
        F.round("frac_b", 6).alias("frac_b"),
        F.round("psi_contrib", 6).alias("psi_contrib"),
    )


def q_category_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical-PSI epoch monitor (maintenance.category_drift): value
    mix of documents.source between the doc_id-parity epochs — top-8
    values by combined count (ties to the lexically smallest), the rest
    folded into one __other__ row so the report stays bounded at any
    cardinality; fractions over FULL epoch totals, epsilon guard for a
    vanished value. The value-mix sibling of `column_drift` — real
    ingestion drifts on source/lang mixes at least as often as on
    numeric features. Floats rounded 6 (ln/division ulp contract)."""
    from mini_etl_spark import maintenance as mt

    docs = _t(spark, sf_dir, "documents")
    out = mt.category_drift(
        docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1"),
        "source", top_k=8,
    )
    return out.select(
        "value",
        "count_a",
        "count_b",
        F.round("frac_a", 6).alias("frac_a"),
        F.round("frac_b", 6).alias("frac_b"),
        F.round("psi_contrib", 6).alias("psi_contrib"),
    )


def q_quantile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency decile assignment (maintenance.quantile_buckets):
    exact cents-fixed percentile boundaries from one tiny aggregate,
    then a pure codegen count-of-boundaries-below expression — the
    distributed-safe ntile (no global window). Per-row bucket output;
    DuckDB replays quantile_cont over the same fixed values."""
    from mini_etl_spark.maintenance import quantile_buckets

    li = _t(spark, sf_dir, "lineitem")
    return quantile_buckets(li, "l_extendedprice", buckets=10).select(
        "l_orderkey", "l_linenumber", "qbucket"
    )


def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit Benford audit (maintenance.benford_audit) over
    extended prices: per leading digit, count, share and the expected
    log10(1+1/d) frequency — the fabricated-numbers / unit-mixing smell
    test. Digits come from exact integer-cents strings (never float
    formatting); expected shares are identical Python-computed literals
    embedded in both engines. Full hash oracle."""
    from mini_etl_spark.maintenance import benford_audit

    li = _t(spark, sf_dir, "lineitem")
    return benford_audit(li, "l_extendedprice")


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (privacy.l_diversity_report): per
    (nation, segment) QI group, the count of distinct account-balance
    brackets — a k-anonymous group whose members all share one bracket
    is still a homogeneity disclosure. Two hash aggregates; full hash
    oracle."""
    from mini_etl_spark.functions.privacy import l_diversity_report

    cust = _t(spark, sf_dir, "customer").withColumn(
        "balance_bracket",
        F.floor(F.col("c_acctbal") / F.lit(2000.0)).cast("long"),
    )
    return l_diversity_report(
        cust, ["c_nationkey", "c_mktsegment"], "balance_bracket", l=3
    )


def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnostic: the 25 heaviest l_suppkey values with row count and
    share of the fact table — the pre-flight check for choosing salted vs
    broadcast vs plain shuffle joins at 100 TB. Partial+final aggregate,
    broadcast scalar total, TakeOrderedAndProject top-n."""
    from mini_etl_spark.operators.skew import key_skew_stats

    li = _t(spark, sf_dir, "lineitem")
    return key_skew_stats(li.select("l_suppkey"), "l_suppkey", top_n=25)


def _synth_url() -> "Column":
    """Deterministic URL per document (the synthetic corpus has no URL
    column): scheme/subdomain/suffix/port/query/fragment all derived from
    doc_id % k so every parsing and normalization branch is exercised —
    mixed-case hosts, userinfo, multi-part suffixes (co.uk), default and
    non-default ports, tracking params, fragments. The DuckDB oracles
    build the SAME string (``_SYNTH_URL_SQL``)."""
    did = F.col("doc_id")
    s = did.cast("string")
    return F.concat(
        F.when(did % 2 == 0, F.lit("https")).otherwise(F.lit("http")),
        F.lit("://"),
        F.when(did % 7 == 0, F.lit("User:Pw@Tracker.")).otherwise(F.lit("www.")),
        F.col("source"),
        F.when(did % 4 == 0, F.lit(".example.com"))
        .when(did % 4 == 1, F.lit(".data.co.uk"))
        .when(did % 4 == 2, F.lit(".archive.org"))
        .otherwise(F.lit(".news.net")),
        F.when(did % 5 == 0, F.lit(":443"))
        .when(did % 5 == 1, F.lit(":80"))
        .when(did % 5 == 2, F.lit(":8080"))
        .otherwise(F.lit("")),
        F.lit("/p/"), s,
        F.when(did % 3 == 0, F.concat(F.lit("?utm_source=feed&id="), s,
                                      F.lit("&utm_campaign=x")))
        .when(did % 3 == 1, F.concat(F.lit("?id="), s))
        .otherwise(F.lit("")),
        F.when(did % 2 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )


def q_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL curation front end (functions/web.py): parse scheme/host/port/
    path/query/fragment, reduce host to its registered domain (the
    per-site grouping key), and canonicalize the URL for dedup — all one
    codegen projection, zero shuffles. Full hash oracle: DuckDB replays
    the same RE2-safe regex chain and the list_filter tracking-param
    drop over identically synthesized URLs."""
    from mini_etl_spark.functions.web import normalize_url, with_url_parts

    docs = _t(spark, sf_dir, "documents").withColumn("url", _synth_url())
    parts = with_url_parts(docs, "url")
    return parts.select(
        "doc_id", "url_scheme", "url_host", "url_port", "url_domain",
        "url_path", "url_query", "url_fragment",
        normalize_url(F.col("url")).alias("url_norm"),
    )


def q_link_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink host census: extract in-text URLs (with trailing
    punctuation stripped per link), explode, reduce to host and
    registered domain, count — the first pass of building a link graph
    for ``functions.graph.pagerank`` over a crawl. Extraction is
    ``regexp_extract_all`` + a transform lambda, so the document body
    never leaves the JVM; the only shuffle is the final host count.
    Full hash oracle: DuckDB replays the same extraction on identically
    synthesized link-bearing text."""
    from mini_etl_spark.functions import web

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    txt = F.concat(
        F.lit("Visit https://"), F.col("source"), F.lit(".example.com/a/"), did,
        F.lit(" and (http://mirror."), F.col("source"), F.lit(".news.net/b?x="),
        did, F.lit(")."),
    )
    links = docs.select(F.explode(web.extract_urls(txt)).alias("link"))
    hosts = links.select(web.url_host(F.col("link")).alias("host"))
    return (
        hosts.groupBy("host")
        .agg(F.count("*").alias("n_links"))
        .withColumn("domain", web.registered_domain(F.col("host")))
    )


def q_html_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl HTML → visible text (functions/web.py html_to_text): the
    synthetic corpus is plain text, so the query wraps it in
    deterministic markup (script/style/comments/entities/tables — every
    branch of the chain) and extracts it back. One codegen projection;
    full hash oracle generated from the SAME ordered HTML_STEPS list."""
    from mini_etl_spark.functions.web import html_to_text

    docs = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>D</title><script>var x = 1;</script>"
              "<style>p{color:red}</style></head><body><!-- c --><h1>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.substring("text", 1, 120),
        F.lit(" &amp; more&nbsp;here</p><div>1 &lt; 2</div>"
              "<table><tr><td>a</td><td>b</td></tr></table></body></html>"),
    )
    return docs.select("doc_id", html_to_text(html).alias("text_html"))


def q_url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast domain blocklist (suffix-aware: blocking example.com
    also blocks every subdomain) then per-registered-domain survivor
    counts — the C4-style site-level exclusion pass. The 100 TB shape:
    the blocklist is vocabulary-sized and broadcast, the document table
    never shuffles until the final map-side-combined count."""
    from mini_etl_spark.functions.web import filter_url_blocklist, with_url_parts

    docs = _t(spark, sf_dir, "documents").withColumn("url", _synth_url())
    kept = filter_url_blocklist(
        docs, "url", blocked=["example.com", "data.co.uk"], match="suffix"
    )
    return (
        with_url_parts(kept, "url")
        .groupBy("url_domain")
        .agg(F.count("*").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_group_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ROTATION RULE (since r12): all 158 pre-r12 keys are driver-green in the
    # r01-r11 union, so the ordering criterion moved from "never stamped"
    # to FRESHNESS — keys sorted ASCENDING by the round of their most
    # recent green driver stamp (ties keep prior order), so the driver's
    # front-50 correctness sample always RE-stamps the 50 stalest keys as
    # the code evolves. Re-derive each round from
    # artifacts/CORRECTNESS_r* + the root CORRECTNESS_r{N}.json files
    # (green = rows+schema+hash all true). Every entry, regardless of
    # position, is differentially tested bit-level by
    # tests/test_oracle.py on every pytest run.
    return {
        # --- never stamped (new in r12) ---
        "set_jaccard_exact": q_set_jaccard_exact,
        "jaccard_pairs_exact": q_jaccard_pairs_exact,
        "jaccard_index_probe": q_jaccard_index_probe,
        # --- last driver-green stamp: r01 ---
        "cosine_pairs": q_cosine_pairs,
        # --- last driver-green stamp: r02 ---
        "fillna_ffill": q_fillna_ffill,
        "rollup": q_rollup,
        "order_gaps": q_order_gaps,
        "part_type_revenue": q_part_type_revenue,
        "dedup_unique_only": q_dedup_unique_only,
        "cube": q_cube,
        "set_ops": q_set_ops,
        "distinct_agg": q_distinct_agg,
        "order_priority": q_order_priority,
        "market_share": q_market_share,
        "priority_lines": q_priority_lines,
        "promo_revenue": q_promo_revenue,
        "brand_revenue": q_brand_revenue,
        "volume_shipping": q_volume_shipping,
        "top_supplier": q_top_supplier,
        "waiting_supplier": q_waiting_supplier,
        "customer_distribution": q_customer_distribution,
        "cheapest_per_part": q_cheapest_per_part,
        "small_quantity_revenue": q_small_quantity_revenue,
        "large_volume_orders": q_large_volume_orders,
        "dormant_customers": q_dormant_customers,
        "important_parts": q_important_parts,
        "supplier_part_count": q_supplier_part_count,
        "dominant_shippers": q_dominant_shippers,
        # --- last driver-green stamp: r03 ---
        "group_agg": q_group_agg,
        "filter_expression": q_filter_expression,
        "select_rename_project": q_select_rename_project,
        "cast_lenient": q_cast_lenient,
        "fillna": q_fillna,
        "dedup_first": q_dedup_first,
        "sort": q_sort,
        "union_concat": q_union_concat,
        "validated": q_validated,
        "join_star": q_join_star,
        "join_outer": q_join_outer,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "anti_join": q_anti_join,
        "topk_per_group": q_topk_per_group,
        "running_window": q_running_window,
        "fuzzy_match": q_fuzzy_match,
        "pivot": q_pivot,
        "expression_derive": q_expression_derive,
        "map_batches": q_map_batches,
        "group_zscore": q_group_zscore,
        "schema_coerce": q_schema_coerce,
        "sessionize": q_sessionize,
        "events_window": q_events_window,
        "shipping_priority": q_shipping_priority,
        "regional_revenue": q_regional_revenue,
        "product_profit": q_product_profit,
        "quality_percentile": q_quality_percentile,
        "returned_revenue": q_returned_revenue,
        "incremental_rollup": q_incremental_rollup,
        "text_features": q_text_features,
        "doc_repetition": q_doc_repetition,
        "doc_chunks": q_doc_chunks,
        "pack_sequences": q_pack_sequences,
        "bm25_topk": q_bm25_topk,
        "pii_redaction": q_pii_redaction,
        "hash_split": q_hash_split,
        "weighted_sample": q_weighted_sample,
        "paragraph_dedup": q_paragraph_dedup,
        "exact_dedup": q_exact_dedup,
        "jaccard_pairs": q_jaccard_pairs,
        "near_dup_groups": q_near_dup_groups,
        "corpus_clean": q_corpus_clean,
        "contamination": q_contamination,
        "incremental_dedup": q_incremental_dedup,
        "cosine_pairs_lsh": q_cosine_pairs_lsh,
        "cosine_topk": q_cosine_topk,
        "upsert": q_upsert,
        "scd2": q_scd2,
        "scd2_snapshot": q_scd2_snapshot,
        # --- last driver-green stamp: r04 ---
        "key_skew": q_key_skew,
        "token_mixture": q_token_mixture,
        "semantic_cell_pairs": q_semantic_cell_pairs,
        "line_hygiene": q_line_hygiene,
        "multimodal_features": q_multimodal_features,
        "semi_join": q_semi_join,
        "percentiles": q_percentiles,
        "json_extract": q_json_extract,
        "funnel": q_funnel,
        "retention_cohorts": q_retention_cohorts,
        "vocab_top_terms": q_vocab_top_terms,
        "embedding_quantize": q_embedding_quantize,
        "pq_topk": q_pq_topk,
        "stratified_sample": q_stratified_sample,
        "source_cap": q_source_cap,
        "decontaminated": q_decontaminated,
        "corpus_shuffle": q_corpus_shuffle,
        "embedding_centroids": q_embedding_centroids,
        "lm_score": q_lm_score,
        "lm_perplexity": q_lm_perplexity,
        "normalized_text": q_normalized_text,
        "unpivot": q_unpivot,
        "simhash_pairs": q_simhash_pairs,
        "knn_join": q_knn_join,
        "duplicate_spans": q_duplicate_spans,
        # --- last driver-green stamp: r05 ---
        "top_values": q_top_values,
        # --- last driver-green stamp: r08 ---
        "histogram": q_histogram,
        # --- last driver-green stamp: r09 ---
        "profile": q_profile,
        # --- last driver-green stamp: r10 ---
        "pagerank_redistribute": q_pagerank_redistribute,
        "domain_score": q_domain_score,
        "diverse_sample": q_diverse_sample,
        "ivf_topk_indexed": q_ivf_topk_indexed,
        "triangles": q_triangles,
        # --- last driver-green stamp: r11 ---
        "bloom_decontaminated": q_bloom_decontaminated,
        "bloom_decontaminated_indexed": q_bloom_decontaminated_indexed,
        "bloom_bits": q_bloom_bits,
        "jaccard_pairs_budget": q_jaccard_pairs_budget,
        "budget_cap_fit": q_budget_cap_fit,
        "hashed_vectors": q_hashed_vectors,
        "approx_sketches": q_approx_sketches,
        "bpe_vocab": q_bpe_vocab,
        "word_histogram_topk": q_word_histogram_topk,
        "span_removal": q_span_removal,
        "snapshot_diff": q_snapshot_diff,
        "resample": q_resample,
        "ivf_topk": q_ivf_topk,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash_dedup": q_simhash_dedup,
        "lsh_topk": q_lsh_topk,
        "psl_domain_cap": q_psl_domain_cap,
        "sparse_cosine_pairs": q_sparse_cosine_pairs,
        "kmeans_clusters": q_kmeans_clusters,
        "bpe_encode": q_bpe_encode,
        "heavy_hitters": q_heavy_hitters,
        "grouping_sets": q_grouping_sets,
        "mad_outliers": q_mad_outliers,
        "conversation_redaction": q_conversation_redaction,
        "semantic_decontaminated": q_semantic_decontaminated,
        "token_shards": q_token_shards,
        "chat_json_roundtrip": q_chat_json_roundtrip,
        "pagerank_personalized": q_pagerank_personalized,
        "set_jaccard": q_set_jaccard,
        "containment_pairs": q_containment_pairs,
        "l_diversity": q_l_diversity,
        "benford": q_benford,
        "quantile_buckets": q_quantile_buckets,
        "column_drift": q_column_drift,
        "category_drift": q_category_drift,
        "group_trend": q_group_trend,
        "temperature_mix": q_temperature_mix,
        "common_ngrams": q_common_ngrams,
        "conversation_stats": q_conversation_stats,
        "preference_pairs": q_preference_pairs,
        "url_parse": q_url_parse,
        "url_blocklist": q_url_blocklist,
        "link_hosts": q_link_hosts,
        "html_text": q_html_text,
        "near_dup_groups_star": q_near_dup_groups_star,
        "rolling_hour": q_rolling_hour,
        "k_anonymized": q_k_anonymized,
        "zorder_key": q_zorder_key,
        "script_id": q_script_id,
        "pagerank": q_pagerank,
    }


# DuckDB dialect building blocks for the text oracle — must mirror
# mini_etl_spark/functions/text.py exactly (same tokenization, same CASE
# chain, same rounding).
_D_TOKENS = (
    "list_filter(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '), "
    "t -> t != '')"
)
def _d_normalize(expr: str) -> str:
    """DuckDB replay of text.normalize_text: the SAME ordered step list
    (imported, not copied) folded into nested regexp_replace(..., 'g')
    calls + trim. Patterns are valid in both Java regex and RE2 by
    construction (text.NORMALIZE_STEPS contract)."""
    from mini_etl_spark.functions.text import NORMALIZE_STEPS

    for pat, rep in NORMALIZE_STEPS:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return f"trim({expr})"


_D_STOP = {
    "en": "['the','and','of','to','in','is','was','for','with','that']",
    "de": "['der','die','das','und','ist','von','mit','nicht','ein','auf']",
    "fr": "['le','la','les','et','est','dans','pour','que','une','des']",
    "es": "['el','los','las','es','en','para','por','una','del','como']",
}
_D_SHINGLES = (
    f"CASE WHEN len({_D_TOKENS}) >= 3 THEN "
    f"list_distinct(list_transform(range(1, len({_D_TOKENS})-2+1), "
    f"i -> array_to_string(({_D_TOKENS})[i:i+2], ' '))) "
    "ELSE [] END"
)


def _d_shingles_n(n: int) -> str:
    """DuckDB twin of text.shingles (distinct token n-grams) for any n —
    the generalized form of _D_SHINGLES (which pins n=3)."""
    return (
        f"CASE WHEN len({_D_TOKENS}) >= {n} THEN "
        f"list_distinct(list_transform(range(1, len({_D_TOKENS})-{n - 1}+1), "
        f"i -> array_to_string(({_D_TOKENS})[i:i+{n - 1}], ' '))) "
        "ELSE [] END"
    )
def _d_md5_64(x: str) -> str:
    """DuckDB twin of dedup._element_hash64(hash_fn='md5'): two 32-bit md5
    halves packed into one signed 64-bit word. Spark's shiftleft(hi,32)
    wraps in two's complement; DuckDB's << overflow-checks, so the wrap is
    made explicit (hi reinterpreted signed-32, then an exact multiply)."""
    hi = f"('0x' || substr(md5({x}), 1, 8))::BIGINT"
    lo = f"('0x' || substr(md5({x}), 9, 8))::BIGINT"
    return (
        f"(({hi} - CASE WHEN {hi} >= 2147483648 THEN 4294967296 ELSE 0 END)"
        f" * 4294967296 + {lo})"
    )


def _d_minhash_incremental_sql(
    num_hashes: int = 16, bands: int = 4, threshold: float = 0.5
) -> str:
    """Full DuckDB replay of q_incremental_dedup's index chain: md5-seeded
    MinHash signatures for corpus and batch, band buckets (joined slice
    strings), the (band,bucket) candidate equi-join, and the signature-
    agreement Jaccard estimator. Generated so the 16 min-hash expressions
    cannot drift from dedup_index.minhash_signatures' loop."""
    r = num_hashes // bands
    mins = ", ".join(
        "MIN({h}) AS h{i}".format(h=_d_md5_64(f"'{i}:' || g"), i=i)
        for i in range(num_hashes)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {expr} AS bucket FROM sig".format(
            b=b,
            expr=" || ',' || ".join(
                f"CAST(h{b * r + j} AS VARCHAR)" for j in range(r)
            ),
        )
        for b in range(bands)
    )
    agree = " + ".join(
        f"CASE WHEN bs.h{i} = cs.h{i} THEN 1 ELSE 0 END" for i in range(num_hashes)
    )
    return f"""
        WITH g AS (
          SELECT doc_id, unnest(sh) AS g
          FROM (SELECT doc_id, {_D_SHINGLES} AS sh FROM documents)),
        sig AS (SELECT doc_id, {mins} FROM g GROUP BY doc_id),
        bands AS ({band_selects}),
        cand AS (
          SELECT DISTINCT bb.doc_id AS batch_id, cb.doc_id AS corpus_id
          FROM bands bb JOIN bands cb
            ON bb.band = cb.band AND bb.bucket = cb.bucket
          WHERE bb.doc_id % 10 = 0 AND cb.doc_id % 10 != 0)
        SELECT batch_id, corpus_id,
               round(({agree}) / {float(num_hashes)}, 4) AS est_jaccard
        FROM cand
        JOIN sig bs ON bs.doc_id = batch_id
        JOIN sig cs ON cs.doc_id = corpus_id
        WHERE ({agree}) / {float(num_hashes)} >= {threshold}
    """


def _d_script_sql() -> str:
    """DuckDB twin of text.script_counts/dominant_script: identical
    character classes translated Java \\uXXXX → RE2 \\x{XXXX}, identical
    strip-and-subtract counting, identical CASE order (with the default
    0.5 threshold at most one script can pass the strict >)."""
    import re as _re

    from mini_etl_spark.functions.text import SCRIPT_RANGES

    def re2(cls: str) -> str:
        return _re.sub(r"\\u([0-9a-fA-F]{4})", r"\\x{\1}", cls)

    counts = ", ".join(
        f"length(text) - length(regexp_replace(text, '[{re2(cls)}]', '', 'g')) AS {n}"
        for n, cls in SCRIPT_RANGES
    )
    letters = " + ".join(n for n, _ in SCRIPT_RANGES)
    branches = " ".join(
        f"WHEN CAST({n} AS DOUBLE) > CAST(letters AS DOUBLE) * 0.5 THEN '{n}'"
        for n, _ in SCRIPT_RANGES
    )
    return f"""
        WITH c AS (SELECT doc_id, text, {counts} FROM documents),
        l AS (SELECT *, {letters} AS letters FROM c)
        SELECT doc_id, latin, cjk, letters,
               CASE WHEN text IS NULL THEN NULL
                    WHEN letters = 0 THEN 'unknown'
                    {branches}
                    ELSE 'mixed' END AS script
        FROM l
    """


def _d_profile_sql() -> str:
    """DuckDB twin of maintenance.profile over four orders columns (long
    format; one SELECT per column, unioned)."""
    cols = [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_orderpriority", "string"),
    ]
    parts = [
        f"""
        SELECT '{c}' AS "column", '{t}' AS dtype, count(*) AS row_count,
               count(*) - count({c}) AS null_count,
               count(DISTINCT {c}) AS distinct_count,
               CAST(min({c}) AS VARCHAR) AS min_value,
               CAST(max({c}) AS VARCHAR) AS max_value
        FROM orders"""
        for c, t in cols
    ]
    return " UNION ALL ".join(parts)


def _d_pagerank_sql(iterations: int = 3) -> str:
    """DuckDB twin of graph.pagerank over the customer→supplier order
    graph: the power method unrolled as chained CTEs. The teleport
    constant is written as (1.0 - 0.85) so both engines evaluate the
    IDENTICAL IEEE double (a literal 0.15 is a different double than
    1.0 - 0.85); ranks round to 6 only at the end."""
    ctes = ["""
        e AS (SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + 100000 AS dst
              FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        deg AS (SELECT src, count(*) AS dg FROM e GROUP BY src),
        r0 AS (SELECT node, 1.0 AS rank FROM nodes)"""]
    for i in range(1, iterations + 1):
        ctes.append(f"""
        c{i} AS (SELECT e.dst, sum(r.rank / d.dg) AS cin
                 FROM e JOIN deg d ON d.src = e.src
                        JOIN r{i - 1} r ON r.node = e.src
                 GROUP BY e.dst),
        r{i} AS (SELECT n.node,
                        (1.0 - 0.85) + 0.85 * coalesce(c.cin, 0.0) AS rank
                 FROM nodes n LEFT JOIN c{i} c ON c.dst = n.node)""")
    return (
        "WITH " + ",".join(ctes)
        + f" SELECT node, round(rank, 6) AS rank FROM r{iterations}"
    )


def _d_pagerank_personalized_sql(
    iterations: int = 3, seeds: tuple = (1, 2, 3, 4, 5)
) -> str:
    """DuckDB twin of graph.pagerank(personalized=seeds): the unrolled
    power method with a CASE teleport — the whole (1−d)·N mass split
    over the seeds, zero elsewhere. The per-seed constant is computed at
    runtime as (1.0 - 0.85) * nc.n / |S| — the same left-associated op
    sequence the Spark side evaluates in Python — so both engines land
    on the identical double."""
    seed_in = ", ".join(str(s) for s in seeds)
    ns = float(len(seeds))
    ctes = ["""
        e AS (SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + 100000 AS dst
              FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        deg AS (SELECT src, count(*) AS dg FROM e GROUP BY src),
        ncnt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        r0 AS (SELECT node, 1.0 AS rank FROM nodes)"""]
    for i in range(1, iterations + 1):
        ctes.append(f"""
        c{i} AS (SELECT e.dst, sum(r.rank / d.dg) AS cin
                 FROM e JOIN deg d ON d.src = e.src
                        JOIN r{i - 1} r ON r.node = e.src
                 GROUP BY e.dst),
        r{i} AS (SELECT n.node,
                        (CASE WHEN n.node IN ({seed_in})
                              THEN (1.0 - 0.85) * nc.n / {ns!r}
                              ELSE 0.0 END)
                        + 0.85 * coalesce(c.cin, 0.0) AS rank
                 FROM nodes n LEFT JOIN c{i} c ON c.dst = n.node, ncnt nc)""")
    return (
        "WITH " + ",".join(ctes)
        + f" SELECT node, round(rank, 6) AS rank FROM r{iterations}"
    )


def _d_pagerank_redistribute_sql(iterations: int = 3) -> str:
    """DuckDB twin of graph.pagerank(dangling='redistribute'): the same
    unrolled power method plus, per iteration, a 1-row CTE summing the
    sink nodes' rank, divided by the (double) node count — the float
    chain written in the IDENTICAL order as the Spark side:
    (1.0 − 0.85) + 0.85 · (coalesce(cin, 0.0) + dang / n)."""
    ctes = ["""
        e AS (SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + 100000 AS dst
              FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        deg AS (SELECT src, count(*) AS dg FROM e GROUP BY src),
        ncnt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        r0 AS (SELECT node, 1.0 AS rank FROM nodes)"""]
    for i in range(1, iterations + 1):
        ctes.append(f"""
        c{i} AS (SELECT e.dst, sum(r.rank / d.dg) AS cin
                 FROM e JOIN deg d ON d.src = e.src
                        JOIN r{i - 1} r ON r.node = e.src
                 GROUP BY e.dst),
        g{i} AS (SELECT coalesce(sum(rank), 0.0) AS dang
                 FROM r{i - 1}
                 WHERE node NOT IN (SELECT src FROM deg)),
        r{i} AS (SELECT n.node,
                        (1.0 - 0.85) + 0.85 * (coalesce(c.cin, 0.0)
                                               + g.dang / nc.n) AS rank
                 FROM nodes n LEFT JOIN c{i} c ON c.dst = n.node,
                      g{i} g, ncnt nc)""")
    return (
        "WITH " + ",".join(ctes)
        + f" SELECT node, round(rank, 6) AS rank FROM r{iterations}"
    )


def _d_zorder_sql(bits: int = 8) -> str:
    """DuckDB twin of maintenance.zorder_value over
    (l_extendedprice, l_quantity): same min-max stats, same width_bucket
    float-division chain ((v-mn)/((mx-mn)/n), floor, +1 — verified
    bit-identical against Spark's WidthBucket on this data), same clamp,
    same bit interleave (disjoint positions → sum == bitwise-or)."""
    n = 1 << bits
    cols = ["l_extendedprice", "l_quantity"]

    def rank(i: int, c: str) -> str:
        v = f"CAST({c} AS DOUBLE)"
        wb = (
            f"CAST(floor(({v} - mn{i}) / ((mx{i} - mn{i}) / {n})) AS BIGINT) + 1"
        )
        return f"GREATEST(0, LEAST({n - 1}, ({wb}) - 1))"

    interleave = " + ".join(
        f"(((r{j} >> {bit}) & 1) << {bit * len(cols) + j})"
        for bit in range(bits)
        for j in range(len(cols))
    )
    stats = ", ".join(
        f"min(CAST({c} AS DOUBLE)) AS mn{i}, max(CAST({c} AS DOUBLE)) AS mx{i}"
        for i, c in enumerate(cols)
    )
    ranks = ", ".join(f"{rank(i, c)} AS r{i}" for i, c in enumerate(cols))
    return f"""
        WITH s AS (SELECT {stats} FROM lineitem),
        b AS (SELECT l_orderkey, l_linenumber, {ranks} FROM lineitem, s)
        SELECT l_orderkey, l_linenumber, CAST({interleave} AS BIGINT) AS zval
        FROM b
    """


# DuckDB twin of splits.hash_bucket: first 8 hex chars of md5(seed\x1f key)
# as a 32-bit int (built by positional hex-digit arithmetic — exact in
# doubles, 16^8 < 2^53), mod NUM_BUCKETS.
def _d_hash_bucket(key: str, seed: int, num_buckets: int = 10000) -> str:
    h = f"md5('{seed}' || chr(31) || CAST({key} AS VARCHAR))"
    return (
        "CAST(list_sum(list_transform(range(1, 9), i -> "
        f"(strpos('0123456789abcdef', substr({h}, CAST(i AS INTEGER), 1)) - 1)"
        f" * pow(16, 8 - i))) AS BIGINT) % {num_buckets}"
    )


def _d_simhash_ctes() -> str:
    """DuckDB CTE chain recomputing dedup._simhash_frame(hash_fn='md5')
    bit-for-bit: shingle → md5 hi/lo 32-bit halves → 64 per-bit ±1 vote
    sums → sign-packed signed 64-bit word (bit 63 contributes -2^63, the
    two's-complement identity, since DuckDB's << overflow-checks where
    Spark's long arithmetic wraps). Generated, not hand-written, so the
    64-term expressions cannot drift from the engine's loop."""
    votes = ", ".join(
        f"SUM(CASE WHEN (({'lo' if j < 32 else 'hi'} >> {j if j < 32 else j - 32}) & 1) = 1 "
        f"THEN 1 ELSE -1 END) AS v{j}"
        for j in range(64)
    )
    packed = " + ".join(
        f"CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(63)
    )
    packed = f"({packed}) + CASE WHEN v63 > 0 THEN -9223372036854775808 ELSE 0 END"
    return f"""
            sh_g AS (
              SELECT doc_id, unnest(sh) AS g
              FROM (SELECT doc_id, {_D_SHINGLES} AS sh FROM documents)),
            sh_h AS (
              SELECT doc_id,
                     ('0x' || substr(md5(g), 1, 8))::BIGINT AS hi,
                     ('0x' || substr(md5(g), 9, 8))::BIGINT AS lo
              FROM sh_g),
            sh_v AS (SELECT doc_id, {votes} FROM sh_h GROUP BY doc_id),
            sh_p AS (SELECT doc_id, CAST({packed} AS BIGINT) AS simhash FROM sh_v)
    """


def _d_pq_sql() -> str:
    """DuckDB twin of pq_adc_topk over pq_random_codebooks(64, 8, 8, 13)
    and the vec_id=0 query. Every float arithmetic chain is written with
    the same left-associated term order as the Spark/driver side, so
    codes, LUT values and rounded distances replay bit-for-bit. Generated
    from the SAME codebook array — no drift possible."""
    from mini_etl_spark.functions.similarity import pq_random_codebooks

    cb = pq_random_codebooks(64, m=8, k=8, seed=13)
    m, k, dsub = cb.shape

    def sqdist(vec: str, s: int, j: int) -> str:
        return " + ".join(
            f"(CAST({vec}[{s * dsub + t + 1}] AS DOUBLE) - {float(cb[s][j][t])!r})"
            f" * (CAST({vec}[{s * dsub + t + 1}] AS DOUBLE) - {float(cb[s][j][t])!r})"
            for t in range(dsub)
        )

    code_parts, lut_parts = [], []
    for s in range(m):
        dists = ", ".join("(" + sqdist("embedding", s, j) + ")" for j in range(k))
        code_parts.append(
            "(SELECT list_position(d, list_min(d)) - 1 FROM (SELECT "
            f"[{dists}] AS d)) AS c{s}"
        )
        qdists = ", ".join("(" + sqdist("q.embedding", s, j) + ")" for j in range(k))
        lut_parts.append(f"[{qdists}] AS lut{s}")
    code_cols = ", ".join(code_parts)
    lut_cols = ", ".join(lut_parts)
    score = " + ".join(f"l.lut{s}[c.c{s} + 1]" for s in range(m))
    return f"""
        WITH c AS (SELECT vec_id, {code_cols} FROM embeddings),
        l AS (SELECT {lut_cols} FROM (SELECT embedding FROM embeddings WHERE vec_id = 0) q)
        SELECT c.vec_id, round({score}, 6) AS adc_dist
        FROM c, l
        ORDER BY adc_dist ASC, c.vec_id ASC
        LIMIT 10
    """


# DuckDB twins of text.redact_pii / text.pii_count, generated from the SAME
# PII_PATTERNS list so the regexes can never drift between engines.
def _d_pii_clean(col: str) -> str:
    from mini_etl_spark.functions.text import PII_PATTERNS

    expr = col
    for _, pattern, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pattern}', '{repl}', 'g')"
    return expr


def _d_pii_count(col: str) -> str:
    from mini_etl_spark.functions.text import PII_PATTERNS

    return " + ".join(
        f"len(regexp_extract_all({col}, '{pattern}'))" for _, pattern, _ in PII_PATTERNS
    )


# double-precision dot product of two float-list columns (positional unnest)
def _d_dot(a: str, b: str) -> str:
    return (
        f"(SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) "
        f"FROM (SELECT unnest({a}) AS x, unnest({b}) AS y))"
    )


def _d_cell_expr(dim: int = 64, k: int = 32, seed: int = 7,
                 col: str = "embedding") -> str:
    """DuckDB expression for the vector's cell id — replicates
    similarity.ivf_assign over random_unit_centroids(dim, k, seed):
    0-based index of the FIRST maximal centroid dot product."""
    from mini_etl_spark.functions.similarity import random_unit_centroids

    cents = random_unit_centroids(dim, k, seed)
    dots = []
    for c in cents:
        lit = "[" + ", ".join(repr(float(v)) for v in c) + "]"
        dots.append(
            f"(SELECT sum(CAST(x AS DOUBLE) * y) "
            f"FROM (SELECT unnest({col}) AS x, unnest({lit}) AS y))"
        )
    arr = "[" + ", ".join(dots) + "]"
    return f"(SELECT list_position(d, list_max(d)) - 1 FROM (SELECT {arr} AS d))"


def _d_probe_cells(nprobe: int, dim: int = 64, k: int = 32, seed: int = 7,
                   col: str = "embedding") -> str:
    """DuckDB list of the vector's ``nprobe`` nearest cells — replicates
    similarity.probe_cells: same centroid dots, same (−dot, index) struct
    sort, so multi-probe assignment is identical in both engines."""
    from mini_etl_spark.functions.similarity import random_unit_centroids

    cents = random_unit_centroids(dim, k, seed)
    dots = []
    for c in cents:
        lit = "[" + ", ".join(repr(float(v)) for v in c) + "]"
        dots.append(
            f"(SELECT sum(CAST(x AS DOUBLE) * y) "
            f"FROM (SELECT unnest({col}) AS x, unnest({lit}) AS y))"
        )
    arr = "[" + ", ".join(dots) + "]"
    return (
        f"(SELECT list_slice(list_transform(list_sort("
        f"list_transform(range(1, {k + 1}), j -> {{'nd': -d[j], 'i': j - 1}})"
        f"), s -> s.i), 1, {nprobe}) FROM (SELECT {arr} AS d))"
    )


def _d_lsh_bucket(dim: int = 64, num_planes: int = 8, seed: int = 42,
                  col: str = "embedding") -> str:
    """DuckDB expression for the single-table LSH bucket of ``col`` —
    replicates similarity.with_lsh_buckets / lsh_bucket bit-for-bit: the
    same seeded unit hyperplanes as full-precision literals, sign bit of
    each projection packed as bit j."""
    from mini_etl_spark.functions.similarity import random_hyperplanes

    planes = random_hyperplanes(dim, num_planes, seed)
    bits = []
    for j, plane in enumerate(planes):
        lit = "[" + ", ".join(repr(float(v)) for v in plane) + "]"
        dot = (
            f"(SELECT sum(CAST(x AS DOUBLE) * y) "
            f"FROM (SELECT unnest({col}) AS x, unnest({lit}) AS y))"
        )
        bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def _d_lsh_tags(dim: int = 64, num_planes: int = 8, num_tables: int = 8,
                seed: int = 42) -> str:
    """DuckDB list of LSH bucket tags for the ``embedding`` column —
    replicates similarity.tagged_lsh_buckets bit-for-bit: same seeded
    hyperplanes (as full-precision literals), same sign-bit packing, same
    ``bucket * num_tables + table`` tag encoding."""
    from mini_etl_spark.functions.similarity import _table_planes

    planes = _table_planes(dim, num_planes, num_tables, seed)
    tag_exprs = []
    for t in range(num_tables):
        bits = []
        for j in range(num_planes):
            lit = "[" + ", ".join(repr(float(v)) for v in planes[t, j]) + "]"
            dot = (
                f"(SELECT sum(CAST(x AS DOUBLE) * y) "
                f"FROM (SELECT unnest(embedding) AS x, unnest({lit}) AS y))"
            )
            bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << j} ELSE 0 END)")
        tag_exprs.append("(" + " + ".join(bits) + f") * {num_tables} + {t}")
    return "[" + ", ".join(tag_exprs) + "]"


# full text-features subquery (doc_id, ws_tokens, bpe_tokens, lang_id,
# quality, fingerprint) — shared by the text_features and corpus_clean
# oracles; mirrors functions/text.py exactly.
_D_FEATURES = f"""(
  SELECT doc_id, ws_tokens, bpe_tokens,
    CASE WHEN s_en >= 1 AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         WHEN s_de >= 1 AND s_de >= s_fr AND s_de >= s_es THEN 'de'
         WHEN s_fr >= 1 AND s_fr >= s_es THEN 'fr'
         WHEN s_es >= 1 THEN 'es'
         ELSE 'unknown' END AS lang_id,
    round(greatest(least(
        0.3*least(ws_tokens/100.0, 1.0) + 0.4*(n_alpha/n_chars)
        + 0.3*least(s_en/8.0, 1.0) - 0.2*(n_digit/n_chars),
        1.0), 0.0), 4) AS quality,
    fingerprint
  FROM (
    SELECT doc_id,
      CASE WHEN trim(text)='' THEN 0
           ELSE len(string_split_regex(trim(text), '\\s+')) END AS ws_tokens,
      len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_tokens,
      len(list_intersect({_D_TOKENS}, {_D_STOP['en']})) AS s_en,
      len(list_intersect({_D_TOKENS}, {_D_STOP['de']})) AS s_de,
      len(list_intersect({_D_TOKENS}, {_D_STOP['fr']})) AS s_fr,
      len(list_intersect({_D_TOKENS}, {_D_STOP['es']})) AS s_es,
      greatest(length(text),1)::DOUBLE AS n_chars,
      length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS n_alpha,
      length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
      md5(array_to_string(list_sort(list_distinct({_D_TOKENS})), ' ')) AS fingerprint
    FROM documents))"""


# DuckDB twin of _synth_url(): identical string construction, so the URL
# oracles below are full-hash (see functions/web.py for the regex contract).
_SYNTH_URL_SQL = """
    (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END) || '://' ||
    (CASE WHEN doc_id % 7 = 0 THEN 'User:Pw@Tracker.' ELSE 'www.' END) ||
    source ||
    (CASE doc_id % 4 WHEN 0 THEN '.example.com' WHEN 1 THEN '.data.co.uk'
                     WHEN 2 THEN '.archive.org' ELSE '.news.net' END) ||
    (CASE doc_id % 5 WHEN 0 THEN ':443' WHEN 1 THEN ':80'
                     WHEN 2 THEN ':8080' ELSE '' END) ||
    '/p/' || CAST(doc_id AS VARCHAR) ||
    (CASE doc_id % 3
       WHEN 0 THEN '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR) || '&utm_campaign=x'
       WHEN 1 THEN '?id=' || CAST(doc_id AS VARCHAR) ELSE '' END) ||
    (CASE WHEN doc_id % 2 = 0 THEN '#sec' ELSE '' END)
"""

def _d_html(expr: str) -> str:
    """DuckDB replay of web.html_to_text: the SAME ordered HTML_STEPS
    list (imported, not copied) folded into regexp_replace(..., 'g')
    calls + trim — the _d_normalize pattern."""
    from mini_etl_spark.functions.web import HTML_STEPS

    for pat, rep in HTML_STEPS:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return f"trim({expr})"


# host → registered domain, the same heuristic chain as web.registered_domain
_D_REG_DOMAIN = """
    CASE WHEN regexp_matches({h}, '^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$') THEN {h}
         WHEN regexp_extract({h}, '([^.]+\\.(?:co|com|net|org|gov|edu|ac|mil)\\.[a-z][a-z])$', 1) <> ''
           THEN regexp_extract({h}, '([^.]+\\.(?:co|com|net|org|gov|edu|ac|mil)\\.[a-z][a-z])$', 1)
         WHEN regexp_extract({h}, '([^.]+\\.[^.]+)$', 1) <> ''
           THEN regexp_extract({h}, '([^.]+\\.[^.]+)$', 1)
         ELSE {h} END
"""

_D_URL_PARTS_CTES = f"""
    u AS (SELECT doc_id, {_SYNTH_URL_SQL} AS url FROM documents),
    p AS (
      SELECT doc_id, url,
        lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS url_scheme,
        regexp_replace(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1),
                       '^[^@]*@', '') AS hp,
        regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS url_path,
        regexp_extract(url, '^[^#?]*\\?([^#]*)', 1) AS url_query,
        regexp_extract(url, '#(.*)$', 1) AS url_fragment
      FROM u),
    h AS (
      SELECT *, lower(regexp_replace(hp, ':[0-9]+$', '')) AS url_host,
             regexp_extract(hp, ':([0-9]+)$', 1) AS url_port
      FROM p),
    d AS (
      SELECT *, {_D_REG_DOMAIN.format(h='url_host')} AS url_domain FROM h)
"""


def _d_bpe_sql(num_merges: int = 50) -> str:
    """Full DuckDB replay of BPE training — an independent second
    implementation, not a literal dump: a generated chain of CTE stages,
    one per merge, each re-deriving the best pair from the live symbol
    table (sum of adjacent-pair counts, ties -> lexicographically
    smallest (l, r) — bpe.train_bpe_merges' heap order) and applying it
    with the Python loop's greedy left-to-right semantics.

    The only subtle equivalence is overlap: matches can overlap ONLY when
    l == r (a run of identical symbols), where greedy selects offsets
    0,2,4… from each run start. The SQL computes run_id (count of
    non-l rows so far) and run_min (first l-position in the run) and
    selects candidates with even (pos - run_min); for l <> r adjacent
    matches cannot overlap, so plain candidacy suffices. Consumed second
    halves drop via lag(sel); positions renumber per stage."""
    parts = [
        # w{k} and b{k} are each referenced twice; without MATERIALIZED
        # DuckDB inlines them, doubling the upstream chain per stage ->
        # exponential plan blowup. MATERIALIZED pins one evaluation each.
        f"""hist AS MATERIALIZED (
              SELECT word, count(*) AS cnt
              FROM (SELECT unnest({_D_TOKENS}) AS word FROM documents)
              GROUP BY word),
            hw AS (
              SELECT row_number() OVER (ORDER BY word) AS word_id, word, cnt
              FROM hist),
            wx AS (
              SELECT word_id, cnt, word,
                     unnest(range(1, len(word) + 2)) AS pos
              FROM hw),
            w0 AS MATERIALIZED (
              SELECT word_id, pos,
                     CASE WHEN pos <= len(word)
                          THEN substr(word, CAST(pos AS INTEGER), 1)
                          ELSE '</w>' END AS sym,
                     cnt
              FROM wx)"""
    ]
    for k in range(num_merges):
        parts.append(f"""p{k} AS (
              SELECT l, r, sum(c) AS c FROM (
                SELECT sym AS l,
                       lead(sym) OVER (PARTITION BY word_id ORDER BY pos) AS r,
                       cnt AS c
                FROM w{k})
              WHERE r IS NOT NULL GROUP BY l, r),
            b{k} AS MATERIALIZED (
              SELECT l, r FROM p{k} ORDER BY c DESC, l, r LIMIT 1),
            m{k} AS (
              SELECT w.word_id, w.pos, w.sym, w.cnt, b.l, b.r,
                     lead(w.sym) OVER (PARTITION BY w.word_id ORDER BY w.pos) AS nxt,
                     count(CASE WHEN w.sym <> b.l THEN 1 END)
                       OVER (PARTITION BY w.word_id ORDER BY w.pos
                             ROWS UNBOUNDED PRECEDING) AS run_id
              FROM w{k} w CROSS JOIN b{k} b),
            r{k} AS (
              SELECT *, min(CASE WHEN sym = l THEN pos END)
                          OVER (PARTITION BY word_id, run_id) AS run_min
              FROM m{k}),
            s{k} AS (
              SELECT word_id, pos, sym, cnt, nxt,
                     CASE WHEN sym = l AND nxt = r
                               AND (l <> r OR (pos - run_min) % 2 = 0)
                          THEN 1 ELSE 0 END AS sel
              FROM r{k}),
            w{k + 1} AS MATERIALIZED (
              SELECT word_id,
                     row_number() OVER (PARTITION BY word_id ORDER BY pos) AS pos,
                     CASE WHEN sel = 1 THEN sym || nxt ELSE sym END AS sym,
                     cnt
              FROM (SELECT *, coalesce(lag(sel)
                       OVER (PARTITION BY word_id ORDER BY pos), 0) AS used
                    FROM s{k})
              WHERE used = 0)""")
    union = "\n              UNION ALL ".join(
        f"SELECT {k} AS k, l, r FROM b{k}" for k in range(num_merges)
    )
    return (
        "WITH "
        + ",\n            ".join(parts)
        + f"""
            SELECT CAST(k AS INTEGER) AS rank, l AS "left", r AS "right"
            FROM ({union})
        """
    )


def _d_bpe_encode_sql(num_merges: int = 50, doc_filter: str = "doc_id % 10 = 0") -> str:
    """DuckDB replay of q_bpe_encode: the TRAINING chain of
    :func:`_d_bpe_sql` (re-deriving every merge from the full-corpus
    histogram) extended with one encode stage per merge over the
    filtered documents' per-word symbol rows.

    Why rank-sequential application is the priority encoder
    (bpe.apply_bpe's _encode_word picks the lowest-rank adjacent pair
    repeatedly): a merge can only create pairs INVOLVING its new symbol,
    and any merge containing that symbol was necessarily learned later
    (higher rank), so once stage k passes, no pair of rank ≤ k can newly
    appear — one greedy left-to-right pass per rank is exhaustive and
    order-equivalent. The greedy window logic is the same run-evenness
    machinery as training, partitioned by (doc, word)."""
    train = _d_bpe_sql(num_merges)
    # reuse the training chain's WITH body up to (excluding) its final
    # SELECT: everything after the last closing ')' of w{num_merges}
    with_body = train[len("WITH ") : train.rindex("SELECT CAST(k AS INTEGER)")]
    with_body = with_body.rstrip().rstrip("\n")
    assert with_body.endswith(")"), "unexpected _d_bpe_sql shape"
    parts = [
        f"""etoks AS (
              SELECT doc_id, widx, word,
                     unnest(range(1, len(word) + 2)) AS pos
              FROM (SELECT doc_id,
                           generate_subscripts({_D_TOKENS}, 1) AS widx,
                           unnest({_D_TOKENS}) AS word
                    FROM documents WHERE {doc_filter})),
            e0 AS MATERIALIZED (
              SELECT doc_id, widx, pos,
                     CASE WHEN pos <= len(word)
                          THEN substr(word, CAST(pos AS INTEGER), 1)
                          ELSE '</w>' END AS sym
              FROM etoks)"""
    ]
    for k in range(num_merges):
        parts.append(f"""em{k} AS (
              -- LEFT JOIN ON TRUE, not CROSS JOIN: if training exhausts
              -- mergeable pairs before rank {k}, b{k} is EMPTY — a cross
              -- join would annihilate the symbol table and diverge from
              -- apply_bpe (which simply has no merge to apply); with the
              -- left join l/r are NULL, sel stays 0, symbols pass through
              SELECT e.doc_id, e.widx, e.pos, e.sym, b.l, b.r,
                     lead(e.sym) OVER (PARTITION BY e.doc_id, e.widx
                                       ORDER BY e.pos) AS nxt,
                     count(CASE WHEN b.l IS NULL OR e.sym <> b.l THEN 1 END)
                       OVER (PARTITION BY e.doc_id, e.widx ORDER BY e.pos
                             ROWS UNBOUNDED PRECEDING) AS run_id
              FROM e{k} e LEFT JOIN b{k} b ON TRUE),
            er{k} AS (
              SELECT *, min(CASE WHEN sym = l THEN pos END)
                          OVER (PARTITION BY doc_id, widx, run_id) AS run_min
              FROM em{k}),
            es{k} AS (
              SELECT doc_id, widx, pos, sym, nxt,
                     CASE WHEN sym = l AND nxt = r
                               AND (l <> r OR (pos - run_min) % 2 = 0)
                          THEN 1 ELSE 0 END AS sel
              FROM er{k}),
            e{k + 1} AS MATERIALIZED (
              SELECT doc_id, widx,
                     row_number() OVER (PARTITION BY doc_id, widx
                                        ORDER BY pos) AS pos,
                     CASE WHEN sel = 1 THEN sym || nxt ELSE sym END AS sym
              FROM (SELECT *, coalesce(lag(sel)
                       OVER (PARTITION BY doc_id, widx ORDER BY pos), 0) AS used
                    FROM es{k})
              WHERE used = 0)""")
    return (
        "WITH "
        + with_body
        + ",\n            "
        + ",\n            ".join(parts)
        + f"""
            SELECT doc_id,
                   CAST(row_number() OVER (PARTITION BY doc_id
                                           ORDER BY widx, pos) - 1
                        AS BIGINT) AS pos,
                   sym
            FROM e{num_merges}
        """
    )


def _d_kmeans_sql(k: int = 8, iters: int = 3, levels: int = 256) -> str:
    """DuckDB replay of q_kmeans_clusters: the quantized-code CTE (same
    shape as the embedding_quantize oracle), rank-ordered init from the
    k smallest vec_ids, then one (assign, update) CTE pair per Lloyd
    iteration and a final assign. All integer arithmetic — sum // count
    floor division mirrors Python's int //; empty clusters keep their
    previous centroid via the left-join coalesce. MATERIALIZED pins the
    multi-referenced stages (codes feeds every iteration)."""
    parts = [
        f"""pos0 AS (
              SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
                     unnest(embedding) AS x
              FROM embeddings),
            qstats AS (
              SELECT pos, min(x)::DOUBLE AS mn,
                     max(x)::DOUBLE - min(x)::DOUBLE AS rng
              FROM pos0 GROUP BY pos),
            codes AS MATERIALIZED (
              SELECT p.vec_id, p.pos,
                     CASE WHEN s.rng = 0 THEN 0
                          ELSE CAST(floor((p.x::DOUBLE - s.mn) / s.rng
                                          * {float(levels - 1)!r} + 0.5)
                                    AS INTEGER) END AS x
              FROM pos0 p JOIN qstats s USING (pos)),
            seeds AS (
              SELECT vec_id, CAST(rank() OVER (ORDER BY vec_id) - 1
                                  AS INTEGER) AS c
              FROM (SELECT DISTINCT vec_id FROM codes
                    ORDER BY vec_id LIMIT {k})),
            cent0 AS MATERIALIZED (
              SELECT s.c, v.pos, v.x
              FROM seeds s JOIN codes v USING (vec_id))"""
    ]
    for i in range(iters + 1):
        parts.append(f"""d{i} AS (
              SELECT v.vec_id, c.c,
                     CAST(sum(CAST((v.x - c.x) * (v.x - c.x) AS BIGINT))
                          AS BIGINT) AS d
              FROM codes v JOIN cent{i} c USING (pos)
              GROUP BY v.vec_id, c.c),
            a{i} AS MATERIALIZED (
              SELECT vec_id, c AS cluster, d
              FROM (SELECT *, row_number() OVER (
                      PARTITION BY vec_id ORDER BY d, c) AS rn
                    FROM d{i})
              WHERE rn = 1)""")
        if i < iters:
            parts.append(f"""u{i} AS (
              SELECT a.cluster AS c, v.pos,
                     CAST(sum(v.x) // count(*) AS INTEGER) AS x
              FROM a{i} a JOIN codes v USING (vec_id)
              GROUP BY a.cluster, v.pos),
            cent{i + 1} AS MATERIALIZED (
              SELECT o.c, o.pos, coalesce(n.x, o.x) AS x
              FROM cent{i} o LEFT JOIN u{i} n
                ON n.c = o.c AND n.pos = o.pos)""")
    return (
        "WITH "
        + ",\n            ".join(parts)
        + f"""
            SELECT vec_id, cluster, d AS dist FROM a{iters}
        """
    )


def _d_psl_cap_sql() -> str:
    """DuckDB replay of q_psl_domain_cap: the bundled suffix snapshot is
    embedded as a VALUES table (imported from assets.public_suffixes —
    the same module data the Spark side broadcasts, so the two cannot
    drift), longest-suffix-wins resolved with 1-based inclusive list
    slices, then the md5-ordered per-domain cap window."""
    from mini_etl_spark.assets import public_suffixes

    values = ", ".join(f"('{s}')" for s in public_suffixes(include_private=True))
    return f"""
            WITH sfx(s) AS (SELECT * FROM (VALUES {values})),
            h AS (
              SELECT doc_id,
                     lower('www.' || source || '.' ||
                       (['co.uk','com.au','co.jp','github.io','io','com'])
                         [CAST(doc_id % 6 AS INTEGER) + 1]) AS host
              FROM documents),
            lab AS (
              SELECT doc_id, host, string_split(host, '.') AS L,
                     len(string_split(host, '.')) AS n
              FROM h),
            m AS (
              SELECT doc_id, host, coalesce(
                CASE WHEN n > 4 AND array_to_string(L[n-3:n], '.') IN (SELECT s FROM sfx)
                     THEN array_to_string(L[n-4:n], '.') END,
                CASE WHEN n > 3 AND array_to_string(L[n-2:n], '.') IN (SELECT s FROM sfx)
                     THEN array_to_string(L[n-3:n], '.') END,
                CASE WHEN n > 2 AND array_to_string(L[n-1:n], '.') IN (SELECT s FROM sfx)
                     THEN array_to_string(L[n-2:n], '.') END,
                CASE WHEN n > 1 AND L[n] IN (SELECT s FROM sfx)
                     THEN array_to_string(L[n-1:n], '.') END,
                CASE WHEN n >= 2 THEN array_to_string(L[n-1:n], '.')
                     ELSE host END) AS domain
              FROM lab),
            r AS (
              SELECT doc_id, host, domain,
                     row_number() OVER (
                       PARTITION BY domain
                       ORDER BY md5('7' || chr(31) || CAST(doc_id AS VARCHAR)),
                                doc_id) AS rn
              FROM m)
            SELECT doc_id, host, domain FROM r WHERE rn <= 5
        """


def oracle_sql() -> dict[str, str]:
    sqls = {
        "psl_domain_cap": _d_psl_cap_sql(),
        "kmeans_clusters": _d_kmeans_sql(8, 3, 256),
        "sparse_cosine_pairs": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_D_TOKENS}) AS tok FROM documents),
            c AS (
              SELECT doc_id, tok, count(*) AS c
              FROM toks GROUP BY doc_id, tok),
            hot AS (
              SELECT tok FROM (SELECT tok, count(*) AS f FROM c GROUP BY tok)
              WHERE f > 1000),
            cc AS (SELECT * FROM c WHERE tok NOT IN (SELECT tok FROM hot)),
            n AS (
              SELECT doc_id, CAST(sum(c*c) AS BIGINT) AS n2
              FROM cc GROUP BY doc_id),
            p AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     CAST(sum(a.c * b.c) AS BIGINT) AS dot
              FROM cc a JOIN cc b
                ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_a, id_b, dot,
                   na.n2 AS norm_sq_a, nb.n2 AS norm_sq_b
            FROM p
            JOIN n na ON na.doc_id = id_a
            JOIN n nb ON nb.doc_id = id_b
            WHERE (CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE))
                  >= {0.8 * 0.8!r} * (CAST(na.n2 AS DOUBLE)
                                      * CAST(nb.n2 AS DOUBLE))
        """,
        # Bound-certificate oracle: exact answers + TRUE for each sketch
        # bound the Spark side asserts (see q_approx_sketches docstring).
        "approx_sketches": """
            SELECT l_returnflag,
                   count(DISTINCT l_orderkey) AS exact_orders,
                   count(*) AS n_rows,
                   TRUE AS cd_within_bound,
                   TRUE AS p50_within_bound
            FROM lineitem
            GROUP BY l_returnflag
        """,
        "bpe_vocab": _d_bpe_sql(50),
        "word_histogram_topk": f"""
            SELECT word, CAST(count AS BIGINT) AS count
            FROM (
              SELECT t AS word, count(*) AS count
              FROM (SELECT unnest({_D_TOKENS}) AS t FROM documents)
              GROUP BY t
              HAVING count(*) >= 2
              ORDER BY count DESC, word
              LIMIT 25
            )
        """,
        "bpe_encode": _d_bpe_encode_sql(50),
        "conversation_redaction": f"""
            WITH flat AS (
              SELECT doc_id AS conv_id, t.turn_idx,
                     CASE WHEN t.turn_idx = 0 THEN 'user'
                          ELSE 'assistant' END AS role,
                     CASE WHEN t.turn_idx = 0
                          THEN 'contact user' || CAST(doc_id AS VARCHAR)
                               || '@mail.example or call 555-123-4567 from 10.1.2.3'
                          ELSE 'noted ssn 123-45-6789 re ' || substr(text, 1, 40)
                     END AS content
              FROM documents, (SELECT unnest([0, 1]) AS turn_idx) t),
            n AS (
              SELECT conv_id,
                     CAST(sum({_d_pii_count('content')}) AS BIGINT) AS n_pii
              FROM flat GROUP BY conv_id)
            SELECT f.conv_id, CAST(f.turn_idx AS BIGINT) AS turn_idx, f.role,
                   {_d_pii_clean('f.content')} AS content, n.n_pii
            FROM flat f JOIN n USING (conv_id)
        """,
        "grouping_sets": """
            SELECT coalesce(l_returnflag, 'ALL') AS flag,
                   coalesce(l_linestatus, 'ALL') AS status,
                   CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
                   CAST(grouping(l_linestatus) AS INTEGER) AS g_status,
                   round(sum(l_quantity), 2) AS sum_qty,
                   count(*) AS n_rows
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                    (l_returnflag), (l_linestatus), ())
        """,
        "mad_outliers": """
            WITH f AS (
              SELECT l_orderkey, l_linenumber, l_returnflag,
                     floor((l_extendedprice *
                            CASE WHEN l_orderkey % 97 = 0
                                 THEN 10.0 ELSE 1.0 END) * 100.0 + 0.5)
                       AS amount_c
              FROM lineitem),
            m AS (
              SELECT l_returnflag, median(amount_c) AS group_median
              FROM f GROUP BY l_returnflag),
            d AS (SELECT f.*, m.group_median
                  FROM f JOIN m USING (l_returnflag)),
            md AS (
              SELECT l_returnflag,
                     median(abs(amount_c - group_median)) AS group_mad
              FROM d GROUP BY l_returnflag)
            SELECT d.l_orderkey, d.l_linenumber, d.amount_c,
                   d.group_median, md.group_mad
            FROM d JOIN md USING (l_returnflag)
            WHERE abs(d.amount_c - d.group_median) > 3.0 * md.group_mad
        """,
        "heavy_hitters": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_D_TOKENS}) AS tok FROM documents),
            s AS MATERIALIZED (
              SELECT tok,
                     {_d_hash_bucket('tok', 1000, 1024)} AS b0,
                     {_d_hash_bucket('tok', 1001, 1024)} AS b1,
                     {_d_hash_bucket('tok', 1002, 1024)} AS b2,
                     {_d_hash_bucket('tok', 1003, 1024)} AS b3
              FROM toks),
            sk AS MATERIALIZED (
              SELECT d, b, count(*) AS c FROM (
                SELECT 0 AS d, b0 AS b FROM s
                UNION ALL SELECT 1, b1 FROM s
                UNION ALL SELECT 2, b2 FROM s
                UNION ALL SELECT 3, b3 FROM s)
              GROUP BY d, b),
            ex AS MATERIALIZED (
              SELECT tok, b0, b1, b2, b3, count(*) AS exact_count
              FROM s GROUP BY tok, b0, b1, b2, b3
              ORDER BY exact_count DESC, tok LIMIT 20),
            pr AS (
              SELECT tok, exact_count, 0 AS d, b0 AS b FROM ex
              UNION ALL SELECT tok, exact_count, 1, b1 FROM ex
              UNION ALL SELECT tok, exact_count, 2, b2 FROM ex
              UNION ALL SELECT tok, exact_count, 3, b3 FROM ex)
            SELECT tok AS token,
                   CAST(exact_count AS BIGINT) AS exact_count,
                   CAST(min(c) AS BIGINT) AS cm_estimate,
                   CAST(min(c) - exact_count AS BIGINT) AS overcount
            FROM pr JOIN sk USING (d, b)
            GROUP BY tok, exact_count
        """,
        "url_parse": f"""
            WITH {_D_URL_PARTS_CTES},
            n AS (
              SELECT *,
                array_to_string(
                  list_filter(string_split(url_query, '&'),
                    x -> NOT regexp_matches(x, '^(utm_[^=&]*|fbclid|gclid|msclkid|ref)(=|$)')
                         AND x <> ''), '&') AS kept
              FROM d)
            SELECT doc_id, url_scheme, url_host, url_port, url_domain,
                   url_path, url_query, url_fragment,
                   url_scheme || '://' || url_host ||
                   (CASE WHEN url_port <> ''
                          AND NOT (url_scheme = 'http' AND url_port = '80')
                          AND NOT (url_scheme = 'https' AND url_port = '443')
                         THEN ':' || url_port ELSE '' END) ||
                   (CASE WHEN url_path = '' THEN '/' ELSE url_path END) ||
                   (CASE WHEN kept <> '' THEN '?' || kept ELSE '' END) AS url_norm
            FROM n
        """,
        "html_text": f"""
            WITH u AS (
              SELECT doc_id,
                '<html><head><title>D</title><script>var x = 1;</script>' ||
                '<style>p{{color:red}}</style></head><body><!-- c --><h1>Doc ' ||
                CAST(doc_id AS VARCHAR) || '</h1><p>' || substr(text, 1, 120) ||
                ' &amp; more&nbsp;here</p><div>1 &lt; 2</div>' ||
                '<table><tr><td>a</td><td>b</td></tr></table></body></html>'
                AS html
              FROM documents)
            SELECT doc_id, {_d_html('html')} AS text_html FROM u
        """,
        "link_hosts": f"""
            WITH t AS (
              SELECT 'Visit https://' || source || '.example.com/a/' ||
                     CAST(doc_id AS VARCHAR) || ' and (http://mirror.' ||
                     source || '.news.net/b?x=' || CAST(doc_id AS VARCHAR) ||
                     ').' AS body
              FROM documents),
            l AS (
              SELECT unnest(list_transform(
                       regexp_extract_all(body, 'https?://[^\\s<>"'')\\]]+'),
                       u -> regexp_replace(u, '[.,;:!?]+$', ''))) AS link
              FROM t),
            h AS (
              SELECT lower(regexp_replace(regexp_replace(
                       regexp_extract(link, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1),
                       '^[^@]*@', ''), ':[0-9]+$', '')) AS host
              FROM l),
            g AS (SELECT host, count(*) AS n_links FROM h GROUP BY host)
            SELECT host, n_links, {_D_REG_DOMAIN.format(h='host')} AS domain
            FROM g
        """,
        "url_blocklist": f"""
            WITH {_D_URL_PARTS_CTES},
            kept AS (
              SELECT * FROM d
              WHERE NOT (url_host = 'example.com' OR url_host LIKE '%.example.com'
                      OR url_host = 'data.co.uk' OR url_host LIKE '%.data.co.uk'))
            SELECT url_domain, count(*) AS n_docs
            FROM kept GROUP BY url_domain
        """,
        "group_agg": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2)       AS l_quantity_sum,
                   round(avg(l_quantity), 4)       AS l_quantity_mean,
                   round(sum(l_extendedprice), 2)  AS l_extendedprice_sum,
                   count(l_orderkey)               AS l_orderkey_count
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "filter_expression": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue_sum,
                   count(l_orderkey) AS n_rows
            FROM lineitem
            WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
        """,
        "select_rename_project": """
            SELECT o_orderkey, o_custkey,
                   o_totalprice AS total_price,
                   strftime(o_orderdate, '%Y-%m') AS order_month
            FROM orders
        """,
        "cast_lenient": """
            -- Spark casts double→int by truncation toward zero; DuckDB's
            -- TRY_CAST rounds, hence the explicit trunc() to pin semantics.
            SELECT o_orderkey,
                   TRY_CAST(o_orderpriority AS BIGINT)   AS priority_as_int,
                   TRY_CAST(trunc(o_totalprice) AS BIGINT) AS price_as_int
            FROM orders
        """,
        "fillna": """
            SELECT o_orderkey,
                   round(coalesce(
                       CASE WHEN o_totalprice > 150000 THEN o_totalprice END,
                       -1.0), 2) AS big_price
            FROM orders
        """,
        "dedup_first": """
            SELECT o_custkey, o_orderkey, o_orderstatus
            FROM (SELECT o_custkey, o_orderkey, o_orderstatus,
                         row_number() OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderkey) AS rn
                  FROM orders)
            WHERE rn = 1
        """,
        "dedup_unique_only": """
            SELECT o_custkey, o_orderkey
            FROM (SELECT o_custkey, o_orderkey,
                         count(*) OVER (PARTITION BY o_custkey) AS n
                  FROM orders)
            WHERE n = 1
        """,
        "sort": """
            SELECT c_custkey, c_name, c_acctbal
            FROM customer
            ORDER BY c_acctbal DESC, c_custkey
        """,
        "join_star": """
            SELECT r_name,
                   round(sum(c_acctbal), 2) AS c_acctbal_sum,
                   round(avg(c_acctbal), 4) AS c_acctbal_mean,
                   count(c_custkey)         AS c_custkey_count
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "join_outer": """
            SELECT c_custkey,
                   coalesce(n_orders, 0) AS n_orders,
                   round(total_spent, 2) AS total_spent
            FROM customer
            FULL OUTER JOIN (
                SELECT o_custkey AS c_custkey,
                       count(o_orderkey) AS n_orders,
                       sum(o_totalprice) AS total_spent
                FROM orders GROUP BY o_custkey
            ) USING (c_custkey)
        """,
        "shipping_priority": """
            SELECT l_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
              AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10
        """,
        "regional_revenue": """
            SELECT r_name, n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_rows
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey  = c_custkey
            JOIN supplier ON l_suppkey  = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE c_nationkey = s_nationkey
            GROUP BY r_name, n_name
        """,
        "order_priority": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders o
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate)
            GROUP BY o_orderpriority
        """,
        "returned_revenue": """
            SELECT c_custkey, c_name, n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey  = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
            GROUP BY c_custkey, c_name, n_name
            ORDER BY revenue DESC, c_custkey
            LIMIT 20
        """,
        "priority_lines": """
            SELECT l_linestatus,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY l_linestatus
        """,
        "promo_revenue": """
            SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                          THEN l_extendedprice * (1 - l_discount)
                                          ELSE 0.0 END)
                         / sum(l_extendedprice * (1 - l_discount)), 4)
                       AS promo_revenue_pct
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
        """,
        "brand_revenue": """
            SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_rows
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "volume_shipping": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey  = c_custkey
            JOIN supplier ON l_suppkey  = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
               OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
            GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
        """,
        "top_supplier": """
            WITH rev AS (
              SELECT l_suppkey AS supplier_no,
                     round(sum(l_extendedprice * (1 - l_discount)), 2)
                         AS total_revenue
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
              GROUP BY l_suppkey)
            SELECT s_suppkey, s_name, total_revenue
            FROM supplier JOIN rev ON s_suppkey = supplier_no
            WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        """,
        "customer_distribution": """
            SELECT c_count, count(*) AS custdist
            FROM (SELECT c_custkey, count(o_orderkey) AS c_count
                  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
                  GROUP BY c_custkey)
            GROUP BY c_count
        """,
        "market_share": """
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   round(sum(CASE WHEN n2.n_name = 'NATION_3'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0.0 END)
                         / sum(l_extendedprice * (1 - l_discount)), 4)
                       AS mkt_share
            FROM lineitem
            JOIN part      ON l_partkey = p_partkey
            JOIN orders    ON l_orderkey = o_orderkey
            JOIN customer  ON o_custkey = c_custkey
            JOIN supplier  ON l_suppkey = s_suppkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region    ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
            GROUP BY year(o_orderdate)
        """,
        "waiting_supplier": """
            WITH l AS (SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
                       FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
            SELECT s_name, count(*) AS numwait
            FROM l l1
            JOIN supplier ON l1.l_suppkey = s_suppkey
            WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL 60 DAY
              AND EXISTS (SELECT 1 FROM l l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM l l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.l_shipdate > l3.o_orderdate
                                    + INTERVAL 60 DAY)
            GROUP BY s_name
            ORDER BY numwait DESC, s_name
            LIMIT 20
        """,
        "cheapest_per_part": """
            SELECT l_partkey, l_orderkey, l_linenumber, s_name,
                   round(l_extendedprice, 2) AS best_price
            FROM lineitem l
            JOIN supplier ON l_suppkey = s_suppkey
            WHERE l_extendedprice = (SELECT min(l2.l_extendedprice)
                                     FROM lineitem l2
                                     WHERE l2.l_partkey = l.l_partkey)
        """,
        "small_quantity_revenue": """
            SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
                   count(*) AS n_rows
            FROM lineitem l
            JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#12'
              AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                                FROM lineitem l2
                                WHERE l2.l_partkey = l.l_partkey)
        """,
        "large_volume_orders": """
            SELECT c_custkey, c_name, o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   round(o_totalprice, 2) AS o_totalprice, sum_qty
            FROM orders
            JOIN (SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
                  FROM lineitem GROUP BY l_orderkey
                  HAVING round(sum(l_quantity), 2) > 250) b
              ON o_orderkey = b.l_orderkey
            JOIN customer ON o_custkey = c_custkey
        """,
        "dormant_customers": """
            SELECT c_nationkey, count(*) AS numcust,
                   round(sum(c_acctbal), 2) AS totacctbal
            FROM customer c
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                               WHERE c_acctbal > 0)
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
            GROUP BY c_nationkey
        """,
        "product_profit": """
            SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   round(sum(l_extendedprice * (1 - l_discount)
                             - 0.6 * p_retailprice * l_quantity), 2) AS sum_profit
            FROM lineitem
            JOIN part     ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN orders   ON l_orderkey = o_orderkey
            WHERE p_name LIKE '%red%'
            GROUP BY n_name, year(o_orderdate)
        """,
        "important_parts": """
            WITH scoped AS (
              SELECT l_partkey, l_extendedprice * l_quantity AS v
              FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                                    WHERE n_name IN ('NATION_1','NATION_2','NATION_3')))
            SELECT l_partkey, round(sum(v), 2) AS value
            FROM scoped GROUP BY l_partkey
            HAVING sum(v) > (SELECT sum(v) * 0.001 FROM scoped)
        """,
        "supplier_part_count": """
            SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
            JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#12' AND p_type <> 'PROMO'
              AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
              AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                    WHERE s_acctbal < 0)
            GROUP BY p_brand, p_type, p_size
        """,
        "dominant_shippers": """
            WITH shipped AS (
              SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
              FROM lineitem
              WHERE l_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_name LIKE 'small%')
                AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
                AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
              GROUP BY l_suppkey, l_partkey),
            tot AS (SELECT l_partkey, sum(qty) AS total_qty
                    FROM shipped GROUP BY l_partkey)
            SELECT s_suppkey, s_name FROM supplier
            WHERE s_suppkey IN (SELECT l_suppkey
                                FROM shipped JOIN tot USING (l_partkey)
                                WHERE qty > 0.4 * total_qty)
        """,
        "union_concat": """
            SELECT s_suppkey, s_name, s_nationkey FROM supplier WHERE s_suppkey <= 60
            UNION
            SELECT s_suppkey, s_name, s_nationkey FROM supplier WHERE s_suppkey > 40
        """,
        "expression_derive": """
            SELECT l_orderkey, l_linenumber,
                   CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
                       AS revenue_cents
            FROM lineitem
        """,
        "map_batches": """
            SELECT l_orderkey, l_linenumber,
                   CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5)
                        AS BIGINT) AS charge_cents
            FROM lineitem
        """,
        "group_zscore": """
            SELECT o_orderkey, o_custkey,
                   round((o_totalprice - avg(o_totalprice) OVER w)
                         / stddev_samp(o_totalprice) OVER w, 4) AS z
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey)
        """,
        "events_window": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   event_type,
                   count(*) AS n_events,
                   round(sum(value), 2) AS value_sum
            FROM events
            GROUP BY 1, 2
        """,
        "topk_per_group": """
            SELECT c_nationkey, rank, c_custkey, c_acctbal
            FROM (SELECT c_nationkey, c_custkey, c_acctbal,
                         row_number() OVER (PARTITION BY c_nationkey
                                            ORDER BY c_acctbal DESC, c_custkey) AS rank
                  FROM customer)
            WHERE rank <= 3
        """,
        "schema_coerce": """
            SELECT s_suppkey, s_name,
                   TRY_CAST(trunc(s_acctbal) AS BIGINT) AS s_acctbal,
                   'UNKNOWN' AS s_region
            FROM supplier
        """,
        "set_ops": """
            SELECT s_suppkey, s_name, 'both' AS tag FROM (
              SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey <= 60
              INTERSECT
              SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey > 40)
            UNION ALL
            SELECT s_suppkey, s_name, 'lo_only' AS tag FROM (
              SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey <= 60
              EXCEPT ALL
              SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey > 40)
        """,
        "distinct_agg": """
            SELECT l_returnflag,
                   count(DISTINCT l_orderkey) AS l_orderkey_nunique,
                   count(DISTINCT l_suppkey)  AS l_suppkey_nunique
            FROM lineitem GROUP BY l_returnflag
        """,
        "sessionize": """
            -- strict > at microsecond precision: Spark's session_window
            -- MERGES adjacent sessions, so an event at exactly prev+gap
            -- extends the session; fractional-second gaps compare exactly
            WITH marked AS (
              SELECT user_id, ts, value,
                     CASE WHEN epoch_us(ts)
                               - lag(epoch_us(ts))
                                 OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
                          THEN 1 ELSE 0 END AS new_s
              FROM events),
            seq AS (
              SELECT user_id, ts, value,
                     -- DuckDB sum(int) is HUGEINT; pin to BIGINT to match Spark
                     CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
                         AS session_seq
              FROM marked)
            SELECT user_id, session_seq,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                   strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
                   count(*) AS n_events,
                   round(sum(value), 2) AS value_sum
            FROM seq GROUP BY user_id, session_seq
        """,
        "asof_join": """
            WITH clicks AS (
              SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
            purchases AS (
              SELECT user_id, ts, round(max(value), 2) AS purchase_value
              FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
            SELECT c.event_id, c.user_id,
                   strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts,
                   p.purchase_value
            FROM clicks c
            ASOF LEFT JOIN purchases p
              ON c.user_id = p.user_id AND c.ts >= p.ts
        """,
        "range_join": """
            SELECT band, count(*) AS n_rows, round(sum(l_quantity), 2) AS qty_sum
            FROM lineitem
            JOIN (VALUES (0.0, 9.999, 'low'), (10.0, 24.999, 'mid'),
                         (25.0, 100.0, 'high')) AS b(lo, hi, band)
              ON l_quantity BETWEEN lo AND hi
            GROUP BY band
        """,
        "pivot": """
            SELECT l_returnflag,
                   round(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0), 2) AS qty_open,
                   round(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0), 2) AS qty_filled
            FROM lineitem GROUP BY l_returnflag
        """,
        "rollup": """
            SELECT coalesce(l_returnflag, '(all)') AS l_returnflag,
                   coalesce(l_linestatus, '(all)') AS l_linestatus,
                   count(*) AS n_rows,
                   round(sum(l_quantity), 2) AS qty_sum
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "cube": """
            SELECT coalesce(l_returnflag, '(all)') AS l_returnflag,
                   coalesce(l_linestatus, '(all)') AS l_linestatus,
                   count(*) AS n_rows,
                   round(sum(l_extendedprice), 2) AS price_sum
            FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        """,
        "order_gaps": """
            SELECT o_custkey, o_orderkey,
                   CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate)
                        AS BIGINT) AS days_since_prev,
                   round(lead(o_totalprice) OVER w, 2) AS next_total,
                   CAST(ntile(4) OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice, o_orderkey)
                        AS BIGINT) AS spend_quartile
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        """,
        "running_window": """
            SELECT l_suppkey, l_orderkey, l_linenumber,
                   round(sum(l_quantity) OVER (
                       PARTITION BY l_suppkey
                       ORDER BY l_shipdate, l_orderkey, l_linenumber
                       ROWS UNBOUNDED PRECEDING), 2) AS running_qty
            FROM lineitem
        """,
        "fillna_ffill": """
            SELECT event_id, user_id,
                   last_value(CASE WHEN event_type = 'purchase'
                                   THEN round(value, 2) END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS purchase_value
            FROM events
        """,
        "part_type_revenue": """
            SELECT p_type, p_brand,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   round(avg(p_retailprice), 4) AS avg_retail,
                   count(*) AS n_rows
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_type, p_brand
        """,
        "anti_join": """
            SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal
            FROM customer c
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                               WHERE c_acctbal > 0.0)
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey)
        """,
        "semi_join": """
            SELECT c_custkey, c_name
            FROM customer c
            WHERE EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND EXISTS (SELECT 1 FROM lineitem l
                            WHERE l.l_orderkey = o.o_orderkey
                              AND l.l_quantity >= 49))
        """,
        "percentiles": """
            SELECT l_returnflag,
                   round(quantile_cont(l_quantity, 0.5), 4)      AS qty_p50,
                   round(quantile_cont(l_quantity, 0.9), 4)      AS qty_p90,
                   round(quantile_cont(l_extendedprice, 0.5), 4) AS price_p50
            FROM lineitem GROUP BY l_returnflag
        """,
        "funnel": """
            WITH v AS (SELECT user_id, min(ts) AS t_view
                       FROM events WHERE event_type = 'view' GROUP BY user_id),
            c AS (SELECT e.user_id, min(e.ts) AS t_click
                  FROM events e JOIN v ON e.user_id = v.user_id
                  WHERE e.event_type = 'click' AND e.ts > v.t_view
                  GROUP BY e.user_id),
            p AS (SELECT e.user_id, min(e.ts) AS t_purchase
                  FROM events e JOIN c ON e.user_id = c.user_id
                  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
                  GROUP BY e.user_id)
            SELECT v.user_id,
                   CAST(1 + CAST(c.t_click IS NOT NULL AS INT)
                          + CAST(p.t_purchase IS NOT NULL AS INT) AS BIGINT)
                       AS funnel_depth,
                   CAST(floor(epoch(c.t_click)) AS BIGINT)
                     - CAST(floor(epoch(v.t_view)) AS BIGINT)
                       AS secs_view_to_click,
                   CAST(floor(epoch(p.t_purchase)) AS BIGINT)
                     - CAST(floor(epoch(v.t_view)) AS BIGINT)
                       AS secs_view_to_purchase
            FROM v
            LEFT JOIN c ON v.user_id = c.user_id
            LEFT JOIN p ON v.user_id = p.user_id
        """,
        "retention_cohorts": """
            WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
                       FROM events GROUP BY user_id),
            d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
            SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
                   CAST(d.day - f.cohort_day AS BIGINT) AS day_offset,
                   count(DISTINCT d.user_id) AS active_users
            FROM d JOIN f USING (user_id)
            GROUP BY 1, 2
        """,
        "unpivot": """
            SELECT l_orderkey, l_linenumber, metric, round(value, 2) AS value
            FROM (SELECT l_orderkey, l_linenumber,
                         l_quantity, l_extendedprice, l_discount
                  FROM lineitem)
            UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice, l_discount))
        """,
        "json_extract": """
            SELECT o_orderkey,
                   json_extract_string(payload, '$.status') AS status,
                   round(CAST(json_extract(payload, '$.total') AS DOUBLE), 2)
                       AS total,
                   json_extract_string(payload, '$.priority') AS priority
            FROM (SELECT o_orderkey,
                         CAST(to_json(struct_pack(
                             status := o_orderstatus,
                             total := o_totalprice,
                             priority := o_orderpriority)) AS VARCHAR) AS payload
                  FROM orders)
        """,
        "text_features": f"""
            SELECT doc_id, ws_tokens, bpe_tokens, lang_id, quality, fingerprint
            FROM {_D_FEATURES} f
        """,
        "vocab_top_terms": f"""
            SELECT term, count(*) AS doc_freq
            FROM (SELECT doc_id, unnest(list_distinct({_D_TOKENS})) AS term
                  FROM documents)
            GROUP BY term
            ORDER BY doc_freq DESC, term
            LIMIT 50
        """,
        "doc_repetition": f"""
            SELECT b.doc_id,
                   CASE WHEN greatest(len(toks) - 1, 0) = 0 THEN 0.0
                        ELSE round(1.0 - len(list_distinct(
                               list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                                              i -> array_to_string(toks[i:i+1], ' '))))
                             / CAST(len(toks) - 1 AS DOUBLE), 4) END AS rep_bigram_ratio,
                   CASE WHEN greatest(len(toks) - 2, 0) = 0 THEN 0.0
                        ELSE round(1.0 - len(list_distinct(
                               list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                                              i -> array_to_string(toks[i:i+2], ' '))))
                             / CAST(len(toks) - 2 AS DOUBLE), 4) END AS rep_trigram_ratio,
                   CASE WHEN len(toks) = 0 THEN 0.0
                        ELSE round(length(array_to_string(toks, ''))
                             / CAST(len(toks) AS DOUBLE), 4) END AS mean_word_len,
                   CASE WHEN len(lns) = 0 THEN 0.0
                        ELSE round(1.0 - len(list_distinct(lns))
                             / CAST(len(lns) AS DOUBLE), 4) END AS dup_line_ratio,
                   t.top_token_fraction
            FROM (SELECT doc_id, {_D_TOKENS} AS toks,
                         list_filter(list_transform(string_split(text, chr(10)),
                                                    l -> trim(l)),
                                     l -> l <> '') AS lns
                  FROM documents) b
            LEFT JOIN (
                SELECT doc_id,
                       round(CAST(max(n) AS DOUBLE) / sum(n), 4) AS top_token_fraction
                FROM (SELECT doc_id, tok, count(*) AS n
                      FROM (SELECT doc_id, unnest({_D_TOKENS}) AS tok FROM documents)
                      GROUP BY doc_id, tok)
                GROUP BY doc_id) t USING (doc_id)
        """,
        "doc_chunks": f"""
            WITH t AS (SELECT doc_id, {_D_TOKENS} AS toks FROM documents),
            s AS (SELECT doc_id, toks,
                         unnest(range(1, len(toks)+1, 48)) AS start
                  FROM t WHERE len(toks) >= 1)
            SELECT doc_id, CAST((start-1)/48 AS BIGINT) AS chunk_id,
                   array_to_string(list_slice(toks, start, start+63), ' ')
                     AS chunk_text,
                   len(list_slice(toks, start, start+63)) AS n_tokens
            FROM s
        """,
        "pack_sequences": f"""
            WITH RECURSIVE d AS (
              SELECT doc_id, doc_id // 100 AS g, len({_D_TOKENS}) AS n_tokens,
                     row_number() OVER (PARTITION BY doc_id // 100
                                        ORDER BY doc_id) AS rn
              FROM documents),
            rec AS (
              SELECT g, rn, doc_id, n_tokens, 0 AS bin, n_tokens AS cur
              FROM d WHERE rn = 1
              UNION ALL
              SELECT d.g, d.rn, d.doc_id, d.n_tokens,
                     CASE WHEN rec.cur > 0 AND rec.cur + d.n_tokens > 256
                          THEN rec.bin + 1 ELSE rec.bin END,
                     CASE WHEN rec.cur > 0 AND rec.cur + d.n_tokens > 256
                          THEN d.n_tokens ELSE rec.cur + d.n_tokens END
              FROM rec JOIN d ON d.g = rec.g AND d.rn = rec.rn + 1)
            SELECT doc_id, n_tokens, g * 1000000 + bin AS bin_id FROM rec
        """,
        "bm25_topk": f"""
            WITH base AS (SELECT doc_id, {_D_TOKENS} AS toks FROM documents),
            doclen AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM base),
            post AS (
              SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS tf
              FROM (SELECT doc_id, unnest(toks) AS t FROM base)
              WHERE t IN ('vector','hash','merge') GROUP BY doc_id, t),
            stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl
                      FROM doclen),
            dfreq AS (SELECT t, CAST(count(*) AS DOUBLE) AS dft FROM post
                      GROUP BY t)
            SELECT doc_id, round(sum(
                ln(1 + (n - dft + 0.5)/(dft + 0.5)) *
                tf*(1.2+1)/(tf + 1.2*(1 - 0.75 + 0.75*dl/avgdl))), 4) AS score
            FROM post JOIN dfreq USING (t) JOIN doclen USING (doc_id)
            CROSS JOIN stats
            GROUP BY doc_id
            ORDER BY score DESC, doc_id LIMIT 15
        """,
        "embedding_centroids": """
            WITH idx AS (
              SELECT vec_id % 4 AS grp, embedding,
                     unnest(range(1, len(embedding)+1)) AS pos
              FROM embeddings),
            s AS (
              SELECT grp, pos, sum(embedding[pos]) AS sv, count(*) AS n
              FROM idx GROUP BY grp, pos),
            c AS (
              SELECT grp, list(sv / n ORDER BY pos) AS centroid,
                     max(n) AS n_members
              FROM s GROUP BY grp),
            cidx AS (
              SELECT grp, centroid, n_members,
                     unnest(range(1, len(centroid)+1)) AS pos
              FROM c)
            SELECT grp, CAST(pos - 1 AS BIGINT) AS pos,
                   round(centroid[pos]
                         / sqrt(list_sum(list_transform(centroid, y -> y*y))), 6)
                     AS value,
                   n_members
            FROM cidx
        """,
        "hashed_vectors": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_D_TOKENS}) AS tok FROM documents),
            c AS (
              SELECT doc_id, {_d_hash_bucket('tok', 42, 64)} AS b,
                     count(*) AS c
              FROM toks GROUP BY doc_id, b),
            d AS (
              -- CAST: DuckDB sum(BIGINT) is HUGEINT -> pandas float64;
              -- the driver's bit-level hash distinguishes 124.0 from the
              -- Spark side's int64 124 (the r4 hash_match=false escape)
              SELECT doc_id, sqrt(sum(c*c)) AS nrm,
                     CAST(sum(c) AS BIGINT) AS n_tokens
              FROM c GROUP BY doc_id),
            grid AS (
              SELECT doc_id, nrm, n_tokens, unnest(range(0, 64)) AS pos
              FROM d)
            SELECT g.doc_id, CAST(g.pos AS BIGINT) AS pos,
                   CAST(round(coalesce(c.c, 0) / g.nrm * 1000000)
                        AS BIGINT) AS weight_e6,
                   g.n_tokens
            FROM grid g
            LEFT JOIN c ON c.doc_id = g.doc_id AND c.b = g.pos
        """,
        "lm_score": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_D_TOKENS}) AS tok FROM documents),
            vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
            totals AS (SELECT CAST(sum(c) AS DOUBLE) AS total,
                              CAST(count(*) AS DOUBLE) AS vsize
                       FROM vocab)
            SELECT doc_id, count(*) AS n_tokens,
                   round(avg(ln((c + 1.0) / (total + vsize))), 4) AS lm_score
            FROM toks JOIN vocab USING (tok) CROSS JOIN totals
            GROUP BY doc_id
        """,
        "normalized_text": f"""
            WITH mess AS (
              SELECT doc_id,
                     concat('“quote”', chr(160), 'and', chr(8195),
                            'x', chr(8230), chr(7), chr(13), chr(10),
                            substr(text, 1, 40),
                            '  two   spaces', chr(9), 'and', chr(9), 'tabs',
                            repeat(chr(10), 5),
                            chr(8211), 'dash', chr(8212), ' ',
                            chr(8217), 'end', chr(8216)) AS t
              FROM documents)
            SELECT doc_id, {_d_normalize('t')} AS text_norm FROM mess
        """,
        "lm_perplexity": f"""
            WITH tr AS (
              SELECT {_D_TOKENS} AS ts FROM documents
              WHERE doc_id % 2 = 0 AND len({_D_TOKENS}) >= 2),
            tri AS (SELECT ts, unnest(range(1, len(ts))) AS i FROM tr),
            model AS (
              SELECT ts[i] AS prev, ts[i+1] AS cur, count(*) AS cnt
              FROM tri GROUP BY 1, 2),
            ctx AS (SELECT prev, sum(cnt) AS ctx_c FROM model GROUP BY prev),
            vocab AS (
              SELECT CAST(count(DISTINCT t) AS DOUBLE) AS vsize
              FROM (SELECT prev AS t FROM model
                    UNION ALL SELECT cur FROM model)),
            sc AS (
              SELECT doc_id, {_D_TOKENS} AS ts FROM documents
              WHERE doc_id % 2 = 1 AND len({_D_TOKENS}) >= 2),
            sci AS (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM sc),
            sp AS (SELECT doc_id, ts[i] AS prev, ts[i+1] AS cur FROM sci),
            lp AS (
              SELECT doc_id,
                     ln((coalesce(m.cnt, 0) + 1.0)
                        / (coalesce(x.ctx_c, 0) + 1.0 * v.vsize)) AS lp
              FROM sp LEFT JOIN model m USING (prev, cur)
              LEFT JOIN ctx x USING (prev) CROSS JOIN vocab v)
            SELECT doc_id, count(*) AS n_bigrams,
                   round(avg(lp), 4) AS lm2_score,
                   round(exp(-round(avg(lp), 4)), 4) AS perplexity
            FROM lp GROUP BY doc_id
        """,
        "line_hygiene": """
            WITH synth AS (
              SELECT doc_id,
                     concat_ws(chr(10), 'cookie banner ok', substr(text, 1, 40),
                               'cookie banner ok', substr(text, 41, 40),
                               'copyright footer') AS text
              FROM documents),
            l0 AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM synth),
            li AS (SELECT doc_id, ls, unnest(range(1, len(ls)+1)) AS pos FROM l0),
            lines AS (SELECT doc_id, pos, ls[pos] AS line FROM li),
            d1 AS (SELECT doc_id, line, min(pos) AS pos
                   FROM lines GROUP BY doc_id, line),
            nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM synth),
            dfq AS (SELECT line, count(*) AS dfc
                    FROM (SELECT DISTINCT doc_id, line FROM d1
                          WHERE trim(line) != '')
                    GROUP BY line),
            boiler AS (SELECT line FROM dfq, nd
                       WHERE dfc >= 2 AND dfc > n * 0.3),
            kept AS (SELECT doc_id, pos, line FROM d1
                     WHERE NOT EXISTS (SELECT 1 FROM boiler b
                                       WHERE b.line = d1.line)),
            rebuilt AS (SELECT doc_id,
                               string_agg(line, chr(10) ORDER BY pos) AS text
                        FROM kept GROUP BY doc_id)
            SELECT doc_id, text,
                   len(string_split(text, chr(10))) AS n_lines
            FROM rebuilt
        """,
        "quality_percentile": f"""
            SELECT doc_id, lang_id, quality, pr
            FROM (SELECT doc_id, lang_id, quality,
                         round(percent_rank() OVER (PARTITION BY lang_id
                                 ORDER BY quality, doc_id), 6) AS pr
                  FROM {_D_FEATURES} f)
            WHERE pr >= 0.6
        """,
        "incremental_rollup": """
            SELECT o_orderstatus, o_orderpriority,
                   round(sum(o_totalprice), 2) AS price_sum,
                   round(sum(o_totalprice) / count(o_orderkey), 4) AS price_mean,
                   max(o_totalprice) AS price_max,
                   count(o_orderkey) AS n_orders
            FROM orders
            GROUP BY o_orderstatus, o_orderpriority
        """,
        "token_mixture": f"""
            WITH sized AS (
              SELECT doc_id, source, len({_D_TOKENS}) AS n_tokens,
                     md5('42' || '|' || CAST(doc_id AS VARCHAR)) AS h,
                     CASE source WHEN 'src0' THEN 800 WHEN 'src1' THEN 400
                                 WHEN 'src2' THEN 2000 END AS budget
              FROM documents WHERE source IN ('src0','src1','src2')),
            cum AS (
              SELECT doc_id, source, n_tokens, budget,
                     sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS c
              FROM sized)
            SELECT doc_id, source, n_tokens FROM cum
            WHERE c - n_tokens < budget
        """,
        "corpus_shuffle": """
            SELECT doc_id,
                   row_number() OVER (
                     ORDER BY md5('42' || '|' || CAST(doc_id AS VARCHAR)),
                              doc_id) - 1 AS shuffle_order
            FROM documents
        """,
        "temperature_mix": """
            WITH counts AS (
              SELECT source, CAST(count(*) AS BIGINT) AS n
              FROM documents GROUP BY source),
            weighted AS (
              SELECT source, n, pow(CAST(n AS DOUBLE), 0.5) AS w,
                     sum(pow(CAST(n AS DOUBLE), 0.5)) OVER (
                       ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cumw
              FROM counts),
            quotas AS (
              SELECT source, n,
                     CAST(floor(600 * w / (SELECT max(cumw) FROM weighted))
                          AS BIGINT) AS quota
              FROM weighted),
            epochs AS (
              SELECT d.doc_id, d.source, q.n, q.quota,
                     unnest(range(0, (q.quota + q.n - 1) // q.n)) AS epoch
              FROM documents d JOIN quotas q USING (source)),
            ranked AS (
              SELECT doc_id, source, epoch, quota,
                     epoch * n + row_number() OVER (
                       PARTITION BY source, epoch
                       ORDER BY md5('42' || '|' || CAST(epoch AS VARCHAR)
                                    || '|' || CAST(doc_id AS VARCHAR)),
                                doc_id) AS rnk
              FROM epochs)
            SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch
            FROM ranked WHERE rnk <= quota
        """,
        "conversation_stats": f"""
            WITH toks AS (
              SELECT doc_id, {_D_TOKENS} AS t FROM documents),
            flat AS (
              SELECT doc_id AS conv_id, i.i AS pos,
                     CASE WHEN doc_id % 7 = 0 THEN 'user'
                          WHEN i.i % 2 = 0 THEN 'user'
                          ELSE 'assistant' END AS role,
                     array_to_string(t[i.i*6+1 : i.i*6+6], ' ') AS content
              FROM toks, (SELECT unnest([0,1,2,3]) AS i) i
              WHERE len(t) > i.i * 6),
            flagged AS (
              SELECT conv_id, pos, role, content,
                     role = lag(role) OVER (
                       PARTITION BY conv_id ORDER BY pos) AS same_as_prev
              FROM flat)
            SELECT conv_id,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(count(*) FILTER (role = 'user') AS BIGINT) AS n_user,
                   CAST(count(*) FILTER (role = 'assistant') AS BIGINT)
                     AS n_assistant,
                   CAST(sum(len(string_split(content, ' '))) AS BIGINT)
                     AS n_tokens,
                   arg_min(role, pos) AS first_role,
                   arg_max(role, pos) AS last_role,
                   concat_ws(',',
                     CASE WHEN coalesce(bool_or(same_as_prev), false)
                          THEN 'consecutive_role' END,
                     CASE WHEN count(*) FILTER (role = 'assistant') = 0
                          THEN 'no_assistant' END) AS errors,
                   NOT (coalesce(bool_or(same_as_prev), false)
                        OR count(*) FILTER (role = 'assistant') = 0) AS valid,
                   md5(string_agg(role || ': ' || content, chr(10)
                                  ORDER BY pos)) AS render_fp
            FROM flagged
            GROUP BY conv_id
        """,
        "preference_pairs": """
            WITH scored AS (
              SELECT doc_id % 97 AS prompt_id, doc_id AS completion_id,
                     CAST(n_chars AS DOUBLE) AS score
              FROM documents),
            ranked AS (
              SELECT *,
                     row_number() OVER (PARTITION BY prompt_id
                       ORDER BY score DESC, completion_id ASC) AS rc,
                     row_number() OVER (PARTITION BY prompt_id
                       ORDER BY score ASC, completion_id DESC) AS rr,
                     count(*) OVER (PARTITION BY prompt_id) AS n
              FROM scored),
            pairs AS (
              SELECT c.prompt_id,
                     c.completion_id AS chosen_id, c.score AS chosen_score,
                     r.completion_id AS rejected_id, r.score AS rejected_score
              FROM ranked c
              JOIN ranked r ON c.prompt_id = r.prompt_id
                           AND c.rc = 1 AND r.rr = 1
              WHERE c.n >= 2 AND c.completion_id != r.completion_id)
            SELECT prompt_id, chosen_id, chosen_score, rejected_id,
                   rejected_score,
                   chosen_score - rejected_score AS margin
            FROM pairs
            WHERE chosen_score - rejected_score >= 1.0
        """,
        "common_ngrams": f"""
            WITH toks AS (
              SELECT doc_id, {_D_TOKENS} AS t FROM documents),
            grams AS (
              SELECT doc_id,
                     unnest(list_transform(
                       range(1, greatest(len(t) - 2, 0) + 1),
                       i -> array_to_string(t[i:i+2], ' '))) AS ngram
              FROM toks),
            agg AS (
              SELECT ngram,
                     CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                     CAST(count(*) AS BIGINT) AS occurrences
              FROM grams GROUP BY ngram)
            SELECT ngram, n_docs, occurrences FROM agg
            WHERE n_docs >= 2
            ORDER BY n_docs DESC, occurrences DESC, ngram
            LIMIT 50
        """,
        "pii_redaction": f"""
            SELECT doc_id,
                   {_d_pii_clean('raw')} AS clean,
                   {_d_pii_count('raw')} AS n_pii
            FROM (SELECT doc_id,
                         concat_ws(' ', 'contact',
                           'user' || CAST(doc_id AS VARCHAR) || '@example.com',
                           'tel',
                           '555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                                  || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                           'ssn',
                           '123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                           'ip',
                           '10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7',
                           substr(text, 1, 40)) AS raw
                  FROM documents)
        """,
        "hash_split": f"""
            SELECT doc_id, bucket,
                   CASE WHEN bucket < 9000 THEN 'train'
                        WHEN bucket < 9500 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id, {_d_hash_bucket('doc_id', 42)} AS bucket
                  FROM documents)
        """,
        "stratified_sample": f"""
            SELECT doc_id, lang
            FROM (SELECT doc_id, lang, {_d_hash_bucket('doc_id', 7)} AS bucket
                  FROM documents)
            WHERE bucket < CASE lang WHEN 'en' THEN 5000
                                     WHEN 'de' THEN 10000
                                     WHEN 'fr' THEN 2500
                                     ELSE 0 END
        """,
        "source_cap": """
            SELECT doc_id, source
            FROM (SELECT doc_id, source,
                         row_number() OVER (
                           PARTITION BY source
                           ORDER BY md5('11' || chr(31)
                                        || CAST(doc_id AS VARCHAR)),
                                    doc_id) AS rn
                  FROM documents)
            WHERE rn <= 10
        """,
        "multimodal_features": """
            SELECT doc_id AS asset_id,
                   CASE doc_id % 3 WHEN 0 THEN 'image'
                                   WHEN 1 THEN 'audio'
                                   ELSE 'video' END AS modality,
                   CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
                   sha256(text) AS content_sha256
            FROM documents
        """,
        "corpus_clean": f"""
            WITH RECURSIVE
            feats AS (SELECT * FROM {_D_FEATURES}),
            kept AS (
              SELECT f.doc_id, f.lang_id, f.quality
              FROM feats f
              JOIN (SELECT fingerprint, min(doc_id) AS doc_id
                    FROM feats
                    WHERE quality >= 0.3 AND lang_id = 'en'
                    GROUP BY fingerprint) r
                ON f.fingerprint = r.fingerprint AND f.doc_id = r.doc_id
              WHERE f.quality >= 0.3 AND f.lang_id = 'en'),
            s AS (
              SELECT d.doc_id, sh, len(sh) AS sz
              FROM (SELECT doc_id, {_D_SHINGLES} AS sh FROM documents) d
              JOIN kept k ON d.doc_id = k.doc_id
              WHERE len(sh) > 0),
            base AS (
              SELECT id_a, id_b
              FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                           round(len(list_intersect(a.sh, b.sh))
                                 / (a.sz + b.sz - len(list_intersect(a.sh, b.sh)))::DOUBLE,
                                 4) AS jaccard
                    FROM s a JOIN s b ON a.doc_id < b.doc_id)
              WHERE jaccard >= 0.5),
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM base
              UNION
              SELECT id_b, id_a FROM base),
            reach(src, dst) AS (
              SELECT src, dst FROM edges
              UNION
              SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
            dropped AS (
              SELECT doc_id
              FROM (SELECT src AS doc_id, least(src, min(dst)) AS component
                    FROM reach GROUP BY src)
              WHERE doc_id != component)
            SELECT doc_id, lang_id, quality
            FROM kept
            WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
        """,
        "exact_dedup": f"""
            SELECT min(doc_id) AS doc_id, count(*) AS dup_count
            FROM (SELECT doc_id,
                         md5(array_to_string(list_sort(list_distinct({_D_TOKENS})), ' ')) AS fp
                  FROM documents)
            GROUP BY fp
        """,
        "jaccard_pairs": f"""
            WITH s AS (
              SELECT doc_id, sh, len(sh) AS sz
              FROM (SELECT doc_id, {_D_SHINGLES} AS sh FROM documents)
              WHERE len(sh) > 0)
            SELECT id_a, id_b, jaccard
            FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         round(len(list_intersect(a.sh, b.sh))
                               / (a.sz + b.sz - len(list_intersect(a.sh, b.sh)))::DOUBLE,
                               4) AS jaccard
                  FROM s a JOIN s b ON a.doc_id < b.doc_id)
            WHERE jaccard >= 0.5
        """,
        # jaccard_index_probe: the persisted prefix index is EXACT by
        # contract (frozen-order prefix lemma + full-postings verify),
        # so the brute-force cross join over the two halves is its truth
        # at any scale — not an oracle-SF adjudication
        "jaccard_index_probe": f"""
            WITH s AS (
              SELECT doc_id, {_D_SHINGLES} AS sh FROM documents),
            bat AS (
              SELECT doc_id, sh, len(sh) AS sz FROM s
              WHERE doc_id % 2 = 1 AND len(sh) > 0),
            idx AS (
              SELECT doc_id, sh, len(sh) AS sz FROM s
              WHERE doc_id % 2 = 0 AND len(sh) > 0)
            SELECT batch_id, index_id, jaccard
            FROM (SELECT b.doc_id AS batch_id, i.doc_id AS index_id,
                         round(len(list_intersect(b.sh, i.sh))
                               / (b.sz + i.sz
                                  - len(list_intersect(b.sh, i.sh)))::DOUBLE,
                               4) AS jaccard
                  FROM bat b, idx i)
            WHERE jaccard >= 0.5
        """,
        # jaccard_pairs_budget: the budget cap is fitted from the observed
        # df distribution and provably admits everything at oracle SF
        # (Σdf² « budget, max df « floor), so the uncapped exact-Jaccard
        # SQL is the oracle for the budget path too
        "jaccard_pairs_budget": f"""
            WITH s AS (
              SELECT doc_id, sh, len(sh) AS sz
              FROM (SELECT doc_id, {_D_SHINGLES} AS sh FROM documents)
              WHERE len(sh) > 0)
            SELECT id_a, id_b, jaccard
            FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         round(len(list_intersect(a.sh, b.sh))
                               / (a.sz + b.sz - len(list_intersect(a.sh, b.sh)))::DOUBLE,
                               4) AS jaccard
                  FROM s a JOIN s b ON a.doc_id < b.doc_id)
            WHERE jaccard >= 0.5
        """,
        # budget_cap_fit: replays the auto_frequency_cap BUDGET FIT math
        # itself (operators/skew.py _budget_fit_frame) with a budget that
        # BINDS at every test SF: per-count-value volumes, cumulative sum
        # ascending, largest count value whose admitted Σcount² fits
        # 20000 (floor 1; quantile rule pushed out of range by the 1e9
        # multiplier on the Spark side, so the budget alone decides)
        "budget_cap_fit": """
            WITH freq AS (
              SELECT l_partkey, count(*) AS f FROM lineitem
              GROUP BY l_partkey),
            per_value AS (
              SELECT f AS c, sum(CAST(f AS DOUBLE) * f) AS vol
              FROM freq GROUP BY f),
            cum AS (
              SELECT c, sum(vol) OVER (ORDER BY c) AS cumvol
              FROM per_value),
            cap AS (
              SELECT coalesce(max(CASE WHEN cumvol <= 20000 THEN c END), 1)
                       AS derived_cap
              FROM cum)
            SELECT cap.derived_cap AS derived_cap,
                   coalesce(sum(CAST(f AS DOUBLE) * f), 0.0)
                     AS admitted_volume,
                   count(*) AS surviving_keys
            FROM freq, cap
            WHERE f <= cap.derived_cap
            GROUP BY cap.derived_cap
        """,
        "group_trend": """
            WITH f AS (
              SELECT l_returnflag,
                     CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS x,
                     CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
              FROM lineitem),
            a AS (
              SELECT l_returnflag, count(*) AS n,
                     CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * y) AS BIGINT) AS sxy,
                     CAST(sum(x * x) AS BIGINT) AS sxx
              FROM f GROUP BY l_returnflag)
            SELECT l_returnflag, n,
                   CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) <> 0.0 THEN
                     CAST(round(
                       (CAST(n * sxy - sx * sy AS DOUBLE)
                        / CAST(n * sxx - sx * sx AS DOUBLE)) * 1e6)
                       AS BIGINT) END AS slope_e6,
                   CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) <> 0.0 THEN
                     CAST(round(
                       ((CAST(sy AS DOUBLE)
                         - (CAST(n * sxy - sx * sy AS DOUBLE)
                            / CAST(n * sxx - sx * sx AS DOUBLE))
                           * CAST(sx AS DOUBLE))
                        / CAST(n AS DOUBLE)) * 1e6)
                       AS BIGINT) END AS intercept_e6
            FROM a
        """,
        # column_drift: replays the shared-bin PSI chain — union min/max,
        # the width_bucket float-division bucket (same chain the
        # zorder/histogram oracles pin), spine left joins, epsilon-guarded
        # fractions, (pa-pb)*ln(pa/pb) — rounded 6 (ln ulp contract).
        "column_drift": """
            WITH v AS (SELECT CAST(value AS DOUBLE) AS v,
                              event_id % 2 AS side
                       FROM events WHERE value IS NOT NULL),
            s AS (SELECT min(v) AS mn, max(v) AS mx FROM v),
            bucketed AS (
              SELECT side,
                     GREATEST(0, LEAST(9,
                       (CAST(floor((v - mn) / ((mx - mn) / 10))
                             AS BIGINT) + 1) - 1)) AS bin
              FROM v, s),
            ca AS (SELECT bin, count(*) AS count_a
                   FROM bucketed WHERE side = 0 GROUP BY bin),
            cb AS (SELECT bin, count(*) AS count_b
                   FROM bucketed WHERE side = 1 GROUP BY bin),
            n AS (SELECT (SELECT count(*) FROM v WHERE side = 0) AS na,
                         (SELECT count(*) FROM v WHERE side = 1) AS nb),
            spine AS (SELECT CAST(range AS INTEGER) AS bin FROM range(10)),
            j AS (SELECT bin,
                         COALESCE(count_a, 0) AS count_a,
                         COALESCE(count_b, 0) AS count_b
                  FROM spine LEFT JOIN ca USING (bin)
                             LEFT JOIN cb USING (bin)),
            f AS (SELECT j.*,
                         CASE WHEN na > 0 THEN count_a / CAST(na AS DOUBLE)
                              ELSE 0.0 END AS frac_a,
                         CASE WHEN nb > 0 THEN count_b / CAST(nb AS DOUBLE)
                              ELSE 0.0 END AS frac_b,
                         mn, mx
                  FROM j, n, s)
            SELECT bin,
                   round(mn + bin * ((mx - mn) / 10), 6) AS lo,
                   round(mn + (bin + 1) * ((mx - mn) / 10), 6) AS hi,
                   count_a, count_b,
                   round(frac_a, 6) AS frac_a,
                   round(frac_b, 6) AS frac_b,
                   round((CASE WHEN frac_a <= 0 THEN 0.000001 ELSE frac_a END
                          - CASE WHEN frac_b <= 0 THEN 0.000001 ELSE frac_b END)
                         * ln(CASE WHEN frac_a <= 0 THEN 0.000001 ELSE frac_a END
                              / CASE WHEN frac_b <= 0 THEN 0.000001 ELSE frac_b END),
                         6) AS psi_contrib
            FROM f
        """,
        # category_drift: replays the bounded value-mix PSI chain — per-
        # epoch value counts, full-outer join, top-8 by (combined DESC,
        # value ASC), __other__ fold, full-total fractions, epsilon guard,
        # (pa-pb)*ln(pa/pb) — rounded 6 (ln ulp contract). SUMs cast back
        # to BIGINT (DuckDB widens to HUGEINT).
        "category_drift": """
            WITH v AS (SELECT CAST(source AS VARCHAR) AS value,
                              doc_id % 2 AS side
                       FROM documents WHERE source IS NOT NULL),
            ca AS (SELECT value, count(*) AS count_a
                   FROM v WHERE side = 0 GROUP BY value),
            cb AS (SELECT value, count(*) AS count_b
                   FROM v WHERE side = 1 GROUP BY value),
            j AS (SELECT COALESCE(ca.value, cb.value) AS value,
                         COALESCE(count_a, 0) AS count_a,
                         COALESCE(count_b, 0) AS count_b
                  FROM ca FULL OUTER JOIN cb ON ca.value = cb.value),
            top AS (SELECT * FROM j
                    ORDER BY (count_a + count_b) DESC, value ASC LIMIT 8),
            oth AS (SELECT '__other__' AS value,
                           CAST(COALESCE(SUM(count_a), 0) AS BIGINT)
                             AS count_a,
                           CAST(COALESCE(SUM(count_b), 0) AS BIGINT)
                             AS count_b
                    FROM j WHERE value NOT IN (SELECT value FROM top)
                    HAVING COALESCE(SUM(count_a), 0)
                           + COALESCE(SUM(count_b), 0) > 0),
            rep AS (SELECT * FROM top UNION ALL SELECT * FROM oth),
            n AS (SELECT CAST(SUM(count_a) AS BIGINT) AS na,
                         CAST(SUM(count_b) AS BIGINT) AS nb FROM j),
            f AS (SELECT rep.*,
                         CASE WHEN na > 0
                              THEN count_a / CAST(na AS DOUBLE)
                              ELSE 0.0 END AS frac_a,
                         CASE WHEN nb > 0
                              THEN count_b / CAST(nb AS DOUBLE)
                              ELSE 0.0 END AS frac_b
                  FROM rep, n)
            SELECT value, count_a, count_b,
                   round(frac_a, 6) AS frac_a,
                   round(frac_b, 6) AS frac_b,
                   round((CASE WHEN frac_a <= 0 THEN 0.000001
                               ELSE frac_a END
                          - CASE WHEN frac_b <= 0 THEN 0.000001
                                 ELSE frac_b END)
                         * ln(CASE WHEN frac_a <= 0 THEN 0.000001
                                   ELSE frac_a END
                              / CASE WHEN frac_b <= 0 THEN 0.000001
                                    ELSE frac_b END),
                         6) AS psi_contrib
            FROM f
        """,
        "quantile_buckets": f"""
            WITH b AS (
              SELECT quantile_cont(floor(l_extendedprice * 100.0 + 0.5),
                                   [{', '.join(repr(i / 10) for i in range(1, 10))}])
                       AS bs
              FROM lineitem)
            SELECT l_orderkey, l_linenumber,
                   CAST(len(list_filter(b.bs,
                          x -> floor(l_extendedprice * 100.0 + 0.5) > x))
                        AS INTEGER) AS qbucket
            FROM lineitem, b
        """,
        "benford": f"""
            WITH f AS (
              SELECT CAST(abs(floor(l_extendedprice * 100.0 + 0.5))
                          AS BIGINT) AS v
              FROM lineitem),
            d AS (
              SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INTEGER)
                       AS digit
              FROM f WHERE v > 0),
            c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
            t AS (SELECT CAST(sum(n) AS DOUBLE) AS tt FROM c)
            SELECT digit, CAST(n AS BIGINT) AS n,
                   round(n / tt, 4) AS share,
                   CASE digit {' '.join(
                       f'WHEN {d} THEN {e!r}'
                       for d, e in sorted(
                           __import__('mini_etl_spark.maintenance',
                                      fromlist=['BENFORD_EXPECTED'])
                           .BENFORD_EXPECTED.items()))} END AS expected
            FROM c, t
        """,
        "l_diversity": """
            WITH pv AS (
              SELECT c_nationkey, c_mktsegment,
                     CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS sv,
                     count(*) AS n
              FROM customer GROUP BY 1, 2, 3)
            SELECT c_nationkey, c_mktsegment,
                   CAST(sum(n) AS BIGINT) AS group_size,
                   count(*) AS n_sensitive_values,
                   count(*) >= 3 AS l_diverse
            FROM pv GROUP BY 1, 2
        """,
        "containment_pairs": f"""
            WITH s AS (
              SELECT doc_id, sh, len(sh) AS sz
              FROM (SELECT doc_id, {_D_SHINGLES} AS sh FROM documents)
              WHERE len(sh) > 0)
            SELECT id_a, id_b, containment
            FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         round(len(list_intersect(a.sh, b.sh))
                               / least(a.sz, b.sz)::DOUBLE, 4) AS containment
                  FROM s a JOIN s b ON a.doc_id < b.doc_id)
            WHERE containment >= 0.8
        """,
        # Containment (not Jaccard): |shared| / |test shingles|. The 50/50
        # split replays the engine's md5 hash bucket exactly; all-pairs
        # list_intersect is viable only at oracle scale — the engine side
        # runs the inverted-index join instead.
        "contamination": f"""
            WITH s AS (
              SELECT doc_id, {_D_SHINGLES} AS sh,
                     {_d_hash_bucket('doc_id', 42)} AS bucket
              FROM documents),
            tr AS (SELECT doc_id, sh FROM s WHERE bucket < 5000 AND len(sh) > 0),
            te AS (SELECT doc_id, sh, len(sh) AS sz
                   FROM s WHERE bucket >= 5000 AND len(sh) > 0)
            SELECT test_id, train_id, overlap
            FROM (SELECT te.doc_id AS test_id, tr.doc_id AS train_id,
                         round(len(list_intersect(tr.sh, te.sh)) / te.sz::DOUBLE,
                               4) AS overlap
                  FROM tr, te)
            WHERE overlap >= 0.5
        """,
        "decontaminated": f"""
            WITH s AS (
              SELECT doc_id, lang, source, n_chars, {_D_SHINGLES} AS sh,
                     {_d_hash_bucket('doc_id', 42)} AS bucket
              FROM documents),
            tr AS (SELECT * FROM s WHERE bucket < 5000),
            te AS (SELECT doc_id, sh, len(sh) AS sz
                   FROM s WHERE bucket >= 5000 AND len(sh) > 0),
            bad AS (
              SELECT DISTINCT tr.doc_id
              FROM tr, te
              WHERE len(tr.sh) > 0
                AND round(len(list_intersect(tr.sh, te.sh)) / te.sz::DOUBLE, 4)
                    >= 0.5)
            SELECT doc_id, lang, source, n_chars
            FROM tr WHERE doc_id NOT IN (SELECT doc_id FROM bad)
        """,
        # bloom_decontaminated: the Bloom screen is a semantics-preserving
        # accelerator (exact verify kills false positives; Bloom filters
        # have no false negatives), so plain exact 5-gram membership SQL
        # is a FULL oracle — independent of the filter's n_bits/k sizing.
        "bloom_decontaminated": f"""
            WITH s AS (
              SELECT doc_id, lang, source, n_chars,
                     {_d_shingles_n(5)} AS sh,
                     {_d_hash_bucket('doc_id', 42)} AS bucket
              FROM documents),
            tr AS (SELECT * FROM s WHERE bucket < 5000),
            te AS (SELECT DISTINCT gram
                   FROM (SELECT unnest(sh) AS gram
                         FROM s WHERE bucket >= 5000)),
            bad AS (
              SELECT DISTINCT doc_id
              FROM (SELECT doc_id, unnest(sh) AS gram FROM tr) ex
              JOIN te USING (gram))
            SELECT doc_id, lang, source, n_chars
            FROM tr WHERE doc_id NOT IN (SELECT doc_id FROM bad)
        """,
        # bloom_decontaminated_indexed: persistence changes WHERE the
        # benchmark side lives, not the result — same full oracle.
        "bloom_decontaminated_indexed": f"""
            WITH s AS (
              SELECT doc_id, lang, source, n_chars,
                     {_d_shingles_n(5)} AS sh,
                     {_d_hash_bucket('doc_id', 42)} AS bucket
              FROM documents),
            tr AS (SELECT * FROM s WHERE bucket < 5000),
            te AS (SELECT DISTINCT gram
                   FROM (SELECT unnest(sh) AS gram
                         FROM s WHERE bucket >= 5000)),
            bad AS (
              SELECT DISTINCT doc_id
              FROM (SELECT doc_id, unnest(sh) AS gram FROM tr) ex
              JOIN te USING (gram))
            SELECT doc_id, lang, source, n_chars
            FROM tr WHERE doc_id NOT IN (SELECT doc_id FROM bad)
        """,
        # bloom_bits: replays the filter CONSTRUCTION bit for bit — one
        # md5 per gram, hex halves as 32-bit ints, odd-forced h2 stride
        # (Kirsch–Mitzenmacher), 62-bit words, bit_or fold. Same byte
        # layout as the hash_bucket oracles ('seed' || chr(31) || value).
        "bloom_bits": f"""
            WITH s AS (
              SELECT {_d_shingles_n(5)} AS sh,
                     {_d_hash_bucket('doc_id', 42)} AS bucket
              FROM documents),
            g AS (SELECT DISTINCT gram
                  FROM (SELECT unnest(sh) AS gram
                        FROM s WHERE bucket >= 5000)),
            h AS (SELECT
                    ('0x' || substr(md5('42' || chr(31) || gram), 1, 8))::BIGINT
                      AS h1,
                    ('0x' || substr(md5('42' || chr(31) || gram), 9, 8))::BIGINT
                      AS h2r
                  FROM g),
            p AS (SELECT (h1 + i * (h2r + 1 - h2r % 2)) % {62 * 64} AS pos
                  FROM h, range(0, 5) t(i))
            SELECT pos // 62 AS word_idx,
                   bit_or(CAST(pow(2, pos % 62) AS BIGINT)) AS word
            FROM p GROUP BY word_idx
        """,
        # Transitive closure via recursive CTE — O(V·E), fine at oracle
        # scale; the engine runs iterative min-label propagation instead.
        "near_dup_groups": f"""
            WITH RECURSIVE
            s AS (
              SELECT doc_id, sh, len(sh) AS sz
              FROM (SELECT doc_id, {_D_SHINGLES} AS sh FROM documents)
              WHERE len(sh) > 0),
            base AS (
              SELECT id_a, id_b
              FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                           round(len(list_intersect(a.sh, b.sh))
                                 / (a.sz + b.sz - len(list_intersect(a.sh, b.sh)))::DOUBLE,
                                 4) AS jaccard
                    FROM s a JOIN s b ON a.doc_id < b.doc_id)
              WHERE jaccard >= 0.5),
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM base
              UNION
              SELECT id_b, id_a FROM base),
            reach(src, dst) AS (
              SELECT src, dst FROM edges
              UNION
              SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
            comp AS (
              SELECT src AS doc_id, least(src, min(dst)) AS component
              FROM reach GROUP BY src)
            SELECT doc_id, component,
                   count(*) OVER (PARTITION BY component) AS group_size
            FROM comp
        """,
        "cosine_topk": f"""
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            d AS (
              SELECT e.vec_id,
                     {_d_dot('e.embedding', 'q.qv')} AS dot,
                     sqrt({_d_dot('e.embedding', 'e.embedding')}) AS na,
                     sqrt({_d_dot('q.qv', 'q.qv')}) AS nb
              FROM embeddings e, q)
            SELECT vec_id, round(dot/(na*nb), 4) AS cosine
            FROM d ORDER BY cosine DESC, vec_id LIMIT 20
        """,
        "cosine_pairs": f"""
            WITH n AS (
              SELECT vec_id, embedding,
                     sqrt({_d_dot('embedding', 'embedding')}) AS nrm
              FROM embeddings)
            SELECT id_a, id_b, cosine
            FROM (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                         round({_d_dot('a.embedding', 'b.embedding')}
                               / (a.nrm * b.nrm), 4) AS cosine
                  FROM n a JOIN n b ON a.vec_id < b.vec_id)
            WHERE cosine >= 0.3
        """,
        "cosine_pairs_lsh": f"""
            WITH tagged AS (
              SELECT vec_id, unnest({_d_lsh_tags()}) AS tag FROM embeddings),
            cand AS (
              SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
              FROM tagged a JOIN tagged b
                ON a.tag = b.tag AND a.vec_id < b.vec_id),
            n AS (
              SELECT vec_id, embedding,
                     sqrt({_d_dot('embedding', 'embedding')}) AS nrm
              FROM embeddings)
            SELECT id_a, id_b, cosine
            FROM (SELECT id_a, id_b,
                         round({_d_dot('a.embedding', 'b.embedding')}
                               / (a.nrm * b.nrm), 4) AS cosine
                  FROM cand
                  JOIN n a ON cand.id_a = a.vec_id
                  JOIN n b ON cand.id_b = b.vec_id)
            WHERE cosine >= 0.3
        """,
        "semantic_cell_pairs": f"""
            WITH assigned AS (
              SELECT vec_id, embedding, {_d_cell_expr()} AS cell,
                     sqrt({_d_dot('embedding', 'embedding')}) AS nrm
              FROM embeddings)
            SELECT id_a, id_b, cell, cosine
            FROM (SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cell AS cell,
                         round({_d_dot('a.embedding', 'b.embedding')}
                               / (a.nrm * b.nrm), 4) AS cosine
                  FROM assigned a
                  JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id)
            WHERE cosine >= 0.3
        """,
        "duplicate_spans": f"""
            WITH toks AS (SELECT doc_id, {_D_TOKENS} AS t FROM documents),
            spans AS (
              SELECT doc_id, i AS pos,
                     md5(array_to_string(t[i:i+4], ' ')) AS h
              FROM (SELECT doc_id, t, unnest(range(1, len(t)-5+2)) AS i
                    FROM toks WHERE len(t) >= 5)),
            s1 AS (SELECT doc_id, h, min(pos) AS pos
                   FROM spans GROUP BY doc_id, h),
            cand AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     a.pos AS pa, b.pos AS pb
              FROM s1 a JOIN s1 b
                ON a.h = b.h AND a.doc_id < b.doc_id),
            runs AS (
              SELECT id_a, id_b, pa - pb AS diag,
                     pa - row_number() OVER (
                       PARTITION BY id_a, id_b, pa - pb
                       ORDER BY pa) AS island
              FROM cand),
            islands AS (
              SELECT id_a, id_b, count(*) AS sz
              FROM runs GROUP BY id_a, id_b, diag, island)
            SELECT id_a, id_b, CAST(sum(sz) AS BIGINT) AS n_spans,
                   CAST(max(sz) + 4 AS BIGINT) AS longest_run
            FROM islands GROUP BY id_a, id_b
        """,
        "resample": """
            WITH agged AS (
              SELECT event_type,
                     CAST(to_timestamp(CAST(floor(epoch(ts)/3600) AS BIGINT)
                                       * 3600) AS TIMESTAMP) AS b,
                     max(value) AS val, count(*) AS n_events
              FROM events GROUP BY 1, 2),
            grid AS (
              SELECT event_type,
                     unnest(generate_series(lo, hi, INTERVAL 3600 SECOND))
                       AS b
              FROM (SELECT event_type, min(b) AS lo, max(b) AS hi
                    FROM agged GROUP BY 1)),
            dense AS (
              SELECT g.event_type, g.b, a.val,
                     coalesce(a.n_events, 0) AS n_events
              FROM grid g LEFT JOIN agged a
                ON g.event_type = a.event_type AND g.b = a.b),
            f AS (
              SELECT event_type, b, val, n_events,
                     last_value(CASE WHEN val IS NOT NULL
                                     THEN {'t': epoch(b), 'v': val} END
                                IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY b
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS prev,
                     first_value(CASE WHEN val IS NOT NULL
                                      THEN {'t': epoch(b), 'v': val} END
                                 IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY b
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                       AS nxt
              FROM dense)
            SELECT event_type, b AS bucket_ts,
                   round(CASE WHEN val IS NOT NULL THEN val
                              WHEN prev IS NOT NULL AND nxt IS NOT NULL
                              THEN prev.v + (nxt.v - prev.v)
                                   * (epoch(b) - prev.t) / (nxt.t - prev.t)
                              ELSE coalesce(prev.v, nxt.v) END, 4) AS value,
                   n_events
            FROM f
        """,
        "snapshot_diff": """
            WITH newsnap AS (
              SELECT c_custkey, c_name, c_nationkey,
                     CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100
                          ELSE c_acctbal END AS c_acctbal,
                     c_mktsegment
              FROM customer WHERE c_custkey % 10 != 0
              UNION ALL
              SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal,
                     c_mktsegment
              FROM customer WHERE c_custkey % 13 = 0
            )
            SELECT 'insert' AS change_type, n.*
            FROM newsnap n
            WHERE NOT EXISTS (SELECT 1 FROM customer o
                              WHERE o.c_custkey = n.c_custkey)
            UNION ALL
            SELECT 'delete' AS change_type, o.*
            FROM customer o
            WHERE NOT EXISTS (SELECT 1 FROM newsnap n
                              WHERE n.c_custkey = o.c_custkey)
            UNION ALL
            SELECT 'update' AS change_type, n.*
            FROM newsnap n JOIN customer o USING (c_custkey)
            WHERE NOT (n.c_name IS NOT DISTINCT FROM o.c_name
                       AND n.c_nationkey IS NOT DISTINCT FROM o.c_nationkey
                       AND n.c_acctbal IS NOT DISTINCT FROM o.c_acctbal
                       AND n.c_mktsegment IS NOT DISTINCT FROM o.c_mktsegment)
        """,
        "span_removal": f"""
            WITH toks AS (SELECT doc_id, {_D_TOKENS} AS t FROM documents),
            spans AS (
              SELECT doc_id, i AS pos,
                     md5(array_to_string(t[i:i+4], ' ')) AS h
              FROM (SELECT doc_id, t, unnest(range(1, len(t)-5+2)) AS i
                    FROM toks WHERE len(t) >= 5)),
            s1 AS (SELECT doc_id, h, min(pos) AS pos
                   FROM spans GROUP BY doc_id, h),
            cand AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     a.pos AS pa, b.pos AS pb
              FROM s1 a JOIN s1 b
                ON a.h = b.h AND a.doc_id < b.doc_id),
            runs AS (
              SELECT id_a, id_b, pa - pb AS diag, pb,
                     pb - row_number() OVER (
                       PARTITION BY id_a, id_b, pa - pb
                       ORDER BY pb) AS island
              FROM cand),
            rngs AS (
              SELECT DISTINCT id_b, s, e
              FROM (SELECT id_a, id_b, min(pb) AS s, max(pb) + 4 AS e
                    FROM runs GROUP BY id_a, id_b, diag, island)
              WHERE e - s + 1 >= 5),
            byd AS (SELECT id_b, list({{'s': s, 'e': e}}) AS ranges
                    FROM rngs GROUP BY id_b),
            rebuilt AS (
              SELECT tk.doc_id, tk.t,
                     list_filter(tk.t, (x, i) -> len(list_filter(
                       coalesce(byd.ranges,
                                CAST([] AS STRUCT(s BIGINT, e BIGINT)[])),
                       r -> i >= r.s AND i <= r.e)) = 0) AS kept
              FROM toks tk LEFT JOIN byd ON tk.doc_id = byd.id_b)
            SELECT doc_id,
                   coalesce(array_to_string(kept, ' '), '') AS clean_text,
                   len(t) - len(kept) AS n_removed_tokens
            FROM rebuilt
        """,
        # set_jaccard: capless twin — the Spark side's default budget cap
        # ("auto:10000000") binds nothing at the oracle SF (Σdf² ≈ 7e5,
        # quantile cap ≈ 692 > max df 173; measured), same adjudication
        # as the jaccard_pairs_budget oracle. The budget-fit MATH has its
        # own binding oracle (budget_cap_fit); scale behavior is the 20×
        # sweep's job.
        "set_jaccard": """
            WITH s AS (
              SELECT doc_id,
                     unnest(list_distinct(list_filter(string_split(
                       regexp_replace(lower(substr(text, 1, 60)),
                                      '[^a-z0-9]+', ' ', 'g'), ' '),
                       t -> t != ''))) AS e
              FROM documents),
            siz AS (SELECT doc_id, count(*) AS sz FROM s GROUP BY doc_id),
            sh AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
              FROM s a JOIN s b ON a.e = b.e AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_a, id_b,
                   round(shared / CAST(sa.sz + sb.sz - shared AS DOUBLE), 4)
                     AS jaccard
            FROM sh
            JOIN siz sa ON sa.doc_id = id_a
            JOIN siz sb ON sb.doc_id = id_b
            WHERE round(shared / CAST(sa.sz + sb.sz - shared AS DOUBLE), 4)
                  >= 0.5
        """,
        "chat_json_roundtrip": """
            SELECT doc_id AS conv_id, CAST(t.turn_idx AS BIGINT) AS turn_idx,
                   CASE WHEN t.turn_idx = 0 THEN 'user'
                        ELSE 'assistant' END AS role,
                   CASE WHEN t.turn_idx = 0
                        THEN 'ask "about" \\ ' || substr(text, 1, 30)
                        ELSE 'reply re ' || substr(text, 11, 30)
                   END AS content
            FROM documents, (SELECT unnest([0, 1]) AS turn_idx) t
        """,
        "token_shards": f"""
            WITH t AS (
              SELECT doc_id,
                     coalesce(CAST(len({_D_TOKENS}) AS BIGINT), 0) AS n_tokens,
                     md5('5' || chr(31) || CAST(doc_id AS VARCHAR)) AS okey
              FROM documents),
            c AS (
              SELECT doc_id, n_tokens,
                     sum(n_tokens) OVER (ORDER BY okey, doc_id
                                         ROWS UNBOUNDED PRECEDING) AS cum
              FROM t),
            tot AS (
              SELECT CASE WHEN coalesce(sum(n_tokens), 0) > 0
                          THEN (sum(n_tokens) - 1) // 2000
                          ELSE 0 END AS max_shard
              FROM t)
            SELECT doc_id, n_tokens,
                   LEAST(CAST(floor((cum - n_tokens) / 2000) AS BIGINT),
                         CAST(max_shard AS BIGINT)) AS shard
            FROM c, tot
        """,
        "semantic_decontaminated": f"""
            WITH corp AS (
              SELECT vec_id, embedding, {_d_cell_expr()} AS cell,
                     sqrt({_d_dot('embedding', 'embedding')}) AS nrm
              FROM embeddings WHERE vec_id % 25 = 0),
            qry AS (
              SELECT vec_id, embedding,
                     unnest({_d_probe_cells(2)}) AS cell,
                     sqrt({_d_dot('embedding', 'embedding')}) AS nrm
              FROM embeddings WHERE vec_id % 25 <> 0),
            scored AS (
              SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS corpus_id,
                     round({_d_dot('q.embedding', 'c.embedding')}
                           / (q.nrm * c.nrm), 4) AS cosine
              FROM qry q JOIN corp c ON q.cell = c.cell),
            top1 AS (
              SELECT query_id, cosine
              FROM (SELECT query_id, cosine,
                           row_number() OVER (
                             PARTITION BY query_id
                             ORDER BY cosine DESC, corpus_id) AS rn
                    FROM scored)
              WHERE rn = 1),
            bad AS (SELECT query_id FROM top1 WHERE cosine >= 0.42)
            SELECT vec_id, label FROM embeddings
            WHERE vec_id % 25 <> 0
              AND vec_id NOT IN (SELECT query_id FROM bad)
        """,
        "knn_join": f"""
            WITH corp AS (
              SELECT vec_id, embedding, {_d_cell_expr()} AS cell,
                     sqrt({_d_dot('embedding', 'embedding')}) AS nrm
              FROM embeddings),
            qry AS (
              SELECT vec_id, embedding,
                     unnest({_d_probe_cells(2)}) AS cell,
                     sqrt({_d_dot('embedding', 'embedding')}) AS nrm
              FROM embeddings WHERE vec_id % 25 = 0),
            scored AS (
              SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS corpus_id,
                     round({_d_dot('q.embedding', 'c.embedding')}
                           / (q.nrm * c.nrm), 4) AS cosine
              FROM qry q JOIN corp c
                ON q.cell = c.cell AND q.vec_id <> c.vec_id)
            SELECT query_id, corpus_id, rank, cosine
            FROM (SELECT query_id, corpus_id, cosine,
                         row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY cosine DESC, corpus_id) AS rank
                  FROM scored)
            WHERE rank <= 5
        """,
        "upsert": """
            WITH delta AS (
                SELECT c.c_custkey, c.c_name, c.c_nationkey,
                       round(sum(o.o_totalprice), 2) AS c_acctbal,
                       'UPDATED' AS c_mktsegment
                FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                WHERE o.o_orderdate >= TIMESTAMP '1998-06-01 00:00:00'
                GROUP BY c.c_custkey, c.c_name, c.c_nationkey
            )
            SELECT t.* FROM customer t
            WHERE NOT EXISTS (SELECT 1 FROM delta d
                              WHERE d.c_custkey = t.c_custkey)
            UNION ALL
            SELECT * FROM delta d
            WHERE NOT (c_acctbal > 400000
                       AND EXISTS (SELECT 1 FROM customer t
                                   WHERE t.c_custkey = d.c_custkey))
        """,
        "scd2": """
            WITH target AS (
                SELECT c.*, TIMESTAMP '1995-01-01 00:00:00' AS valid_from,
                       CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
                FROM customer c
            ),
            delta AS (
                SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal,
                       'BIG98' AS c_mktsegment,
                       TIMESTAMP '1998-06-01 00:00:00' AS eff
                FROM customer c
                JOIN (SELECT o_custkey
                      FROM orders
                      WHERE o_orderdate >= TIMESTAMP '1998-06-01 00:00:00'
                      GROUP BY o_custkey
                      HAVING sum(o_totalprice) > 300000) b
                  ON b.o_custkey = c.c_custkey
            ),
            changed AS (
                SELECT d.* FROM delta d
                LEFT JOIN target t
                  ON d.c_custkey = t.c_custkey AND t.is_current
                WHERE t.c_custkey IS NULL
                   OR NOT (d.c_mktsegment IS NOT DISTINCT FROM t.c_mktsegment)
            )
            SELECT t.c_custkey, t.c_name, t.c_nationkey, t.c_acctbal,
                   t.c_mktsegment, t.valid_from, t.valid_to, t.is_current
            FROM target t
            WHERE t.is_current
              AND NOT EXISTS (SELECT 1 FROM changed c
                              WHERE c.c_custkey = t.c_custkey)
            UNION ALL
            SELECT t.c_custkey, t.c_name, t.c_nationkey, t.c_acctbal,
                   t.c_mktsegment, t.valid_from, c.eff AS valid_to,
                   FALSE AS is_current
            FROM target t JOIN changed c ON c.c_custkey = t.c_custkey
            WHERE t.is_current
            UNION ALL
            SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal,
                   c.c_mktsegment, c.eff AS valid_from,
                   CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
            FROM changed c
        """,
        # scd2_snapshot: the scd2 dimension filtered to the one version per
        # key covering the as-of instant (valid_from inclusive, valid_to
        # exclusive) — the boundary case, since the snapshot sits exactly
        # at the delta's effective timestamp.
        "scd2_snapshot": """
            WITH target AS (
                SELECT c.*, TIMESTAMP '1995-01-01 00:00:00' AS valid_from,
                       CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
                FROM customer c
            ),
            delta AS (
                SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal,
                       'BIG98' AS c_mktsegment,
                       TIMESTAMP '1998-06-01 00:00:00' AS eff
                FROM customer c
                JOIN (SELECT o_custkey
                      FROM orders
                      WHERE o_orderdate >= TIMESTAMP '1998-06-01 00:00:00'
                      GROUP BY o_custkey
                      HAVING sum(o_totalprice) > 300000) b
                  ON b.o_custkey = c.c_custkey
            ),
            changed AS (
                SELECT d.* FROM delta d
                LEFT JOIN target t
                  ON d.c_custkey = t.c_custkey AND t.is_current
                WHERE t.c_custkey IS NULL
                   OR NOT (d.c_mktsegment IS NOT DISTINCT FROM t.c_mktsegment)
            ),
            dim AS (
                SELECT t.c_custkey, t.c_name, t.c_nationkey, t.c_acctbal,
                       t.c_mktsegment, t.valid_from, t.valid_to, t.is_current
                FROM target t
                WHERE t.is_current
                  AND NOT EXISTS (SELECT 1 FROM changed c
                                  WHERE c.c_custkey = t.c_custkey)
                UNION ALL
                SELECT t.c_custkey, t.c_name, t.c_nationkey, t.c_acctbal,
                       t.c_mktsegment, t.valid_from, c.eff AS valid_to,
                       FALSE AS is_current
                FROM target t JOIN changed c ON c.c_custkey = t.c_custkey
                WHERE t.is_current
                UNION ALL
                SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal,
                       c.c_mktsegment, c.eff AS valid_from,
                       CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
                FROM changed c
            )
            SELECT * FROM dim
            WHERE valid_from <= TIMESTAMP '1998-06-01 00:00:00'
              AND (valid_to IS NULL
                   OR valid_to > TIMESTAMP '1998-06-01 00:00:00')
        """,
        # validated: per-row rule evaluation with NULL-as-violation
        # semantics; the label is the comma-joined list of failed rules in
        # declaration order.
        "validated": """
            SELECT l_orderkey, l_linenumber,
                   array_to_string(list_filter([
                       CASE WHEN NOT coalesce(l_discount <= 0.05, FALSE)
                            THEN 'discount_low' END,
                       CASE WHEN NOT coalesce(l_quantity <= 30, FALSE)
                            THEN 'qty_small' END,
                       CASE WHEN NOT coalesce(l_tax <= 0.06, FALSE)
                            THEN 'tax_bounded' END
                   ], x -> x IS NOT NULL), ',') AS violated
            FROM lineitem
            WHERE NOT coalesce(l_discount <= 0.05, FALSE)
               OR NOT coalesce(l_quantity <= 30, FALSE)
               OR NOT coalesce(l_tax <= 0.06, FALSE)
        """,
        "incremental_dedup": _d_minhash_incremental_sql(),
        "zorder_key": _d_zorder_sql(),
        "script_id": _d_script_sql(),
        "pagerank": _d_pagerank_sql(),
        "pagerank_redistribute": _d_pagerank_redistribute_sql(),
        "pagerank_personalized": _d_pagerank_personalized_sql(),
        "profile": _d_profile_sql(),
        # top_values: melt → count → deterministic k-bounded window (ties
        # break on the value string in both engines)
        "top_values": """
            WITH m AS (
                SELECT 'o_orderstatus' AS "column",
                       coalesce(CAST(o_orderstatus AS VARCHAR), 'NULL') AS value
                FROM orders
                UNION ALL
                SELECT 'o_orderpriority',
                       coalesce(CAST(o_orderpriority AS VARCHAR), 'NULL')
                FROM orders
                UNION ALL
                SELECT 'o_custkey',
                       coalesce(CAST(o_custkey AS VARCHAR), 'NULL')
                FROM orders
            ),
            c AS (SELECT "column", value, count(*) AS value_count
                  FROM m GROUP BY "column", value)
            SELECT "column", value, value_count,
                   CAST(row_number() OVER (
                       PARTITION BY "column"
                       ORDER BY value_count DESC, value ASC) AS INTEGER) AS rank
            FROM c QUALIFY rank <= 5
        """,
        # histogram: same width_bucket float chain as zorder_key; bin
        # edges recomputed with the identical (mx-mn)/20 width expression
        "histogram": """
            WITH s AS (SELECT min(CAST(l_extendedprice AS DOUBLE)) AS mn,
                              max(CAST(l_extendedprice AS DOUBLE)) AS mx
                       FROM lineitem),
            b AS (SELECT GREATEST(0, LEAST(19,
                     CAST(floor((CAST(l_extendedprice AS DOUBLE) - mn)
                                / ((mx - mn) / 20)) AS BIGINT))) AS bin
                  FROM lineitem, s
                  WHERE l_extendedprice IS NOT NULL)
            SELECT bin, mn + bin * ((mx - mn) / 20) AS lo,
                   mn + (bin + 1) * ((mx - mn) / 20) AS hi,
                   count(*) AS bin_count
            FROM b, s GROUP BY bin, mn, mx
        """,
        # triangles: ordered two-path closure over the canonicalized
        # supplier co-occurrence edge set — one count, exact integer.
        "triangles": """
            WITH und AS (
                SELECT DISTINCT a.l_suppkey AS a, b.l_suppkey AS b
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
            )
            SELECT count(*) AS triangles
            FROM und ab
            JOIN und bc ON bc.a = ab.b
            JOIN und ac ON ac.a = ab.a AND ac.b = bc.b
        """,
        # k_anonymized: suppress rows whose QI combination has < k members
        "k_anonymized": """
            SELECT c_custkey, c_nationkey, c_mktsegment
            FROM customer
            QUALIFY count(*) OVER (PARTITION BY c_nationkey, c_mktsegment) >= 8
        """,
        # fuzzy_match: blocked levenshtein join — normalization, suffix
        # block, length band, and the edit-distance verify all replayed.
        "fuzzy_match": r"""
            WITH s AS (
                SELECT s_suppkey, s_name,
                       regexp_replace(lower(trim(s_name)), '\s+', ' ', 'g') AS n
                FROM supplier),
            t AS (
                SELECT s_suppkey + 100000 AS t_id,
                       concat(substr(s_name, 1, 4), 'x', substr(s_name, 6))
                           AS t_name
                FROM supplier),
            tn AS (
                SELECT t_id, t_name,
                       regexp_replace(lower(trim(t_name)), '\s+', ' ', 'g') AS n
                FROM t)
            SELECT s.s_suppkey, s.s_name, tn.t_id, tn.t_name,
                   levenshtein(s.n, tn.n) AS distance
            FROM s JOIN tn ON right(s.n, 3) = right(tn.n, 3)
            WHERE abs(length(s.n) - length(tn.n)) <= 2
              AND levenshtein(s.n, tn.n) <= 2
        """,
        # minhash_lsh_pairs: the driver query runs in exact-verify mode
        # (candidates re-scored with true Jaccard), and the pytest recall
        # gate (LSH(verify) == exact) holds on this corpus — so the exact
        # inverted-index Jaccard join IS the oracle, identical to
        # jaccard_pairs' SQL twin.
        "minhash_lsh_pairs": f"""
            WITH s AS (
              SELECT doc_id, sh, len(sh) AS sz
              FROM (SELECT doc_id, {_D_SHINGLES} AS sh FROM documents)
              WHERE len(sh) > 0)
            SELECT id_a, id_b, jaccard
            FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         round(len(list_intersect(a.sh, b.sh))
                               / (a.sz + b.sz - len(list_intersect(a.sh, b.sh)))::DOUBLE,
                               4) AS jaccard
                  FROM s a JOIN s b ON a.doc_id < b.doc_id)
            WHERE jaccard >= 0.5
        """,
        # simhash (md5 signature mode): DuckDB recomputes every signature
        # from scratch — the full vote/pack machinery is differentially
        # checked, not just the grouping.
        "simhash_dedup": f"""
            WITH {_d_simhash_ctes()}
            SELECT simhash, min(doc_id) AS doc_id, count(*) AS dup_count
            FROM sh_p GROUP BY simhash
        """,
        # Pigeonhole banding has recall 1.0 by construction, so brute-force
        # all-pairs popcount is an exact oracle (viable only at oracle SF;
        # the engine never materializes the pair space).
        "simhash_pairs": f"""
            WITH {_d_simhash_ctes()}
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
            FROM sh_p a JOIN sh_p b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        # Scalar quantization: per-dim min/max recomputed in SQL; the
        # subtraction producing the range runs in DOUBLE on both sides
        # (Spark collects float32-exact values and subtracts in Python
        # doubles), so codes replay bit-for-bit.
        "embedding_quantize": """
            WITH pos AS (
              SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
                     unnest(embedding) AS x
              FROM embeddings),
            stats AS (
              SELECT pos, min(x)::DOUBLE AS mn,
                     max(x)::DOUBLE - min(x)::DOUBLE AS rng
              FROM pos GROUP BY pos)
            SELECT p.vec_id, p.pos,
                   CASE WHEN s.rng = 0 THEN 0
                        ELSE CAST(floor((p.x::DOUBLE - s.mn) / s.rng * 255.0 + 0.5)
                                  AS INTEGER) END AS code
            FROM pos p JOIN stats s USING (pos)
        """,
        # PQ/ADC: seeded codebooks + identical left-assoc float chains
        # make the entire compress-and-rank path SQL-replayable.
        "pq_topk": _d_pq_sql(),
        # Paragraph dedup: global winner per paragraph = row_number 1 over
        # (doc_id, pos) — identical keep-set to the engine's min(struct)
        # aggregate; positions are 1-based here vs 0-based in Spark, which
        # only matters within each engine's own winner identity.
        "paragraph_dedup": """
            WITH synth AS (
              SELECT doc_id,
                     concat_ws(chr(10)||chr(10),
                               'shared introduction paragraph for every page',
                               substr(text, 1, 60),
                               'group paragraph ' || CAST(doc_id % 25 AS VARCHAR)
                     ) AS text
              FROM documents),
            p0 AS (SELECT doc_id, string_split(text, chr(10)||chr(10)) AS ps
                   FROM synth),
            pi AS (SELECT doc_id, ps, unnest(range(1, len(ps)+1)) AS pos
                   FROM p0),
            paras AS (SELECT doc_id, pos, ps[pos] AS para FROM pi),
            winners AS (
              SELECT para, doc_id AS wd, pos AS wp
              FROM (SELECT para, doc_id, pos,
                           row_number() OVER (PARTITION BY para
                                              ORDER BY doc_id, pos) AS rn
                    FROM paras WHERE len(trim(para)) >= 5)
              WHERE rn = 1),
            kept AS (
              SELECT p.doc_id, p.pos, p.para
              FROM paras p LEFT JOIN winners w ON p.para = w.para
              WHERE len(trim(p.para)) < 5
                 OR (p.doc_id = w.wd AND p.pos = w.wp)),
            rebuilt AS (SELECT doc_id,
                               string_agg(para, chr(10)||chr(10)
                                          ORDER BY pos) AS text
                        FROM kept GROUP BY doc_id)
            SELECT s.doc_id, coalesce(r.text, '') AS text,
                   len(string_split(coalesce(r.text, ''),
                                    chr(10)||chr(10))) AS n_paras
            FROM synth s LEFT JOIN rebuilt r USING (doc_id)
        """,
        # Exponential-race weighted sample: md5 uniform → ln(u)/w race key,
        # top-500. Adjacent race keys differ by ≥1e-4 relative at corpus
        # size vs ≤1-ulp ln() drift between engines, so the cutoff rank is
        # stable and the selected SET matches exactly.
        "weighted_sample": f"""
            SELECT doc_id, source, n_chars
            FROM (
              SELECT doc_id, source, n_chars,
                     ln(({_d_hash_bucket('doc_id', 13, 1 << 32)} + 0.5)
                        / 4294967296.0) / CAST(n_chars AS DOUBLE) AS race
              FROM documents WHERE n_chars > 0
              ORDER BY race DESC, doc_id LIMIT 500)
        """,
        "rolling_hour": """
            SELECT event_id, user_id,
                   max(value) OVER w AS value_rolling_max,
                   CAST(count(value) OVER w AS BIGINT) AS value_rolling_count
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                         RANGE BETWEEN 3600000000 PRECEDING AND 0 FOLLOWING)
        """,
        "key_skew": """
            SELECT l_suppkey, key_count,
                   round(key_count / (SELECT count(*) FROM lineitem), 6)
                       AS key_share
            FROM (SELECT l_suppkey, count(*) AS key_count
                  FROM lineitem GROUP BY l_suppkey)
            ORDER BY key_count DESC, l_suppkey LIMIT 25
        """,
        # lsh_topk: the SAME seeded hyperplanes as full-precision SQL
        # literals — bucket assignment, the multiprobe set (query bucket
        # plus all hamming-1 neighbors), and exact cosine ranking of the
        # scanned rows all replay in DuckDB. Probing is set-membership,
        # so probe-list order (irrelevant on both sides) can't diverge.
        "lsh_topk": f"""
            WITH q AS (SELECT embedding AS qv FROM embeddings
                       WHERE vec_id = 0),
            qb AS (SELECT {_d_lsh_bucket(col='qv')} AS qbucket FROM q),
            probe AS (
              SELECT qbucket AS pb FROM qb
              UNION ALL
              SELECT xor(qbucket, p) FROM qb,
                     (SELECT unnest([{', '.join(str(1 << j) for j in range(8))}]) AS p)),
            b AS (SELECT vec_id, embedding,
                         {_d_lsh_bucket()} AS bucket FROM embeddings),
            d AS (
              SELECT b.vec_id,
                     {_d_dot('b.embedding', 'q.qv')} AS dot,
                     sqrt({_d_dot('b.embedding', 'b.embedding')}) AS na,
                     sqrt({_d_dot('q.qv', 'q.qv')}) AS nb
              FROM b, q
              WHERE b.bucket IN (SELECT pb FROM probe))
            SELECT vec_id, round(dot/(na*nb), 4) AS cosine
            FROM d ORDER BY cosine DESC, vec_id LIMIT 10
        """,
        # ivf_topk: seeded random-unit codebook (k=8) — cell assignment,
        # the query's 3 probe cells (stable (−dot, index) order on BOTH
        # sides), and exact cosine ranking replay in DuckDB.
        "ivf_topk": f"""
            WITH q AS (SELECT embedding AS qv FROM embeddings
                       WHERE vec_id = 0),
            probe AS (
              SELECT unnest({_d_probe_cells(3, k=8, col='qv')}) AS cell
              FROM q),
            assigned AS (
              SELECT vec_id, embedding, {_d_cell_expr(k=8)} AS cell
              FROM embeddings),
            d AS (
              SELECT a.vec_id,
                     {_d_dot('a.embedding', 'q.qv')} AS dot,
                     sqrt({_d_dot('a.embedding', 'a.embedding')}) AS na,
                     sqrt({_d_dot('q.qv', 'q.qv')}) AS nb
              FROM assigned a, q
              WHERE a.cell IN (SELECT cell FROM probe))
            SELECT vec_id, round(dot/(na*nb), 4) AS cosine
            FROM d ORDER BY cosine DESC, vec_id LIMIT 10
        """,
        # diverse_sample: seeded cell assignment + md5-window cap — the
        # per-semantic-mode frequency cap replayed exactly.
        "diverse_sample": f"""
            SELECT vec_id, cell AS ivf_cell
            FROM (SELECT vec_id, cell,
                         row_number() OVER (
                           PARTITION BY cell
                           ORDER BY md5('11' || chr(31)
                                        || CAST(vec_id AS VARCHAR)),
                                    vec_id) AS rn
                  FROM (SELECT vec_id, {_d_cell_expr()} AS cell
                        FROM embeddings))
            WHERE rn <= 25
        """,
        # domain_score: the ENTIRE NB train+score pipeline — exact counts,
        # add-one smoothing, ln() chains, per-doc grid, argmax — as one
        # DuckDB statement. Rounding to 6 absorbs libm-vs-JVM ln() ulps
        # (same contract as pagerank).
        "domain_score": f"""
            WITH tok AS (
              SELECT doc_id, unnest({_D_TOKENS}) AS token FROM documents),
            ltok AS (
              SELECT t.doc_id, d.source AS label, t.token
              FROM tok t JOIN documents d USING (doc_id)),
            counts AS (
              SELECT label, token, count(*) AS c FROM ltok GROUP BY 1, 2),
            class_tok AS (
              SELECT label, count(*) AS ct FROM ltok GROUP BY 1),
            vocab AS (SELECT count(DISTINCT token) AS v FROM tok),
            classes AS (
              SELECT source AS label, count(*) AS n FROM documents GROUP BY 1),
            cstats AS (
              SELECT c.label,
                     ln(CAST(c.n AS DOUBLE)
                        / (SELECT count(*) FROM documents)) AS log_prior,
                     ln(1.0 / (ct.ct + (SELECT v FROM vocab))) AS unseen_lp,
                     ct.ct
              FROM classes c JOIN class_tok ct USING (label)),
            model AS (
              SELECT co.token, co.label,
                     ln((co.c + 1.0)
                        / (cs.ct + (SELECT v FROM vocab))) AS lp
              FROM counts co JOIN cstats cs USING (label)),
            tokc AS (
              SELECT doc_id, token, count(*) AS cnt FROM tok GROUP BY 1, 2),
            contrib AS (
              SELECT t.doc_id, cs.label,
                     sum(m.lp * t.cnt) AS known,
                     sum(t.cnt) AS n_tok,
                     coalesce(sum(CASE WHEN m.lp IS NOT NULL THEN t.cnt END),
                              0) AS n_known
              FROM tokc t CROSS JOIN cstats cs
              LEFT JOIN model m ON m.token = t.token AND m.label = cs.label
              GROUP BY 1, 2),
            scored AS (
              SELECT g.doc_id, g.label,
                     round(g.log_prior + coalesce(c.known, 0.0)
                           + coalesce((c.n_tok - c.n_known) * g.unseen_lp,
                                      0.0), 6) AS score
              FROM (SELECT d.doc_id, cs.label, cs.log_prior, cs.unseen_lp
                    FROM (SELECT DISTINCT doc_id FROM documents) d
                    CROSS JOIN cstats cs) g
              LEFT JOIN contrib c
                ON c.doc_id = g.doc_id AND c.label = g.label)
            SELECT doc_id, label, score
            FROM (SELECT doc_id, label, score,
                         row_number() OVER (PARTITION BY doc_id
                                            ORDER BY score DESC, label) AS rk
                  FROM scored)
            WHERE rk = 1
        """,
        # approx_sketches: genuinely approximate (HLL sketch internals) —
        # rows-only driver check; bounds are pytest-gated.
        # bpe_vocab: iterative algorithm (driver merge loop over the
        # distributed histogram) — rows-only here; the cross-engine
        # differential (DuckDB histogram → identical loop) is
        # tests/test_bpe.py.
    }
    # star-mode connected components produce IDENTICAL output to label
    # propagation — the same recursive-closure oracle hash-checks both
    # algorithms independently.
    sqls["near_dup_groups_star"] = sqls["near_dup_groups"]
    # the persisted-index IVF serve path returns exactly the in-memory
    # ivf_topk result (same seeded codebook) — one oracle checks both
    # the search semantics and the index lifecycle.
    sqls["ivf_topk_indexed"] = sqls["ivf_topk"]
    # the prefix-filtered exact joins compute the SAME uncapped truth
    # their capped twins' oracles state — there the match is an
    # oracle-SF adjudication (nothing binds), here it is the algorithm's
    # contract (exact at any scale).
    sqls["set_jaccard_exact"] = sqls["set_jaccard"]
    sqls["jaccard_pairs_exact"] = sqls["jaccard_pairs"]
    return sqls
