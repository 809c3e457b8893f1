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

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mini_etl_spark import operators as ops
from mini_etl_spark.sources import read_parquet


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.ts is TIMESTAMP(NANOS) parquet, which Spark's reader rejects;
    # read as int64 nanos and convert (see sources.files.read_parquet).
    ns_cols = ["ts"] if name == "events" else None
    return read_parquet(f"{sf_dir}/{name}.parquet", ns_timestamp_columns=ns_cols)(spark)


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
    df = df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 3)
    return df.select("c_nationkey", "rank", "c_custkey", "c_acctbal")


# ---------------------------------------------------------------------------
# Driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_group_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "group_agg": q_group_agg,
        "filter_expression": q_filter_expression,
        "select_rename_project": q_select_rename_project,
        "cast_lenient": q_cast_lenient,
        "fillna": q_fillna,
        "dedup_first": q_dedup_first,
        "dedup_unique_only": q_dedup_unique_only,
        "sort": q_sort,
        "join_star": q_join_star,
        "join_outer": q_join_outer,
        "union_concat": q_union_concat,
        "expression_derive": q_expression_derive,
        "map_batches": q_map_batches,
        "events_window": q_events_window,
        "topk_per_group": q_topk_per_group,
    }


def oracle_sql() -> dict[str, str]:
    return {
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
    }
