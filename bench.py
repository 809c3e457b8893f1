#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution methodology: each query's full plan is forced with a noop-format
write (computes everything, serializes nothing to the driver), after a JVM
warm-up pass. Wall-clock per query; total is the headline metric.

The set covers the BASELINE.md B1-B5 shapes (scan/filter/project+write,
global group-agg, dedup+sort, multi-source concat+join+write, csv
cast/fillna roundtrip) plus the scale extensions (text features, exact and
approximate dedup, similarity search).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from mini_etl_spark.session import get_spark
    from mini_etl_spark.sources import read_csv, read_parquet
    from mini_etl_spark.sinks import to_csv, to_parquet
    from mini_etl_spark import operators as ops
    from mini_etl_spark.dag import PipelineDAG

    spark = get_spark("bench")
    tmp = tempfile.mkdtemp(prefix="bench_out_")
    queries = entry.queries()

    # JVM/codegen warm-up (not timed)
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    # CSV input for the B5 shape (generated once from parquet, not timed)
    csv_in = os.path.join(tmp, "lineitem_csv")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"
    ).write.mode("overwrite").option("header", True).csv(csv_in)

    def b1_scan_filter_project_write(spark, sf_dir):
        df = read_parquet(f"{sf_dir}/lineitem.parquet")(spark)
        df = ops.filter_rows("l_discount >= 0.05 and l_quantity < 30")(df)
        df = ops.select_columns(["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"])(df)
        to_parquet(os.path.join(tmp, "b1"), mode="overwrite")(df)
        return None

    def b3_dedup_sort(spark, sf_dir):
        df = read_parquet(f"{sf_dir}/orders.parquet")(spark)
        df = ops.deduplicate(["o_custkey"], keep="first", order_by="o_orderkey")(df)
        df = ops.sort_rows(["o_totalprice"], ascending=False)(df)
        return df

    def b4_dag_concat_join_write(spark, sf_dir):
        orders = read_parquet(f"{sf_dir}/orders.parquet")
        customer = read_parquet(f"{sf_dir}/customer.parquet")
        dag = (
            PipelineDAG("bench_dag", spark=spark)
            .add_source("o1", orders)
            .add_source("o2", orders)
            .add_merge("all_orders", "concat")
            .add_transform(
                "per_cust",
                ops.group_agg("o_custkey", {"o_totalprice": "sum", "o_orderkey": "count"}),
            )
            .add_source("cust", customer)
            .add_transform("cust_keyed", lambda df: df.withColumnRenamed("c_custkey", "o_custkey"))
            .add_merge("joined", "join", join_keys=["o_custkey"], join_how="outer")
            .add_sink("out", lambda df: to_parquet(os.path.join(tmp, "b4"), mode="overwrite")(df))
            .add_edge("o1", "all_orders").add_edge("o2", "all_orders")
            .add_edge("all_orders", "per_cust").add_edge("per_cust", "joined")
            .add_edge("cust", "cust_keyed").add_edge("cust_keyed", "joined")
            .add_edge("joined", "out")
        )
        dag.run(spark)
        return None

    def b5_csv_cast_fillna_write(spark, sf_dir):
        df = read_csv(csv_in, infer_schema=False)(spark)
        df = ops.cast_types({"l_quantity": "float", "l_extendedprice": "float", "l_orderkey": "int"})(df)
        df = ops.fill_na(0.0, columns=["l_quantity", "l_extendedprice"])(df)
        to_csv(os.path.join(tmp, "b5"), mode="overwrite")(df)
        return None

    bench_set: dict[str, object] = {
        "b1_scan_filter_write": b1_scan_filter_project_write,
        "b2_group_agg": queries["group_agg"],
        "b3_dedup_sort": b3_dedup_sort,
        "b4_dag_concat_join_write": b4_dag_concat_join_write,
        "b5_csv_cast_fillna_write": b5_csv_cast_fillna_write,
        "q6_filter_expression": queries["filter_expression"],
        "q3_shipping_priority": queries["shipping_priority"],
        "q5_regional_revenue": queries["regional_revenue"],
        "join_star": queries["join_star"],
        "join_outer": queries["join_outer"],
        "expression_derive": queries["expression_derive"],
        "events_window": queries["events_window"],
        "topk_per_group": queries["topk_per_group"],
        "text_features": queries["text_features"],
        "exact_dedup": queries["exact_dedup"],
        "jaccard_pairs": queries["jaccard_pairs"],
        "minhash_lsh_pairs": queries["minhash_lsh_pairs"],
        "cosine_topk": queries["cosine_topk"],
        "lsh_topk": queries["lsh_topk"],
    }

    timings: dict[str, float] = {}
    for name, fn in bench_set.items():
        t0 = time.monotonic()
        result = fn(spark, SF_DIR)
        if result is not None:
            _force(result)
        timings[name] = round(time.monotonic() - t0, 3)

    shutil.rmtree(tmp, ignore_errors=True)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "all"),
            }
        )
    )


if __name__ == "__main__":
    main()
