#!/usr/bin/env python
"""Scale-linearity check: the same queries at sf0.1 and at a REPLICA-scaled
multiple (default 8×, ≈ sf0.8), with join keys remapped per replica so join
fan-out and group-key cardinality scale like real data growth — replicating
rows verbatim would square join output and prove nothing.

For each query: warm wall-clock at both scales and the time ratio vs the
data ratio. A scan/agg/join plan that survives 100× shows time ratio ≲
data ratio here (local[32] has fixed per-job cost, so small queries sit
BELOW the data ratio); anything super-linear is flagged — that's the shape
that dies at 100 TB.

Replica tables go to /tmp (driver testdata stays read-only). Usage:

    SCALE_FACTOR=8 python scripts/scale_check.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REPLICAS = int(os.environ.get("SCALE_FACTOR", "8"))
BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BIG = f"/tmp/scale_check_x{REPLICAS}"

# key columns to offset per replica so relationships stay 1:1/N:1 instead
# of exploding quadratically; non-key ids (nation/region, 25/5 rows) are
# left alone — dimension tables that small stay broadcast at any scale.
KEY_OFFSETS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["region", "nation"]
OFFSET = 100_000_000  # far above any base key

QUERIES = [
    # name — chosen to cover scan+agg, filter, multi-join, window, text,
    # dedup-hash, similarity, and the inverted-index join
    "group_agg",
    "filter_expression",
    "shipping_priority",
    "topk_per_group",
    "running_window",
    "text_features",
    "exact_dedup",
    "hash_split",
    "cosine_topk",
    "minhash_lsh_pairs",
    "fuzzy_match",
    "script_id",
    "pagerank",
    "k_anonymized",
    # round 4: the new default arrow paths, the classifier, star components
    "knn_join",
    "pq_topk",
    "domain_score",
    "near_dup_groups_star",
    # round 4 (late): bigram LM — train + held-out scoring in one plan
    "lm_perplexity",
    # round 4 (cont.): web curation — URL regex chain (narrow projection),
    # broadcast suffix blocklist + count, HTML strip chain
    "url_parse",
    "url_blocklist",
    "html_text",
    # round 5: PSL broadcast suffix join + cap window, sparse bag-of-words
    # inverted-index cosine, integer k-means iterations, CM sketch
    "psl_domain_cap",
    "sparse_cosine_pairs",
    "kmeans_clusters",
    "heavy_hitters",
    # round 5 (cont.): distributed prefix-sum sharding, embedding
    # decontamination, nested-array redaction, median/MAD outliers
    "token_shards",
    "semantic_decontaminated",
    "conversation_redaction",
    "mad_outliers",
    "containment_pairs",
    "set_jaccard",
    "pagerank_personalized",
    "quantile_buckets",
    "group_trend",
]


def build_big(spark) -> None:
    if os.path.exists(os.path.join(BIG, "_OK")):
        return
    shutil.rmtree(BIG, ignore_errors=True)
    os.makedirs(BIG, exist_ok=True)
    from mini_etl_spark.sources import read_parquet

    for t in COPY_ONLY:
        read_parquet(f"{BASE}/{t}.parquet")(spark).write.mode("overwrite").parquet(
            f"{BIG}/{t}.parquet"
        )
    for t, keys in KEY_OFFSETS.items():
        src = f"{BASE}/{t}.parquet"
        if not os.path.exists(src):
            continue
        ns_cols = ["ts"] if t == "events" else None
        df = read_parquet(src, ns_timestamp_columns=ns_cols)(spark)
        # one replica per element of a literal array — the replication is
        # a single explode projection, no driver loop over unions
        rep = df.select(
            F.explode(F.array(*[F.lit(i) for i in range(REPLICAS)])).alias("__r"),
            "*",
        )
        for k in keys:
            rep = rep.withColumn(
                k, (F.col(k) + F.col("__r").cast("long") * OFFSET).cast("long")
            )
        if t == "documents":
            # Salt every token with the replica id (a token-level
            # bijection: "hello" → "hellor3"). WITHIN a replica all
            # similarity structure is preserved exactly (shingle sets map
            # 1:1), but ACROSS replicas shingle overlap is zero — without
            # this, every doc near-duplicates its 7 verbatim copies and
            # the similarity queries' OUTPUT grows ~replicas², flagging
            # the plan superlinear for a fixture artifact (measured 611×
            # pair growth at 8×) rather than anything the engine does.
            # Real corpus growth adds new content, which this models.
            rep = rep.withColumn(
                "text",
                F.regexp_replace(
                    F.col("text"),
                    F.lit(r"(\S+)"),
                    F.concat(F.lit("$1r"), F.col("__r").cast("string")),
                ),
            )
        rep.drop("__r").write.mode("overwrite").parquet(f"{BIG}/{t}.parquet")
    open(os.path.join(BIG, "_OK"), "w").close()


def main() -> None:
    from mini_etl_spark import get_spark

    import __spark_entry__ as entry

    spark = get_spark("scale-check")
    t0 = time.monotonic()
    build_big(spark)
    print(f"# replica build ({REPLICAS}x): {time.monotonic() - t0:.1f}s",
          file=sys.stderr)

    queries = entry.queries()
    results = {}
    for name in QUERIES:
        fn = queries[name]
        times = {}
        for label, sf_dir in (("base", BASE), ("big", BIG)):
            fn(spark, sf_dir).count()  # warm: codegen + shuffle machinery
            spark.catalog.clearCache()
            t = time.monotonic()
            n = fn(spark, sf_dir).count()
            times[label] = time.monotonic() - t
            times[f"{label}_rows"] = n
            spark.catalog.clearCache()
        # a sub-resolution base time (0.0s) can't produce a meaningful
        # ratio — degrade to inf rather than crash on round()/comparison
        ratio = times["big"] / times["base"] if times["base"] > 0 else float("inf")
        if ratio > REPLICAS * 1.25:
            # re-measure before flagging: late in a 19-query session a
            # single timed pass can eat a GC/compile pause an order of
            # magnitude above the plan's real cost (observed: 30.8s for
            # a query that re-times at 3.6s in a clean session). A
            # superlinear PLAN reproduces; a paused pass doesn't.
            for label, sf_dir in (("base", BASE), ("big", BIG)):
                spark.catalog.clearCache()
                t = time.monotonic()
                fn(spark, sf_dir).count()
                times[label] = min(times[label], time.monotonic() - t)
                spark.catalog.clearCache()
            ratio = (
                times["big"] / times["base"] if times["base"] > 0 else float("inf")
            )
        results[name] = {
            "base_s": round(times["base"], 3),
            "big_s": round(times["big"], 3),
            "time_ratio": round(ratio, 2) if ratio != float("inf") else None,
            "data_ratio": REPLICAS,
            "superlinear": bool(ratio > REPLICAS * 1.25),
            "base_rows": times["base_rows"],
            "big_rows": times["big_rows"],
        }
        flag = " **SUPERLINEAR**" if results[name]["superlinear"] else ""
        print(
            f"{name:22s} base {times['base']:6.2f}s  big {times['big']:6.2f}s  "
            f"ratio {ratio:5.2f}x vs data {REPLICAS}x{flag}",
            file=sys.stderr,
        )
    print(json.dumps({"replicas": REPLICAS, "results": results}))


if __name__ == "__main__":
    main()
