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
# v2: replica build salts embeddings too (per-replica dimension rotation)
BIG = f"/tmp/scale_check_x{REPLICAS}v2"

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

# r7: default is the FULL registry (every __spark_entry__ query) — set
# SCALE_QUERIES=a,b,c to restrict, SCALE_SKIP=a,b to exclude. The r6
# 35-query headline list is kept below for documentation/quick runs
# (SCALE_QUERIES=headline).
HEADLINE = [
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


def pick_queries(registry: dict) -> list[str]:
    want = os.environ.get("SCALE_QUERIES", "")
    if want == "headline":
        names = list(HEADLINE)
    elif want:
        names = [q.strip() for q in want.split(",") if q.strip()]
    else:
        names = list(registry)
    skip = {q.strip() for q in os.environ.get("SCALE_SKIP", "").split(",")}
    unknown = [q for q in names if q not in registry]
    if unknown:  # a typo must not abort a multi-hour sweep
        print(f"# ignoring unknown queries: {unknown}", file=sys.stderr)
    return [q for q in names if q in registry and q not in skip]


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
        if t == "embeddings":
            # Same artifact-avoidance move in vector space: a cyclic
            # DIMENSION rotation per replica preserves every
            # within-replica cosine/dot exactly (it's a permutation of
            # coordinates applied uniformly) while decorrelating vectors
            # ACROSS replicas — without it, each vector's 9 verbatim
            # copies are perfect near-duplicates and every pair/cell
            # query's output grows ~replicas² for a fixture reason.
            first = df.select("embedding").first()
            dim = len(first[0]) if first and first[0] is not None else 0
            if dim == 0:
                # a NULL/empty first embedding must fail loudly: with
                # dim=0 the rotation expression evaluates to NULL for
                # EVERY row and the replica build would silently stamp
                # an all-NULL embedding column as _OK
                raise ValueError(
                    "embeddings table's first row has a NULL/empty "
                    "embedding — cannot derive the rotation dimension"
                )
            if dim < REPLICAS:
                # shifts r*step mod dim would collide (step=1, r wraps),
                # leaving verbatim replica pairs — the exact artifact the
                # rotation exists to remove; refuse rather than mislead
                raise ValueError(
                    f"embedding dim {dim} < replicas {REPLICAS}: rotation "
                    "cannot decorrelate that many replicas"
                )
            step = max(1, dim // max(REPLICAS, 2))
            shift = F.pmod(F.col("__r") * F.lit(step), F.lit(dim))
            rep = rep.withColumn(
                "embedding",
                F.when(shift == F.lit(0), F.col("embedding")).otherwise(
                    F.concat(
                        F.slice(F.col("embedding"), shift + 1, F.lit(dim) - shift),
                        F.slice(F.col("embedding"), F.lit(1), shift),
                    )
                ),
            )
        rep.drop("__r").write.mode("overwrite").parquet(f"{BIG}/{t}.parquet")
    open(os.path.join(BIG, "_OK"), "w").close()


def autocap_evidence(spark) -> dict:
    """VERDICT r6 #6: the quantile-derived hot-shingle cap on the REAL
    salted 10× corpus — derived cap value, and pair-set recall of
    cap="auto" vs the hand-tuned constant the oracles use (100)."""
    from mini_etl_spark.functions.dedup import _shingled, jaccard_pairs
    from mini_etl_spark.operators.skew import auto_frequency_cap

    docs = spark.read.parquet(f"{BIG}/documents.parquet")
    freq = (
        _shingled(docs, "text", "doc_id", 3)
        .select(F.explode("__sh").alias("__g"))
        .groupBy("__g")
        .agg(F.count(F.lit(1)).alias("__f"))
    )
    derived_cap = auto_frequency_cap(freq)
    kw = dict(threshold=0.3, n=3)
    auto = {(r.id_a, r.id_b)
            for r in jaccard_pairs(docs, max_shingle_freq="auto", **kw).collect()}
    manual = {(r.id_a, r.id_b)
              for r in jaccard_pairs(docs, max_shingle_freq=100, **kw).collect()}
    recall = (len(auto & manual) / len(manual)) if manual else 1.0
    return {
        "derived_cap": derived_cap,
        "pairs_auto": len(auto),
        "pairs_manual_cap100": len(manual),
        "recall_auto_vs_manual": round(recall, 4),
        "extra_auto_pairs": len(auto - manual),
    }


def _cpu_jiffies() -> dict | None:
    """Aggregate /proc/stat counters — the before/after delta exposes the
    run's STEAL fraction, the one guest-visible signal of a noisy
    neighbor on a shared VM (guest loadavg stays ~0 under host-side
    contention; see bench.py's twin helper and the round-11 BASELINE.md
    adjudication). Ratios measured under steal > ~2% are box noise."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        if parts[0] != "cpu":
            return None
        vals = [int(v) for v in parts[1:9]]
        user, nice, system, idle, iowait, irq, softirq, steal = (
            vals + [0] * 8
        )[:8]
        return {
            "user": user + nice, "system": system + irq + softirq,
            "idle": idle, "iowait": iowait, "steal": steal,
        }
    except (OSError, ValueError, IndexError):
        return None


def main() -> None:
    from mini_etl_spark import get_spark

    import __spark_entry__ as entry

    jiffies_before = _cpu_jiffies()
    spark = get_spark("scale-check")
    t0 = time.monotonic()
    build_big(spark)
    print(f"# replica build ({REPLICAS}x): {time.monotonic() - t0:.1f}s",
          file=sys.stderr)

    queries = entry.queries()
    names = pick_queries(queries)
    # SCALE_SESSION_RESET=N: recycle the SparkSession every N queries.
    # Measured in the round-10 full-registry sweep: a single session
    # accumulates heap/GC pressure over ~150 queries that inflates LATE
    # big-side runs 2-4x (three false SUPERLINEAR flags, all of which
    # re-timed clean in a fresh session). Stopping the context drops the
    # block manager, caches, and codegen state; the replica build is
    # keyed on the _OK marker so the new session skips it.
    reset_every = int(os.environ.get("SCALE_SESSION_RESET", "0"))
    print(f"# sweeping {len(names)} queries"
          + (f" (session reset every {reset_every})" if reset_every else ""),
          file=sys.stderr)
    results = {}
    errors = {}
    for qi, name in enumerate(names):
        if reset_every and qi and qi % reset_every == 0:
            spark.stop()
            spark = get_spark("scale-check")
            print(f"# session recycled at query {qi}", file=sys.stderr)
        fn = queries[name]
        times = {}
        try:
            for label, sf_dir in (("base", BASE), ("big", BIG)):
                fn(spark, sf_dir).count()  # warm: codegen + shuffle machinery
                spark.catalog.clearCache()
                t = time.monotonic()
                n = fn(spark, sf_dir).count()
                times[label] = time.monotonic() - t
                times[f"{label}_rows"] = n
                spark.catalog.clearCache()
        except Exception as exc:  # record, keep sweeping
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"{name:22s} ERROR {errors[name][:80]}", file=sys.stderr)
            continue
        # a sub-resolution base time (0.0s) can't produce a meaningful
        # ratio — degrade to inf rather than crash on round()/comparison
        ratio = times["big"] / times["base"] if times["base"] > 0 else float("inf")
        # output-bound allowance: a pair/list query whose RESULT grows
        # faster than the data (e.g. similarity pairs at a threshold
        # inside the fixture's random-cosine tail — output is Θ(n²) by
        # definition) is doing linear work per output row; the plan is
        # only superlinear if time outgrows max(data, output) growth.
        rows_ratio = (
            times["big_rows"] / times["base_rows"] if times["base_rows"] else 1.0
        )
        allowed = max(REPLICAS, rows_ratio)
        if ratio > allowed * 1.25:
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
            "rows_ratio": round(rows_ratio, 2),
            "output_bound": bool(rows_ratio > REPLICAS * 1.25),
            "superlinear": bool(ratio > allowed * 1.25),
            "base_rows": times["base_rows"],
            "big_rows": times["big_rows"],
        }
        flag = " **SUPERLINEAR**" if results[name]["superlinear"] else ""
        print(
            f"{name:22s} base {times['base']:6.2f}s  big {times['big']:6.2f}s  "
            f"ratio {ratio:5.2f}x vs data {REPLICAS}x{flag}",
            file=sys.stderr,
        )
    autocap = None
    if not os.environ.get("SCALE_SKIP_AUTOCAP"):
        t = time.monotonic()
        autocap = autocap_evidence(spark)
        print(f"# autocap evidence: {autocap} "
              f"({time.monotonic() - t:.1f}s)", file=sys.stderr)
    fractions = None
    jiffies_after = _cpu_jiffies()
    if jiffies_before and jiffies_after:
        tot = sum(jiffies_after.values()) - sum(jiffies_before.values())
        if tot > 0:
            fractions = {
                k: round((jiffies_after[k] - jiffies_before[k]) / tot, 4)
                for k in jiffies_after
            }
    print(json.dumps({
        "replicas": REPLICAS,
        "n_queries": len(results),
        "n_superlinear": sum(1 for r in results.values() if r["superlinear"]),
        "autocap": autocap,
        "errors": errors,
        "run_cpu_fractions": fractions,
        "results": results,
    }))


if __name__ == "__main__":
    main()
