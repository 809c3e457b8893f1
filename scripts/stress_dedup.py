#!/usr/bin/env python
"""Scale-stress the dedup path beyond the bench data: N synthetic docs with
planted exact and near duplicates → MinHash-LSH pairs vs exact Jaccard.

Reports throughput (docs/s) per stage and LSH recall/precision against the
exact inverted-index join. Synthetic corpus goes to /tmp (the driver's
testdata stays read-only and untouched).

Usage: STRESS_DOCS=100000 python scripts/stress_dedup.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("STRESS_DOCS", "100000"))
DUP_RATE = 0.05          # fraction of docs that are near-copies of another
VOCAB = 500
DOC_LEN = 60
OUT = "/tmp/stress_dedup_corpus"


def make_corpus(spark):
    """Deterministic corpus built ON EXECUTORS (no driver materialization):
    seed docs from hashed token picks; every k-th doc is a mutated copy of
    doc (i - i % 20) with ~3 token substitutions."""
    from pyspark.sql import functions as F

    base = spark.range(N_DOCS).withColumnRenamed("id", "doc_id")
    # parent for planted dups: doc_id rounded down to a multiple of 20;
    # offset-1 docs are near-copies of their parent (5% of the corpus)
    parent = (F.col("doc_id") - F.col("doc_id") % 20)
    is_dup = (F.col("doc_id") % 20) == F.lit(1)
    seed = F.when(is_dup, parent).otherwise(F.col("doc_id"))
    # token t of doc d = "w" + hash(d, t) % VOCAB; dup docs mutate 3 positions
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(DOC_LEN - 1)),
        lambda t: F.concat(
            F.lit("w"),
            F.when(
                is_dup & t.isin(7, 23, 41),
                F.pmod(F.xxhash64(F.col("doc_id"), t), F.lit(VOCAB)),
            ).otherwise(F.pmod(F.xxhash64(seed, t), F.lit(VOCAB))),
        ),
    )
    return base.select("doc_id", F.concat_ws(" ", toks).alias("text"))


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from mini_etl_spark.session import get_spark
    from mini_etl_spark.functions import dedup as dd

    spark = get_spark("stress-dedup")
    shutil.rmtree(OUT, ignore_errors=True)
    make_corpus(spark).write.parquet(OUT)
    docs = spark.read.parquet(OUT)
    n = docs.count()

    t0 = time.monotonic()
    exact = dd.jaccard_pairs(docs, threshold=0.5, max_shingle_freq=2000)
    exact_pairs = {(r.id_a, r.id_b) for r in exact.collect()}
    t_exact = time.monotonic() - t0

    t0 = time.monotonic()
    lsh = dd.minhash_lsh_pairs(docs, threshold=0.5, num_hashes=64, bands=16)
    lsh_pairs = {(r.id_a, r.id_b) for r in lsh.collect()}
    t_lsh = time.monotonic() - t0

    t0 = time.monotonic()
    n_exact_groups = dd.exact_dedup(docs).count()
    t_fp = time.monotonic() - t0

    # Skewed-corpus stress: the same corpus with one hot 6-token stop phrase
    # appended to EVERY doc. Uncapped, its shingles' posting lists are length
    # N → O(N²) join pairs (at 100k docs: 5e9 rows — a job-killer). With the
    # default cap (1000) the hot shingles are dropped before the join and the
    # pair count stays bounded by the genuine near-dup structure.
    from pyspark.sql import functions as F

    skewed = docs.withColumn(
        "text", F.concat_ws(" ", F.col("text"), F.lit("of the and in to a"))
    )
    t0 = time.monotonic()
    skew_pairs = dd.jaccard_pairs(skewed, threshold=0.5).count()  # default cap
    t_skew = time.monotonic() - t0

    recall = len(lsh_pairs & exact_pairs) / max(len(exact_pairs), 1)
    precision = (
        len(lsh_pairs & exact_pairs) / max(len(lsh_pairs), 1)
    )  # 1.0 by construction (verify=True)
    print(
        json.dumps(
            {
                "docs": n,
                "exact_jaccard_sec": round(t_exact, 1),
                "exact_pairs": len(exact_pairs),
                "minhash_lsh_sec": round(t_lsh, 1),
                "lsh_pairs": len(lsh_pairs),
                "lsh_recall": round(recall, 4),
                "lsh_precision": round(precision, 4),
                "exact_dedup_sec": round(t_fp, 1),
                "fingerprint_groups": n_exact_groups,
                "skewed_capped_sec": round(t_skew, 1),
                "skewed_capped_pairs": skew_pairs,
                "lsh_docs_per_sec": int(n / t_lsh),
            }
        )
    )
    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
