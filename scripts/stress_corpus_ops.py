#!/usr/bin/env python
"""Scale-stress the context-window/corpus-assembly path: N synthetic docs →
chunk → pack → BM25 → mixture, reporting throughput per stage.

The corpus is built ON EXECUTORS (spark.range + column expressions — no
driver materialization) and written to /tmp parquet so every stage reads a
real scan. Linearity check: run with STRESS_DOCS=100000 and 200000 — the
per-doc cost should be flat.

Usage: STRESS_DOCS=100000 python scripts/stress_corpus_ops.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("STRESS_DOCS", "100000"))
OUT = "/tmp/stress_corpus_ops"


def make_corpus(spark):
    from pyspark.sql import functions as F

    words = F.array(*[F.lit(f"w{i}") for i in range(300)])
    df = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 8).cast("string")).alias("source"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), (F.pmod(F.col("id") * 31, F.lit(80)) + F.lit(20))),
                lambda i: F.element_at(
                    words, (F.pmod(F.col("id") * 17 + i * 13, F.lit(300)) + 1).cast("int")
                ),
            ),
            " ",
        ).alias("text"),
    )
    shutil.rmtree(OUT, ignore_errors=True)
    df.write.parquet(OUT)


def main() -> None:
    from mini_etl_spark.functions import chunking as ck
    from mini_etl_spark.functions import mixing as mx
    from mini_etl_spark.session import get_spark

    spark = get_spark("stress-corpus-ops")
    spark.sparkContext.setLogLevel("ERROR")
    make_corpus(spark)
    docs = spark.read.parquet(OUT)

    def timed(name, df):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        return {"stage": name, "sec": round(dt, 2), "docs_per_s": round(N_DOCS / dt)}

    report = [
        timed("chunk_64_48", ck.chunk_documents(docs, window=64, stride=48)),
        timed("pack_512", ck.pack_sequences(docs, max_tokens=512, group_size=1000)),
        timed("bm25", ck.bm25_topk(docs, ["w1", "w42", "w123"], k=20)),
        timed(
            "mixture",
            mx.mix_by_token_budget(
                docs, {f"src{i}": 50_000 for i in range(8)}
            ),
        ),
        timed("shuffle_order", mx.shuffle_order(docs)),
    ]
    print(json.dumps({"n_docs": N_DOCS, "stages": report}))
    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
