#!/usr/bin/env python
"""Scale-stress the tokenizer-training path: N synthetic docs →
word histogram (the one corpus-sized pass) → driver merge loop →
distributed apply_bpe encoding, reporting per-stage throughput.

The corpus is built on executors (spark.range + column expressions) and
written to parquet so every stage reads a real scan. The histogram
output is vocabulary-sized regardless of N — doubling STRESS_DOCS
should double histogram time and encoding time but leave the merge
loop flat.

Usage: STRESS_DOCS=100000 python scripts/stress_bpe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("STRESS_DOCS", "100000"))
N_MERGES = int(os.environ.get("STRESS_MERGES", "500"))
OUT = "/tmp/stress_bpe"


def make_corpus(spark):
    from pyspark.sql import functions as F

    # 2000 distinct "words" with skewed (Zipf-ish) reuse so merges have
    # real frequency structure to chew on
    words = F.array(*[F.lit(f"tok{i}x{'ab' * (i % 5)}") for i in range(2000)])
    df = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), (F.pmod(F.col("id") * 31, F.lit(80)) + F.lit(20))),
                lambda i: F.element_at(
                    words,
                    (
                        F.pmod(
                            F.pmod(F.col("id") * 17 + i * 13, F.lit(2000))
                            * F.pmod(i, F.lit(7)),
                            F.lit(2000),
                        )
                        + 1
                    ).cast("int"),
                ),
            ),
            " ",
        ).alias("text"),
    )
    shutil.rmtree(OUT, ignore_errors=True)
    df.write.parquet(OUT)


def main() -> None:
    from mini_etl_spark.functions import bpe
    from mini_etl_spark.session import get_spark

    spark = get_spark("stress-bpe")
    spark.sparkContext.setLogLevel("ERROR")
    make_corpus(spark)
    docs = spark.read.parquet(OUT)

    t0 = time.monotonic()
    hist = [(r.word, r["count"]) for r in bpe.word_histogram(docs).collect()]
    t_hist = time.monotonic() - t0

    t0 = time.monotonic()
    merges = bpe.train_bpe_merges(hist, N_MERGES)
    t_train = time.monotonic() - t0

    t0 = time.monotonic()
    bpe.apply_bpe(docs, merges).write.format("noop").mode("overwrite").save()
    t_enc = time.monotonic() - t0

    print(
        json.dumps(
            {
                "n_docs": N_DOCS,
                "vocab_words": len(hist),
                "n_merges": len(merges),
                "stages": [
                    {"stage": "histogram", "sec": round(t_hist, 2),
                     "docs_per_s": round(N_DOCS / t_hist)},
                    {"stage": "merge_loop(driver)", "sec": round(t_train, 2)},
                    {"stage": "apply_bpe", "sec": round(t_enc, 2),
                     "docs_per_s": round(N_DOCS / t_enc)},
                ],
            }
        )
    )
    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
