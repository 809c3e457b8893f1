"""chunk_documents / pack_sequences / bm25_topk invariants.

The exact-value gates are the DuckDB oracles (`doc_chunks`,
`pack_sequences`, `bm25_topk` in test_oracle.py); these tests pin the
semantic invariants on hand-built corpora.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_etl_spark.functions.chunking import bm25_topk, chunk_documents, pack_sequences


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, " ".join(f"w{i}" for i in range(10))),   # 10 tokens
        (1, "solo"),                                  # 1 token
        (2, ""),                                      # 0 tokens → no chunks
        (3, " ".join(f"x{i}" for i in range(7))),     # 7 tokens
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunks_cover_and_overlap(spark, corpus):
    out = chunk_documents(corpus, window=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: starts 1,4,7,10 → 4 chunks; last has 1 token
    c0 = sorted(by_doc[0], key=lambda r: r["chunk_id"])
    assert [r["n_tokens"] for r in c0] == [4, 4, 4, 1]
    assert c0[0]["chunk_text"] == "w0 w1 w2 w3"
    assert c0[1]["chunk_text"] == "w3 w4 w5 w6"  # overlap of 1 token
    # stride-striped reconstruction: first `stride` tokens of each chunk +
    # the tail of the last chunk reproduce the document
    rebuilt = " ".join(
        " ".join(r["chunk_text"].split()[:3]) for r in c0[:-1]
    ) + " " + c0[-1]["chunk_text"]
    assert rebuilt == " ".join(f"w{i}" for i in range(10))
    assert 2 not in by_doc  # empty doc emits no chunks
    assert [r["n_tokens"] for r in sorted(by_doc[3], key=lambda r: r["chunk_id"])] == [4, 4, 1]
    assert len(by_doc[1]) == 1 and by_doc[1][0]["chunk_text"] == "solo"


def test_chunks_validation(corpus):
    with pytest.raises(ValueError):
        chunk_documents(corpus, window=0)
    with pytest.raises(ValueError):
        chunk_documents(corpus, stride=0)


def test_pack_sequences_invariants(spark):
    # token counts: doc i has (i % 7) + 1 tokens; 60 docs over 3 groups
    rows = [(i, " ".join("t" for _ in range((i % 7) + 1))) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, max_tokens=10, group_size=20)
    got = out.collect()
    # totality: every doc exactly once
    assert sorted(r["doc_id"] for r in got) == list(range(60))
    # capacity: no bin over max_tokens (no single doc exceeds it here)
    sums = out.groupBy("bin_id").agg(F.sum("n_tokens").alias("s")).collect()
    assert all(r["s"] <= 10 for r in sums)
    # bins never span groups
    for r in got:
        assert r["bin_id"] // 1_000_000 == r["doc_id"] // 20
    # greedy in id order: doc 0 (1 tok) and doc 1 (2 tok) share bin 0
    by_doc = {r["doc_id"]: r["bin_id"] for r in got}
    assert by_doc[0] == by_doc[1] == 0


def test_pack_sequences_oversized_doc_gets_own_bin(spark):
    rows = [(0, "a b c"), (1, " ".join("x" for _ in range(50))), (2, "d e")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["bin_id"] for r in pack_sequences(df, max_tokens=10, group_size=100).collect()}
    assert got[0] != got[1] and got[1] != got[2]  # oversized isolated
    assert len(set(got.values())) == 3


def test_bm25_ranks_term_rich_docs_first(spark):
    rows = [
        (0, "apple banana cherry apple apple"),
        (1, "apple banana banana"),
        (2, "cherry plum plum plum"),
        (3, "unrelated words only here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = bm25_topk(df, ["apple", "banana"], k=3).collect()
    assert [r["doc_id"] for r in got][:2] == [0, 1] or [r["doc_id"] for r in got][:2] == [1, 0]
    assert all(r["doc_id"] != 3 for r in got)  # no query terms → never scored
    assert len(got) <= 3
    with pytest.raises(ValueError):
        bm25_topk(df, [])
