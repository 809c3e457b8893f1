"""BPE trainer/encoder tests: classic-example merges, differential
histogram vs DuckDB (the distributed pass), encoding properties."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mini_etl_spark.functions import bpe
from mini_etl_spark.sources import read_parquet

from tests.conftest import SF_SMALL


def test_train_bpe_classic_example():
    """The textbook BPE corpus: est-family merges surface first (ties
    break lexicographically, so the run is fully deterministic)."""
    hist = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe.train_bpe_merges(hist, 3)
    assert merges == [("e", "s"), ("es", "t"), ("est", bpe.END)]


def test_train_bpe_exhausts_gracefully():
    merges = bpe.train_bpe_merges([("ab", 1)], 100)
    # 'a'+'b', 'ab'+END -> single symbol; no pairs left, loop stops early
    assert merges == [("a", "b"), ("ab", bpe.END)]


def test_word_histogram_matches_duckdb(spark):
    """The distributed corpus pass must equal DuckDB's histogram under the
    shared tokenizer contract — the engine-differential half of training
    (the merge loop is engine-independent driver Python)."""
    docs = read_parquet(f"{SF_SMALL}/documents.parquet")(spark)
    got = {
        (r.word, r["count"])
        for r in bpe.word_histogram(docs).collect()
    }
    want = set(
        duckdb.sql(
            f"""
            SELECT t AS word, count(*) AS count
            FROM (SELECT unnest(list_filter(
                     string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
                     x -> x <> '')) AS t
                  FROM read_parquet('{SF_SMALL}/documents.parquet'))
            GROUP BY t
            """
        ).fetchall()
    )
    assert got == want and len(got) > 20


def test_apply_bpe_reconstructs_words(spark):
    docs = read_parquet(f"{SF_SMALL}/documents.parquet")(spark).limit(50)
    hist = [(r.word, r["count"]) for r in bpe.word_histogram(docs).collect()]
    merges = bpe.train_bpe_merges(hist, 40)
    encoded = bpe.apply_bpe(docs, merges)
    rows = encoded.collect()
    assert len(rows) == 50
    toks_by_id = {
        r.doc_id: r.toks
        for r in docs.select(
            "doc_id",
            F.filter(
                F.split(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " "), " "),
                lambda t: t != F.lit(""),
            ).alias("toks"),
        ).collect()
    }
    n_multi = 0
    for r in rows:
        joined = "".join(r.bpe_tokens).replace(bpe.END, "")
        assert joined == "".join(toks_by_id[r.doc_id])
        n_multi += sum(1 for s in r.bpe_tokens if len(s.replace(bpe.END, "")) > 1)
    assert n_multi > 0  # merges actually fired


def test_apply_bpe_rank_order():
    """Merges apply by training rank, not greedily by length."""
    ranks_case = [("a", "b"), ("ab", "c")]
    out = bpe._encode_word("abc", {p: i for i, p in enumerate(ranks_case)})
    assert out == ["abc", bpe.END]
    # competing merge with better (lower) rank wins first: (b,c) has rank
    # 0, so it fires before (a,b) even though (a,b) is leftmost
    ranks2 = {("b", "c"): 0, ("a", "b"): 1}
    assert bpe._encode_word("abc", ranks2) == ["a", "bc", bpe.END]


def test_bpe_vocab_query_differential(spark):
    """Driver-query differential: Spark histogram -> merge loop equals
    DuckDB histogram -> same merge loop (rows-only in the driver gate, so
    the cross-engine check lives here)."""
    import __spark_entry__ as entry

    got = {
        (r["rank"], r["left"], r["right"])
        for r in entry.queries()["bpe_vocab"](spark, SF_SMALL).collect()
    }
    hist = duckdb.sql(
        f"""
        SELECT t AS word, count(*) AS count
        FROM (SELECT unnest(list_filter(
                 string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
                 x -> x <> '')) AS t
              FROM read_parquet('{SF_SMALL}/documents.parquet'))
        GROUP BY t ORDER BY t
        """
    ).fetchall()
    merges = bpe.train_bpe_merges(list(hist), 50)
    want = {(i, a, b) for i, (a, b) in enumerate(merges)}
    assert got == want and len(got) == 50


def test_word_histogram_driver_bounds(spark):
    """r6: the corpus-fit collect must be boundable — min_count floors
    executor-side, max_vocab caps top-k deterministically (count desc,
    word asc) and plans as TakeOrderedAndProject, never a global sort."""
    rows = [(1, "aa aa aa bb bb cc"), (2, "aa bb dd")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = {(r.word, r["count"]) for r in bpe.word_histogram(df).collect()}
    assert full == {("aa", 4), ("bb", 3), ("cc", 1), ("dd", 1)}
    floored = {(r.word, r["count"])
               for r in bpe.word_histogram(df, min_count=2).collect()}
    assert floored == {("aa", 4), ("bb", 3)}  # singletons pruned
    capped = bpe.word_histogram(df, max_vocab=3)
    assert "TakeOrderedAndProject" in capped._jdf.queryExecution().executedPlan().toString()
    got = [(r.word, r["count"]) for r in capped.collect()]
    assert got == [("aa", 4), ("bb", 3), ("cc", 1)]  # tie cc<dd breaks asc
    # merges from the bounded histogram still train
    merges = bpe.train_bpe_merges(
        [(r.word, r["count"]) for r in bpe.word_histogram(
            df, min_count=2, max_vocab=2).collect()], 2)
    assert merges  # non-empty
    with pytest.raises(ValueError, match="min_count"):
        bpe.word_histogram(df, min_count=0)
    with pytest.raises(ValueError, match="max_vocab"):
        bpe.word_histogram(df, max_vocab=0)
