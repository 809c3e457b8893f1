"""Distributed BPE (byte-pair-encoding) vocabulary training + encoding.

The tokenizer-training step of an LLM data pipeline. Architecture is the
standard two-tier split every production BPE trainer uses (HF tokenizers,
SentencePiece on corpora too big for one machine):

- **corpus pass (distributed)**: one Spark aggregation reduces the corpus
  to a (word, count) histogram. At 100 TB this is the only pass that
  touches the data — one shuffle, map-side combined, output bounded by
  vocabulary size (~10⁶ rows), not corpus size.
- **merge loop (driver)**: classic BPE over the histogram — repeatedly
  merge the most frequent adjacent symbol pair. The loop's working set is
  the histogram, never the corpus, so driver-side is the *correct* home
  (a distributed merge loop would shuffle the vocabulary per merge for no
  parallelism gain). Pair counts are maintained incrementally with a
  pair→words inverted index: each merge touches only words containing the
  winning pair.
- **encoding (distributed)**: ``apply_bpe`` replays the learned merges
  over any corpus via Arrow-batched ``mapInPandas`` — merges ride along
  as a broadcast-sized list; ranks decide merge order exactly as in
  training, so encode(train_corpus) is consistent with the vocabulary.

Determinism: ties on pair frequency break lexicographically, so the
learned merge table is a pure function of the histogram — pytest re-runs
the same loop on a DuckDB-computed histogram (differential gate for the
distributed pass; the loop itself is engine-independent Python).

Reference parity: none (the reference has no tokenizer surface) — this is
part of the LLM-pipeline extension set, like minhash dedup and packing.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mini_etl_spark.functions.text import exploded_tokens

__all__ = ["word_histogram", "train_bpe_merges", "merges_df", "apply_bpe"]

END = "</w>"  # end-of-word marker, the classic BPE word-boundary symbol


def word_histogram(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
    max_vocab: int | None = None,
) -> DataFrame:
    """(word, count) over the tokenized corpus — the one distributed pass
    of BPE training. One explode + one hash aggregate (map-side combined);
    output is vocabulary-sized.

    The histogram is the frame a BPE trainer COLLECTS, so its size must
    be provably bounded before the driver pull — a 100 TB web corpus's
    distinct-word count (typos, URLs, hex blobs) is corpus-scaled, not
    vocabulary-scaled. ``min_count`` drops singleton noise executor-side
    (standard BPE practice — a pair seen once never wins a merge against
    real vocabulary); ``max_vocab`` keeps only the top-k words by
    (count desc, word asc — fully deterministic), which Spark plans as
    ``TakeOrderedAndProject`` (per-partition heaps, no global sort).
    Defaults (1, None) preserve the exact unbounded histogram."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if max_vocab is not None and max_vocab < 1:
        raise ValueError(f"max_vocab must be >= 1, got {max_vocab}")
    toks = exploded_tokens(df, text_col, id_col, "__did", "word")
    hist = toks.groupBy("word").agg(F.count(F.lit(1)).alias("count"))
    if min_count > 1:
        hist = hist.filter(F.col("count") >= F.lit(int(min_count)))
    if max_vocab is not None:
        hist = hist.orderBy(F.col("count").desc(), F.col("word")).limit(
            int(max_vocab)
        )
    return hist


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (END,)


def train_bpe_merges(
    histogram: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a (word, count) histogram.

    Pure driver-side function (engine-independent — tested against a
    DuckDB-derived histogram). Pair counts update incrementally via a
    pair→word inverted index, and the best pair comes from a max-heap
    with lazy invalidation (stale/zero entries are discarded on pop) —
    each merge costs O(words containing the winning pair · log pairs),
    never a scan of the whole pair table. Frequency ties break on the
    lexicographically smallest pair for full determinism."""
    import heapq

    words: dict[int, list] = {}   # word idx -> [symbols, count]
    for i, (w, c) in enumerate(histogram):
        words[i] = [list(_word_symbols(w)), int(c)]

    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, (syms, c) in words.items():
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += c
            pair_words[(a, b)].add(i)

    # min-heap on (-count, pair): top = max count, ties -> smallest pair
    heap = [(-cnt, pair) for pair, cnt in pair_counts.items()]
    heapq.heapify(heap)

    def _bump(pair: tuple[str, str], delta: int) -> None:
        cnt = pair_counts[pair] + delta
        if cnt <= 0:
            pair_counts.pop(pair, None)
            pair_words.pop(pair, None)
        else:
            pair_counts[pair] = cnt
            if delta > 0:  # stale smaller entries invalidate lazily
                heapq.heappush(heap, (-cnt, pair))

    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges and heap:
        negc, pair = heapq.heappop(heap)
        cur = pair_counts.get(pair, 0)
        if cur <= 0:
            continue  # dead pair
        if -negc != cur:
            # stale priority (decrements don't push): re-queue at the live
            # count — stale entries are always >= live, so the pair keeps
            # surfacing until its top-of-heap entry is exact
            heapq.heappush(heap, (-cur, pair))
            continue
        merges.append(pair)
        merged = pair[0] + pair[1]
        for i in list(pair_words.get(pair, ())):
            syms, c = words[i]
            # remove this word's old pair contributions
            for a, b in zip(syms, syms[1:]):
                if (a, b) != pair:
                    pair_words[(a, b)].discard(i)
                _bump((a, b), -c)
            # apply the merge left-to-right
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == pair[0] and syms[j + 1] == pair[1]:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i][0] = out
            # add the new contributions
            for a, b in zip(out, out[1:]):
                _bump((a, b), c)
                pair_words[(a, b)].add(i)
        pair_counts.pop(pair, None)
        pair_words.pop(pair, None)
    return merges


def merges_df(spark: SparkSession, merges: list[tuple[str, str]]) -> DataFrame:
    """The learned merge table as a DataFrame: (rank, left, right) —
    rank is merge priority (0 = first/highest)."""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank, best_idx = None, None
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_idx = r, j
        if best_idx is None:
            break
        syms[best_idx : best_idx + 2] = [syms[best_idx] + syms[best_idx + 1]]
    return syms


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode a corpus with a learned merge table: (id, ``out_col``
    array<string>) — subword symbols per document, merges applied in rank
    order per word (training-consistent).

    Distributed via Arrow-batched ``mapInPandas``; the merge table is a
    broadcast-sized Python dict carried in the closure (vocabulary-sized,
    like any tokenizer model shipped to executors). Per-word results are
    memoized per batch — real corpora repeat words heavily, so the
    amortized cost per token is a dict hit."""
    import pandas as pd  # noqa: F401

    from mini_etl_spark.functions.text import tokens as _tokens_col

    ranks = {pair: i for i, pair in enumerate(merges)}
    tokenized = df.withColumn("__toks", _tokens_col(text_col)).select(
        id_col, "__toks"
    )
    out_schema = f"{df.schema[id_col].dataType.simpleString()}"
    schema = f"{id_col} {out_schema}, {out_col} array<string>"

    def _encode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        cache: dict[str, list[str]] = {}
        for pdf in batches:
            out_rows = []
            for toks in pdf["__toks"]:
                syms: list[str] = []
                for w in toks:
                    got = cache.get(w)
                    if got is None:
                        got = _encode_word(w, ranks)
                        cache[w] = got
                    syms.extend(got)
                out_rows.append(syms)
            yield pd.DataFrame({id_col: pdf[id_col], out_col: out_rows})

    return tokenized.mapInPandas(_encode, schema=schema)
