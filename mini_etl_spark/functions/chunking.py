"""Document chunking, sequence packing, and BM25 retrieval — the
context-window side of a training-data pipeline.

No reference parity (the reference has no text operators); these extend the
LLM-pipeline surface the same way :mod:`text` and :mod:`dedup` do. All
token arithmetic uses the shared :func:`text.tokens` contract so every
operator has an exact DuckDB twin.

Scale stance:

- ``chunk_documents`` is one codegen projection + posexplode — no shuffle,
  no UDF; output size is input token count / stride, linear at any scale.
- ``pack_sequences`` (greedy bin packing into fixed context windows) is
  sequential by nature, so it is made distributed the standard way:
  deterministic id-range groups pack independently (bins never span
  groups — a few percent of fill lost at group edges, bounded by
  window/group size, in exchange for embarrassing parallelism and
  run-to-run reproducibility). One shuffle to the groups, Arrow-batched
  applyInPandas inside each.
- ``bm25_topk`` builds postings only for the query's terms (the filter
  pushes inside the explode), so cost is O(corpus tokens) scan + tiny
  aggregates; the final top-k is TakeOrderedAndProject, never a global
  sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from mini_etl_spark.functions.text import tokens

__all__ = ["chunk_documents", "pack_sequences", "bm25_topk"]


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document into token windows of ``window`` tokens starting
    every ``stride`` tokens (overlap = window - stride).

    Returns (id, ``chunk_id`` 0-based per doc, ``chunk_text``,
    ``n_tokens``). Start positions are 1, 1+stride, … ≤ token count, so the
    final chunk may be shorter than ``window``; zero-token documents emit
    no chunks. Pure column expressions (sequence → posexplode → slice) —
    the whole operator is one codegen stage with no shuffle and no UDF.
    """
    if window < 1 or stride < 1:
        raise ValueError("chunk_documents: window and stride must be ≥ 1")
    toks = tokens(text_col)
    n = F.size("__toks")
    starts = F.when(n >= 1, F.sequence(F.lit(1), n, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    chunk = F.slice("__toks", F.col("__start"), window)
    return (
        df.withColumn("__toks", toks)
        .select(id_col, "__toks", F.posexplode(starts).alias("__pos", "__start"))
        .select(
            id_col,
            F.col("__pos").cast("long").alias("chunk_id"),
            F.array_join(chunk, " ").alias("chunk_text"),
            F.size(chunk).cast("long").alias("n_tokens"),
        )
    )


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 512,
    group_size: int = 100,
) -> DataFrame:
    """Greedy sequence packing: assign documents to context-window bins of
    ``max_tokens`` capacity, preserving id order.

    The classic pretraining step (pack short documents together so a batch
    wastes no pad tokens). Greedy packing is sequential, so to distribute
    it deterministically the id space is cut into ranges of ``group_size``
    ids (``group = id div group_size``); each range packs independently
    with the textbook greedy rule — walk docs in id order, open a new bin
    when the next document would overflow a non-empty bin. A document
    larger than ``max_tokens`` gets a bin of its own (truncation is a
    separate, explicit step — see :func:`chunk_documents`).

    Returns (id, ``n_tokens``, ``bin_id``) where
    ``bin_id = group * 1_000_000 + bin-within-group`` — globally unique,
    stable under corpus growth in other groups, and reproducible across
    runs and engines (the DuckDB twin replays the same walk as a recursive
    CTE). One shuffle (groupBy the range id), Arrow-batched pandas inside.

    ``id_col`` values must be unique (they define the walk order); for
    chunked input derive one first, e.g. ``doc_id * K + chunk_id`` — see
    examples/chunk_pack.yaml.
    """
    if max_tokens < 1 or group_size < 1:
        raise ValueError("pack_sequences: max_tokens and group_size must be ≥ 1")
    if group_size > 1_000_000:
        # bin_id = group * 1e6 + bin-within-group; a group can emit up to
        # group_size bins (one doc per bin), so a larger group would let
        # bin ids collide across groups
        raise ValueError("pack_sequences: group_size must be <= 1_000_000")
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_tokens", LongType()),
            StructField("bin_id", LongType()),
        ]
    )

    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_col)
        group = int(pdf["__g"].iloc[0])
        bins, cur, b = [], 0, 0
        for t in pdf["n_tokens"]:
            t = int(t)
            if cur > 0 and cur + t > max_tokens:
                b, cur = b + 1, t
            else:
                cur += t
            bins.append(group * 1_000_000 + b)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].astype("int64"),
                "n_tokens": pdf["n_tokens"].astype("int64"),
                "bin_id": pd.Series(bins, dtype="int64", index=pdf.index),
            }
        )

    sized = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.size(tokens(text_col)).cast("long").alias("n_tokens"),
        F.floor(F.col(id_col).cast("long") / group_size).cast("long").alias("__g"),
    )
    return sized.groupBy("__g").applyInPandas(_pack, schema)


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 keyword retrieval over the corpus: top-``k`` documents for a
    bag of query terms (Robertson/Spärck Jones probabilistic idf with the
    standard +1 floor, as in Lucene).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df_t + 0.5)/(df_t + 0.5)).

    Plan shape: one pass builds (doc, dl) and the postings for *query terms
    only* (the isin filter sits inside the explode, so non-query terms
    never reach a shuffle); df_t and (N, avgdl) are two scalar-sized
    aggregates broadcast back; the final top-k is TakeOrderedAndProject.
    Everything JVM-side.
    """
    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    base = df.select(
        F.col(id_col), tokens(text_col).alias("__toks")
    ).withColumn("__dl", F.size("__toks").cast("double"))
    base = base.persist()
    post = (
        base.select(id_col, "__dl", F.explode("__toks").alias("__t"))
        .filter(F.col("__t").isin(terms))
        .groupBy(id_col, "__t")
        .agg(F.count(F.lit(1)).cast("double").alias("__tf"), F.first("__dl").alias("__dl"))
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )
    dfreq = post.groupBy("__t").agg(F.count(F.lit(1)).cast("double").alias("__df"))
    idf = F.log(
        F.lit(1.0) + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    tf_term = (F.col("__tf") * (k1 + 1)) / (
        F.col("__tf")
        + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
    )
    # (N, avgdl) attach via a broadcast of the 1-row stats aggregate; the
    # plan is a BroadcastNestedLoopJoin by necessity (an equi-key would be
    # constant-folded away), which is benign here: the build side is a
    # single row, so the "nested loop" is one comparison per stream row —
    # the standard scalar-subquery shape. Allow-listed as such in
    # tests/test_query_plans_audit.py.
    scored = (
        post.join(F.broadcast(dfreq), "__t")
        .join(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(idf * tf_term), 4).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)
