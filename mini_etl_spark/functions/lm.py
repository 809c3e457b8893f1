"""Bigram language model: distributed training and perplexity scoring.

The CCNet/Gopher-style quality filter the unigram proxy
(:func:`mini_etl_spark.functions.text.unigram_logprob_score`) approximates:
fit an add-alpha-smoothed bigram LM on a (clean) training corpus, then
score any corpus by mean bigram log-probability / perplexity and keep the
low-perplexity tail. Unlike the unigram score, the bigram model captures
local word ORDER — shuffled-token soup that fools a unigram filter scores
badly here.

Spark-first shape (no reference counterpart — the reference has no LM
surface; this extends the training-data-pipeline tier):

- **Training** is one tokenize pass over the corpus (the same
  ``text.tokens`` contract every text operator shares, so the model
  composes with the rest of the text stack) → explode adjacent pairs →
  ``groupBy(prev, cur).count()``. Map-side partial aggregation does the
  heavy lifting; the shuffled model is bigram-vocabulary-sized (≪ corpus),
  and persists as plain parquet — build once on the clean corpus, serve
  every scoring job after (the 100 TB shape: the model is small state, the
  corpus is the big side and is only ever streamed through once).
- **Scoring** re-derives context totals and vocabulary size from the model
  itself (model-sized aggregates, so a loaded model is self-contained),
  then left-joins each document's bigrams against the model. Joins are
  equi-joins on the bigram key — AQE broadcasts the model side when it fits,
  shuffles otherwise; either way no all-pairs work and no driver loops.
- Every float is produced by a fixed chain (single ``ln`` per bigram, one
  ``avg``, rounds pinned at 4) so external engines replay the scores
  bit-for-bit — see the ``lm_perplexity`` DuckDB oracle.

Smoothing: add-``alpha`` over the model vocabulary V (distinct tokens seen
on either side of a training bigram). Unseen bigram in a seen context →
``(0+α)/(ctx+αV)``; wholly unseen context → ``α/(αV) = 1/V``. Zero- and
one-token documents have no bigrams and are absent from the output,
matching the unigram scorer's zero-token contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mini_etl_spark.functions.text import tokens

__all__ = [
    "bigram_pairs",
    "train_bigram_lm",
    "merge_bigram_lms",
    "bigram_logprob_score",
]


def bigram_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, prev, cur) — one row per adjacent token pair.

    Same generate-barrier pattern as ``text.exploded_tokens``: the token
    array is materialized in its own projection and exploded with
    ``explode_outer`` + a null filter, so Catalyst cannot push an inferred
    ``size(...) > 0`` filter below the projection and re-run the regex
    tokenizer once per output row. Documents with < 2 tokens are dropped.
    """
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("__toks") - 1),
        lambda i: F.struct(
            F.element_at("__toks", i).alias("prev"),
            F.element_at("__toks", i + 1).alias("cur"),
        ),
    )
    return (
        df.withColumn("__toks", tokens(text_col))
        .filter(F.size("__toks") >= 2)
        .withColumn("__pairs", pairs)
        .select(F.col(id_col).alias("__did"), F.explode_outer("__pairs").alias("__p"))
        .filter(F.col("__p").isNotNull())
        .select(
            F.col("__did").alias(id_col),
            F.col("__p.prev").alias("prev"),
            F.col("__p.cur").alias("cur"),
        )
    )


def train_bigram_lm(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Fit the model: (prev, cur, cnt) bigram occurrence counts.

    One corpus pass; the output is bigram-vocabulary-sized and is the
    whole model state — write it with ``to_parquet`` to serve later
    scoring jobs, read it back with ``read_parquet``. Context totals and
    vocabulary size are NOT stored; :func:`bigram_logprob_score`
    recomputes them from the counts (model-sized work) so a persisted
    model round-trips with no sidecar."""
    return (
        bigram_pairs(df, text_col, id_col)
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_bigram_lms(*models: DataFrame) -> DataFrame:
    """Combine bigram models by summing counts — the incremental-update
    path: train on each new corpus slice independently (parallel jobs,
    or one slice per day), then merge model-sized frames instead of ever
    re-reading old corpora. Exactly equals training on the concatenated
    corpus (counts are additive; document boundaries already isolate
    pairs), which the property test asserts. Associative and commutative,
    so slices can merge in any order or tree shape."""
    if not models:
        raise ValueError("merge_bigram_lms: need at least one model")
    merged = models[0]
    for m in models[1:]:
        merged = merged.unionByName(m)
    return merged.groupBy("prev", "cur").agg(F.sum("cnt").alias("cnt"))


def bigram_logprob_score(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    out_col: str = "lm2_score",
) -> DataFrame:
    """Score documents under a trained bigram LM.

    Returns (id, ``n_bigrams``, ``out_col`` = mean bigram ln-prob rounded
    to 4, ``perplexity`` = exp(−rounded mean) rounded to 4 — computed from
    the already-rounded mean so any engine replays it exactly). Documents
    with < 2 tokens are absent.

    Plan: one tokenize+explode over the scored corpus; two model-sized
    aggregates (context totals, vocab size); left equi-joins on
    (prev, cur) and (prev) — model side broadcast by AQE when small; the
    1-row vocab total rides in as an explicit broadcast."""
    if alpha <= 0:
        raise ValueError(
            f"bigram_logprob_score: alpha must be > 0 (got {alpha}) — "
            "zero smoothing gives ln(0) on any unseen bigram"
        )
    pairs = bigram_pairs(df, text_col, id_col)
    ctx = model.groupBy("prev").agg(F.sum("cnt").alias("__ctx_c"))
    vocab = (
        model.select(F.explode(F.array("prev", "cur")).alias("__t"))
        .agg(F.countDistinct("__t").cast("double").alias("__vsize"))
    )
    a = F.lit(float(alpha))
    lp: Column = F.log(
        (F.coalesce(F.col("cnt"), F.lit(0)) + a)
        / (F.coalesce(F.col("__ctx_c"), F.lit(0)) + a * F.col("__vsize"))
    )
    avg4 = F.round(F.avg("__lp"), 4)
    return (
        pairs.join(model, ["prev", "cur"], "left")
        .join(ctx, "prev", "left")
        .join(F.broadcast(vocab))
        .select(F.col(id_col), lp.alias("__lp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            avg4.alias(out_col),
            F.round(F.exp(-avg4), 4).alias("perplexity"),
        )
    )
