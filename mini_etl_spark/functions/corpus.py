"""Corpus hygiene: the composed training-data cleaning pipeline.

``clean_corpus`` chains the individual primitives the way a real LLM data
pipeline does — quality score → language filter → exact dedup → near-dup
removal — as ONE lazy DataFrame expression, so Catalyst sees the whole
plan (filters push into the scan; each dedup stage consumes the previous
stage's pruned output, never the raw corpus).

Stage order matters at scale and is deliberate: the cheap row-local
filters (quality, language — pure column expressions, no shuffle) run
first and typically drop most of a crawl; exact dedup (one hash-aggregate)
runs second; the pair-join near-dup stage — the only super-linear piece —
sees only the survivors.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mini_etl_spark.functions import dedup as dd
from mini_etl_spark.functions.text import add_text_features


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.3,
    languages: Sequence[str] = ("en",),
    jaccard_threshold: float = 0.5,
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """Clean a document corpus for training-data use.

    Returns (id, lang_id, quality) for every KEPT document:

    1. quality ≥ ``min_quality`` and language ∈ ``languages``
       (row-local column expressions — zero shuffles, scan-pushable);
    2. exact dedup on the token-set fingerprint, keeping the min-id
       representative (one aggregate + one semi join on the tiny
       (fingerprint, min_id) side);
    3. near-dup removal: exact n-gram Jaccard pairs over the survivors →
       connected components → drop non-representatives. Swap
       ``dd.jaccard_pairs`` for ``dd.minhash_lsh_pairs`` at corpus scale —
       identical downstream contract (id_a, id_b pairs).
    """
    feats = add_text_features(df, text_col)
    kept = feats.filter(
        (F.col("quality") >= min_quality) & F.col("lang_id").isin(list(languages))
    )
    # exact dedup, keep min-id per fingerprint. The survivor set feeds
    # three consumers (pair generation, the anti-join left side, the final
    # projection) — persist so the regex-heavy feature stage runs once.
    reps = kept.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    kept = kept.join(reps, ["fingerprint", id_col], "left_semi").persist()
    # near-dup removal among survivors
    pairs = dd.jaccard_pairs(
        kept,
        text_col=text_col,
        id_col=id_col,
        threshold=jaccard_threshold,
        max_shingle_freq=max_shingle_freq,
    )
    deduped = dd.drop_near_duplicates(kept, pairs, id_col=id_col)
    return deduped.select(id_col, "lang_id", "quality")


def semantic_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    cells: int = 32,
    threshold: float = 0.9,
    seed: int = 42,
    method: str = "arrow",
) -> DataFrame:
    """Model-free semantic dedup, composed end-to-end: hashing-trick
    document vectors → random-projection cells → in-cell cosine pairs →
    connected components → keep the min-id representative per near-dup
    group. The SemDeDup pipeline with zero model dependencies — every
    stage is a verified primitive (`text.hashed_doc_vectors`,
    `similarity.cell_cosine_pairs`, `dedup.drop_near_duplicates`).

    Returns the KEPT rows of ``df`` (all original columns). Cost at scale:
    one token explode, one cell shuffle, Σ|cell|² in-executor matmuls
    (``method="arrow"``), one pair-graph contraction — the corpus itself
    streams twice and never collects.
    """
    from mini_etl_spark.functions.similarity import (
        cell_cosine_pairs,
        random_unit_centroids,
    )
    from mini_etl_spark.functions.text import hashed_doc_vectors

    vecs = hashed_doc_vectors(df, text_col, id_col, dim=dim, seed=seed).persist()
    cents = random_unit_centroids(dim=dim, k=cells, seed=seed)
    pairs = cell_cosine_pairs(
        vecs, cents, threshold=threshold,
        vec_col="embedding", id_col=id_col, method=method,
    )
    return dd.drop_near_duplicates(df, pairs, id_col=id_col)
