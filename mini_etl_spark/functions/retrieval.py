"""Hybrid retrieval composition: rank fusion and hard-negative mining.

Two operators that sit ON TOP of the retrieval primitives (``chunking.
bm25_topk``, ``similarity.cosine_topk`` / ``knn_join``):

- :func:`rrf_fuse` — reciprocal-rank fusion (Cormack/Clarke/Büttcher,
  SIGIR'09): merge N ranked candidate lists into one ranking using only
  the ranks, ``score(d) = Σ_lists 1/(c + rank_list(d))``. The standard
  way to combine keyword (BM25) and embedding retrieval without score
  calibration — scores from different systems are incomparable, ranks
  are not.
- :func:`hard_negatives` — mine training negatives for embedding models:
  for each query, the top-k most similar corpus items that (a) carry a
  DIFFERENT label and (b) fall inside a similarity band
  ``[lo, hi]`` — similar enough to be hard, not so similar they're
  probable false negatives (the standard FAISS-mining recipe).

Scale stance: rank fusion runs per query — ``row_number`` windows are
hash-partitioned on the query id, so fusing a million queries' candidate
lists is one shuffle on ``query_col``. The single-query form (no
``query_col``) windows over lists that are top-k-bounded BY CONSTRUCTION
(k rows per retriever), so the one-partition window touches O(N·k) rows,
never the corpus. Hard-negative mining inherits ``knn_join``'s bucketed
pair space (Σ q_cell × c_cell, never |Q|×|C|); the label attach is two
equi-joins on the id keys.

No reference counterpart (the reference has no retrieval surface at
all); public recipe: RRF per Cormack et al.; hard-negative banding per
the DPR/ANCE/SBERT mining literature.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rrf_fuse", "hard_negatives"]


def rrf_fuse(
    lists: Sequence[DataFrame],
    id_col: str = "doc_id",
    score_col: str = "score",
    k: int = 10,
    c: float = 60.0,
    query_col: str | None = None,
) -> DataFrame:
    """Fuse ranked candidate lists by reciprocal rank.

    Each input frame is one retriever's candidates: ``(id_col,
    score_col)`` — or ``(query_col, id_col, score_col)`` in batched mode.
    Ranks are recomputed per list as ``row_number`` over (score DESC, id
    ASC) — deterministic ties, engine-replayable. Output: one row per
    (query,) id with ``rrf_score = Σ 1/(c + rank)`` (rounded to 6; the
    sum has ≤ len(lists) terms, so float order cannot matter at that
    precision), ``n_lists`` it appeared in, and ``best_rank``; top-``k``
    per query by (rrf_score DESC, id ASC).

    ``c=60`` is the published default — it damps the head so one
    retriever's #1 can't dominate two retrievers' #3s.
    """
    if not lists:
        raise ValueError("rrf_fuse: need at least one ranked list")
    if k < 1:
        raise ValueError(f"rrf_fuse: k must be >= 1, got {k}")
    part = [query_col] if query_col else []
    ranked = []
    for i, df in enumerate(lists):
        w = Window.partitionBy(*part).orderBy(
            F.col(score_col).desc(), F.col(id_col).asc()
        )
        ranked.append(
            df.select(
                *part,
                F.col(id_col),
                F.row_number().over(w).alias("__rank"),
            ).withColumn("__list", F.lit(i))
        )
    union = ranked[0]
    for r in ranked[1:]:
        union = union.unionByName(r)
    fused = union.groupBy(*part, id_col).agg(
        F.round(
            F.sum(F.lit(1.0) / (F.lit(float(c)) + F.col("__rank"))), 6
        ).alias("rrf_score"),
        F.count(F.lit(1)).alias("n_lists"),
        F.min("__rank").alias("best_rank"),
    )
    wq = Window.partitionBy(*part).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    k_search: int = 20,
    nprobe: int = 2,
    lo: float = 0.0,
    hi: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    method: str = "arrow",
) -> DataFrame:
    """Mine hard negatives: per query row, the ``k`` most cosine-similar
    corpus rows whose ``label_col`` DIFFERS from the query's, restricted
    to the band ``lo <= cosine <= hi``.

    The band is the false-negative guard from the dense-retrieval mining
    literature: above ``hi`` a "negative" is more likely a mislabeled
    positive; below ``lo`` it is too easy to teach the model anything.

    Runs :func:`~mini_etl_spark.functions.similarity.knn_join` with a
    wider ``k_search`` (candidates are filtered by label and band, so
    over-fetch before the cut), attaches both sides' labels by equi-join,
    filters, and re-ranks per query — (query_id, corpus_id, neg_rank,
    cosine, query_label, corpus_label). Deterministic: cosine rounds to 4
    inside ``knn_join`` and ties break on corpus id.

    ``method`` passes through to ``knn_join`` (``"arrow"`` BLAS default;
    ``"expr"`` for bit-replayable oracle runs).
    """
    from mini_etl_spark.functions.similarity import knn_join

    if not 1 <= k <= k_search:
        raise ValueError(
            f"hard_negatives: need 1 <= k <= k_search, got k={k} "
            f"k_search={k_search}"
        )
    if lo > hi:
        raise ValueError(f"hard_negatives: lo must be <= hi, got {lo} > {hi}")
    knn = knn_join(
        queries,
        corpus,
        centroids,
        k=k_search,
        nprobe=nprobe,
        vec_col=vec_col,
        id_col=id_col,
        exclude_self=True,
        method=method,
    )
    q_lab = queries.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("query_label")
    )
    c_lab = corpus.select(
        F.col(id_col).alias("corpus_id"), F.col(label_col).alias("corpus_label")
    )
    banded = (
        knn.join(q_lab, "query_id")
        .join(c_lab, "corpus_id")
        .filter(
            (F.col("query_label") != F.col("corpus_label"))
            & (F.col("cosine") >= F.lit(float(lo)))
            & (F.col("cosine") <= F.lit(float(hi)))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        banded.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select(
            "query_id",
            "corpus_id",
            "neg_rank",
            "cosine",
            "query_label",
            "corpus_label",
        )
    )
