"""Large-scale data-prep operators — the capability extension beyond the
reference (BASELINE.json north star): the operations a 100 TB training-data
pipeline needs, each designed partition-parallel with no driver
materialization.

- :mod:`text`       — language ID, Unicode script detection, quality scoring,
                      token counting, document fingerprinting (all JVM-side
                      column expressions)
- :mod:`dedup`      — exact, n-gram Jaccard (inverted index), MinHash+LSH,
                      SimHash, embedding-cosine near-dup
- :mod:`dedup_index`— persisted MinHash signature index: incremental batch-
                      vs-corpus dedup without re-reading the corpus
- :mod:`fuzzy`      — blocked levenshtein joins (entity resolution)
- :mod:`similarity` — brute-force cosine top-k (exact baseline) and
                      random-hyperplane LSH bucketed ANN (scale path)
- :mod:`privacy`    — k-anonymity over quasi-identifiers (+ audit report)
- :mod:`graph`      — PageRank, triangle count, degrees as joins+aggs
- :mod:`multimodal` — opaque binary columns with typed metadata; decode /
                      feature-extract plumbing over mapInPandas (native
                      PPM/BMP/WAV kernels; codec formats stubbed by design)
- :mod:`corpus`     — the composed cleaning pipeline (quality → language →
                      exact dedup → near-dup removal) as one lazy plan
- :mod:`splits`     — deterministic hash-based train/val/test assignment and
                      (stratified) sampling, reproducible across engines
- :mod:`chunking`   — token-window chunking, greedy sequence packing, BM25
- :mod:`mixing`     — per-source token-budget mixture, global shuffle order
- :mod:`bpe`        — BPE vocabulary training (distributed histogram +
                      driver merge loop) and corpus encoding
- :mod:`classify`   — relational Naive-Bayes domain/quality classifier and
                      DSIR-style importance weights (train = two hash
                      aggregates; score = explode + model equi-join)
- :mod:`retrieval`  — reciprocal-rank fusion (hybrid BM25+embedding
                      retrieval) and banded hard-negative mining
- :mod:`ranking`    — majority-vote label aggregation and Bradley–Terry
                      strength fitting from pairwise preferences
- :mod:`web`        — URL parse/normalize/extract + registered-domain
                      grouping key + broadcast blocklist filtering (the
                      C4/CCNet per-host curation front end; pure codegen)
- :mod:`bloom`      — Bloom-filter membership screening: broadcast-bitmask
                      exact n-gram decontamination (GPT-3 recipe) with a
                      shuffle-free map-side corpus test
"""

from mini_etl_spark.functions import (
    bloom,
    bpe,
    chunking,
    classify,
    corpus,
    dedup,
    dedup_index,
    fuzzy,
    graph,
    lm,
    mixing,
    privacy,
    multimodal,
    ranking,
    retrieval,
    similarity,
    splits,
    text,
    web,
)

__all__ = [
    "text", "dedup", "dedup_index", "fuzzy", "similarity", "multimodal",
    "corpus", "splits", "chunking", "mixing", "bpe", "privacy", "graph", "lm",
    "classify", "web", "ranking", "retrieval", "bloom",
]
