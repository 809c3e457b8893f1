"""Fuzzy string matching — blocked edit-distance joins for entity resolution.

The record-linkage shape neither the reference nor the set-similarity
operators (``dedup.jaccard_pairs`` & co) cover: match names / titles /
addresses that differ by TYPOS rather than by token sets — supplier
canonicalization, author disambiguation, source-name reconciliation in a
crawl. The classic plan is blocking + verification:

1. **Block**: an equi-join key that collapses each string to a coarse
   bucket (normalized prefix or suffix). Only strings sharing a block are
   compared — the O(N·M) cross product never exists.
2. **Verify**: a length-band filter (|len(a)−len(b)| ≤ k is a *necessary*
   condition for edit distance ≤ k — exact, cheap, pushed into the join)
   and then ``levenshtein`` (JVM intrinsic) on the survivors.

Recall contract — stated, not hidden: edit-distance ≤ k pairs whose edits
fall inside the blocked affix land in different blocks and are missed.
Prefix/suffix blocking is the standard high-recall heuristic because real
typos cluster mid-string; for stronger recall run the join once per affix
(``block_on="prefix"`` ∪ ``block_on="suffix"``) — each run is the same
bounded plan. Guaranteed-recall schemes (PassJoin segment pigeonhole)
trade candidate blowup for that guarantee and are out of scope here.

Scale notes (100 TB): one shuffle per side on the block key; candidate
volume is Σ |block_L|·|block_R| — bounded by ``max_block_freq``, which
anti-joins away degenerate blocks (single-letter names, empty strings)
before the join, exactly like ``jaccard_pairs``' hot-shingle cap.
``levenshtein`` runs only on candidates, inside codegen. Deterministic
end-to-end, so the DuckDB oracle replays the identical block + verify
chain (DuckDB ships the same ``levenshtein``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["normalize_text", "fuzzy_join", "fuzzy_dedup_pairs"]


def normalize_text(col: Column | str) -> Column:
    """Matching-normal form: lowercase, trim, collapse internal runs of
    whitespace to one space. Deliberately does NOT strip punctuation —
    '&' vs 'and' is a semantic choice the caller makes upstream."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def _block_key(col: Column, block_on: str, block_len: int) -> Column:
    if block_on == "prefix":
        return F.substring(col, 1, block_len)
    if block_on == "suffix":
        # right()-semantics, NOT substring(col, -n, n): the latter returns
        # '' for strings shorter than n (they'd collide in one empty-string
        # block and could never match longer strings), and diverges from
        # SQL engines' right(s, n), which returns the whole short string.
        return F.right(col, F.lit(block_len))
    raise ValueError(f"block_on must be 'prefix' or 'suffix', got {block_on!r}")


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    max_distance: int = 2,
    block_on: str = "prefix",
    block_len: int = 3,
    max_block_freq: int | None = 1000,
    how: str = "pairs",
) -> DataFrame:
    """Edit-distance join: rows of ``left`` × ``right`` whose normalized
    strings are within ``max_distance`` Levenshtein edits, found via
    affix blocking (see module docstring for the recall contract).

    Returns ``left.* , right.* , distance`` with the right side's columns
    suffixed ``_r`` where they collide. ``how="pairs"`` (the only mode)
    emits one row per matched pair; aggregate downstream for best-match
    semantics (e.g. ``min_by`` on distance per left key).
    """
    if how != "pairs":
        raise ValueError("fuzzy_join: only how='pairs' is implemented")
    ln = normalize_text(left_on)
    rn = normalize_text(right_on)
    overlap = {c for c in right.columns if c in set(left.columns)}
    r_renamed = right
    for c in overlap:
        r_renamed = r_renamed.withColumnRenamed(c, f"{c}_r")
    r_on = f"{right_on}_r" if right_on in overlap else right_on

    a = left.withColumn("__ln", ln).withColumn(
        "__block", _block_key(F.col("__ln"), block_on, block_len)
    )
    b = r_renamed.withColumn("__rn", normalize_text(r_on)).withColumn(
        "__block", _block_key(F.col("__rn"), block_on, block_len)
    )
    if max_block_freq is not None:
        # a block is degenerate if EITHER side floods it (empty strings,
        # single-letter names): cap both — candidate volume per block is
        # |block_L|·|block_R|, so a one-sided cap leaves |block_L|·cap
        # unbounded. The block histograms are tiny and broadcast.
        def _hot(side: DataFrame) -> DataFrame:
            return (
                side.groupBy("__block")
                .count()
                .filter(F.col("count") > max_block_freq)
                .select("__block")
            )

        hot = _hot(a).unionByName(_hot(b)).distinct()
        a = a.join(F.broadcast(hot), "__block", "left_anti")
        b = b.join(F.broadcast(hot), "__block", "left_anti")

    out = (
        a.join(b, "__block")
        .filter(
            F.abs(F.length("__ln") - F.length("__rn")) <= max_distance
        )
        .withColumn("distance", F.levenshtein("__ln", "__rn"))
        .filter(F.col("distance") <= max_distance)
        .drop("__block", "__ln", "__rn")
    )
    return out


def fuzzy_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_distance: int = 2,
    block_on: str = "prefix",
    block_len: int = 3,
    max_block_freq: int | None = 1000,
) -> DataFrame:
    """Self-join form: (``id_a``, ``id_b``, ``distance``) with id_a < id_b —
    near-identical strings inside ONE frame (typo'd duplicate entities).
    Same blocking/verification plan as :func:`fuzzy_join`."""
    slim = df.select(
        F.col(id_col).alias("__id"), normalize_text(text_col).alias("__n")
    ).withColumn("__block", _block_key(F.col("__n"), block_on, block_len))
    if max_block_freq is not None:
        hot = (
            slim.groupBy("__block")
            .count()
            .filter(F.col("count") > max_block_freq)
            .select("__block")
        )
        slim = slim.join(F.broadcast(hot), "__block", "left_anti")
    a, b = slim.alias("a"), slim.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__block") == F.col("b.__block"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .filter(
            F.abs(F.length("a.__n") - F.length("b.__n")) <= max_distance
        )
        .withColumn("distance", F.levenshtein(F.col("a.__n"), F.col("b.__n")))
        .filter(F.col("distance") <= max_distance)
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            "distance",
        )
    )
