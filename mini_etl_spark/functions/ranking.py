"""Preference/label aggregation: majority vote and Bradley–Terry fitting.

The RLHF-side counterparts of :mod:`conversations.preference_pairs`:
once you HAVE preference judgments (human annotator votes, pairwise
A-vs-B comparisons from an eval harness), turn them into per-item
consensus labels and per-item strength scores.

- :func:`majority_label` — weighted plurality vote per item with a
  deterministic tie-break (most votes, then smallest label), plus an
  agreement ratio for disagreement-based quality filtering.
- :func:`bradley_terry` — strength scores from pairwise win/loss records
  via the classic MM (minorization–maximization) iteration
  (Hunter 2004): ``s_i ← W_i / Σ_j n_ij/(s_i + s_j)``. A fixed
  iteration count, a fixed float-chain order, and a virtual-opponent
  regularizer make the whole fit replayable in an external SQL engine
  as unrolled CTEs (same trick as ``graph.pagerank``).

Scale stance: majority vote is two hash aggregates (map-side partial
combine on both). Bradley–Terry is, per iteration, two equi-joins of the
symmetric game table against the (item, strength) frame plus one hash
aggregate — the same bounded-state loop shape as PageRank; strength
frames are ``localCheckpoint``-ed each round so lineage (and the plan)
stays O(1) across iterations. The item universe (models, completions,
annotators) is small in practice, but nothing here requires it: every
step is keyed on item ids.

No reference counterpart; public recipe per Hunter (2004), "MM
algorithms for generalized Bradley-Terry models".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["majority_label", "bradley_terry"]


def majority_label(
    df: DataFrame,
    item_col: str = "item_id",
    label_col: str = "label",
    weight_col: str | None = None,
) -> DataFrame:
    """Consensus label per item from (item, label[, weight]) vote rows.

    Winner = the label with the greatest vote mass; ties break to the
    SMALLEST label (cast to string for ordering stability across label
    types). Output: (item, label, votes, total_votes, agreement) with
    ``agreement = votes/total`` rounded to 4 — filter on it to drop
    low-consensus items (the standard inter-annotator-agreement gate).

    Two hash aggregates, both with map-side partial combine; no window,
    no sort.
    """
    wcol = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    per_label = df.groupBy(item_col, label_col).agg(
        F.sum(wcol).alias("votes")
    )
    # min_by on (-votes, label): most votes first, then smallest label —
    # one deterministic ordering key serving winner pick and agreement
    ordkey = F.struct(
        (-F.col("votes")).alias("nv"),
        F.col(label_col).cast("string").alias("lb"),
    )
    return (
        per_label.groupBy(item_col)
        .agg(
            F.min_by(F.col(label_col), ordkey).alias(label_col),
            F.max("votes").alias("votes"),
            F.sum("votes").alias("total_votes"),
        )
        .withColumn(
            "agreement", F.round(F.col("votes") / F.col("total_votes"), 4)
        )
    )


def bradley_terry(
    pairs: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    iterations: int = 5,
) -> DataFrame:
    """Fit Bradley–Terry strengths from pairwise outcomes.

    Input: one row per decided comparison (``winner_col`` beat
    ``loser_col``). Output: (item, strength), strength normalized so the
    item with the SMALLEST id has strength 1.0 (a deterministic anchor —
    normalizing by the sum or geometric mean would make the result
    depend on float aggregation order), rounded to 6.

    MM update with a virtual-opponent regularizer: every item also plays
    two games (one win, one loss) against a fixed strength-1.0 ghost, so
    items with no losses (or no wins) stay finite and the fit is defined
    on disconnected comparison graphs:

        s_i ← (W_i + 1) / ( Σ_j n_ij/(s_i + s_j)  +  2/(s_i + 1) )

    Fixed ``iterations``, left-to-right float chain, and deterministic
    join/agg semantics make the fit replayable as unrolled CTEs in an
    external engine (the driver oracle does exactly that).
    """
    if iterations < 1:
        raise ValueError("bradley_terry: iterations must be >= 1")
    e = pairs.select(
        F.col(winner_col).alias("w"), F.col(loser_col).alias("l")
    )
    # symmetric game-count table (i, j, n_ij) and per-item win counts
    games = (
        e.select(F.col("w").alias("i"), F.col("l").alias("j"))
        .unionByName(e.select(F.col("l").alias("i"), F.col("w").alias("j")))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
        .persist()
    )
    items = games.select(F.col("i").alias("item")).distinct()
    wins = (
        items.join(
            e.groupBy(F.col("w").alias("item")).agg(
                F.count(F.lit(1)).cast("double").alias("__w")
            ),
            "item",
            "left",
        )
        .select(
            "item",
            (F.coalesce("__w", F.lit(0.0)) + F.lit(1.0)).alias("wins"),
        )
        .persist()
    )
    try:
        s = wins.select("item", F.lit(1.0).alias("strength"))
        for _ in range(iterations):
            si = s.select(F.col("item").alias("i"), F.col("strength").alias("si"))
            sj = s.select(F.col("item").alias("j"), F.col("strength").alias("sj"))
            denom = (
                games.join(si, "i")
                .join(sj, "j")
                .groupBy("i")
                .agg(F.sum(F.col("n") / (F.col("si") + F.col("sj"))).alias("__d"))
                .withColumnRenamed("i", "item")
            )
            # localCheckpoint: materialize + cut lineage, exactly as the
            # pagerank loop — plans stay O(1) across iterations
            s = (
                wins.join(s, "item")
                .join(denom, "item", "left")
                .select(
                    "item",
                    (
                        F.col("wins")
                        / (
                            F.coalesce("__d", F.lit(0.0))
                            + F.lit(2.0) / (F.col("strength") + F.lit(1.0))
                        )
                    ).alias("strength"),
                )
                .localCheckpoint(eager=True)
            )
        anchor = s.orderBy("item").limit(1).select(
            F.col("strength").alias("__anchor")
        )
        return s.crossJoin(F.broadcast(anchor)).select(
            "item",
            F.round(F.col("strength") / F.col("__anchor"), 6).alias("strength"),
        )
    finally:
        games.unpersist()
        wins.unpersist()
