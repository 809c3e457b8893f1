"""Privacy transforms beyond regex PII redaction (``text.redact_pii``):
k-anonymity over quasi-identifiers.

A released/derived dataset is k-anonymous when every combination of
quasi-identifier (QI) values is shared by at least ``k`` rows — no row can
be singled out by joining the QI columns against an external source. The
two standard enforcement moves, both provided:

- **suppress**: drop rows in QI groups smaller than k (lossy but exact);
- **generalize**: blank the QI columns (to NULL) for under-k groups, so
  the rows survive with their non-identifying payload — the usual choice
  for training corpora where the payload (text) is the point.

Scale notes (100 TB): one hash aggregate over the QI columns (map-side
combined; the exchange carries one row per distinct QI combination), then
one join of the fact rows against the under-k group list. That list is
almost always tiny relative to the data (it IS the rare combinations) —
broadcast by default. No windows, no global sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["k_anonymize", "k_anonymity_report", "l_diversity_report"]


def _small_groups(df: DataFrame, quasi_identifiers: list[str], k: int) -> DataFrame:
    return (
        df.groupBy(*quasi_identifiers)
        .count()
        .filter(F.col("count") < k)
        .select(*quasi_identifiers)
    )


def k_anonymize(
    df: DataFrame,
    quasi_identifiers: list[str],
    k: int,
    method: str = "suppress",
    broadcast_groups: bool = True,
) -> DataFrame:
    """Enforce k-anonymity on ``quasi_identifiers``.

    ``method="suppress"`` drops rows whose QI combination has < k rows;
    ``method="generalize"`` keeps them but nulls the QI columns (the
    blanked rows then all share the all-NULL QI combination). NULL QI
    values count as ordinary values (null-safe grouping), matching the
    definition: a NULL combination seen once is still identifying.
    """
    if k < 1:
        raise ValueError(f"k_anonymize: k must be >= 1, got {k}")
    missing = [c for c in quasi_identifiers if c not in df.columns]
    if missing:
        raise ValueError(f"k_anonymize: missing quasi-identifier columns {missing}")
    small = _small_groups(df, quasi_identifiers, k)
    if broadcast_groups:
        small = F.broadcast(small)
    if method == "suppress":
        # null-safe anti join: groupBy treats NULL as a value, so the
        # membership test must too
        cond = [df[c].eqNullSafe(small[c]) for c in quasi_identifiers]
        return df.join(small, cond, "left_anti")
    if method == "generalize":
        flagged = df.join(
            small.withColumn("__under_k", F.lit(True)),
            [df[c].eqNullSafe(small[c]) for c in quasi_identifiers],
            "left",
        ).select(df["*"], "__under_k")
        out = flagged
        for c in quasi_identifiers:
            out = out.withColumn(
                c, F.when(F.col("__under_k"), F.lit(None)).otherwise(F.col(c))
            )
        return out.drop("__under_k")
    raise ValueError(
        f"k_anonymize: method must be suppress|generalize, got {method!r}"
    )


def k_anonymity_report(
    df: DataFrame, quasi_identifiers: list[str], k: int
) -> DataFrame:
    """One-row audit: (``total_rows``, ``group_count``, ``min_group_size``,
    ``under_k_groups``, ``under_k_rows``) — is the frame k-anonymous, and
    how much would enforcement cost. Two chained aggregates (QI groups →
    one summary row); the exchange carries one row per QI combination."""
    groups = df.groupBy(*quasi_identifiers).count()
    return groups.agg(
        F.sum("count").cast("long").alias("total_rows"),
        F.count(F.lit(1)).cast("long").alias("group_count"),
        F.min("count").cast("long").alias("min_group_size"),
        F.count_if(F.col("count") < k).cast("long").alias("under_k_groups"),
        F.sum(F.when(F.col("count") < k, F.col("count")).otherwise(F.lit(0)))
        .cast("long")
        .alias("under_k_rows"),
    )


def l_diversity_report(
    df: DataFrame,
    quasi_identifiers: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """l-diversity audit — the k-anonymity complement: a QI group can be
    large (k-anonymous) yet expose everyone in it when ALL members share
    one sensitive value (homogeneity attack: "every 34xx-zip patient in
    the release has the same diagnosis"). A group is l-diverse when its
    members carry at least ``l`` DISTINCT sensitive values.

    Returns one row per QI group: the identifiers, ``group_size``,
    ``n_sensitive_values`` (exact distinct), and ``l_diverse`` boolean —
    feed the failing groups to :func:`k_anonymize`-style suppression or
    generalize the sensitive column. One map-side-combined aggregate
    over (QI, sensitive) then (QI) — two hash aggregates, no window, no
    broadcast; NULL sensitive values count as one value (NULL-safe
    distinct), matching the honest reading that "unknown" is itself a
    disclosure class."""
    if not quasi_identifiers:
        raise ValueError("l_diversity_report: quasi_identifiers is empty")
    if l < 1:
        raise ValueError(f"l_diversity_report: l must be >= 1, got {l}")
    per_value = df.groupBy(
        *quasi_identifiers, F.col(sensitive_col).alias("__sv")
    ).agg(F.count(F.lit(1)).alias("__n"))
    return (
        per_value.groupBy(*quasi_identifiers)
        .agg(
            F.sum("__n").cast("long").alias("group_size"),
            F.count(F.lit(1)).cast("long").alias("n_sensitive_values"),
        )
        .withColumn("l_diverse", F.col("n_sensitive_values") >= F.lit(int(l)))
    )
