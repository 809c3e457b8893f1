"""Joins: equi-joins plus scale extensions (as-of, range).

Reference coverage is honest (SURVEY §2.3): the *only* join in the reference
is the DAG's pairwise outer equi-join (dag.py:356-365). Spark supersedes it
with every join type via ``df.join(how=...)``; Catalyst picks
broadcast / shuffled-hash / sort-merge. This module adds:

- ``join``       — thin factory with an explicit ``broadcast`` hint for small
                   dimension sides (the 100 TB pattern: fact ⋈ dim should
                   never shuffle the fact table).
- ``asof_join``  — "latest right row at or before the left timestamp" per key.
                   Spark lacks a native as-of join; implemented as a
                   *composition of built-in ops* (union + window last), which
                   scales as one shuffle on (key, ts) — no pandas, no
                   per-group materialization, skew handled by AQE.
- ``range_join`` — equi-key + value-in-[lo,hi] join via bucketized equi-join
                   pre-filter, avoiding the naive cross-product-per-key plan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Transform = Callable[[DataFrame], DataFrame]

_JOIN_TYPES = {
    "inner", "left", "right", "outer", "full", "left_semi", "semi",
    "left_anti", "anti", "cross",
}


def join(
    other: DataFrame,
    on: str | list[str],
    how: str = "inner",
    broadcast: bool = False,
) -> Transform:
    """Equi-join factory. ``broadcast=True`` hints the right side as the
    build/broadcast side — use for dimension tables (region/nation/part-sized)
    so the big fact side never shuffles. Catalyst auto-broadcasts below
    ``spark.sql.autoBroadcastJoinThreshold``; the hint makes intent explicit
    and survives misestimated stats."""
    if how not in _JOIN_TYPES:
        raise ValueError(f"join: unsupported how={how!r}")
    right = F.broadcast(other) if broadcast else other

    def _apply(df: DataFrame) -> DataFrame:
        return df.join(right, on=on, how=how)

    return _apply


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str] | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, attach the most recent right row whose
    ``on`` value is <= the left's (``direction="backward"``; ``"forward"``
    gives the earliest right row >=).

    Implementation (no native Spark op — SURVEY guide "as-of join" pattern,
    built from primitives): tag both sides, union them, and run a single
    window pass per ``by`` key ordered by ``on``; ``last(ignorenulls)`` over
    a STRUCT of the right columns carries the most recent right ROW — whole,
    never field-stitched across rows — onto subsequent left rows. One
    shuffle on (by, on) total — same cost shape as a sort-merge join,
    scales linearly.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("asof_join: direction must be backward|forward")
    by_cols = [] if by is None else ([by] if isinstance(by, str) else list(by))
    rcols = right_cols or [c for c in right.columns if c != on and c not in by_cols]
    overlap = set(rcols) & set(left.columns)
    if overlap:
        raise ValueError(f"asof_join: right columns collide with left: {sorted(overlap)}")

    # The right row rides the union as ONE struct (null on left rows), so
    # last/first(ignorenulls) carries the whole row atomically — per-column
    # windows would stitch fields from DIFFERENT right rows whenever a
    # right column holds NULLs (the newest row's null field would fall back
    # to an older row's value).
    l_tag = left.withColumn("__side", F.lit(1)).withColumn(
        "__r",
        F.lit(None).cast(
            "struct<" + ", ".join(
                f"{c}: {right.schema[c].dataType.simpleString()}" for c in rcols
            ) + ">"
        ),
    )
    r_tag = right.select(
        *by_cols, on,
        F.struct(*[F.col(c) for c in rcols]).alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in by_cols and c != on],
    ).withColumn("__side", F.lit(0))
    unioned = l_tag.unionByName(r_tag)

    if direction == "backward":
        # right rows sort before left rows at equal `on` so an exact tie matches
        w = (
            Window.partitionBy(*by_cols)
            .orderBy(F.col(on).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last("__r", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*by_cols)
            .orderBy(F.col(on).asc(), F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = F.first("__r", ignorenulls=True).over(w)

    out_cols = [c for c in left.columns]
    result = (
        unioned.select(*out_cols, F.col("__side"), carried.alias("__rc"))
        .filter(F.col("__side") == 1)
        .select(*out_cols, *[F.col(f"__rc.{c}").alias(c) for c in rcols])
    )
    return result


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_value: str,
    right_lo: str,
    right_hi: str,
    on: str | list[str] | None = None,
    bucket_width: float | None = None,
) -> DataFrame:
    """Join left rows to right intervals: ``right_lo <= left_value <= right_hi``
    (optionally also equi-keyed on ``on``).

    Naive theta-joins explode into BroadcastNestedLoopJoin; with
    ``bucket_width`` both sides are expanded to integer buckets and the join
    becomes an equi-join on bucket (+ keys) followed by the exact range
    filter — the standard scalable range-join decomposition (as in Databricks'
    range-join optimization, reconstructed from primitives here).
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    cond = (F.col(left_value) >= F.col(right_lo)) & (F.col(left_value) <= F.col(right_hi))
    if bucket_width is None:
        join_cond = cond
        for k in keys:
            join_cond = (left[k] == right[k]) & join_cond
        return left.join(right, join_cond, "inner").drop(*[right[k] for k in keys])

    lb = left.withColumn("__bucket", F.floor(F.col(left_value) / F.lit(bucket_width)))
    rb = right.withColumn(
        "__b_lo", F.floor(F.col(right_lo) / F.lit(bucket_width))
    ).withColumn("__b_hi", F.floor(F.col(right_hi) / F.lit(bucket_width)))
    rb = rb.withColumn(
        "__bucket", F.explode(F.sequence(F.col("__b_lo"), F.col("__b_hi")))
    ).drop("__b_lo", "__b_hi")
    joined = lb.join(rb, on=keys + ["__bucket"], how="inner").filter(cond)
    return joined.drop("__bucket")
