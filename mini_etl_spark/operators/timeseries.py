"""Gap-filled time-series resampling — the hypertable rollup surface.

No reference parity: the reference has no time-series operators (its
closest shape is a pandas groupby over parsed timestamps); this is the
analytics extension the `events` table exists for. The streaming twin of
the *aggregation* half lives in ``mini_etl_spark/streaming/events.py``
(tumbling windows); this module is the batch form plus the part streaming
can't do: materializing the EMPTY buckets and filling them.

Design for scale: bucketing is a pure projection (``floor(epoch/step)``),
the rollup is one hash aggregate (partial + final), and the dense grid is
generated EXECUTOR-side per group with ``sequence()`` + ``explode`` — the
grid row count is (span/step) per group, never driver-materialized. The
fills are two window passes over the grid, partitioned by group and
ordered by bucket — one shuffle on the group key, which the rollup
aggregate already paid. Nothing here is a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["time_bucket", "resample", "rolling_window"]

_AGGS = {
    "avg": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": lambda c: F.count(c).cast("double"),
}


def time_bucket(ts_col: Column | str, step_seconds: int) -> Column:
    """Floor the timestamp to a ``step_seconds`` bucket (UTC epoch
    arithmetic — ``floor(epoch/step)*step``, the time_bucket contract
    every engine shares). Whole seconds only: sub-second data keeps its
    bucket because flooring the epoch first is order-equivalent."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    step = F.lit(int(step_seconds))
    return F.timestamp_seconds(
        (F.floor(F.unix_timestamp(c) / step) * step).cast("long")
    )


def rolling_window(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window_seconds: int,
    partition_cols: list[str] | None = None,
    aggs: tuple[str, ...] = ("sum", "count"),
    round_to: int | None = 2,
) -> DataFrame:
    """Trailing time-RANGE window: for every event, aggregate ``value_col``
    over the ``window_seconds`` interval ending at (and including) the
    event — "sum of spend in the last hour per user", the sliding metric
    a per-row rows-frame window cannot express when events are irregular.

    Frame semantics: RANGE over epoch **microseconds**, boundaries
    inclusive, peers (identical timestamps) share a frame — the ANSI
    RANGE contract, so a SQL engine replays it exactly.

    Appends one ``{value_col}_rolling_{agg}`` column per agg. Scale: one
    shuffle on ``partition_cols``; each partition is range-scanned once
    with a sliding frame (Spark's WindowExec keeps only the in-frame
    buffer). Unpartitioned use collapses to a single task — pass
    partition columns for anything beyond diagnostic size.
    """
    allowed = {"sum", "avg", "min", "max", "count"}
    bad = set(aggs) - allowed
    if bad:
        raise ValueError(f"rolling_window: unknown aggs {sorted(bad)}")
    parts = list(partition_cols or [])
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = Window.partitionBy(*parts) if parts else Window.partitionBy()
    w = base.orderBy(micros.alias("__us")).rangeBetween(
        -int(window_seconds) * 1_000_000, 0
    )
    out = df
    for agg in aggs:
        if agg == "count":
            col = F.count(value_col).over(w).cast("long")
        else:
            col = getattr(F, agg)(value_col).over(w)
            if round_to is not None:
                col = F.round(col, round_to)
        out = out.withColumn(f"{value_col}_rolling_{agg}", col)
    return out


def resample(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    step_seconds: int,
    group_cols: list[str] | None = None,
    agg: str = "avg",
    fill: str = "linear",
    round_to: int | None = 4,
) -> DataFrame:
    """Resample irregular events onto a dense ``step_seconds`` grid:
    aggregate ``value_col`` per (group, bucket), then materialize every
    bucket between each group's first and last event and fill the gaps.

    ``fill``:
    - ``"none"``  — empty buckets carry NULL.
    - ``"zero"``  — empty buckets carry 0.0 (the counter convention).
    - ``"ffill"`` — last observed aggregate carries forward (the gauge
      convention; leading gaps stay NULL).
    - ``"linear"``— linear interpolation between the surrounding observed
      buckets, time-weighted; leading/trailing gaps fall back to the one
      neighbor that exists (bfill/ffill at the edges).

    Output: group columns, ``bucket_ts``, ``value`` (rounded to
    ``round_to`` decimals so differential engines agree bit-for-bit),
    and ``n_events`` (0 for filled buckets — the audit column that
    distinguishes observed from synthesized).

    Scale: see the module docstring — one aggregate + one per-group grid
    explode + two windows, all shuffling on the group key only. An
    ungrouped resample (group_cols=None) is a single global series; its
    windows run unpartitioned by necessity, which is fine because the
    grid is span/step rows regardless of input size.
    """
    if agg not in _AGGS:
        raise ValueError(f"resample: unknown agg {agg!r} (use {sorted(_AGGS)})")
    if fill not in ("none", "zero", "ffill", "linear"):
        raise ValueError(f"resample: unknown fill {fill!r}")
    groups = list(group_cols or [])

    bucket = time_bucket(ts_col, step_seconds).alias("__b")
    agged = (
        df.select(*groups, bucket, F.col(value_col).alias("__v"))
        .groupBy(*groups, "__b")
        .agg(
            _AGGS[agg]("__v").alias("__val"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )

    step = F.expr(f"interval {int(step_seconds)} seconds")
    grid = (
        agged.groupBy(*groups)
        .agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
        .select(
            *groups,
            F.explode(F.sequence(F.col("__lo"), F.col("__hi"), step)).alias(
                "__b"
            ),
        )
    )
    dense = grid.join(agged, [*groups, "__b"], "left").withColumn(
        "n_events", F.coalesce(F.col("n_events"), F.lit(0))
    )

    w = Window.partitionBy(*groups).orderBy("__b") if groups else (
        Window.orderBy("__b")
    )
    if fill == "zero":
        val = F.coalesce(F.col("__val"), F.lit(0.0))
    elif fill == "ffill":
        val = F.last("__val", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
    elif fill == "linear":
        obs = F.when(
            F.col("__val").isNotNull(),
            F.struct(
                F.unix_timestamp("__b").alias("t"), F.col("__val").alias("v")
            ),
        )
        prev = F.last(obs, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
        nxt = F.first(obs, ignorenulls=True).over(
            w.rowsBetween(0, Window.unboundedFollowing)
        )
        t = F.unix_timestamp("__b")
        frac = (t - prev["t"]) / (nxt["t"] - prev["t"])
        val = (
            F.when(F.col("__val").isNotNull(), F.col("__val"))
            .when(
                prev.isNotNull() & nxt.isNotNull(),
                prev["v"] + (nxt["v"] - prev["v"]) * frac,
            )
            .otherwise(F.coalesce(prev["v"], nxt["v"]))
        )
    else:
        val = F.col("__val")

    if round_to is not None:
        val = F.round(val, round_to)
    return dense.select(
        *groups,
        F.col("__b").alias("bucket_ts"),
        val.alias("value"),
        "n_events",
    )
