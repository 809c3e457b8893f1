"""Global deduplication.

Reference parity: DeduplicateTransformer (transformers.py:522-547) — pandas
``drop_duplicates(subset, keep)`` per chunk, so cross-chunk duplicates
survived. Here dedup is **global** (SURVEY §4.3.2).

``keep`` semantics vs distributed reality (SURVEY §4.3.3): pandas' first/last
rely on implicit row order, which a distributed table does not have. So:

- ``keep="any"`` (default) → ``dropDuplicates`` — cheapest, a hash aggregate
  on the subset; use when any representative is fine.
- ``keep="first"`` / ``"last"`` → require ``order_by``; implemented with
  ``row_number()`` over a window partitioned by the subset.
- ``keep=False`` → keep only rows whose key appears exactly once (count-over-
  window == 1).

At 100 TB the window variants shuffle once on the subset keys — identical
cost shape to groupBy; skew on hot keys is handled by AQE. For exact full-row
dedup at scale prefer ``keep="any"`` which avoids the window sort.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Transform = Callable[[DataFrame], DataFrame]


def deduplicate(
    subset: list[str] | None = None,
    keep: str | bool = "any",
    order_by: str | list[str] | None = None,
) -> Transform:
    if keep in ("first", "last") and order_by is None:
        raise ValueError(
            "deduplicate: keep='first'/'last' requires order_by= "
            "(a distributed table has no implicit row order)"
        )
    if keep not in ("any", "first", "last", False):
        raise ValueError(f"deduplicate: invalid keep={keep!r}")

    def _apply(df: DataFrame) -> DataFrame:
        cols = subset or df.columns
        if keep == "any":
            return df.dropDuplicates(cols)
        order_cols = [order_by] if isinstance(order_by, str) else list(order_by or [])
        w = Window.partitionBy(*cols)
        if keep is False:
            marked = df.withColumn("__n", F.count(F.lit(1)).over(w))
            return marked.filter(F.col("__n") == 1).drop("__n")
        ordering = [
            F.col(c).asc() if keep == "first" else F.col(c).desc() for c in order_cols
        ]
        marked = df.withColumn("__rn", F.row_number().over(w.orderBy(*ordering)))
        return marked.filter(F.col("__rn") == 1).drop("__rn")

    return _apply
