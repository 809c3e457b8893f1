"""Global sort.

Reference parity: SortTransformer (transformers.py:550-577) sorted each chunk
independently — an artifact. Here ``sort_rows`` is a true global sort
(SURVEY §4.3.2): Spark range-partitions on a sample of the sort key, then
sorts each partition locally — the standard distributed sort, no driver
materialization, spills to disk when partitions exceed memory.

Scale note: a global sort is a full shuffle; only sort when the *output*
must be totally ordered (e.g. writing a sorted export). For top-k use
``df.orderBy(...).limit(k)`` which Catalyst executes as TakeOrderedAndProject
(no full sort).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Transform = Callable[[DataFrame], DataFrame]


def sort_rows(
    by: str | list[str],
    ascending: bool | list[bool] = True,
) -> Transform:
    cols = [by] if isinstance(by, str) else list(by)
    if isinstance(ascending, bool):
        asc = [ascending] * len(cols)
    else:
        asc = list(ascending)
        if len(asc) != len(cols):
            raise ValueError("sort_rows: ascending list must match by list")

    def _apply(df: DataFrame) -> DataFrame:
        ordering = [F.col(c).asc() if a else F.col(c).desc() for c, a in zip(cols, asc)]
        return df.orderBy(*ordering)

    return _apply
