"""Parallelism utilities — the reference's parallel layer, re-based on Spark.

Reference parity (mini_etl/core/parallel.py) — and what remains of it once
Spark owns scheduling:

| reference                              | here                                |
|----------------------------------------|-------------------------------------|
| ParallelTransformer (thread/proc pool  | **no-op**: Spark's task scheduler   |
|   over chunks, parallel.py:35-129)     | already runs partitions in parallel |
| ParallelConfig.workers (parallel.py:22)| session parallelism / repartition   |
| StreamBuffer (parallel.py:132-166)     | internal to Spark exchanges — gone  |
| parallel_map (parallel.py:169-201)     | :func:`parallel_map` → mapInPandas  |
| ChunkBalancer (parallel.py:204-245)    | :func:`rebalance` → repartition /   |
|                                        | coalesce (+ AQE auto-coalescing)    |

Only the two functions with real user-facing value survive; the rest is
deliberately absent (SURVEY §2.5: "No-op: Spark's task scheduler already
parallelizes partitions").
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame


def parallel_map(
    df: DataFrame,
    func: Callable[[pd.DataFrame], pd.DataFrame],
    schema: Any,
) -> DataFrame:
    """Parallel chunk map (⇐ parallel_map, parallel.py:169-201): ``func``
    runs once per Arrow batch on executors. Identical to
    ``operators.map_batches`` — exposed under the reference's name."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            out = func(pdf)
            if out is not None and len(out):
                yield out

    return df.mapInPandas(_gen, schema=schema)


def rebalance(
    df: DataFrame,
    num_partitions: int,
    by: str | list[str] | None = None,
) -> DataFrame:
    """Partition rebalancing (⇐ ChunkBalancer, parallel.py:204-245).

    - shrink without shuffle: ``coalesce``
    - grow or key-partition: ``repartition`` (hash on ``by`` when given, so
      a following join/agg on those keys avoids its own shuffle)

    With AQE enabled (the session default) output partitions are also
    auto-coalesced to target size after every shuffle — prefer leaving
    balancing to AQE unless a specific key layout is needed.
    """
    current = df.rdd.getNumPartitions()
    if by is not None:
        cols = [by] if isinstance(by, str) else list(by)
        return df.repartition(num_partitions, *cols)
    if num_partitions < current:
        return df.coalesce(num_partitions)
    return df.repartition(num_partitions)
