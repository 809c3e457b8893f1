"""JDBC scan (⇐ SQLExtractor, extractors.py:285-356).

The reference used SQLAlchemy + a server-side cursor for chunking
(extractors.py:330-344); here the database itself partitions the scan:
``partition_column/num_partitions/lower_bound/upper_bound`` issue N parallel
range queries — the distributed analogue of its ``chunksize``.

The query-vs-table exclusivity check mirrors extractors.py:320-323.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

Source = Callable[[SparkSession], DataFrame]


def read_jdbc(
    url: str,
    table: str | None = None,
    query: str | None = None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: Any | None = None,
    upper_bound: Any | None = None,
    properties: dict[str, str] | None = None,
    **options: Any,
) -> Source:
    if (table is None) == (query is None):
        raise ValueError("read_jdbc: provide exactly one of table= or query=")
    if partition_column is not None:
        if table is None:
            raise ValueError("read_jdbc: partitioned reads require table=, not query=")
        if num_partitions is None or lower_bound is None or upper_bound is None:
            raise ValueError(
                "read_jdbc: partition_column requires num_partitions, "
                "lower_bound and upper_bound"
            )

    def _read(spark: SparkSession) -> DataFrame:
        reader = spark.read.format("jdbc").option("url", url)
        if table is not None:
            reader = reader.option("dbtable", table)
        else:
            reader = reader.option("query", query)
        if partition_column is not None:
            reader = (
                reader.option("partitionColumn", partition_column)
                .option("numPartitions", str(num_partitions))
                .option("lowerBound", str(lower_bound))
                .option("upperBound", str(upper_bound))
            )
        for k, v in (properties or {}).items():
            reader = reader.option(k, v)
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load()

    return _read
