"""Driver-local sources: in-memory frames and Excel.

Excel is inherently non-splittable and small (the reference also read the
whole sheet then sliced, extractors.py:151-220) — it is read driver-side
with pandas and parallelized into a DataFrame. Gated behind an import-try:
openpyxl is not in every environment.
"""

from __future__ import annotations

import logging
from collections.abc import Callable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

logger = logging.getLogger(__name__)

Source = Callable[[SparkSession], DataFrame]


def from_memory(data: Any, schema: Any | None = None) -> Source:
    """In-memory source (⇐ InMemoryExtractor, extractors.py:526-561): a pandas
    DataFrame, list of dicts/Rows, or list of pandas DataFrames (the
    reference accepted a chunk list — concatenated here).

    Driver-side by definition (the payload already lives in driver
    memory); past 1M rows a warning fires — createDataFrame serializes
    the whole payload through the driver, so big corpora should land on
    storage and come in through a distributed scan instead."""

    def _read(spark: SparkSession) -> DataFrame:
        payload = data
        if isinstance(payload, list) and payload and isinstance(payload[0], pd.DataFrame):
            payload = pd.concat(payload, ignore_index=True)
        try:
            n = len(payload)
        except TypeError:
            n = -1
        if n > 1_000_000:
            logger.warning(
                "from_memory serializing %d rows through the driver — "
                "this source is for small data; write to storage and use "
                "a distributed scan instead", n,
            )
        if schema is not None:
            return spark.createDataFrame(payload, schema=schema)
        return spark.createDataFrame(payload)

    return _read


def read_excel(
    path: str,
    sheet_name: Any = 0,
    **kwargs: Any,
) -> Source:
    """Excel scan (⇐ ExcelExtractor, extractors.py:151-220). Driver-side by
    necessity. Prefers pandas' engine (openpyxl) when installed; otherwise
    falls back to the bundled pure-stdlib codec (``mini_etl_spark.xlsx``),
    so the surface works in engine-less environments too."""

    def _read(spark: SparkSession) -> DataFrame:
        try:
            pdf = pd.read_excel(path, sheet_name=sheet_name, **kwargs)
        except ImportError:  # openpyxl missing → stdlib codec
            from mini_etl_spark.xlsx import read_xlsx

            pdf = read_xlsx(path, sheet_name=sheet_name)
        return spark.createDataFrame(pdf)

    return _read
