"""Driver-local sources: in-memory frames and Excel.

Excel is inherently non-splittable and small (the reference also read the
whole sheet then sliced, extractors.py:151-220) — it is read driver-side
with pandas and parallelized into a DataFrame. Gated behind an import-try:
openpyxl is not in every environment.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

Source = Callable[[SparkSession], DataFrame]


def from_memory(data: Any, schema: Any | None = None) -> Source:
    """In-memory source (⇐ InMemoryExtractor, extractors.py:526-561): a pandas
    DataFrame, list of dicts/Rows, or list of pandas DataFrames (the
    reference accepted a chunk list — concatenated here)."""

    def _read(spark: SparkSession) -> DataFrame:
        payload = data
        if isinstance(payload, list) and payload and isinstance(payload[0], pd.DataFrame):
            payload = pd.concat(payload, ignore_index=True)
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
    necessity; raises a clear error when no Excel engine is installed."""

    def _read(spark: SparkSession) -> DataFrame:
        try:
            pdf = pd.read_excel(path, sheet_name=sheet_name, **kwargs)
        except ImportError as exc:  # openpyxl missing
            raise NotImplementedError(
                "read_excel requires an Excel engine (openpyxl/xlrd) which is "
                "not installed in this environment"
            ) from exc
        return spark.createDataFrame(pdf)

    return _read
