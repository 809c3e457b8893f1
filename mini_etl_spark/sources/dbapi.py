"""DBAPI (PEP 249) scan — the driver-side twin of :mod:`.jdbc` for embedded
databases reachable only from Python (SQLite first among them; the reference's
SQLExtractor/SQLLoader test fixtures are SQLite files,
extractors.py:285-356, tests/conftest.py).

Scale stance: this path deliberately runs on the DRIVER — it exists for
dimension-table-scale data (lookup tables, config, test fixtures), where a
single cursor is the right tool. Reads are chunked (``fetchmany`` →
arrow-backed ``createDataFrame``), so driver memory is bounded by
``chunk_size`` rows at a time only during transfer. For fact-table scans
against a real database server, use :func:`mini_etl_spark.sources.read_jdbc`
— executors issue N parallel range queries there.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

Source = Callable[[SparkSession], DataFrame]

# DBAPI connection factory, e.g. ``lambda: sqlite3.connect(path)`` — a
# factory, not a live connection, so the source closure stays re-runnable.
ConnectFn = Callable[[], Any]


def read_dbapi(
    connect: ConnectFn,
    table: str | None = None,
    query: str | None = None,
    chunk_size: int = 50_000,
    schema: str | None = None,
) -> Source:
    """Read a table or query through any PEP 249 connection.

    Exactly one of ``table``/``query`` (mirrors read_jdbc and the
    reference's exclusivity check, extractors.py:320-323). ``schema`` (DDL
    string) pins dtypes — required when the result can be empty (nothing to
    infer from)."""
    if (table is None) == (query is None):
        raise ValueError("read_dbapi: provide exactly one of table= or query=")
    sql = query if query is not None else f"SELECT * FROM {table}"

    def _read(spark: SparkSession) -> DataFrame:
        import pandas as pd

        conn = connect()
        try:
            cur = conn.cursor()
            cur.execute(sql)
            cols = [d[0] for d in cur.description]
            frames = []
            while True:
                rows = cur.fetchmany(chunk_size)
                if not rows:
                    break
                frames.append(pd.DataFrame.from_records(rows, columns=cols))
            if not frames:
                frames = [pd.DataFrame(columns=cols)]
            pdf = pd.concat(frames, ignore_index=True)
        finally:
            conn.close()
        if schema is not None:
            return spark.createDataFrame(pdf, schema=schema)
        return spark.createDataFrame(pdf)

    return _read
