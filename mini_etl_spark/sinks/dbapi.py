"""DBAPI (PEP 249) writer — driver-side twin of ``to_jdbc`` for embedded
databases (SQLite first; ⇐ SQLLoader, loaders.py:197-276, whose test
fixtures are SQLite).

Streaming contract: rows flow through ``toLocalIterator`` one partition at
a time and are flushed with ``executemany`` per ``batch_size`` rows —
driver memory is bounded by a partition, never the full result (the same
contract as ``callback_sink(driver_side=True)``). For parallel writes to a
database server, use ``to_jdbc`` (one connection per partition on the
executors).
"""

from __future__ import annotations

import logging
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame

logger = logging.getLogger(__name__)

Sink = Callable[[DataFrame], None]
ConnectFn = Callable[[], Any]

# Spark simpleString dtype → portable SQL column type (SQLite/ANSI-friendly)
_SQL_TYPES = {
    "tinyint": "INTEGER",
    "smallint": "INTEGER",
    "int": "INTEGER",
    "bigint": "BIGINT",
    "float": "REAL",
    "double": "DOUBLE PRECISION",
    "string": "TEXT",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
}


def _create_table_sql(df: DataFrame, table: str) -> str:
    cols = []
    for f in df.schema.fields:
        sql_t = _SQL_TYPES.get(f.dataType.simpleString())
        if sql_t is None:
            # decimals and friends: keep the engine permissive
            sql_t = "NUMERIC" if f.dataType.simpleString().startswith("decimal") else "TEXT"
        cols.append(f"{f.name} {sql_t}")
    return f"CREATE TABLE {table} ({', '.join(cols)})"


def to_dbapi(
    connect: ConnectFn,
    table: str,
    if_exists: str = "fail",
    batch_size: int = 10_000,
    max_rows: int | None = None,
) -> Sink:
    """Write a DataFrame into a DBAPI database table.

    ``if_exists`` follows the reference's SQLLoader vocabulary
    (loaders.py:264-266): ``fail`` | ``replace`` | ``append``.

    Driver-side by design (one DBAPI connection, ``toLocalIterator``
    streaming — bounded memory, but serial): ``max_rows`` makes the size
    guard an error — the stream aborts before COMMIT once the bound
    passes, so a transactional target keeps nothing. Without it a single
    warning fires past 1M rows (the "this path is for small data" rail,
    mirroring the reference's JSON-array warning)."""
    if if_exists not in ("fail", "replace", "append"):
        raise ValueError("to_dbapi: if_exists must be fail|replace|append")

    def _write(df: DataFrame) -> None:
        conn = connect()
        try:
            cur = conn.cursor()
            exists = True
            try:
                cur.execute(f"SELECT 1 FROM {table} WHERE 1=0")
            except Exception:
                exists = False
                if hasattr(conn, "rollback"):
                    conn.rollback()
            if exists and if_exists == "fail":
                raise ValueError(f"to_dbapi: table {table!r} exists (if_exists='fail')")
            if exists and if_exists == "replace":
                cur.execute(f"DROP TABLE {table}")
                exists = False
            if not exists:
                cur.execute(_create_table_sql(df, table))
            placeholders = ", ".join(["?"] * len(df.columns))
            insert = f"INSERT INTO {table} VALUES ({placeholders})"
            from mini_etl_spark.sinks.writers import DRIVER_PATH_WARN_ROWS

            buf: list[tuple] = []
            written, warned = 0, False
            for row in df.toLocalIterator(prefetchPartitions=False):
                written += 1
                if max_rows is not None and written > max_rows:
                    # abort BEFORE commit: a transactional target keeps none
                    raise ValueError(
                        f"to_dbapi: result exceeds max_rows={max_rows} — "
                        "this serial driver-side path is for small data; "
                        "raise max_rows or use the partitioned JDBC sink"
                    )
                if not warned and written > DRIVER_PATH_WARN_ROWS:
                    warned = True
                    logger.warning(
                        "to_dbapi streaming >%d rows through one driver "
                        "connection — prefer the partitioned JDBC sink",
                        DRIVER_PATH_WARN_ROWS,
                    )
                buf.append(tuple(row))
                if len(buf) >= batch_size:
                    cur.executemany(insert, buf)
                    buf = []
            if buf:
                cur.executemany(insert, buf)
            conn.commit()
        finally:
            conn.close()

    return _write
