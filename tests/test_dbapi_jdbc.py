"""Live SQL round-trips — the reference's SQLExtractor/SQLLoader are
exercised against SQLite fixtures (tests/conftest.py there); here both SQL
paths run for real:

- **DBAPI** (driver-side, SQLite): ``to_dbapi`` → ``read_dbapi`` round-trip
  with the reference's full ``if_exists`` vocabulary.
- **JDBC** (executor-side, Derby embedded — the JDBC engine Spark ships
  in its own classpath): ``to_jdbc`` → ``read_jdbc`` round-trip including
  a partitioned (parallel range-query) read.
"""

from __future__ import annotations

import sqlite3

import pytest

from mini_etl_spark.sinks import to_dbapi, to_jdbc
from mini_etl_spark.sources import read_dbapi, read_jdbc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def sample(spark):
    return spark.createDataFrame(
        [(i, f"name_{i}", float(i) * 1.5) for i in range(100)],
        "id bigint, name string, score double",
    )


# -- DBAPI / SQLite -----------------------------------------------------------

def test_sqlite_write_read_roundtrip(spark, sample, tmp_path):
    db = str(tmp_path / "t.db")
    connect = lambda: sqlite3.connect(db)  # noqa: E731
    to_dbapi(connect, "people")(sample)
    back = read_dbapi(connect, table="people")(spark)
    assert back.count() == 100
    assert set(back.columns) == {"id", "name", "score"}
    assert back.exceptAll(sample).count() == 0
    assert sample.exceptAll(back).count() == 0


def test_sqlite_if_exists_vocabulary(spark, sample, tmp_path):
    db = str(tmp_path / "t.db")
    connect = lambda: sqlite3.connect(db)  # noqa: E731
    to_dbapi(connect, "t")(sample)
    with pytest.raises(ValueError, match="exists"):
        to_dbapi(connect, "t", if_exists="fail")(sample)
    to_dbapi(connect, "t", if_exists="append")(sample)
    assert read_dbapi(connect, table="t")(spark).count() == 200
    to_dbapi(connect, "t", if_exists="replace")(sample.limit(10))
    assert read_dbapi(connect, table="t")(spark).count() == 10


def test_sqlite_query_and_chunked_batches(spark, sample, tmp_path):
    db = str(tmp_path / "t.db")
    connect = lambda: sqlite3.connect(db)  # noqa: E731
    # small batch_size exercises the executemany flush loop
    to_dbapi(connect, "t", batch_size=7)(sample)
    out = read_dbapi(connect, query="SELECT id, score FROM t WHERE id < 10", chunk_size=3)(spark)
    assert out.count() == 10
    assert set(out.columns) == {"id", "score"}


def test_read_dbapi_empty_needs_schema(spark, sample, tmp_path):
    db = str(tmp_path / "t.db")
    connect = lambda: sqlite3.connect(db)  # noqa: E731
    to_dbapi(connect, "t")(sample)
    out = read_dbapi(
        connect, query="SELECT id FROM t WHERE id < 0", schema="id bigint"
    )(spark)
    assert out.count() == 0
    assert out.schema.simpleString() == "struct<id:bigint>"


def test_dbapi_validation():
    with pytest.raises(ValueError, match="exactly one"):
        read_dbapi(lambda: None)
    with pytest.raises(ValueError, match="exactly one"):
        read_dbapi(lambda: None, table="t", query="SELECT 1")
    with pytest.raises(ValueError, match="if_exists"):
        to_dbapi(lambda: None, "t", if_exists="nope")


# -- JDBC / Derby embedded ----------------------------------------------------

def test_jdbc_write_read_roundtrip(spark, sample, tmp_path):
    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    to_jdbc(url, "people", mode="overwrite", properties={"driver": DERBY_DRIVER})(sample)
    back = read_jdbc(url, table="people", properties={"driver": DERBY_DRIVER})(spark)
    assert back.count() == 100
    assert back.exceptAll(sample).count() == 0
    assert sample.exceptAll(back).count() == 0


def test_jdbc_partitioned_parallel_read(spark, sample, tmp_path):
    """The scale path: N executors issue N range queries in parallel."""
    url = f"jdbc:derby:{tmp_path}/derbydb2;create=true"
    to_jdbc(url, "people", mode="overwrite", properties={"driver": DERBY_DRIVER})(sample)
    back = read_jdbc(
        url,
        table="people",
        partition_column="id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=100,
        properties={"driver": DERBY_DRIVER},
    )(spark)
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100


def test_jdbc_append_mode(spark, sample, tmp_path):
    url = f"jdbc:derby:{tmp_path}/derbydb3;create=true"
    props = {"driver": DERBY_DRIVER}
    to_jdbc(url, "t", mode="overwrite", properties=props)(sample)
    to_jdbc(url, "t", mode="append", properties=props)(sample.limit(20))
    assert read_jdbc(url, table="t", properties=props)(spark).count() == 120
