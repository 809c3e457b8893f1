"""Sink writers — each returns a ``DataFrame -> None`` closure whose call is
the pipeline's action.

Reference parity (mini_etl/components/loaders.py):

| writer         | reference                               |
|----------------|-----------------------------------------|
| to_csv         | CSVLoader       loaders.py:18-99        |
| to_json        | JSONLoader      loaders.py:102-194      |
| to_jdbc        | SQLLoader       loaders.py:197-276      |
| to_parquet     | ParquetLoader   loaders.py:279-378      |
| to_excel       | ExcelLoader     loaders.py:381-450      |
| multi_sink     | MultiLoader     loaders.py:453-484      |
| null_sink      | NullLoader      loaders.py:487-509      |
| callback_sink  | CallbackLoader  loaders.py:512-546      |

Mode vocabulary follows the reference (`w`/`a` → overwrite/append,
``if_exists`` fail/replace/append → error/overwrite/append).

Scale stance: all file writers emit distributed multi-part output by
default. ``single_file=True`` (needed for pandas-style one-file parity)
coalesces to one partition — documented as a deliberate non-scalable
convenience, exactly like the reference's buffering loaders were bounded by
driver memory (SURVEY §4.2). Excel and JSON-array are inherently
driver-local and warn, as the reference warned (loaders.py:129-133).
"""

from mini_etl_spark.sinks.dbapi import to_dbapi
from mini_etl_spark.sinks.writers import (
    callback_sink,
    multi_sink,
    null_sink,
    to_csv,
    to_excel,
    to_jdbc,
    to_json,
    to_orc,
    to_parquet,
    to_parquet_bucketed,
    to_xml,
)

from mini_etl_spark.sinks.shards import read_shard_manifest, to_training_shards

__all__ = [
    "to_csv",
    "to_training_shards",
    "read_shard_manifest",
    "to_json",
    "to_parquet",
    "to_orc",
    "to_xml",
    "to_parquet_bucketed",
    "to_jdbc",
    "to_dbapi",
    "to_excel",
    "multi_sink",
    "null_sink",
    "callback_sink",
]
