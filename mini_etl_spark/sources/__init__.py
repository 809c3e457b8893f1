"""Source readers — each returns a ``SparkSession -> DataFrame`` closure.

Reference parity (mini_etl/components/extractors.py): every extractor there
yields pandas chunks; here each reader declares a distributed scan. Chunk
size disappears — Spark splits files by ``spark.sql.files.maxPartitionBytes``
and JDBC by ``partitionColumn/numPartitions``. Column pruning and predicate
pushdown, which the reference exposed as manual knobs (``columns=``,
hand-written SQL), are automatic through Catalyst; explicit ``columns=`` is
still honored as an eager projection hint.

| reader        | reference                                   |
|---------------|---------------------------------------------|
| read_csv      | CSVExtractor      extractors.py:19-76       |
| read_json     | JSONExtractor     extractors.py:79-148      |
| read_excel    | ExcelExtractor    extractors.py:151-220     |
| read_parquet  | ParquetExtractor  extractors.py:223-282     |
| read_jdbc     | SQLExtractor      extractors.py:285-356     |
| read_api      | APIExtractor      extractors.py:359-523     |
| from_memory   | InMemoryExtractor extractors.py:526-561     |
"""

from mini_etl_spark.sources.dbapi import read_dbapi
from mini_etl_spark.sources.files import (
    read_binary_files,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_text,
    read_xml,
)
from mini_etl_spark.sources.jdbc import read_jdbc
from mini_etl_spark.sources.local import from_memory, read_excel
from mini_etl_spark.sources.api import read_api
from mini_etl_spark.sources.warc import read_warc

__all__ = [
    "read_csv",
    "read_json",
    "read_parquet",
    "read_orc",
    "read_xml",
    "read_text",
    "read_binary_files",
    "read_excel",
    "read_jdbc",
    "read_dbapi",
    "read_api",
    "read_warc",
    "from_memory",
]
