"""mini_etl_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference library *yoadjei/mini-etl* (a pandas chunk-stream ETL toolkit),
re-expressed idiomatically on Spark DataFrames / SQL:

- the reference's *stream of pandas chunks* (``mini_etl/core/base.py:5-20``)
  becomes a lazy, partitioned :class:`pyspark.sql.DataFrame`;
- its generator chain becomes the Catalyst logical plan;
- its sink-driven iteration becomes the write action;
- chunk sizing / manual parallelism / partial-agg merging disappear into
  Spark partitioning, task scheduling and ``HashAggregateExec``.

Public surface (see SURVEY.md §2 for the inventory this covers):

- :mod:`mini_etl_spark.session`   — SparkSession factory
- :mod:`mini_etl_spark.sources`   — CSV/JSON/Parquet/JDBC/Excel/API/in-memory readers
- :mod:`mini_etl_spark.sinks`     — CSV/JSON/Parquet/JDBC/Excel/multi/null/callback writers
- :mod:`mini_etl_spark.operators` — transform factories (filter, rename, select,
  drop, cast, fillna, expression, group_agg, dedup, sort, map_batches, joins)
- :mod:`mini_etl_spark.schema`    — declared schemas + validate/coerce
- :mod:`mini_etl_spark.pipeline`  — Pipeline / PipelineBuilder
- :mod:`mini_etl_spark.config`    — YAML/JSON pipeline compiler
- :mod:`mini_etl_spark.dag`       — multi-source DAG (concat/join/union/branch)
- :mod:`mini_etl_spark.functions` — scale extensions: text analysis, dedup
  (exact/MinHash-LSH/SimHash/Jaccard/embedding), similarity search, multimodal
- :mod:`mini_etl_spark.streaming` — Structured Streaming helpers (events table)
- :mod:`mini_etl_spark.monitor` / :mod:`mini_etl_spark.ui` — run-history
  reports (static HTML/JSON) and the live stdlib-HTTP dashboard
- :mod:`mini_etl_spark.scheduler` / :mod:`mini_etl_spark.retry` — thin utilities
"""

from mini_etl_spark.session import get_spark
from mini_etl_spark.pipeline import Pipeline, PipelineBuilder
from mini_etl_spark.schema import ColumnSchema, Schema, SchemaValidator

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "Pipeline",
    "PipelineBuilder",
    "ColumnSchema",
    "Schema",
    "SchemaValidator",
    "__version__",
]
