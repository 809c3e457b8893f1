"""Pipeline orchestration: compose source → transforms → sink, lazily.

Reference parity: ``Pipeline`` (mini_etl/core/pipeline.py:19-279) and
``PipelineBuilder`` (pipeline.py:281-375). The reference chains pandas
generators and lets the sink's ``load()`` pull chunks (pipeline.py:124-138);
here the chain *is* the Catalyst logical plan and the sink's write action
triggers execution. Nothing materializes on the driver.

Stats parity (pipeline.py:146-153): ``{rows, duration, rows_per_second,
errors}`` — row count measured with ``df.observe`` (a streaming-safe
accumulator evaluated during the one write job, no second scan). The
reference's ``chunks`` counter is intentionally not reported: it has no
clean distributed meaning (partition counts shift under AQE), and SURVEY
§3.1 marks it as an implementation detail.

Error modes (pipeline.py:44, 162-191): the reference drops a whole failing
*chunk* in skip mode — an artifact of chunked execution. Here (SURVEY §4.3.4)
``on_error="skip"/"log"`` degrade to catching the job failure; *row-level*
skipping belongs to the sources (PERMISSIVE mode) and casts (try_cast),
which is strictly finer-grained.
"""

from __future__ import annotations

import logging
import time
import uuid
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from mini_etl_spark import operators as ops
from mini_etl_spark.session import get_spark

logger = logging.getLogger(__name__)

Source = Callable[[SparkSession], DataFrame]
Transform = Callable[[DataFrame], DataFrame]
Sink = Callable[[DataFrame], None]


class Pipeline:
    """Fluent pipeline: ``set_source → add_transformer* → set_sink → run``.

    The fluent, type-checked builder surface mirrors the reference
    (pipeline.py:64-83) but every stage is a plain function:
    sources are ``SparkSession -> DataFrame``, transforms are
    ``DataFrame -> DataFrame``, sinks are ``DataFrame -> None``.
    """

    def __init__(
        self,
        name: str = "pipeline",
        on_error: str = "raise",
        spark: SparkSession | None = None,
    ) -> None:
        if on_error not in ("raise", "skip", "log"):
            raise ValueError(f"on_error must be raise|skip|log, got {on_error!r}")
        self.name = name
        self.error_mode = on_error
        self._spark = spark
        self._source: Source | None = None
        self._transforms: list[Transform] = []
        self._sink: Sink | None = None
        self._on_start: list[Callable[[], None]] = []
        self._on_complete: list[Callable[[dict], None]] = []
        self._on_error_cbs: list[Callable[[Exception], None]] = []
        self.stats: dict[str, Any] = {}
        self.history: list[dict[str, Any]] = []

    # -- fluent construction ------------------------------------------------
    def set_source(self, source: Source | DataFrame) -> "Pipeline":
        if isinstance(source, DataFrame):
            df = source
            source = lambda spark: df  # noqa: E731
        if not callable(source):
            raise TypeError("source must be a DataFrame or SparkSession -> DataFrame")
        self._source = source
        return self

    def add_transformer(self, transform: Transform) -> "Pipeline":
        if not callable(transform):
            raise TypeError("transformer must be DataFrame -> DataFrame")
        self._transforms.append(transform)
        return self

    def set_sink(self, sink: Sink) -> "Pipeline":
        if not callable(sink):
            raise TypeError("sink must be DataFrame -> None")
        self._sink = sink
        return self

    def with_schema(self, schema, coerce: bool = True, on_error: str = "raise") -> "Pipeline":
        """Wire schema validation/coercion into the stream, as the reference
        did with ``validate_schema=True`` (pipeline.py:134-135, 233-246).
        Appended as a transform stage so it runs after prior transforms."""
        from mini_etl_spark.schema import Schema, SchemaValidator

        if isinstance(schema, dict):
            schema = Schema.from_dict(schema)
        validator = SchemaValidator(schema, coerce=coerce, on_error=on_error)
        return self.add_transformer(validator.as_transform())

    def on_start(self, cb: Callable[[], None]) -> "Pipeline":
        self._on_start.append(cb)
        return self

    def on_complete(self, cb: Callable[[dict], None]) -> "Pipeline":
        self._on_complete.append(cb)
        return self

    def on_error(self, cb: Callable[[Exception], None]) -> "Pipeline":
        self._on_error_cbs.append(cb)
        return self

    # -- plan assembly ------------------------------------------------------
    def dataframe(self, spark: SparkSession | None = None) -> DataFrame:
        """Build the composed (still lazy) DataFrame without running a sink."""
        if self._source is None:
            raise ValueError("pipeline has no source")
        spark = spark or self._spark or get_spark()
        df = self._source(spark)
        for t in self._transforms:
            df = t(df)
        return df

    def explain(self, mode: str = "formatted") -> None:
        self.dataframe().explain(mode)

    # -- execution ----------------------------------------------------------
    def run(self, spark: SparkSession | None = None) -> dict[str, Any]:
        if self._source is None:
            raise ValueError("pipeline has no source")
        if self._sink is None:
            raise ValueError("pipeline has no sink")
        for cb in self._on_start:
            cb()
        start = time.monotonic()
        stats: dict[str, Any] = {"name": self.name, "rows": 0, "errors": 0}
        try:
            df = self.dataframe(spark)
            if df.isStreaming:
                # Streaming pipelines: the sink runs a checkpointed
                # availableNow query and returns it. Row stats come from a
                # NAMED observe — the file sink reports numOutputRows=-1
                # and the batch Observation API blocks, but named observed
                # metrics ride in every micro-batch progress. The session
                # raises numRecentProgressUpdates to 10k so the ring
                # buffer covers any availableNow backlog; a continuously
                # running service should attach a StreamingQueryListener
                # instead of reading recentProgress after the fact. Same
                # pipeline definition, incremental execution — the config
                # surface's `stream: true` flag.
                obs_name = f"stats_{uuid.uuid4().hex[:8]}"
                observed = df.observe(obs_name, F.count(F.lit(1)).alias("rows"))
                query = self._sink(observed)
                rows = 0
                for p in getattr(query, "recentProgress", None) or []:
                    metrics = (
                        p.get("observedMetrics")
                        if isinstance(p, dict)
                        else p.observedMetrics
                    ) or {}
                    m = metrics.get(obs_name)
                    if m is not None:
                        rows += int(m["rows"] if not hasattr(m, "rows") else m.rows)
                stats["rows"] = rows
            else:
                obs = Observation(f"stats_{uuid.uuid4().hex[:8]}")
                observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
                self._sink(observed)
                stats["rows"] = int(obs.get.get("rows", 0))
        except Exception as exc:  # noqa: BLE001
            stats["errors"] = 1
            for cb in self._on_error_cbs:
                cb(exc)
            if self.error_mode == "raise":
                raise
            log = logger.error if self.error_mode == "log" else logger.warning
            log("pipeline %s failed (%s mode): %s", self.name, self.error_mode, exc)
        duration = time.monotonic() - start
        stats["duration"] = duration
        stats["rows_per_second"] = stats["rows"] / duration if duration > 0 else 0.0
        self.stats = stats
        self.history.append(stats)
        for cb in self._on_complete:
            cb(stats)
        return stats

    # -- lifecycle helpers (reference: pipeline.py:248-270) ------------------
    def copy(self) -> "Pipeline":
        clone = Pipeline(self.name, self.error_mode, self._spark)
        clone._source = self._source
        clone._transforms = list(self._transforms)
        clone._sink = self._sink
        return clone

    def clear(self) -> "Pipeline":
        self._source = None
        self._transforms = []
        self._sink = None
        return self


class PipelineBuilder:
    """Fluent builder façade (reference: pipeline.py:281-375) —
    ``from_*`` source, chained transforms, ``to_*`` sink, ``build()``."""

    def __init__(self, name: str = "pipeline") -> None:
        self._pipeline = Pipeline(name)

    # sources
    def from_csv(self, path: str, **options: Any) -> "PipelineBuilder":
        from mini_etl_spark.sources import read_csv

        self._pipeline.set_source(read_csv(path, **options))
        return self

    def from_json(self, path: str, **options: Any) -> "PipelineBuilder":
        from mini_etl_spark.sources import read_json

        self._pipeline.set_source(read_json(path, **options))
        return self

    def from_parquet(self, path: str, **options: Any) -> "PipelineBuilder":
        from mini_etl_spark.sources import read_parquet

        self._pipeline.set_source(read_parquet(path, **options))
        return self

    def from_sql(self, url: str, **options: Any) -> "PipelineBuilder":
        from mini_etl_spark.sources import read_jdbc

        self._pipeline.set_source(read_jdbc(url, **options))
        return self

    def from_dataframe(self, df: DataFrame) -> "PipelineBuilder":
        self._pipeline.set_source(df)
        return self

    # transforms
    def filter(self, condition: str) -> "PipelineBuilder":
        self._pipeline.add_transformer(ops.filter_rows(condition))
        return self

    def rename(self, columns: dict[str, str]) -> "PipelineBuilder":
        self._pipeline.add_transformer(ops.rename_columns(columns))
        return self

    def select(self, columns: list[str]) -> "PipelineBuilder":
        self._pipeline.add_transformer(ops.select_columns(columns))
        return self

    def drop(self, columns: list[str]) -> "PipelineBuilder":
        self._pipeline.add_transformer(ops.drop_columns(columns))
        return self

    def cast(self, columns: dict[str, str]) -> "PipelineBuilder":
        self._pipeline.add_transformer(ops.cast_types(columns))
        return self

    def fillna(self, value: Any = None, **kwargs: Any) -> "PipelineBuilder":
        self._pipeline.add_transformer(ops.fill_na(value, **kwargs))
        return self

    def expression(self, expr: str, filter_mode: bool = False) -> "PipelineBuilder":
        self._pipeline.add_transformer(ops.with_expression(expr, filter_mode))
        return self

    def aggregate(self, group_by: Any, agg: dict) -> "PipelineBuilder":
        self._pipeline.add_transformer(ops.group_agg(group_by, agg))
        return self

    def dedupe(self, subset: list[str] | None = None, **kwargs: Any) -> "PipelineBuilder":
        self._pipeline.add_transformer(ops.deduplicate(subset, **kwargs))
        return self

    def sort(self, by: Any, ascending: Any = True) -> "PipelineBuilder":
        self._pipeline.add_transformer(ops.sort_rows(by, ascending))
        return self

    def transform(self, fn: Transform) -> "PipelineBuilder":
        self._pipeline.add_transformer(fn)
        return self

    # sinks
    def to_csv(self, path: str, **options: Any) -> "PipelineBuilder":
        from mini_etl_spark.sinks import to_csv

        self._pipeline.set_sink(to_csv(path, **options))
        return self

    def to_json(self, path: str, **options: Any) -> "PipelineBuilder":
        from mini_etl_spark.sinks import to_json

        self._pipeline.set_sink(to_json(path, **options))
        return self

    def to_parquet(self, path: str, **options: Any) -> "PipelineBuilder":
        from mini_etl_spark.sinks import to_parquet

        self._pipeline.set_sink(to_parquet(path, **options))
        return self

    def to_sql(self, url: str, table: str, **options: Any) -> "PipelineBuilder":
        from mini_etl_spark.sinks import to_jdbc

        self._pipeline.set_sink(to_jdbc(url, table, **options))
        return self

    def build(self) -> Pipeline:
        return self._pipeline
