"""File-format scans: CSV, JSON/JSONL, Parquet.

All three are splittable, distributed scans (CSV/JSON line-splittable,
Parquet row-group-splittable) — at 100 TB the scan parallelism comes from
file splits, no driver involvement. ``mode="PERMISSIVE"`` is the default so
corrupt records null out instead of failing the job — the row-level
refinement of the reference's chunk-skip error mode (SURVEY §4.3.4).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

Source = Callable[[SparkSession], DataFrame]


def _stream_path(path: str) -> str:
    """FileStreamSource wants a directory; expose a single file through a
    symlink dir (zero-copy). The dir name is DERIVED from the absolute
    file path, not random: the checkpoint dedups files by absolute path,
    so a restart must present the same path or the whole file would be
    re-ingested as 'new' (and random temp dirs would leak, one per run)."""
    import hashlib
    import os
    import tempfile

    if not os.path.isfile(path):
        return path
    abspath = os.path.abspath(path)
    digest = hashlib.md5(abspath.encode()).hexdigest()[:16]
    link_dir = os.path.join(tempfile.gettempdir(), f"mini_etl_stream_{digest}")
    os.makedirs(link_dir, exist_ok=True)
    link = os.path.join(link_dir, os.path.basename(path))
    if not os.path.islink(link):
        os.symlink(abspath, link)
    return link_dir


def read_csv(
    path: str,
    header: bool = True,
    encoding: str = "utf-8",
    schema: Any | None = None,
    columns: list[str] | None = None,
    infer_schema: bool = True,
    stream: bool = False,
    **options: Any,
) -> Source:
    """CSV scan (⇐ CSVExtractor, extractors.py:19-76). ``columns`` maps the
    reference's pandas ``usecols`` passthrough (tests/test_extractors.py:39-50)
    to an explicit projection, which Catalyst prunes at the parser level.

    Scale note: ``infer_schema`` costs an extra pass over the data — pass an
    explicit ``schema`` for production scans.

    ``stream=True`` returns a Structured Streaming source over the same
    path (files appearing later become micro-batches). Streams need a
    fixed schema: pass ``schema``, or the factory runs one batch
    inference pass up front (startup cost, documented trade).
    """

    def _read(spark: SparkSession) -> DataFrame:
        # read, don't pop: sources are re-runnable factories — mutating the
        # closed-over dict would drop the caller's parse mode on re-runs
        parse_mode = options.get("mode", "PERMISSIVE")

        def _configure(reader):
            reader = (
                reader.option("header", str(header).lower())
                .option("encoding", encoding)
                .option("mode", parse_mode)
            )
            for k, v in options.items():
                if k != "mode":
                    reader = reader.option(k, v)
            return reader

        if stream:
            s = schema
            if s is None:
                s = _configure(
                    spark.read.option("inferSchema", str(infer_schema).lower())
                ).csv(path).schema
            df = _configure(spark.readStream.schema(s)).csv(_stream_path(path))
        else:
            reader = _configure(spark.read)
            if schema is not None:
                reader = reader.schema(schema)
            elif infer_schema:
                reader = reader.option("inferSchema", "true")
            df = reader.csv(path)
        return df.select(*columns) if columns else df

    return _read


def read_json(
    path: str,
    lines: bool = True,
    schema: Any | None = None,
    columns: list[str] | None = None,
    stream: bool = False,
    **options: Any,
) -> Source:
    """JSON scan (⇐ JSONExtractor, extractors.py:79-148). ``lines=True`` is
    JSONL (splittable — the scale path); ``lines=False`` reads a JSON array
    via multiLine mode (non-splittable per file: one task per file, fine for
    many files, a bottleneck for one giant array — prefer JSONL).

    ``stream=True``: Structured Streaming source; schema comes from the
    ``schema`` argument or one up-front batch inference pass."""

    def _read(spark: SparkSession) -> DataFrame:
        def _configure(reader):
            if not lines:
                reader = reader.option("multiLine", "true")
            for k, v in options.items():
                reader = reader.option(k, v)
            return reader

        if stream:
            s = schema if schema is not None else _configure(spark.read).json(path).schema
            df = _configure(spark.readStream.schema(s)).json(_stream_path(path))
        else:
            reader = spark.read
            if schema is not None:
                reader = reader.schema(schema)
            df = _configure(reader).json(path)
        return df.select(*columns) if columns else df

    return _read


def read_orc(
    path: str,
    columns: list[str] | None = None,
    **options: Any,
) -> Source:
    """ORC scan (format extension beyond the reference — ORC support ships
    in Spark's classpath, so the columnar-format story isn't parquet-only).
    Same pushdown/pruning/vectorization properties as parquet."""

    def _read(spark: SparkSession) -> DataFrame:
        reader = spark.read
        for k, v in options.items():
            reader = reader.option(k, v)
        df = reader.orc(path)
        return df.select(*columns) if columns else df

    return _read


def read_xml(
    path: str,
    row_tag: str = "row",
    columns: list[str] | None = None,
    schema: Any = None,
    **options: Any,
) -> Source:
    """XML scan (format extension — Spark 4 ships a built-in ``xml`` data
    source, so no external package is needed). ``row_tag`` names the
    repeating element that maps to one row; nested elements become struct
    columns. Distributed parse like json/csv — each file split is parsed
    executor-side, so a directory of XML files scales with the cluster.
    """

    def _read(spark: SparkSession) -> DataFrame:
        reader = spark.read.format("xml").option("rowTag", row_tag)
        for k, v in options.items():
            reader = reader.option(k, v)
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.load(path)
        return df.select(*columns) if columns else df

    return _read


def read_parquet(
    path: str,
    columns: list[str] | None = None,
    ns_timestamp_columns: list[str] | None = None,
    stream: bool = False,
    **options: Any,
) -> Source:
    """Parquet scan (⇐ ParquetExtractor, extractors.py:223-282). The
    reference's explicit column pruning (extractors.py:243,264-268) is
    automatic in Catalyst; ``columns`` is still honored as a projection.
    Predicate pushdown, row-group skipping and vectorized reads come free.

    ``ns_timestamp_columns``: Spark's parquet reader rejects TIMESTAMP(NANOS)
    fields; listing them here reads nanos as int64 (legacy conf) and converts
    to microsecond timestamps — all column-wise JVM expressions, no UDF.

    ``stream=True``: Structured Streaming source over the same path (schema
    pinned by a footer-only metadata read; later-arriving files become
    micro-batches). The ns-timestamp normalization applies identically."""

    def _read(spark: SparkSession) -> DataFrame:
        prev_nanos = None
        if ns_timestamp_columns:
            # scoped, not permanent: the conf is captured when the relation
            # is ANALYZED (reader.parquet below), so restoring it right
            # after keeps the side effect off every later read in the
            # session (an unlisted NANOS column elsewhere should still
            # raise Spark's unsupported-type error, not silently arrive
            # as int64 nanos)
            prev_nanos = spark.conf.get(
                "spark.sql.legacy.parquet.nanosAsLong", "false"
            )
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            if stream:
                # footer-only metadata read pins the stream schema
                s = spark.read.parquet(path).schema
                reader = spark.readStream.schema(s)
            else:
                reader = spark.read
            for k, v in options.items():
                reader = reader.option(k, v)
            df = reader.parquet(_stream_path(path) if stream else path)
        finally:
            if prev_nanos is not None:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev_nanos)
        from pyspark.sql import functions as F

        from pyspark.sql.types import LongType, TimestampNTZType

        for c in ns_timestamp_columns or []:
            # Normalize to a session-tz TimestampType regardless of how the
            # file stored the instant: TIMESTAMP(NANOS) arrives as int64
            # under the legacy conf (convert), TIMESTAMP_NTZ arrives naive
            # (relabel — value-identical under the UTC session timezone),
            # and a standard TIMESTAMP needs nothing.
            if isinstance(df.schema[c].dataType, LongType):
                df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
            elif isinstance(df.schema[c].dataType, TimestampNTZType):
                # The NTZ→TimestampType cast interprets the naive wall-clock
                # in the *session* timezone; it is value-identical only under
                # UTC. The bundled session builder sets UTC — assert rather
                # than silently shift instants for callers who didn't.
                tz = spark.conf.get("spark.sql.session.timeZone")
                if tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
                    raise ValueError(
                        f"read_parquet(ns_timestamp_columns=[{c!r}]): converting "
                        "TIMESTAMP_NTZ requires spark.sql.session.timeZone=UTC "
                        f"(session has {tz!r}) — instants would silently shift."
                    )
                df = df.withColumn(c, F.col(c).cast("timestamp"))
        return df.select(*columns) if columns else df

    return _read


def read_text(
    path: str,
    whole_file: bool = False,
    line_col: str = "value",
    **options: Any,
) -> Source:
    """Raw text ingestion (corpus on-ramp beyond the reference): one row
    per line, or per file with ``whole_file=True`` (``wholetext`` option —
    one document per file, the common pre-chunking corpus layout). Globs
    and directories work; partition parallelism follows file splits."""

    def _read(spark: SparkSession) -> DataFrame:
        reader = spark.read
        for k, v in options.items():
            reader = reader.option(k, v)
        df = reader.text(path, wholetext=whole_file)
        return df.withColumnRenamed("value", line_col) if line_col != "value" else df

    return _read


def read_binary_files(
    path: str,
    glob: str | None = None,
    **options: Any,
) -> Source:
    """Binary asset ingestion via Spark's built-in ``binaryFile`` source —
    the multimodal on-ramp: each file becomes a row of (path,
    modificationTime, length, content BINARY), ready for
    ``functions.multimodal`` feature extraction. ``glob`` maps to
    ``pathGlobFilter`` (e.g. ``*.png``); scans parallelize per file and
    metadata-only queries (count, length stats) never read the bytes."""

    def _read(spark: SparkSession) -> DataFrame:
        reader = spark.read.format("binaryFile")
        if glob:
            reader = reader.option("pathGlobFilter", glob)
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load(path)

    return _read
