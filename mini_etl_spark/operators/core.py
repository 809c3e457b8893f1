"""Row/column-level transform factories (projection, filter, cast, fillna).

Reference parity (cites into /root/reference):

- ``filter_rows``      ⇐ FilterTransformer (transformers.py:19-51) +
                         ExpressionTransformer filter mode (transformers.py:288-323)
- ``rename_columns``   ⇐ RenameTransformer (transformers.py:54-88) — tolerant of
                         missing columns, warns
- ``select_columns``   ⇐ SelectColumnsTransformer (transformers.py:91-128)
- ``drop_columns``     ⇐ DropColumnsTransformer (transformers.py:131-160)
- ``cast_types``       ⇐ CastTypeTransformer (transformers.py:163-225) — lenient
                         coerce-to-null casts via try_cast
- ``fill_na``          ⇐ FillNATransformer (transformers.py:228-285) — scalar /
                         dict / subset / ffill / bfill
- ``with_expression``  ⇐ ExpressionTransformer (transformers.py:288-323) —
                         ``"name = expr"`` strings; Spark's ``F.expr`` is a strict
                         superset of pandas.eval
- ``map_batches``      ⇐ LambdaTransformer (transformers.py:580-603) — arbitrary
                         pandas logic, Arrow-batched via mapInPandas (same
                         chunk-at-a-time granularity as the reference, but
                         distributed across executors)

Every factory returns a closure so pipelines compose lazily; nothing here
triggers a job.
"""

from __future__ import annotations

import logging
import re
from collections.abc import Callable, Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

Transform = Callable[[DataFrame], DataFrame]

# Reference type vocabulary (transformers.py:180-189, schema.py:24-35) →
# Spark SQL type names. `int` maps to nullable Int64 in the reference; Spark
# columns are nullable by default, so LongType is the clean fit.
TYPE_MAP: dict[str, str] = {
    "int": "bigint",
    "integer": "bigint",
    "int64": "bigint",
    "int32": "int",
    "long": "bigint",
    "float": "double",
    "float64": "double",
    "double": "double",
    "str": "string",
    "string": "string",
    "bool": "boolean",
    "boolean": "boolean",
    "datetime": "timestamp",
    "date": "timestamp",  # the reference aliases date → datetime (schema.py:32-33)
    "timestamp": "timestamp",
}


def _to_column(condition: str | Column) -> Column:
    return F.expr(condition) if isinstance(condition, str) else condition


def filter_rows(condition: str | Column) -> Transform:
    """Keep rows matching ``condition`` (SQL expression string or Column).

    SQL strings go straight into Catalyst (`F.expr`) so the predicate is
    eligible for parquet/JDBC pushdown — unlike the reference, where only a
    hand-written SQL query could push down (extractors.py:340).

    Column construction is deferred to apply time: ``F.expr`` needs an
    active SparkContext, and factories must be buildable before the session
    exists (e.g. compiling a config file).
    """

    def _apply(df: DataFrame) -> DataFrame:
        return df.filter(_to_column(condition))

    return _apply


def rename_columns(columns: dict[str, str]) -> Transform:
    """Rename columns; missing source columns are skipped with a warning
    (reference tolerance: transformers.py:79-87)."""

    def _apply(df: DataFrame) -> DataFrame:
        existing = {c for c in df.columns}
        missing = [c for c in columns if c not in existing]
        if missing:
            logger.warning("rename_columns: columns not found, skipping: %s", missing)
        mapping = {k: v for k, v in columns.items() if k in existing}
        return df.withColumnsRenamed(mapping) if mapping else df

    return _apply


def select_columns(columns: list[str], ignore_missing: bool = True) -> Transform:
    """Projection. ``ignore_missing`` toggles warn-vs-error for absent columns
    (transformers.py:91-128). Explicit projection also lets Catalyst prune the
    scan down to exactly these columns."""

    def _apply(df: DataFrame) -> DataFrame:
        existing = set(df.columns)
        missing = [c for c in columns if c not in existing]
        if missing:
            if not ignore_missing:
                raise ValueError(f"select_columns: columns not found: {missing}")
            logger.warning("select_columns: columns not found, skipping: %s", missing)
        keep = [c for c in columns if c in existing]
        return df.select(*keep)

    return _apply


def drop_columns(columns: list[str], ignore_missing: bool = True) -> Transform:
    """Inverse projection (transformers.py:131-160). Spark's drop already
    ignores missing names; ``ignore_missing=False`` adds the strict check."""

    def _apply(df: DataFrame) -> DataFrame:
        if not ignore_missing:
            missing = [c for c in columns if c not in set(df.columns)]
            if missing:
                raise ValueError(f"drop_columns: columns not found: {missing}")
        return df.drop(*columns)

    return _apply


def cast_types(columns: dict[str, str]) -> Transform:
    """Lenient type casts: unparseable values become null, never an error —
    the reference's ``errors="coerce"`` semantics (transformers.py:211-218)
    mapped to ``try_cast`` (requires non-ANSI or try_cast, both engine
    defaults). Unknown type names raise up front, like the reference's
    TYPE_MAP lookup (transformers.py:196-199)."""
    resolved: dict[str, str] = {}
    for col, typ in columns.items():
        key = str(typ).lower()
        if key not in TYPE_MAP:
            raise ValueError(f"cast_types: unsupported type {typ!r} for column {col!r}")
        resolved[col] = TYPE_MAP[key]

    def _apply(df: DataFrame) -> DataFrame:
        existing = set(df.columns)
        out = df
        for col, spark_type in resolved.items():
            if col not in existing:
                logger.warning("cast_types: column not found, skipping: %s", col)
                continue
            out = out.withColumn(col, F.col(col).try_cast(spark_type))
        return out

    return _apply


def fill_na(
    value: Any | dict[str, Any] | None = None,
    columns: list[str] | None = None,
    method: str | None = None,
    order_by: str | list[str] | None = None,
    partition_by: str | list[str] | None = None,
) -> Transform:
    """Fill nulls: scalar, per-column dict, column subset, or ffill/bfill.

    Reference: FillNATransformer (transformers.py:228-285): exactly one of
    ``value`` / ``method`` must be given (254-257).

    ffill/bfill delta (SURVEY §4.3.3): Spark has no implicit row order, so the
    directional fills require ``order_by``. Without ``partition_by`` the fill
    runs in a single-partition window — fine for small frames, a bottleneck at
    scale — so a warning is logged; pass ``partition_by`` to keep it parallel.
    """
    if (value is None) == (method is None):
        raise ValueError("fill_na: provide exactly one of value= or method=")
    if method is not None:
        if method not in ("ffill", "bfill"):
            raise ValueError(f"fill_na: unknown method {method!r} (ffill|bfill)")
        if order_by is None:
            raise ValueError("fill_na: method= requires order_by= (no implicit row order in a distributed table)")

    def _apply(df: DataFrame) -> DataFrame:
        if method is None:
            # NullType (void) columns — e.g. inferred from an all-null input —
            # are silently skipped by na.fill; replace them with the literal
            per_col = value if isinstance(value, dict) else None
            scope = list(per_col) if per_col is not None else (columns or df.columns)
            out = df
            for f in df.schema.fields:
                if f.name in scope and f.dataType.typeName() == "void":
                    fill = per_col[f.name] if per_col is not None else value
                    out = out.withColumn(f.name, F.lit(fill))
            if isinstance(value, dict):
                return out.na.fill(value)
            if columns:
                return out.na.fill(value, subset=columns)
            return out.na.fill(value)
        order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
        if partition_by:
            part_cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
            base = Window.partitionBy(*part_cols)
        else:
            logger.warning("fill_na: %s without partition_by runs on a single partition", method)
            base = Window.partitionBy()
        target = columns or df.columns
        out = df
        for col in target:
            if col in order_cols:
                continue
            if method == "ffill":
                w = base.orderBy(*[F.col(c).asc() for c in order_cols]).rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
                out = out.withColumn(col, F.last(col, ignorenulls=True).over(w))
            else:
                w = base.orderBy(*[F.col(c).asc() for c in order_cols]).rowsBetween(
                    Window.currentRow, Window.unboundedFollowing
                )
                out = out.withColumn(col, F.first(col, ignorenulls=True).over(w))
        return out

    return _apply


_ASSIGN_RE = re.compile(r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.+)$", re.DOTALL)


def with_expression(expression: str, filter_mode: bool = False) -> Transform:
    """SQL expression transform, the engine's ExpressionTransformer
    (transformers.py:288-323).

    - derive mode: ``"total = price * quantity"`` adds/overwrites column
      ``total``; multiple assignments may be separated by newlines.
    - filter mode: the expression is a boolean predicate, rows are filtered.

    The reference evaluates pandas ``eval`` strings; here the expression is a
    Spark SQL expression — a strict superset (functions, CASE WHEN, casts),
    fully visible to Catalyst.
    """

    def _apply(df: DataFrame) -> DataFrame:
        if filter_mode:
            return df.filter(F.expr(expression))
        out = df
        for line in expression.splitlines():
            line = line.strip()
            if not line:
                continue
            m = _ASSIGN_RE.match(line)
            if not m:
                raise ValueError(
                    f"with_expression: expected 'name = expression', got {line!r}"
                )
            name, expr_src = m.group(1), m.group(2)
            out = out.withColumn(name, F.expr(expr_src))
        return out

    return _apply


def map_batches(
    func: Callable[[pd.DataFrame], pd.DataFrame],
    schema: Any,
) -> Transform:
    """Arbitrary pandas logic over Arrow record batches — the LambdaTransformer
    escape hatch (transformers.py:580-603), distributed via ``mapInPandas``.

    ``func`` receives one pandas DataFrame per batch (same granularity as the
    reference's chunk) and must return a DataFrame matching ``schema``. Unlike
    the reference, batches run in parallel across executors; ``func`` must be
    pure (no cross-chunk state — for global aggregation use group_agg).
    """

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            out = func(pdf)
            if out is not None and len(out):
                yield out

    def _apply(df: DataFrame) -> DataFrame:
        return df.mapInPandas(_gen, schema=schema)

    return _apply


def apply_by_group(
    group_by: str | list[str],
    func: Callable[[pd.DataFrame], pd.DataFrame],
    schema: Any,
) -> Transform:
    """Grouped pandas transform (``applyInPandas``): ``func`` receives each
    group's FULL pandas DataFrame and returns rows matching ``schema``.

    The grouped sibling of :func:`map_batches` (SURVEY §2.2 maps the
    reference's LambdaTransformer to mapInPandas, "grouped variants ⇒
    applyInPandas"). One shuffle on the grouping keys; each group must fit
    in executor memory — at 100 TB keep groups bounded (key design), or use
    window functions for per-group arithmetic that doesn't need pandas.
    """
    keys = [group_by] if isinstance(group_by, str) else list(group_by)

    def _apply(df: DataFrame) -> DataFrame:
        return df.groupBy(*keys).applyInPandas(func, schema=schema)

    return _apply


def limit(n: int) -> Transform:
    """Row limit (no reference analogue; head/tail appear only in its tests)."""

    def _apply(df: DataFrame) -> DataFrame:
        return df.limit(n)

    return _apply


def explode_column(
    column: str,
    out_col: str | None = None,
    outer: bool = False,
) -> Transform:
    """Unnest an array (or map) column into one row per element — the
    normalize step for list-valued fields (tags, tokens, attachments).
    ``outer=True`` keeps rows whose array is null/empty (element null),
    matching SQL's LATERAL VIEW OUTER. Generates rows executor-side
    (Generate node) — never a driver loop."""
    from pyspark.sql import functions as F

    def _apply(df: DataFrame) -> DataFrame:
        from pyspark.sql.types import MapType

        fn = F.explode_outer if outer else F.explode
        if isinstance(df.schema[column].dataType, MapType):
            # map explode yields TWO generator outputs (key, value) —
            # withColumn can only alias one, so route through select
            prefix = out_col or column
            others = [c for c in df.columns if c != column]
            return df.select(
                *others,
                fn(F.col(column)).alias(f"{prefix}_key", f"{prefix}_value"),
            )
        target = out_col or column
        exploded = df.withColumn(target, fn(F.col(column)))
        return exploded.drop(column) if out_col and out_col != column else exploded

    return _apply
