"""Declared schemas + validate/coerce on StructType.

Reference parity (mini_etl/core/schema.py):

- ``ColumnSchema(name, dtype, nullable, default)`` ⇐ schema.py:14-35
- ``Schema(columns, strict)`` with dict construction (schema.py:54-79) and
  inference from a DataFrame (``from_dataframe``, schema.py:81-92)
- ``SchemaValidator(schema, coerce, on_error)`` ⇐ schema.py:124-270:
  missing required columns (184-190), nulls in non-nullable columns
  (192-197), dtype compatibility with int→float widening (253-270), extra
  columns under strict (209-214); with ``coerce=True`` casts columns and
  injects missing ones with defaults/nulls (218-251).

Distributed mapping: declared types are Spark SQL types; the null check is a
single aggregated pass (one job computing every non-nullable column's null
count at once — not one job per column); coercion is lenient ``try_cast``
(reference ``errors="coerce"``, schema.py:233-243) plus ``lit(default)``
injection. Validation of *structure* (columns/dtypes) is plan-only and free;
only the null check touches data.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

logger = logging.getLogger(__name__)

# Reference dtype vocabulary (schema.py:24-35) → Spark types.
_TYPE_MAP: dict[str, T.DataType] = {
    "int": T.LongType(),
    "integer": T.LongType(),
    "int64": T.LongType(),
    "int32": T.IntegerType(),
    "long": T.LongType(),
    "float": T.DoubleType(),
    "float64": T.DoubleType(),
    "double": T.DoubleType(),
    "str": T.StringType(),
    "string": T.StringType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "datetime": T.TimestampType(),
    "date": T.TimestampType(),  # reference aliases date→datetime (schema.py:32-33)
    "timestamp": T.TimestampType(),
}

# int→float widening allowed, as in reference compatibility (schema.py:253-270).
_WIDENING_OK: set[tuple[str, str]] = {
    ("bigint", "double"),
    ("int", "double"),
    ("int", "bigint"),
}


def _resolve_type(dtype: str | T.DataType) -> T.DataType:
    if isinstance(dtype, T.DataType):
        return dtype
    key = str(dtype).lower()
    if key not in _TYPE_MAP:
        raise ValueError(f"unsupported dtype {dtype!r}")
    return _TYPE_MAP[key]


@dataclass
class ColumnSchema:
    name: str
    dtype: str | T.DataType = "string"
    nullable: bool = True
    default: Any = None

    @property
    def spark_type(self) -> T.DataType:
        return _resolve_type(self.dtype)


@dataclass
class Schema:
    columns: list[ColumnSchema] = field(default_factory=list)
    strict: bool = False

    @classmethod
    def from_dict(cls, spec: dict[str, Any], strict: bool = False) -> "Schema":
        """``{"id": "int", "name": {"dtype": "str", "nullable": False}}``
        (⇐ schema.py:54-79)."""
        cols = []
        for name, val in spec.items():
            if isinstance(val, dict):
                cols.append(
                    ColumnSchema(
                        name=name,
                        dtype=val.get("dtype", val.get("type", "string")),
                        nullable=val.get("nullable", True),
                        default=val.get("default"),
                    )
                )
            else:
                cols.append(ColumnSchema(name=name, dtype=val))
        return cls(columns=cols, strict=strict)

    @classmethod
    def from_dataframe(cls, df: DataFrame, strict: bool = False) -> "Schema":
        """Infer from a DataFrame's StructType (⇐ schema.py:81-92)."""
        cols = [
            ColumnSchema(name=f.name, dtype=f.dataType, nullable=f.nullable)
            for f in df.schema.fields
        ]
        return cls(columns=cols, strict=strict)

    def to_struct_type(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c.name, c.spark_type, c.nullable) for c in self.columns]
        )

    def column_names(self) -> list[str]:
        return [c.name for c in self.columns]


class SchemaValidationError(ValueError):
    def __init__(self, errors: list[str]) -> None:
        super().__init__("; ".join(errors))
        self.errors = errors


class SchemaValidator:
    """Validate (and optionally coerce) a DataFrame against a Schema.

    ``on_error``: "raise" | "warn" (⇐ schema.py on_error modes).
    ``coerce=True`` returns a new DataFrame cast/completed to the schema.
    """

    def __init__(
        self,
        schema: Schema,
        coerce: bool = False,
        on_error: str = "raise",
        check_nulls: bool = True,
    ) -> None:
        if on_error not in ("raise", "warn"):
            raise ValueError("on_error must be raise|warn")
        self.schema = schema
        self.coerce = coerce
        self.on_error = on_error
        self.check_nulls = check_nulls

    # -- structural checks (plan-only, no job) ------------------------------
    def _structural_errors(self, df: DataFrame) -> list[str]:
        errors: list[str] = []
        actual = {f.name: f.dataType for f in df.schema.fields}
        for col in self.schema.columns:
            if col.name not in actual:
                if not col.nullable and col.default is None and not self.coerce:
                    errors.append(f"missing required column: {col.name}")
                elif not self.coerce:
                    errors.append(f"missing column: {col.name}")
                continue
            want = col.spark_type.simpleString()
            have = actual[col.name].simpleString()
            if have != want and (have, want) not in _WIDENING_OK and not self.coerce:
                errors.append(f"column {col.name}: expected {want}, got {have}")
        if self.schema.strict and not self.coerce:  # coercion drops extras instead
            declared = set(self.schema.column_names())
            extra = [c for c in df.columns if c not in declared]
            if extra:
                errors.append(f"unexpected extra columns: {extra}")
        return errors

    def _null_errors(self, df: DataFrame) -> list[str]:
        """One aggregated job for all non-nullable columns (schema.py:192-197)."""
        targets = [
            c.name
            for c in self.schema.columns
            if not c.nullable and c.name in df.columns
        ]
        if not targets:
            return []
        agg = df.agg(
            *[
                F.count(F.when(F.col(c).isNull(), 1)).alias(c)
                for c in targets
            ]
        ).collect()[0]
        return [
            f"column {c} has {agg[c]} null(s) but is non-nullable"
            for c in targets
            if agg[c] > 0
        ]

    def validate(self, df: DataFrame) -> DataFrame:
        errors = self._structural_errors(df)
        if not errors and self.check_nulls and not self.coerce:
            errors += self._null_errors(df)
        if errors:
            if self.on_error == "raise":
                raise SchemaValidationError(errors)
            for e in errors:
                logger.warning("schema: %s", e)
        if not self.coerce:
            return df
        return self._coerce(df)

    def _coerce(self, df: DataFrame) -> DataFrame:
        """Cast existing columns leniently, inject missing ones with
        default/null, order columns per schema; under strict, drop extras
        (⇐ schema.py:218-251)."""
        out = df
        existing = set(df.columns)
        for col in self.schema.columns:
            if col.name in existing:
                out = out.withColumn(
                    col.name, F.col(col.name).try_cast(col.spark_type.simpleString())
                )
            else:
                fill = (
                    F.lit(col.default).cast(col.spark_type)
                    if col.default is not None
                    else F.lit(None).cast(col.spark_type)
                )
                out = out.withColumn(col.name, fill)
        ordered = self.schema.column_names()
        if self.schema.strict:
            return out.select(*ordered)
        extras = [c for c in df.columns if c not in set(ordered)]
        return out.select(*ordered, *extras)

    def as_transform(self):
        """Use as a pipeline stage: ``pipeline.add_transformer(v.as_transform())``
        (the reference wired validation into the stream, pipeline.py:134-135)."""

        def _apply(df: DataFrame) -> DataFrame:
            return self.validate(df)

        return _apply


# ---------------------------------------------------------------------------
# Data-quality expectations (one aggregate pass)
# ---------------------------------------------------------------------------

def check_expectations(
    df: DataFrame,
    rules: dict[str, dict[str, Any]],
    fail: bool = False,
) -> dict[str, dict[str, int]]:
    """Evaluate declarative quality gates in ONE aggregate job.

    ``rules`` maps column → checks; supported checks per column:

    - ``not_null: True`` — count of NULLs,
    - ``min: x`` / ``max: x`` — count of values outside the bound,
    - ``isin: [...]`` — count of values outside the allowed set,
    - ``regex: pat`` — count of non-NULL values NOT matching,
    - ``unique: True`` — duplicate count (count - distinct count).

    Every check compiles to one conditional-sum column of a single
    hash-aggregate — at 100 TB this is one scan regardless of rule count,
    never a per-rule job. Returns ``{column: {check: violation_count}}``
    (zero-violation checks included); with ``fail=True`` raises
    :class:`SchemaValidationError` listing non-zero violations.
    """
    exprs: list = []
    names: list[tuple[str, str]] = []

    def add(col: str, check: str, cond) -> None:
        exprs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"{col}__{check}"))
        names.append((col, check))

    for col, checks in rules.items():
        c = F.col(col)
        for check, arg in checks.items():
            if check == "not_null" and arg:
                add(col, "not_null", c.isNull())
            elif check == "min":
                add(col, "min", c < F.lit(arg))
            elif check == "max":
                add(col, "max", c > F.lit(arg))
            elif check == "isin":
                add(col, "isin", ~c.isin(list(arg)) | c.isNull())
            elif check == "regex":
                add(col, "regex", c.isNotNull() & ~c.rlike(arg))
            elif check == "unique" and arg:
                exprs.append(
                    (F.count(c) - F.count_distinct(c)).alias(f"{col}__unique")
                )
                names.append((col, "unique"))
            else:
                raise ValueError(f"check_expectations: unknown check {check!r}")
    if not exprs:
        return {}
    row = df.agg(*exprs).first()
    report: dict[str, dict[str, int]] = {}
    for col, check in names:
        report.setdefault(col, {})[check] = int(row[f"{col}__{check}"] or 0)
    if fail:
        bad = [
            f"{col}.{check}: {n} violations"
            for col, checks in report.items()
            for check, n in checks.items()
            if n > 0
        ]
        if bad:
            raise SchemaValidationError(bad)
    return report
