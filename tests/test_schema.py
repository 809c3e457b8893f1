"""Schema validation/coercion tests (⇐ reference tests around
core/schema.py semantics: missing columns, nulls, widening, coercion)."""

from __future__ import annotations

import pandas as pd
import pytest

from mini_etl_spark.schema import (
    ColumnSchema,
    Schema,
    SchemaValidationError,
    SchemaValidator,
)


def test_schema_from_dict_and_struct():
    s = Schema.from_dict({"id": "int", "name": {"dtype": "str", "nullable": False}})
    st = s.to_struct_type()
    assert st.fieldNames() == ["id", "name"]
    assert st["id"].dataType.simpleString() == "bigint"
    assert st["name"].nullable is False


def test_schema_from_dataframe(spark, sample_df):
    s = Schema.from_dataframe(sample_df)
    assert s.column_names() == ["id", "category", "value", "name"]


def test_validate_ok(spark, sample_df):
    s = Schema.from_dict({"id": "int", "value": "int", "name": "str", "category": "str"})
    out = SchemaValidator(s).validate(sample_df)
    assert out is sample_df


def test_missing_column_raises(spark, sample_df):
    s = Schema.from_dict({"ghost": "int"})
    with pytest.raises(SchemaValidationError, match="missing"):
        SchemaValidator(s).validate(sample_df)


def test_type_mismatch_raises(spark, sample_df):
    s = Schema.from_dict({"name": "int"})
    with pytest.raises(SchemaValidationError, match="expected bigint"):
        SchemaValidator(s).validate(sample_df)


def test_widening_allowed(spark, sample_df):
    # declared float, actual bigint → int→float widening ok (schema.py:253-270)
    s = Schema.from_dict({"value": "float"})
    SchemaValidator(s).validate(sample_df)


def test_null_check(spark, nulls_df):
    s = Schema.from_dict({"value": {"dtype": "float", "nullable": False}})
    with pytest.raises(SchemaValidationError, match="null"):
        SchemaValidator(s).validate(nulls_df)
    # warn mode does not raise
    SchemaValidator(s, on_error="warn").validate(nulls_df)


def test_strict_extra_columns(spark, sample_df):
    s = Schema.from_dict({"id": "int"}, strict=True)
    with pytest.raises(SchemaValidationError, match="extra"):
        SchemaValidator(s).validate(sample_df)


def test_coerce_cast_inject_order(spark):
    pdf = pd.DataFrame({"id": ["1", "2", "zzz"], "extra": [1, 2, 3]})
    df = spark.createDataFrame(pdf)
    s = Schema.from_dict(
        {"id": "int", "score": {"dtype": "float", "default": 0.5}, "tag": "str"}
    )
    out = SchemaValidator(s, coerce=True).validate(df)
    assert out.columns == ["id", "score", "tag", "extra"]
    rows = out.orderBy("extra").collect()
    assert [r.id for r in rows] == [1, 2, None]  # lenient cast
    assert all(r.score == 0.5 for r in rows)      # default injected
    assert all(r.tag is None for r in rows)       # null injected


def test_coerce_strict_drops_extras(spark):
    df = spark.createDataFrame(pd.DataFrame({"id": [1], "junk": ["x"]}))
    s = Schema.from_dict({"id": "int"}, strict=True)
    out = SchemaValidator(s, coerce=True).validate(df)
    assert out.columns == ["id"]


def test_as_transform_in_pipeline(spark, sample_pdf):
    from mini_etl_spark import Pipeline
    from mini_etl_spark.sources import from_memory
    from mini_etl_spark.sinks import null_sink

    s = Schema.from_dict({"id": "int", "value": "float"})
    stats = (
        Pipeline("v")
        .set_source(from_memory(sample_pdf))
        .add_transformer(SchemaValidator(s, coerce=True).as_transform())
        .set_sink(null_sink())
        .run(spark)
    )
    assert stats["rows"] == 100


def test_check_expectations_one_pass_report(spark):
    from mini_etl_spark.schema import SchemaValidationError, check_expectations

    df = spark.createDataFrame(
        [
            (1, 10.0, "a@x.com", "us"),
            (2, -5.0, "bad", "us"),
            (2, 200.0, None, "xx"),
            (4, 50.0, "c@y.org", "de"),
        ],
        "id int, score double, email string, country string",
    )
    report = check_expectations(
        df,
        {
            "id": {"not_null": True, "unique": True},
            "score": {"min": 0.0, "max": 100.0},
            "email": {"regex": r"^[^@]+@[^@]+\.[^@]+$"},
            "country": {"isin": ["us", "de", "fr"]},
        },
    )
    assert report == {
        "id": {"not_null": 0, "unique": 1},
        "score": {"min": 1, "max": 1},
        "email": {"regex": 1},
        "country": {"isin": 1},
    }
    with pytest.raises(SchemaValidationError, match="score.min"):
        check_expectations(df, {"score": {"min": 0.0}}, fail=True)
    assert check_expectations(df, {"id": {"not_null": True}}) == {
        "id": {"not_null": 0}
    }
    assert check_expectations(df, {}) == {}
