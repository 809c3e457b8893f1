"""Unicode script detection (text.script_counts / dominant_script)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_etl_spark.functions.text import dominant_script, script_counts

SAMPLES = [
    (1, "The quick brown fox — 42 times."),          # latin
    (2, "Привет мир, это тест кириллицы."),          # cyrillic
    (3, "مرحبا بالعالم هذا اختبار"),                  # arabic
    (4, "这是一个中文测试 hello"),                      # cjk-dominant w/ latin tail
    (5, "12345 !!! ---"),                             # no script letters
    (6, "abcdefghij клмнопрсту"),                      # exactly 10 vs 10 → mixed
    (7, "שלום עולם זה מבחן"),                          # hebrew
    (8, "नमस्ते दुनिया यह परीक्षण है"),                # devanagari
    (9, "Ελληνικά γράμματα εδώ"),                      # greek
    (10, "こんにちは世界のテスト"),                      # cjk (kana+han)
]


def _df(spark):
    return spark.createDataFrame(SAMPLES, "id int, text string")


def test_dominant_script_labels(spark):
    out = _df(spark).select("id", dominant_script("text").alias("s"))
    got = {r["id"]: r["s"] for r in out.collect()}
    assert got == {
        1: "latin",
        2: "cyrillic",
        3: "arabic",
        4: "cjk",
        5: "unknown",
        6: "mixed",
        7: "hebrew",
        8: "devanagari",
        9: "greek",
        10: "cjk",
    }


def test_script_counts_sum_and_fields(spark):
    row = (
        _df(spark)
        .filter("id = 4")
        .select(script_counts("text").alias("sc"))
        .first()["sc"]
    )
    assert row["cjk"] == 8  # 8 han characters
    assert row["latin"] == 5  # 'hello'
    assert row["letters"] == row["cjk"] + row["latin"]


def test_min_fraction_threshold(spark):
    # at min_fraction=0.2 the mixed row resolves to its first-listed
    # passing script (latin precedes cyrillic in SCRIPT_RANGES)
    out = (
        _df(spark)
        .filter("id = 6")
        .select(dominant_script("text", min_fraction=0.2).alias("s"))
        .first()
    )
    assert out["s"] == "latin"


def test_math_signs_are_not_latin_letters(spark):
    df = spark.createDataFrame([(1, "3 × 4 ÷ 2")], "id int, text string")
    row = df.select(
        script_counts("text").alias("sc"), dominant_script("text").alias("s")
    ).first()
    assert row["sc"]["latin"] == 0
    assert row["s"] == "unknown"


def test_null_and_empty(spark):
    df = spark.createDataFrame([(1, None), (2, "")], "id int, text string")
    out = df.select("id", dominant_script("text").alias("s")).collect()
    got = {r["id"]: r["s"] for r in out}
    assert got[2] == "unknown"
    assert got[1] is None  # NULL propagates like every column expression
