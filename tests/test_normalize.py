"""text.normalize_text: hand-checked cleanup semantics + idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from mini_etl_spark.functions import text as tx


def _norm(spark, s: str) -> str:
    df = spark.createDataFrame([(s,)], "text string")
    return df.select(tx.normalize_text("text").alias("t")).collect()[0].t


def test_punctuation_mapping(spark):
    assert _norm(spark, "“hello” ‘x’") == "\"hello\" 'x'"
    assert _norm(spark, "a – b — c") == "a - b - c"
    assert _norm(spark, "wait…") == "wait..."


def test_whitespace_and_controls(spark):
    assert _norm(spark, "a\u00a0b\u2003c\u200bd") == "a b c d"
    assert _norm(spark, "a\x07b\x1fc") == "abc"          # controls stripped
    assert _norm(spark, "a\r\nb\rc") == "a\nb\nc"        # CR variants → LF
    assert _norm(spark, "a  \t b") == "a b"              # run collapse
    assert _norm(spark, "a\n\n\n\n\nb") == "a\n\nb"  # cap at one blank line
    assert _norm(spark, "  padded  ") == "padded"


def test_newline_cap_exact(spark):
    assert _norm(spark, "a\n\nb") == "a\n\nb"     # double stays
    assert _norm(spark, "a\n\n\n\nb") == "a\n\nb"  # runs cap to double


def test_idempotent_on_corpus(spark):
    """normalize(normalize(x)) == normalize(x) for every document plus
    adversarial junk rows — the fixed-point property a cleanup stage
    must have."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    junk = spark.createDataFrame(
        [(999901, "“ –\r\n\n\n\n\x07 x \t\t y …")],
        "doc_id long, text string",
    )
    both = docs.select("doc_id", "text").unionByName(junk)
    once = both.select("doc_id", tx.normalize_text("text").alias("t"))
    twice = once.select("doc_id", tx.normalize_text("t").alias("t"))
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0


def test_config_normalize(spark, tmp_path):
    from mini_etl_spark.config import ConfigLoader

    src = tmp_path / "in"
    spark.createDataFrame(
        [(1, "“quoted”  text…")], "doc_id long, text string"
    ).write.parquet(str(src))
    out = tmp_path / "out"
    cfg = tmp_path / "n.yaml"
    cfg.write_text(
        f"""
name: normalizer
source: {{type: parquet, path: '{src}'}}
transformers:
  - type: normalize
sink: {{type: parquet, path: '{out}', mode: overwrite}}
"""
    )
    loader = ConfigLoader()
    config = loader.load(cfg)
    assert config.validate() == []
    loader.build_pipeline(config).run(spark)
    row = spark.read.parquet(str(out)).collect()[0]
    assert row.text == '"quoted" text...'
