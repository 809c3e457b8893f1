"""Source/sink roundtrips per format — mirrors the reference's loader tests
(write-then-read-back, tests/test_loaders.py:28-268)."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from mini_etl_spark.sources import from_memory, read_csv, read_json, read_parquet
from mini_etl_spark.sinks import (
    callback_sink,
    multi_sink,
    null_sink,
    to_csv,
    to_json,
    to_parquet,
)


def test_csv_roundtrip(spark, sample_pdf, tmp_path):
    src = tmp_path / "in.csv"
    sample_pdf.to_csv(src, index=False)
    df = read_csv(str(src))(spark)
    assert df.count() == 100
    out = tmp_path / "out_csv"
    to_csv(str(out), mode="overwrite")(df)
    back = read_csv(str(out))(spark)
    assert back.count() == 100
    assert set(back.columns) == set(sample_pdf.columns)


def test_csv_append_mode(spark, sample_pdf, tmp_path):
    df = spark.createDataFrame(sample_pdf)
    out = tmp_path / "out_csv"
    to_csv(str(out), mode="w")(df)
    to_csv(str(out), mode="a")(df)
    assert read_csv(str(out))(spark).count() == 200


def test_csv_special_chars(spark, tmp_path):
    # ⇐ reference df_with_special_chars (conftest.py:163-170)
    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3],
            "name": ['has,comma', 'has"quote', "has\nnewline"],
            "desc": ["<html>", "a & b", "c > d"],
        }
    )
    df = spark.createDataFrame(pdf)
    out = tmp_path / "special"
    to_csv(str(out))(df)
    back = read_csv(str(out), multiLine="true")(spark).toPandas()
    assert sorted(back["name"]) == sorted(pdf["name"])


def test_jsonl_roundtrip(spark, sample_pdf, tmp_path):
    df = spark.createDataFrame(sample_pdf)
    out = tmp_path / "out_jsonl"
    to_json(str(out), lines=True)(df)
    back = read_json(str(out), lines=True)(spark)
    assert back.count() == 100


def test_json_array_read_and_write(spark, sample_pdf, tmp_path):
    src = tmp_path / "arr.json"
    src.write_text(json.dumps(sample_pdf.head(10).to_dict(orient="records")))
    df = read_json(str(src), lines=False)(spark)
    assert df.count() == 10
    out = tmp_path / "arr_out.json"
    to_json(str(out), lines=False)(df)
    payload = json.loads(out.read_text())
    assert isinstance(payload, list) and len(payload) == 10


def test_parquet_roundtrip_and_partitioned(spark, sample_pdf, tmp_path):
    df = spark.createDataFrame(sample_pdf)
    out = tmp_path / "plain"
    to_parquet(str(out))(df)
    assert read_parquet(str(out))(spark).count() == 100

    part = tmp_path / "partitioned"
    to_parquet(str(part), partition_by=["category"])(df)
    # hive-style layout: one dir per category value
    dirs = {p.name for p in part.iterdir() if p.is_dir()}
    assert {"category=A", "category=B"}.issubset(dirs)
    back = read_parquet(str(part))(spark)
    assert back.count() == 100
    # partition pruning: reading one category only scans that dir
    pruned = back.filter("category = 'A'")
    assert pruned.count() == 20


def test_parquet_refresh_replaces_only_present_partitions(spark, sample_pdf, tmp_path):
    df = spark.createDataFrame(sample_pdf)
    part = tmp_path / "refresh"
    to_parquet(str(part), partition_by=["category"])(df)
    before_a = read_parquet(str(part))(spark).filter("category = 'A'").count()
    total = read_parquet(str(part))(spark).count()

    # rewrite ONLY category A with a single replacement row
    repl = df.filter("category = 'A'").limit(1)
    to_parquet(str(part), mode="refresh", partition_by=["category"])(repl)

    back = read_parquet(str(part))(spark)
    assert back.filter("category = 'A'").count() == 1  # replaced
    assert back.count() == total - before_a + 1  # other partitions intact

    # plain overwrite mode would have wiped them; refresh requires keys
    import pytest as _pytest

    with _pytest.raises(ValueError):
        to_parquet(str(part), mode="refresh")(repl)


def test_parquet_column_projection(spark, sample_pdf, tmp_path):
    out = tmp_path / "proj"
    to_parquet(str(out))(spark.createDataFrame(sample_pdf))
    df = read_parquet(str(out), columns=["id", "value"])(spark)
    assert df.columns == ["id", "value"]


def test_from_memory_variants(spark, sample_pdf):
    assert from_memory(sample_pdf)(spark).count() == 100
    chunks = [sample_pdf.iloc[:50], sample_pdf.iloc[50:]]
    assert from_memory(chunks)(spark).count() == 100
    rows = [{"a": 1}, {"a": 2}]
    assert from_memory(rows)(spark).count() == 2


def test_multi_sink(spark, sample_pdf, tmp_path):
    df = spark.createDataFrame(sample_pdf)
    c, p = tmp_path / "multi_csv", tmp_path / "multi_pq"
    multi_sink([to_csv(str(c)), to_parquet(str(p))])(df)
    assert read_csv(str(c))(spark).count() == 100
    assert read_parquet(str(p))(spark).count() == 100


def test_orc_roundtrip_partitioned(spark, sample_pdf, tmp_path):
    from mini_etl_spark.sinks import to_orc
    from mini_etl_spark.sources import read_orc

    df = spark.createDataFrame(sample_pdf)
    out = tmp_path / "orc_out"
    to_orc(str(out), partition_by=["category"])(df)
    back = read_orc(str(out))(spark)
    assert back.count() == 100
    assert set(back.columns) == set(df.columns)
    # partitioned layout on disk (hive-style directories)
    assert any(p.name.startswith("category=") for p in out.iterdir())


def test_null_sink(spark, sample_df):
    null_sink()(sample_df)  # must simply not fail


def test_null_sink_counter(spark, sample_df):
    counter: dict = {}
    null_sink(counter)(sample_df)
    assert counter["rows"] == sample_df.count()
    null_sink(counter)(sample_df.limit(7))
    assert counter["rows"] == sample_df.count() + 7  # accumulates


def test_callback_sink_driver_side(spark, sample_df):
    seen: list[int] = []
    done: list[bool] = []
    callback_sink(lambda pdf: seen.append(len(pdf)), on_complete=lambda: done.append(True), driver_side=True)(sample_df)
    assert sum(seen) == 100
    assert done == [True]


def test_callback_sink_driver_side_rebatches(spark):
    """Driver-side streaming re-batches rows (10k per callback frame) while
    fetching one partition at a time — content must round-trip exactly."""
    df = spark.range(25_000).withColumnRenamed("id", "v").repartition(4)
    seen: list = []
    callback_sink(lambda pdf: seen.append(pdf), driver_side=True)(df)
    assert sum(len(p) for p in seen) == 25_000
    assert all(len(p) <= 10_000 for p in seen)
    got = sorted(v for p in seen for v in p["v"].tolist())
    assert got == list(range(25_000))


def test_read_csv_missing_file(spark, tmp_path):
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        read_csv(str(tmp_path / "nope.csv"))(spark).count()


def test_excel_missing_file(spark, tmp_path):
    from mini_etl_spark.sources import read_excel

    with pytest.raises((FileNotFoundError, ValueError, ImportError, Exception)):
        read_excel(str(tmp_path / "x.xlsx"))(spark)


def test_excel_roundtrip(spark, sample_df, tmp_path):
    """Live round-trip through the engine-agnostic path (pandas engine when
    installed, bundled stdlib codec otherwise) — ⇐ the reference's
    test_extractors/test_loaders Excel round-trips."""
    from mini_etl_spark.sinks import to_excel
    from mini_etl_spark.sources import read_excel

    target = tmp_path / "t.xlsx"
    to_excel(str(target))(sample_df)
    back = read_excel(str(target))(spark)
    assert back.count() == sample_df.count()
    assert set(back.columns) == set(sample_df.columns)
    got = {r["id"]: (r["category"], r["value"], r["name"]) for r in back.collect()}
    want = {
        r["id"]: (r["category"], r["value"], r["name"]) for r in sample_df.collect()
    }
    assert got == want


def test_excel_append_mode(spark, sample_df, tmp_path):
    from mini_etl_spark.sinks import to_excel
    from mini_etl_spark.sources import read_excel

    target = tmp_path / "t.xlsx"
    to_excel(str(target))(sample_df)
    to_excel(str(target), mode="a")(sample_df.limit(10))
    assert read_excel(str(target))(spark).count() == sample_df.count() + 10


def test_xlsx_codec_types_and_sheet_names(tmp_path):
    """The stdlib codec itself: type fidelity (int/float/bool/str/None),
    sheet lookup by name, shared-strings files from other producers."""
    import pandas as pd

    from mini_etl_spark.xlsx import read_xlsx, write_xlsx

    pdf = pd.DataFrame(
        {
            "i": [1, 2, 3],
            "f": [1.5, -2.25, 0.0],
            "b": [True, False, True],
            "s": ["plain", "x < y & z", "  padded  "],
            "n": ["a", None, "c"],
        }
    )
    target = tmp_path / "codec.xlsx"
    write_xlsx(pdf, str(target), sheet_name="metrics")
    back = read_xlsx(str(target), sheet_name="metrics")
    assert list(back.columns) == ["i", "f", "b", "s", "n"]
    assert back["i"].tolist() == [1, 2, 3]
    assert back["f"].tolist() == [1.5, -2.25, 0.0]
    assert back["b"].tolist() == [True, False, True]
    assert back["s"].tolist() == ["plain", "x < y & z", "  padded  "]
    assert back["n"].tolist() == ["a", None, "c"]
    assert read_xlsx(str(target), sheet_name=0).shape == (3, 5)
    with pytest.raises(ValueError, match="no sheet named"):
        read_xlsx(str(target), sheet_name="nope")


def test_xlsx_codec_shared_strings(tmp_path):
    """Files from openpyxl/Excel store text in xl/sharedStrings.xml —
    synthesize one and confirm the reader resolves the indirection."""
    import zipfile

    from mini_etl_spark.xlsx import read_xlsx, write_xlsx
    import pandas as pd

    base = tmp_path / "inline.xlsx"
    write_xlsx(pd.DataFrame({"k": [1]}), str(base))
    shared = tmp_path / "shared.xlsx"
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    with zipfile.ZipFile(base) as zin, zipfile.ZipFile(shared, "w") as zout:
        for name in zin.namelist():
            if name == "xl/worksheets/sheet1.xml":
                zout.writestr(
                    name,
                    f'<worksheet xmlns="{ns}"><sheetData>'
                    '<row r="1"><c r="A1" t="s"><v>0</v></c></row>'
                    '<row r="2"><c r="A2" t="s"><v>1</v></c></row>'
                    "</sheetData></worksheet>",
                )
            else:
                zout.writestr(name, zin.read(name))
        zout.writestr(
            "xl/sharedStrings.xml",
            f'<sst xmlns="{ns}"><si><t>col</t></si>'
            "<si><r><t>ri</t></r><r><t>ch</t></r></si></sst>",
        )
    back = read_xlsx(str(shared))
    assert list(back.columns) == ["col"]
    assert back["col"].tolist() == ["rich"]


def test_csv_permissive_corrupt_rows(spark, tmp_path):
    """Row-level error handling (SURVEY §4.3.4): corrupt rows null out
    under PERMISSIVE instead of failing the job or dropping a whole chunk."""
    src = tmp_path / "bad.csv"
    src.write_text("id,value\n1,10\n2,not_a_number\n3,30\n")
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("value", T.LongType()),
        ]
    )
    df = read_csv(str(src), schema=schema, infer_schema=False)(spark)
    rows = {r.id: r.value for r in df.collect()}
    assert rows == {1: 10, 2: None, 3: 30}


def test_jdbc_validation():
    from mini_etl_spark.sources import read_jdbc

    with pytest.raises(ValueError, match="exactly one"):
        read_jdbc("jdbc:x")
    with pytest.raises(ValueError, match="exactly one"):
        read_jdbc("jdbc:x", table="t", query="q")
    with pytest.raises(ValueError, match="partitioned reads require table"):
        read_jdbc("jdbc:x", query="select 1", partition_column="id")
    with pytest.raises(ValueError, match="requires num_partitions"):
        read_jdbc("jdbc:x", table="t", partition_column="id")


def test_nested_json_structs(spark, tmp_path):
    """Nested JSON carries through as real struct/array types (the
    reference could only pass nested objects opaquely; SURVEY §1.2)."""
    src = tmp_path / "nested.jsonl"
    src.write_text(
        '{"id": 1, "meta": {"tags": ["a", "b"], "score": 0.5}}\n'
        '{"id": 2, "meta": {"tags": [], "score": 1.5}}\n'
    )
    df = read_json(str(src), lines=True)(spark)
    rows = df.selectExpr("id", "meta.score AS score", "size(meta.tags) AS n_tags").collect()
    assert {(r.id, r.score, r.n_tags) for r in rows} == {(1, 0.5, 2), (2, 1.5, 0)}


def test_callback_sink_executor_side(spark, sample_df, tmp_path):
    """Executor-side callbacks: one invocation per partition, observable via
    filesystem side effects (callbacks run in executor processes, so driver
    lists can't capture them)."""
    import uuid

    out_dir = tmp_path / "cb"
    out_dir.mkdir()
    path = str(out_dir)

    def per_batch(pdf):
        with open(f"{path}/{uuid.uuid4().hex}.cnt", "w") as fh:
            fh.write(str(len(pdf)))

    callback_sink(per_batch)(sample_df.repartition(4))
    files = list(out_dir.glob("*.cnt"))
    assert len(files) >= 1
    assert sum(int(f.read_text()) for f in files) == 100


def test_excel_invalid_mode(spark, sample_df, tmp_path):
    from mini_etl_spark.sinks import to_excel

    with pytest.raises(ValueError):
        to_excel(str(tmp_path / "x.xlsx"), mode="r")


# ---------------------------------------------------------------------------
# text / binaryFile sources
# ---------------------------------------------------------------------------

def test_read_text_lines_and_whole(spark, tmp_path):
    from mini_etl_spark.sources import read_text

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("line one\nline two\n")
    (d / "b.txt").write_text("solo doc body\n")
    lines = read_text(str(d), line_col="text")(spark)
    assert lines.columns == ["text"]
    assert lines.count() == 3
    whole = read_text(str(d), whole_file=True, line_col="text")(spark)
    docs = sorted(r.text for r in whole.collect())
    assert len(docs) == 2 and docs[1].startswith("solo doc")


def test_read_binary_files_multimodal_onramp(spark, tmp_path):
    """binaryFile rows feed functions.multimodal feature extraction
    unchanged — the asset ingestion path is end-to-end real."""
    import hashlib

    from mini_etl_spark.functions import multimodal as mm
    from mini_etl_spark.sources import read_binary_files
    from pyspark.sql import functions as F

    d = tmp_path / "assets"
    d.mkdir()
    payloads = {"x.png": b"\x89PNG fake image bytes", "y.wav": b"RIFF fake audio"}
    for name, data in payloads.items():
        (d / name).write_bytes(data)
    (d / "skip.txt").write_bytes(b"not an asset")

    df = read_binary_files(str(d), glob="*.{png,wav}")(spark)
    assert {"path", "length", "content"} <= set(df.columns)
    assert df.count() == 2

    assets = df.select(
        F.abs(F.xxhash64("path")).alias("asset_id"),
        F.when(F.col("path").endswith(".png"), "image")
        .otherwise("audio")
        .alias("modality"),
        F.element_at(F.split("path", "/"), -1).alias("name"),
        "content",
    )
    names = {r.asset_id: r.name for r in assets.select("asset_id", "name").collect()}
    feats = {
        names[r.asset_id]: r
        for r in mm.extract_features(assets.drop("name")).collect()
    }
    for name, data in payloads.items():
        assert feats[name].n_bytes == len(data)
        assert feats[name].content_sha256 == hashlib.sha256(data).hexdigest()


# ---------------------------------------------------------------------------
# layout maintenance: compaction + sorted writes
# ---------------------------------------------------------------------------

def test_compact_parquet_small_files(spark, tmp_path):
    from mini_etl_spark.maintenance import compact_parquet, dataset_stats

    src = str(tmp_path / "fragmented")
    # simulate incremental-append drift: 64 tiny files
    spark.range(64_000).repartition(64).write.parquet(src)
    assert dataset_stats(spark, src)["n_files"] == 64

    out = str(tmp_path / "compacted")
    report = compact_parquet(spark, src, out, target_file_mb=1024)
    assert report["after"]["n_files"] == 1  # tiny dataset -> one file
    assert spark.read.parquet(out).count() == 64_000
    assert report["before"]["total_bytes"] > 0


def test_sorted_write_enables_file_skipping(spark, tmp_path):
    """sort_by range-partitions the write so each file covers a narrow id
    range; a selective filter then reads fewer files than exist."""
    from mini_etl_spark.sinks import to_parquet
    from pyspark.sql import functions as F

    out = str(tmp_path / "sorted")
    df = spark.range(100_000).withColumn("v", F.col("id") % 7)
    df = df.repartition(8)  # scrambled input
    to_parquet(out, mode="overwrite", sort_by=["id"], sort_partitions=6)(df)
    back = spark.read.parquet(out)
    assert back.count() == 100_000
    # each file must hold a contiguous, non-overlapping id range
    ranges = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(ranges) > 1
    for prev, cur in zip(ranges, ranges[1:]):
        assert prev.hi < cur.lo


def test_xml_roundtrip(spark, sample_df, tmp_path):
    """Built-in Spark 4 XML source/sink: distributed write → read restores
    rows; rowTag/rootTag honored; projection works through the reader."""
    from mini_etl_spark.sinks import to_xml
    from mini_etl_spark.sources import read_xml

    path = str(tmp_path / "out_xml")
    to_xml(path, row_tag="rec", root_tag="data")(sample_df)
    back = read_xml(path, row_tag="rec")(spark)
    assert back.count() == sample_df.count()
    assert set(back.columns) == set(sample_df.columns)
    left = sorted(sample_df.select(*sorted(sample_df.columns)).collect())
    right = sorted(back.select(*sorted(sample_df.columns)).collect())
    assert [tuple(r) for r in left] == [tuple(r) for r in right]
    only = read_xml(path, row_tag="rec", columns=[sample_df.columns[0]])(spark)
    assert only.columns == [sample_df.columns[0]]
