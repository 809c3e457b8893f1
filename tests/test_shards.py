"""to_training_shards / read_shard_manifest: deterministic shard layout,
one file per shard, manifest consistency, stable assignment."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from mini_etl_spark.functions.splits import hash_bucket
from mini_etl_spark.sinks.shards import read_shard_manifest, to_training_shards


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"text for document {i}", f"src{i % 3}") for i in range(500)]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_shard_layout_and_readback(spark, corpus, tmp_path):
    path = str(tmp_path / "shards")
    to_training_shards(path, num_shards=8, key_col="doc_id", fmt="jsonl")(corpus)
    # hive layout, one data file per non-empty shard
    dirs = sorted(glob.glob(os.path.join(path, "shard=*")))
    assert 1 <= len(dirs) <= 8
    for d in dirs:
        files = [f for f in glob.glob(os.path.join(d, "*")) if not f.endswith(".crc")]
        assert len(files) == 1, f"expected one data file in {d}, got {files}"
    # read back: full row parity, shard comes back as a partition column
    back = spark.read.format("json").load(path)
    assert back.count() == 500
    assert "shard" in back.columns
    assert sorted(r["doc_id"] for r in back.select("doc_id").collect()) == list(range(500))
    # shard values match the library's hash_bucket assignment
    expected = {
        r["doc_id"]: r["b"]
        for r in corpus.select(
            "doc_id", hash_bucket("doc_id", seed=42, num_buckets=8).alias("b")
        ).collect()
    }
    for r in back.select("doc_id", "shard").collect():
        assert int(r["shard"]) == expected[r["doc_id"]]


def test_manifest_counts(spark, corpus, tmp_path):
    path = str(tmp_path / "shards_m")
    to_training_shards(path, num_shards=4, key_col="doc_id", fmt="parquet")(corpus)
    m = read_shard_manifest(path)
    assert m["num_shards"] == 4 and m["total_rows"] == 500
    assert sum(m["shards"].values()) == 500
    back = spark.read.parquet(path)
    actual = {
        str(r["shard"]): r["n"]
        for r in back.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for k, v in m["shards"].items():
        assert actual.get(k, 0) == v


def test_assignment_stable_across_exports(spark, corpus, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    # second export over a GROWN corpus: original rows keep their shard
    grown = corpus.unionByName(
        corpus.sparkSession.createDataFrame(
            [(1000 + i, f"new {i}", "srcX") for i in range(50)],
            "doc_id long, text string, source string",
        )
    )
    to_training_shards(p1, num_shards=8)(corpus)
    to_training_shards(p2, num_shards=8)(grown)
    a = {r["doc_id"]: int(r["shard"]) for r in spark.read.json(p1).collect()}
    b = {r["doc_id"]: int(r["shard"]) for r in spark.read.json(p2).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_shards_validation(spark, corpus, tmp_path):
    with pytest.raises(ValueError, match="num_shards"):
        to_training_shards(str(tmp_path / "x"), num_shards=0)(corpus)
    with pytest.raises(ValueError, match="fmt"):
        to_training_shards(str(tmp_path / "x"), num_shards=2, fmt="avro")(corpus)
    with pytest.raises(ValueError, match="already exists"):
        to_training_shards(str(tmp_path / "x"), num_shards=2)(
            corpus.withColumn("shard", F.lit(1))
        )
    # append/ignore would desync manifest and one-file-per-shard layout
    with pytest.raises(ValueError, match="fresh-write"):
        to_training_shards(str(tmp_path / "x"), num_shards=2, mode="a")(corpus)
    with pytest.raises(ValueError, match="fresh-write"):
        to_training_shards(str(tmp_path / "x"), num_shards=2, mode="ignore")(corpus)


def test_shards_uri_path_manifest(spark, corpus, tmp_path):
    # file:// URI: manifest must land NEXT TO the shards, not in a
    # mangled cwd-relative local path
    path = "file://" + str(tmp_path / "uri_shards")
    to_training_shards(path, num_shards=4)(corpus)
    m = read_shard_manifest(path, spark)
    assert m["total_rows"] == 500
    assert os.path.exists(str(tmp_path / "uri_shards" / "_manifest.json"))


def test_token_balanced_shard_writer(spark, corpus, tmp_path):
    """tokens_per_shard mode: shards cut by token mass along the md5
    layout; hive layout + one file per shard + manifest hold; every doc
    written exactly once, whole."""
    path = str(tmp_path / "tok_shards")
    to_training_shards(path, tokens_per_shard=300, fmt="jsonl")(corpus)
    import glob as g
    import os as o

    dirs = sorted(g.glob(o.path.join(path, "shard=*")))
    assert len(dirs) >= 2
    for d in dirs:
        files = [f for f in g.glob(o.path.join(d, "*")) if not f.endswith(".crc")]
        assert len(files) == 1
    back = spark.read.json(path)
    assert back.count() == 500
    assert back.select("doc_id").distinct().count() == 500
    man = read_shard_manifest(path, spark)
    assert sum(man["shards"].values()) == 500
    # exactly-one-mode contract
    with pytest.raises(ValueError, match="exactly one"):
        to_training_shards(str(tmp_path / "x"), num_shards=2, tokens_per_shard=10)(corpus)
    with pytest.raises(ValueError, match="exactly one"):
        to_training_shards(str(tmp_path / "x"))(corpus)
    with pytest.raises(ValueError, match="tokens_per_shard"):
        to_training_shards(str(tmp_path / "x"), tokens_per_shard=0)(corpus)
