"""Persisted EXACT-Jaccard prefix index
(mini_etl_spark/functions/jaccard_index.py): build/probe/append/gate,
frozen-order exactness, idempotence, CLI lifecycle, compaction.

The index's core claim — exactness is UNCONDITIONAL under the frozen
element order (the prefix lemma holds for ANY fixed total order;
frequency-ascending is only the pruning heuristic) — is pinned by the
append-equals-rebuild probe differential: an index grown by appends
(ranked under the BUILD-time order) must return bit-identical matches
to an index rebuilt from scratch (a completely different order).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mini_etl_spark.functions import jaccard_index as JI

from tests.conftest import SF_SMALL


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text"
    )


def test_probe_matches_handcrafted_truth(spark, tmp_path):
    """Exact dup -> 1.0, near dup -> its true rounded jaccard, unrelated
    and sub-n-token docs -> no match; threshold on the ROUNDED value."""
    idx = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "one two three four five six"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "ji")
    assert JI.jaccard_index_write(idx, path) == 2
    batch = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon"),   # = doc 1 -> 1.0
            (11, "one two three four five seven"),    # 3 of 4 shingles
            (12, "unrelated words entirely here now"),
            (13, "too short"),                        # < 3 tokens
        ],
        "doc_id long, text string",
    )
    out = {(r.batch_id, r.index_id): r.jaccard
           for r in JI.jaccard_index_dedup(batch, path, 0.5).collect()}
    # doc 11 vs 2: shingle sets of size 4, 3 shared -> 3/5 = 0.6
    assert out == {(10, 1): 1.0, (11, 2): 0.6}
    # higher threshold drops the near dup, keeps the exact dup
    out = {(r.batch_id, r.index_id)
           for r in JI.jaccard_index_dedup(batch, path, 0.7).collect()}
    assert out == {(10, 1)}


def test_probe_equals_cross_frame_exact_truth(spark, tmp_path):
    """Differential on real data: probe(batch vs index) must equal the
    in-frame exact join's cross-half pairs — the persisted path and
    jaccard_pairs_exact are two routes to one truth."""
    from mini_etl_spark.functions.dedup import jaccard_pairs_exact

    docs = _docs(spark)
    path = str(tmp_path / "ji")
    JI.jaccard_index_write(docs.filter("doc_id % 2 = 0"), path)
    got = {(r.batch_id, r.index_id, r.jaccard)
           for r in JI.jaccard_index_dedup(
               docs.filter("doc_id % 2 = 1"), path, 0.5).collect()}
    truth = set()
    for r in jaccard_pairs_exact(docs, threshold=0.5).collect():
        if (r.id_a % 2) != (r.id_b % 2):
            bid, iid = ((r.id_a, r.id_b) if r.id_a % 2 == 1
                        else (r.id_b, r.id_a))
            truth.add((bid, iid, r.jaccard))
    assert got == truth and truth


def test_append_equals_rebuild_probe(spark, tmp_path):
    """THE frozen-order exactness pin: grow-by-append (old order) and
    rebuild-from-scratch (new order) must probe identically."""
    docs = _docs(spark)
    half = docs.filter("doc_id % 2 = 0")
    extra = docs.filter("doc_id % 2 = 1").limit(80).localCheckpoint()
    probe = docs.filter("doc_id % 7 = 3").withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    grown = str(tmp_path / "grown")
    JI.jaccard_index_write(half, grown)
    with pytest.warns(UserWarning, match="unseen"):
        assert JI.jaccard_index_append(extra, grown) == 80
    rebuilt = str(tmp_path / "rebuilt")
    JI.jaccard_index_write(half.unionByName(extra), rebuilt)
    m1 = {(r.batch_id, r.index_id, r.jaccard)
          for r in JI.jaccard_index_dedup(probe, grown, 0.5).collect()}
    m2 = {(r.batch_id, r.index_id, r.jaccard)
          for r in JI.jaccard_index_dedup(probe, rebuilt, 0.5).collect()}
    assert m1 == m2 and m1


def test_append_idempotent(spark, tmp_path):
    """Re-running a completed append is a no-op: 0 returned, no
    duplicate postings rows (one component -> no crash window)."""
    docs = _docs(spark)
    path = str(tmp_path / "ji")
    JI.jaccard_index_write(docs.filter("doc_id % 2 = 0"), path)
    batch = docs.filter("doc_id % 2 = 1").limit(30).localCheckpoint()
    import warnings as W

    with W.catch_warnings():
        W.simplefilter("ignore")
        assert JI.jaccard_index_append(batch, path) == 30
        before = spark.read.parquet(os.path.join(path, "postings")).count()
        assert JI.jaccard_index_append(batch, path) == 0
    after = spark.read.parquet(os.path.join(path, "postings")).count()
    assert before == after
    post = spark.read.parquet(os.path.join(path, "postings"))
    assert post.count() == post.select("doc_id", "g").distinct().count()


def test_filter_gate_in_batch_and_survivor_loop(spark, tmp_path):
    """Gate semantics: index matches drop, co-arriving in-batch dups
    keep only the min-id winner, survivors append so a re-gate of the
    same batch drains to zero."""
    idx = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    path = str(tmp_path / "ji")
    JI.jaccard_index_write(idx, path)
    batch = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon"),  # index dup -> drop
            (11, "one two three four five"),         # in-batch pair, min id
            (12, "one two three four five"),         # -> dropped
            (13, "completely different text here"),  # survivor
        ],
        "doc_id long, text string",
    )
    import warnings as W

    with W.catch_warnings():
        W.simplefilter("ignore")
        kept = JI.jaccard_index_filter(
            batch, path, 0.5, append_survivors=True
        )
        assert {r.doc_id for r in kept.collect()} == {11, 13}
        # everything is now indexed (or an in-batch dup of something
        # indexed): the same batch drains
        again = JI.jaccard_index_filter(batch, path, 0.5)
        assert again.count() == 0
    # in_batch=False keeps both co-arriving dups (pre-deduped caller)
    path2 = str(tmp_path / "ji2")
    JI.jaccard_index_write(idx, path2)
    kept = JI.jaccard_index_filter(batch, path2, 0.5, in_batch=False)
    assert {r.doc_id for r in kept.collect()} == {11, 12, 13}


def test_unmarked_path_raises(spark, tmp_path):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="_JACCARD.json"):
        JI.jaccard_index_dedup(df, str(tmp_path / "nope"))


def test_cli_lifecycle(spark, tmp_path):
    """index-build / index-append --kind jaccard: params resolve from
    the marker (never re-passed), append is idempotent from the shell."""
    import json

    from click.testing import CliRunner

    from mini_etl_spark.cli import main

    docs = _docs(spark)
    corpus = str(tmp_path / "corpus")
    batch = str(tmp_path / "batch")
    docs.filter("doc_id % 2 = 0").write.parquet(corpus)
    docs.filter("doc_id % 2 = 1").limit(20).write.parquet(batch)
    path = str(tmp_path / "ji")
    r = CliRunner().invoke(
        main,
        ["index-build", path, "--kind", "jaccard", "--input", corpus],
        catch_exceptions=False,
    )
    assert r.exit_code == 0
    rep = json.loads(r.output.strip().splitlines()[-1])
    assert rep["kind"] == "jaccard" and rep["indexed_docs"] > 0
    for expect in (20, 0):  # second run: idempotent no-op
        r = CliRunner().invoke(
            main,
            ["index-append", path, "--kind", "jaccard", "--input", batch],
            catch_exceptions=False,
        )
        assert r.exit_code == 0
        rep = json.loads(r.output.strip().splitlines()[-1])
        assert rep["appended_docs"] == expect


def test_index_dedup_config_node_jaccard_kind(spark, tmp_path):
    """Declarative YAML surface: index_dedup kind=jaccard routes to the
    exact prefix index; shingle config resolves from the index marker,
    never from the YAML."""
    from mini_etl_spark.config import ConfigLoader

    path = str(tmp_path / "cfg_ji")
    JI.jaccard_index_write(
        spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon")],
            "doc_id long, text string",
        ),
        path,
    )
    src = str(tmp_path / "batch.parquet")
    spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon"),  # exact-index dup
            (11, "one two three four five"),
            (12, "one two three four five"),         # in-batch dup of 11
        ],
        "doc_id long, text string",
    ).write.parquet(src)
    out = str(tmp_path / "out.parquet")
    cfg = {
        "pipeline": {
            "name": "ingest",
            "source": {"type": "parquet", "path": src},
            "transformers": [
                {"type": "index_dedup", "kind": "jaccard", "path": path}
            ],
            "sink": {"type": "parquet", "path": out, "mode": "w"},
        }
    }
    loader = ConfigLoader()
    loader.build_pipeline(loader.parse(cfg)).run(spark)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {11}


def test_stream_dedup_jaccard_kind(spark, tmp_path):
    """Streaming ingestion gate over the EXACT index: stream 1 seeds
    survivors; stream 2 must drop re-submissions of both corpus docs
    and stream-1 survivors, pass novel docs. max_bucket_freq is
    minhash-only and is refused for the exact kind."""
    from mini_etl_spark.streaming.events import stream_dedup_against_index

    corpus_text = "the quick brown fox jumps over the lazy dog by the river"
    novel1 = "completely new essay about distributed query engines at scale"
    novel2 = "another unseen document describing garden landscaping advice"
    idx = str(tmp_path / "idx")
    JI.jaccard_index_write(
        spark.createDataFrame([(1, corpus_text)], "doc_id long, text string"),
        idx,
    )
    src1 = str(tmp_path / "in1")
    spark.createDataFrame(
        [(100, corpus_text), (101, novel1)], "doc_id long, text string"
    ).write.parquet(src1)
    out = str(tmp_path / "out")
    import warnings as W

    with W.catch_warnings():
        W.simplefilter("ignore")
        stream_dedup_against_index(
            spark.readStream.schema("doc_id long, text string").parquet(src1),
            idx, out, checkpoint=str(tmp_path / "cp1"), kind="jaccard",
        )
        assert {r.doc_id for r in spark.read.parquet(out).collect()} == {101}
        src2 = str(tmp_path / "in2")
        spark.createDataFrame(
            [(200, novel1), (201, novel2)], "doc_id long, text string"
        ).write.parquet(src2)
        stream_dedup_against_index(
            spark.readStream.schema("doc_id long, text string").parquet(src2),
            idx, out, checkpoint=str(tmp_path / "cp2"), kind="jaccard",
        )
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {101, 201}
    with pytest.raises(ValueError, match="minhash bucket cap"):
        stream_dedup_against_index(
            spark.readStream.schema("doc_id long, text string").parquet(src2),
            idx, out, checkpoint=str(tmp_path / "cp3"),
            kind="jaccard", max_bucket_freq=10,
        )
    with pytest.raises(ValueError, match="kind must be"):
        stream_dedup_against_index(
            spark.readStream.schema("doc_id long, text string").parquet(src2),
            idx, out, checkpoint=str(tmp_path / "cp4"), kind="nope",
        )


def test_compact_preserves_probe(spark, tmp_path):
    """compact_minhash_index folds the jaccard postings component; probe
    results are unchanged and the file count drops."""
    from mini_etl_spark.maintenance import compact_minhash_index

    docs = _docs(spark)
    path = str(tmp_path / "ji")
    JI.jaccard_index_write(docs.filter("doc_id % 4 = 0"), path)
    import warnings as W

    with W.catch_warnings():
        W.simplefilter("ignore")
        for m in (1, 2, 3):
            JI.jaccard_index_append(
                docs.filter(f"doc_id % 4 = {m}").limit(15).localCheckpoint(),
                path,
            )
    probe = docs.filter("doc_id % 9 = 5").withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    before = {(r.batch_id, r.index_id, r.jaccard)
              for r in JI.jaccard_index_dedup(probe, path, 0.5).collect()}
    stats = compact_minhash_index(spark, path, target_file_mb=64)
    assert "postings" in stats
    after = {(r.batch_id, r.index_id, r.jaccard)
             for r in JI.jaccard_index_dedup(probe, path, 0.5).collect()}
    assert before == after
