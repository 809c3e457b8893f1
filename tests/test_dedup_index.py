"""Persisted MinHash index (functions.dedup_index): build / probe / append,
candidate equivalence with the in-frame LSH join, and md5 portability mode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_etl_spark.functions import dedup as dd
from mini_etl_spark.functions.dedup_index import (
    minhash_index_append,
    minhash_index_dedup,
    minhash_index_write,
    minhash_signatures,
)

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the old river bank"),
    (2, "machine learning systems require large curated training corpora today"),
    (3, "completely unrelated text about cooking pasta with garlic and olive oil"),
]
BATCH = [
    # exact duplicate of corpus doc 1
    (101, "the quick brown fox jumps over the lazy dog near the old river bank"),
    # near-duplicate of corpus doc 2 (one word changed)
    (102, "machine learning systems require large curated training datasets today"),
    # novel
    (103, "quantum chemistry simulations on lattice models diverge rapidly here"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


@pytest.fixture(scope="module")
def index_path(tmp_path_factory):
    return str(tmp_path_factory.mktemp("mhidx") / "index")


def test_index_build_probe_append(spark, index_path):
    minhash_index_write(_df(spark, CORPUS), index_path, num_hashes=32, bands=8)
    pairs = minhash_index_dedup(
        spark, index_path, _df(spark, BATCH), threshold=0.5
    )
    got = {(r["batch_id"], r["corpus_id"]) for r in pairs.collect()}
    assert (101, 1) in got  # exact dup: est_jaccard = 1.0
    assert (102, 2) in got  # near dup
    assert not any(b == 103 for b, _ in got)  # novel doc matches nothing
    exact = pairs.filter("batch_id = 101").first()
    assert exact["est_jaccard"] == 1.0

    # append the novel doc, then a re-submission of it must be caught
    minhash_index_append(_df(spark, [(103, BATCH[2][1])]), index_path)
    again = minhash_index_dedup(
        spark, index_path, _df(spark, [(201, BATCH[2][1])]), threshold=0.9
    )
    assert {(r["batch_id"], r["corpus_id"]) for r in again.collect()} == {(201, 103)}


def test_index_candidates_match_inframe_lsh(spark, tmp_path):
    """Same hash chain + banding as minhash_lsh_pairs: the index probe must
    produce exactly the cross-split candidate pairs the in-frame LSH
    self-join finds on corpus ∪ batch."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs.filter("doc_id % 5 != 0")
    batch = docs.filter("doc_id % 5 = 0")

    path = str(tmp_path / "idx")
    minhash_index_write(corpus, path, num_hashes=64, bands=16)
    idx_pairs = minhash_index_dedup(
        spark, path, batch, threshold=0.0, max_bucket_freq=None
    )
    got = {(r["batch_id"], r["corpus_id"]) for r in idx_pairs.collect()}

    cands = dd.minhash_lsh_pairs(
        docs, "text", "doc_id", num_hashes=64, bands=16, verify=False
    )
    want = set()
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    for r in cands.collect():
        a, b = r["id_a"], r["id_b"]
        if (a in batch_ids) != (b in batch_ids):  # cross-split pairs only
            want.add((a, b) if a in batch_ids else (b, a))
    assert got == want
    assert len(got) > 0  # fixture contains planted near-dups


def test_signature_agreement_estimates_jaccard(spark):
    # identical docs agree on every component; unrelated docs on almost none
    sig = minhash_signatures(
        _df(spark, [(1, CORPUS[0][1]), (2, CORPUS[0][1]), (3, CORPUS[2][1])]),
        num_hashes=64,
    )
    rows = {r["__id"]: [r[f"h{i}"] for i in range(64)] for r in sig.collect()}
    same = sum(a == b for a, b in zip(rows[1], rows[2]))
    diff = sum(a == b for a, b in zip(rows[1], rows[3]))
    assert same == 64
    assert diff < 16


def test_md5_mode_is_engine_portable_and_finds_dups(spark, tmp_path):
    path = str(tmp_path / "idx_md5")
    minhash_index_write(
        _df(spark, CORPUS), path, num_hashes=16, bands=4, hash_fn="md5"
    )
    pairs = minhash_index_dedup(spark, path, _df(spark, BATCH), threshold=0.5)
    got = {(r["batch_id"], r["corpus_id"]) for r in pairs.collect()}
    assert (101, 1) in got and (102, 2) in got


def test_index_filter_continuous_ingestion_loop(spark, tmp_path):
    from mini_etl_spark.functions.dedup_index import minhash_index_filter

    path = str(tmp_path / "loop_idx")
    minhash_index_write(_df(spark, CORPUS), path, num_hashes=32, bands=8)

    # batch 1: dup of corpus doc 1 dropped, novel doc kept AND appended
    kept = minhash_index_filter(
        _df(spark, [(101, CORPUS[0][1]), (103, BATCH[2][1])]),
        path,
        append_survivors=True,
    )
    assert [r["doc_id"] for r in kept.collect()] == [103]

    # batch 2: resubmission of the batch-1 survivor is now caught
    kept2 = minhash_index_filter(_df(spark, [(201, BATCH[2][1])]), path)
    assert kept2.count() == 0


def test_index_dedup_config_node(spark, tmp_path):
    from mini_etl_spark.config import ConfigLoader

    path = str(tmp_path / "cfg_idx")
    minhash_index_write(_df(spark, CORPUS), path, num_hashes=32, bands=8)
    src = str(tmp_path / "batch.parquet")
    _df(spark, BATCH).write.parquet(src)
    out = str(tmp_path / "out.parquet")
    cfg = {
        "pipeline": {
            "name": "ingest",
            "source": {"type": "parquet", "path": src},
            "transformers": [{"type": "index_dedup", "path": path}],
            "sink": {"type": "parquet", "path": out, "mode": "w"},
        }
    }
    loader = ConfigLoader()
    loader.build_pipeline(loader.parse(cfg)).run(spark)
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {103}  # 101 (exact dup) and 102 (near dup) dropped


def test_hot_bucket_cap_drops_boilerplate(spark, tmp_path):
    # 60 identical corpus docs form one giant bucket per band; with the cap
    # at 10 the batch copy of that text yields zero candidates, so the join
    # volume is bounded even when boilerplate floods the index.
    rows = [(i, "standard legal disclaimer text repeated on every page of site")
            for i in range(60)]
    path = str(tmp_path / "idx_hot")
    minhash_index_write(_df(spark, rows), path, num_hashes=32, bands=8)
    batch = _df(spark, [(999, rows[0][1])])
    capped = minhash_index_dedup(spark, path, batch, threshold=0.5,
                                 max_bucket_freq=10)
    assert capped.count() == 0
    uncapped = minhash_index_dedup(spark, path, batch, threshold=0.5,
                                   max_bucket_freq=None)
    assert uncapped.count() == 60


def test_fingerprint_index_exact_gate(spark, tmp_path):
    from mini_etl_spark.functions.dedup_index import (
        fingerprint_index_filter,
        fingerprint_index_write,
    )

    path = str(tmp_path / "fp_idx")
    fingerprint_index_write(_df(spark, CORPUS), path)

    batch = _df(
        spark,
        [
            (101, CORPUS[0][1]),              # exact corpus dup → dropped
            (102, CORPUS[0][1].upper()),      # token-set identical → dropped
            (103, "a wholly new document about nothing in particular"),
            (104, "a wholly new document about nothing in particular"),  # in-batch dup
            (105, BATCH[1][1]),               # near-dup but NOT exact → kept
        ],
    )
    kept = fingerprint_index_filter(batch, path, append_survivors=True)
    assert sorted(r["doc_id"] for r in kept.collect()) == [103, 105]

    # resubmission of a batch-1 survivor is now exact-blocked
    again = fingerprint_index_filter(
        _df(spark, [(201, BATCH[1][1])]), path
    )
    assert again.count() == 0


def test_index_filter_in_batch_near_dups(spark, tmp_path):
    """Two near-duplicate docs arriving in the SAME batch: only the min-id
    member survives (and is the only one appended to the index), mirroring
    fingerprint_index_filter's in-batch winners step. in_batch=False
    restores the old index-only gate."""
    from mini_etl_spark.functions.dedup_index import minhash_index_filter

    path = str(tmp_path / "inbatch_idx")
    minhash_index_write(_df(spark, CORPUS), path, num_hashes=32, bands=8)
    # one word changed in a 20-word doc: true 3-shingle Jaccard ≈ 0.71,
    # safely above threshold 0.5 even with 32-hash estimation noise
    base = (
        "quantum chemistry simulations on small lattice models often diverge "
        "rapidly when the basis set truncation interacts with electron "
        "correlation terms"
    )
    novel = base
    near = base.replace("diverge", "converge")
    batch = [(201, novel), (202, near), (203, "tidal patterns shift benthic fauna zones")]

    # index-only gate keeps both co-arriving near-dups
    both = minhash_index_filter(_df(spark, batch), path, in_batch=False)
    assert {r["doc_id"] for r in both.collect()} == {201, 202, 203}

    # default gate keeps the min-id member only, and appends just that one
    kept = minhash_index_filter(
        _df(spark, batch), path, append_survivors=True
    )
    assert {r["doc_id"] for r in kept.collect()} == {201, 203}
    resub = minhash_index_filter(_df(spark, [(301, near)]), path)
    assert resub.count() == 0  # 202's survivor twin (201) now guards it


def test_append_retry_heals_bands_lost_in_crash_window(spark, tmp_path):
    """ADVICE r11 (medium): _write_parts lands signatures BEFORE bands,
    and the pre-r12 idempotence anti-join keyed on signatures alone — a
    crash between the two writes followed by the advertised retry
    anti-joined the batch away, leaving it in signatures but PERMANENTLY
    absent from the band postings (invisible to every probe). The append
    is now per-component idempotent: the retry must back-fill the missing
    bands without duplicating the signature rows."""
    import os

    from mini_etl_spark.functions.dedup_index import _read_meta

    idx = str(tmp_path / "idx")
    minhash_index_write(_df(spark, CORPUS), idx, num_hashes=32, bands=8)
    meta = _read_meta(idx)

    novel = [(500, "entirely fresh paragraph describing alpine glacier hydrology")]
    batch = _df(spark, novel)

    # simulate the crash window: the batch's SIGNATURES landed, its band
    # postings did not (exactly what a kill between the two writes leaves)
    sig = minhash_signatures(
        batch, meta["text_col"], meta["id_col"], meta["n"],
        meta["num_hashes"], meta["hash_fn"],
    )
    sig.withColumnRenamed("__id", meta["id_col"]).write.mode("append").parquet(
        os.path.join(idx, "signatures")
    )
    # stranded: probes cannot see doc 500 (no postings)
    pre = minhash_index_dedup(spark, idx, _df(spark, [(900, novel[0][1])]),
                              threshold=0.9)
    assert pre.isEmpty()

    # the advertised retry — must HEAL, not no-op
    n = minhash_index_append(batch, idx)
    assert n == 1

    sigs = spark.read.parquet(os.path.join(idx, "signatures"))
    assert sigs.filter(F.col("doc_id") == 500).count() == 1  # not duplicated
    bands = spark.read.parquet(os.path.join(idx, "bands"))
    assert bands.filter(F.col("doc_id") == 500).count() == meta["bands"]

    post = minhash_index_dedup(spark, idx, _df(spark, [(900, novel[0][1])]),
                               threshold=0.9)
    assert {(r["batch_id"], r["corpus_id"]) for r in post.collect()} == {(900, 500)}

    # a full retry AFTER success stays a no-op (idempotence preserved)
    assert minhash_index_append(batch, idx) == 0
    assert sigs.filter(F.col("doc_id") == 500).count() == 1
    assert spark.read.parquet(os.path.join(idx, "bands")).filter(
        F.col("doc_id") == 500
    ).count() == meta["bands"]
