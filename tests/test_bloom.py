"""Bloom-filter membership screening (functions/bloom.py).

No reference parity — the reference has no probabilistic membership
structure; this locks the extension's three contracts:

1. bit layout: the Spark word table equals a pure-Python replay of the
   same md5 double-hash construction (the same math the DuckDB oracle
   replays in SQL);
2. semantics: no false negatives ever, false positives pruned by the
   exact verify so bloom_decontaminate equals the plain exact-join
   answer for ANY (n_bits, k);
3. plan: the corpus-side test is k broadcast joins — no shuffle of the
   big side, and the pruning actually bites (candidates ≪ grams).
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from mini_etl_spark.functions import bloom as bl
from tests.conftest import SF_ORACLE


def _py_positions(value: str, k: int, n_bits: int, seed: int) -> list[int]:
    """Pure-Python twin of bloom._hash_halves + the K-M stride."""
    h = hashlib.md5(f"{seed}\x1f{value}".encode()).hexdigest()
    h1 = int(h[:8], 16)
    h2 = int(h[8:16], 16)
    h2 += 1 - h2 % 2
    return [(h1 + i * h2) % n_bits for i in range(k)]


def _py_words(values, k: int, n_bits: int, seed: int) -> dict[int, int]:
    words: dict[int, int] = {}
    for v in values:
        for pos in _py_positions(v, k, n_bits, seed):
            w, b = divmod(pos, bl.BITS_PER_WORD)
            words[w] = words.get(w, 0) | (1 << b)
    return words


def test_word_table_matches_python_replay(spark):
    vals = [f"gram {i} x" for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], ["g"])
    got = {
        r["word_idx"]: r["word"]
        for r in bl.bloom_build(df, "g", n_bits=1 << 12, k=5, seed=9).collect()
    }
    assert got == _py_words(vals, 5, 1 << 12, 9)


def test_no_false_negatives_and_fp_rate_in_band(spark):
    member = [f"in-{i}" for i in range(500)]
    other = [f"out-{i}" for i in range(5000)]
    n_bits, k = bl.bloom_parameters(len(member), 0.01)
    words = bl.bloom_build(
        spark.createDataFrame([(v,) for v in member], ["g"]),
        "g", n_bits=n_bits, k=k,
    ).localCheckpoint(eager=True)
    probe = spark.createDataFrame([(v,) for v in member + other], ["g"])
    flagged = bl.with_might_contain(
        probe, "g", words, n_bits=n_bits, k=k
    )
    hits = {r["g"] for r in flagged.filter("might_contain").collect()}
    assert set(member) <= hits  # a Bloom filter never misses a member
    fp = (len(hits) - len(member)) / len(other)
    # 0.01 design point; allow generous sampling slack
    assert fp <= 0.05, fp


def test_null_keys_never_match(spark):
    words = bl.bloom_build(
        spark.createDataFrame([("a",)], ["g"]), "g", n_bits=62 * 4, k=2
    ).localCheckpoint(eager=True)
    out = bl.with_might_contain(
        spark.createDataFrame([("a",), (None,)], ["g"]),
        "g", words, n_bits=62 * 4, k=2,
    ).collect()
    by_key = {r["g"]: r["might_contain"] for r in out}
    assert by_key["a"] is True
    assert by_key[None] is False


def test_empty_benchmark_keeps_everything(spark):
    train = spark.createDataFrame([(1, "alpha beta gamma delta epsilon")],
                                  ["doc_id", "text"])
    test = spark.createDataFrame([], "doc_id int, text string")
    out = bl.bloom_decontaminate(train, test, n=3)
    assert out.count() == 1


def test_decontaminate_equals_exact_join_any_sizing(spark):
    """The headline contract: for ANY (n_bits, k) — including an
    undersized filter with a terrible FP rate — the verify stage makes
    the result EXACTLY 'train docs sharing no n-gram with test'."""
    from mini_etl_spark.functions.dedup import _shingled
    from mini_etl_spark.functions import splits as sp

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    bucket = sp.hash_bucket("doc_id")
    train, test = docs.filter(bucket < 5000), docs.filter(bucket >= 5000)

    def grams(df):
        return _shingled(df, "text", "doc_id", 5).select(
            "__id", F.explode("__sh").alias("g")
        )

    bad = (
        grams(train).join(grams(test).select("g").distinct(), "g", "left_semi")
        .select(F.col("__id").alias("doc_id")).distinct()
    )
    exact = {r["doc_id"] for r in train.join(bad, "doc_id", "left_anti")
             .select("doc_id").collect()}
    for n_bits, k in ((62 * 8, 2), (1 << 16, 5)):  # saturated and sane
        got = {
            r["doc_id"]
            for r in bl.bloom_decontaminate(
                train, test, n=5, n_bits=n_bits, k=k
            ).select("doc_id").collect()
        }
        assert got == exact, (n_bits, k)


def test_corpus_side_plan_is_broadcast_only(spark):
    """No shuffle of the probed side: every join in with_might_contain is
    a BroadcastHashJoin and no Exchange hashpartitions the corpus grams."""
    words = bl.bloom_build(
        spark.createDataFrame([("x",)], ["g"]), "g", n_bits=1 << 12, k=4
    ).localCheckpoint(eager=True)
    probe = spark.range(1000).select(F.concat(F.lit("g"), "id").alias("g"))
    plan = (
        bl.with_might_contain(probe, "g", words, n_bits=1 << 12, k=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "hashpartitioning" not in plan


def test_pruning_actually_bites(spark):
    """The screen must shrink the verify input: with a properly sized
    filter, might-contain candidates ≈ true hits, a small fraction of
    the corpus grams tested."""
    from mini_etl_spark.functions.dedup import _shingled
    from mini_etl_spark.functions import splits as sp

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    bucket = sp.hash_bucket("doc_id")
    train, test = docs.filter(bucket < 5000), docs.filter(bucket >= 5000)
    te = (
        _shingled(test, "text", "doc_id", 5)
        .select(F.explode("__sh").alias("g")).distinct()
    )
    n_te = te.count()
    n_bits, k = bl.bloom_parameters(n_te, 0.01)
    words = bl.bloom_build(te, "g", n_bits=n_bits, k=k).localCheckpoint(
        eager=True
    )
    tr = _shingled(train, "text", "doc_id", 5).select(
        "__id", F.explode("__sh").alias("g")
    )
    total = tr.count()
    cand = bl.with_might_contain(tr, "g", words, n_bits=n_bits, k=k).filter(
        "might_contain"
    )
    n_cand = cand.count()
    true_hits = tr.join(te, "g", "left_semi").count()
    assert true_hits <= n_cand <= true_hits + math.ceil(0.05 * total)
    assert n_cand < total / 2  # the screen prunes, it doesn't pass-through


def test_parameter_validation():
    with pytest.raises(ValueError):
        bl.bloom_parameters(0)
    with pytest.raises(ValueError):
        bl.bloom_parameters(10, 1.5)
    with pytest.raises(ValueError):
        bl.bloom_fp_rate(10, 0, 3)
    n_bits, k = bl.bloom_parameters(1000, 0.01)
    assert n_bits % bl.BITS_PER_WORD == 0
    assert bl.bloom_fp_rate(1000, n_bits, k) < 0.015


def test_decontaminate_config_node(spark, tmp_path):
    """YAML surface: both methods drop the leaking doc, keep the clean one
    (side-input benchmark parquet, like the index_dedup node)."""
    from mini_etl_spark.config import ConfigLoader

    bench = str(tmp_path / "bench.parquet")
    spark.createDataFrame(
        [(900, "the quick brown fox jumps over the lazy dog tonight")],
        ["doc_id", "text"],
    ).write.parquet(bench)
    src = str(tmp_path / "train.parquet")
    spark.createDataFrame(
        [
            (1, "prefix the quick brown fox jumps over the lazy dog suffix"),
            (2, "completely unrelated training document about spark plans"),
        ],
        ["doc_id", "text"],
    ).write.parquet(src)
    for method, extra in (
        ("bloom", {"n": 5}),
        ("containment", {"n": 3, "threshold": 0.5}),
    ):
        out = str(tmp_path / f"out_{method}.parquet")
        cfg = {
            "pipeline": {
                "name": "decon",
                "source": {"type": "parquet", "path": src},
                "transformers": [
                    {"type": "decontaminate", "benchmark": bench,
                     "method": method, **extra}
                ],
                "sink": {"type": "parquet", "path": out, "mode": "w"},
            }
        }
        loader = ConfigLoader()
        loader.build_pipeline(loader.parse(cfg)).run(spark)
        kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert kept == {2}, method


def test_decontaminate_config_rejects_unknown_method(spark, tmp_path):
    from mini_etl_spark.config import ConfigLoader

    cfg = {
        "pipeline": {
            "name": "bad",
            "source": {"type": "parquet", "path": str(tmp_path / "x")},
            "transformers": [
                {"type": "decontaminate", "benchmark": "b", "method": "nope"}
            ],
            "sink": {"type": "null"},
        }
    }
    loader = ConfigLoader()
    with pytest.raises(ValueError, match="bloom|containment"):
        loader.build_pipeline(loader.parse(cfg))


def test_index_roundtrip_equals_direct(spark, tmp_path):
    """Persisted-index screen == direct bloom_decontaminate == exact
    membership, and the params marker round-trips the auto sizing."""
    from mini_etl_spark.functions import splits as sp

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    bucket = sp.hash_bucket("doc_id")
    train, test = docs.filter(bucket < 5000), docs.filter(bucket >= 5000)
    path = str(tmp_path / "decon_idx")
    params = bl.decontamination_index_write(test, path, n=5)
    assert params["n_bits"] % bl.BITS_PER_WORD == 0 and params["k"] >= 1
    via_index = {
        r["doc_id"]
        for r in bl.bloom_decontaminate_indexed(train, path)
        .select("doc_id").collect()
    }
    direct = {
        r["doc_id"]
        for r in bl.bloom_decontaminate(train, test, n=5)
        .select("doc_id").collect()
    }
    assert via_index == direct


def test_index_missing_or_halfbuilt_fails_loudly(spark, tmp_path):
    train = spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="not a decontamination index"):
        bl.bloom_decontaminate_indexed(train, str(tmp_path / "nope"))
    # half-built: grams/words exist but the marker was never published
    path = str(tmp_path / "half")
    bench = spark.createDataFrame([(9, "a b c d e f")], ["doc_id", "text"])
    bl.decontamination_index_write(bench, path, n=3)
    import os
    os.remove(f"{path}/_BLOOM.json")
    with pytest.raises(ValueError, match="not a decontamination index"):
        bl.bloom_decontaminate_indexed(train, path)


def test_index_config_node(spark, tmp_path):
    from mini_etl_spark.config import ConfigLoader

    bench = spark.createDataFrame(
        [(900, "the quick brown fox jumps over the lazy dog tonight")],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "idx")
    bl.decontamination_index_write(bench, idx, n=5)
    src = str(tmp_path / "train.parquet")
    spark.createDataFrame(
        [
            (1, "prefix the quick brown fox jumps over the lazy dog suffix"),
            (2, "completely unrelated training document about spark plans"),
        ],
        ["doc_id", "text"],
    ).write.parquet(src)
    out = str(tmp_path / "out.parquet")
    cfg = {
        "pipeline": {
            "name": "decon_idx",
            "source": {"type": "parquet", "path": src},
            "transformers": [{"type": "decontaminate", "index": idx}],
            "sink": {"type": "parquet", "path": out, "mode": "w"},
        }
    }
    loader = ConfigLoader()
    loader.build_pipeline(loader.parse(cfg)).run(spark)
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {2}


def test_config_rejects_ambiguous_benchmark_and_index(spark):
    from mini_etl_spark.config import ConfigLoader

    loader = ConfigLoader()
    for opts in ({}, {"benchmark": "b", "index": "i"}):
        cfg = {
            "pipeline": {
                "name": "bad",
                "source": {"type": "parquet", "path": "x"},
                "transformers": [{"type": "decontaminate", **opts}],
                "sink": {"type": "null"},
            }
        }
        with pytest.raises(ValueError, match="exactly one of"):
            loader.build_pipeline(loader.parse(cfg))


def test_streaming_frame_rejected_with_guidance(spark, tmp_path):
    src = str(tmp_path / "sdocs")
    spark.createDataFrame([(1, "a b c")], ["doc_id", "text"]).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    bench = spark.createDataFrame([(9, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="foreachBatch"):
        bl.bloom_decontaminate(stream, bench, n=3)
    idx = str(tmp_path / "idx")
    bl.decontamination_index_write(bench, idx, n=3)
    with pytest.raises(ValueError, match="foreachBatch"):
        bl.bloom_decontaminate_indexed(stream, idx)


# -- append path (decontamination_index_append) ------------------------------

def _bench_frames(spark):
    a = spark.createDataFrame(
        [(100 + i, f"alpha bench {i} tokens run through here {i}")
         for i in range(8)],
        ["doc_id", "text"],
    )
    b = spark.createDataFrame(
        [(200 + i, f"beta bench {i} other holdout material goes here {i}")
         for i in range(8)],
        ["doc_id", "text"],
    )
    return a, b


def _train_frame(spark):
    rows = [(1, "prefix alpha bench 3 tokens run through here 3 suffix"),
            (2, "prefix beta bench 5 other holdout material goes here 5 end"),
            (3, "completely unrelated training document about spark plans"),
            (4, "another clean doc with nothing shared across benchmarks")]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_index_append_equals_rebuild(spark, tmp_path):
    """build(A) + append(B) screens identically to build(A ∪ B) at the
    SAME (n_bits, k, seed) — the append ≡ rebuild differential, pinned
    sizing so the rebuilt filter lays out the same bits."""
    bench_a, bench_b = _bench_frames(spark)
    train = _train_frame(spark)
    appended = str(tmp_path / "appended")
    rebuilt = str(tmp_path / "rebuilt")
    bl.decontamination_index_write(
        bench_a, appended, n=3, n_bits=62 * 64, k=4
    )
    out = bl.decontamination_index_append(bench_b, appended)
    assert out["state"] == "ready" and out["appends"] == 1
    bl.decontamination_index_write(
        bench_a.unionByName(bench_b), rebuilt, n=3, n_bits=62 * 64, k=4
    )
    # the word tables are bit-identical, not just equivalent
    words = lambda p: {  # noqa: E731
        r["word_idx"]: r["word"]
        for r in spark.read.parquet(f"{p}/words").collect()
    }
    assert words(appended) == words(rebuilt)
    kept_app = {
        r["doc_id"]
        for r in bl.bloom_decontaminate_indexed(train, appended).collect()
    }
    kept_reb = {
        r["doc_id"]
        for r in bl.bloom_decontaminate_indexed(train, rebuilt).collect()
    }
    assert kept_app == kept_reb == {3, 4}
    # n_grams advanced to the union's distinct gram count
    assert out["n_grams"] == spark.read.parquet(
        f"{rebuilt}/grams"
    ).count()


def test_index_append_noop_and_missing(spark, tmp_path):
    bench_a, _ = _bench_frames(spark)
    path = str(tmp_path / "idx")
    params = bl.decontamination_index_write(bench_a, path, n=3)
    # same benchmark again: every gram already stored -> no-op
    out = bl.decontamination_index_append(bench_a, path)
    assert out["appends"] == params["appends"] == 0
    with pytest.raises(ValueError, match="not a decontamination index"):
        bl.decontamination_index_append(bench_a, str(tmp_path / "nope"))


def test_index_append_crash_refused(spark, tmp_path):
    """A marker stuck in state=appending (crash between the words and
    grams writes) must refuse BOTH further appends and screening — a
    half-applied append is the one path to Bloom false negatives."""
    import json
    import os

    bench_a, bench_b = _bench_frames(spark)
    path = str(tmp_path / "idx")
    bl.decontamination_index_write(bench_a, path, n=3)
    with open(f"{path}/_BLOOM.json") as f:
        params = json.load(f)
    params["state"] = "appending"
    with open(f"{path}/_BLOOM.json", "w") as f:
        json.dump(params, f)
    # the out-of-band edit invalidates Hadoop's checksum sidecar; drop it
    crc = f"{path}/._BLOOM.json.crc"
    if os.path.exists(crc):
        os.remove(crc)
    with pytest.raises(ValueError, match="mid-append"):
        bl.bloom_decontaminate_indexed(_train_frame(spark), path)
    with pytest.raises(ValueError, match="mid-append"):
        bl.decontamination_index_append(bench_b, path)


def test_index_append_fp_saturation_warns(spark, tmp_path, caplog):
    """Appending far past the original sizing degrades fp (never
    correctness) — the append logs a rebuild recommendation."""
    import logging

    bench_a, bench_b = _bench_frames(spark)
    path = str(tmp_path / "idx")
    # one word of filter: saturates immediately
    bl.decontamination_index_write(bench_a, path, n=3, n_bits=62, k=2)
    with caplog.at_level(logging.WARNING, logger="mini_etl_spark.functions.bloom"):
        out = bl.decontamination_index_append(bench_b, path)
    assert out["fp_rate"] > 0.04
    assert any("rebuild" in r.message for r in caplog.records)
    # and the screen is still EXACT despite the saturated filter
    kept = {
        r["doc_id"]
        for r in bl.bloom_decontaminate_indexed(_train_frame(spark), path)
        .collect()
    }
    assert kept == {3, 4}


def test_pinned_hashes_honored_under_auto_sizing(spark):
    """k pinned + n_bits auto sizes the mask FOR that k (the config
    `hashes:` path) instead of silently overriding it."""
    assert bl.bloom_parameters_for_k(1000, 4, 0.01) >= 62
    bench_a, _ = _bench_frames(spark)
    train = _train_frame(spark)
    out = bl.bloom_decontaminate(train, bench_a, n=3, k=4)
    assert {r["doc_id"] for r in out.select("doc_id").collect()} == {2, 3, 4}
    with pytest.raises(ValueError, match="k must be"):
        bl.bloom_decontaminate(train, bench_a, n=3, k=3.5)


def test_temp_columns_never_clobber_caller(spark):
    """A caller frame already carrying __h1/__w0-style names survives
    the screen intact (collision-free derived prefix)."""
    words = bl.bloom_build(
        spark.createDataFrame([("a",)], ["g"]), "g", n_bits=62 * 4, k=2
    ).localCheckpoint(eager=True)
    probe = spark.createDataFrame(
        [("a", 11, 22), ("b", 33, 44)], ["g", "__h1", "__w0"]
    )
    out = bl.with_might_contain(probe, "g", words, n_bits=62 * 4, k=2)
    assert set(out.columns) == {"g", "__h1", "__w0", "might_contain"}
    rows = {r["g"]: (r["__h1"], r["__w0"]) for r in out.collect()}
    assert rows == {"a": (11, 22), "b": (33, 44)}
