"""Round-8 hardening regressions — the VERDICT r7 task list and the four
ADVICE findings:

- auto_frequency_cap's candidate-volume budget fit runs its cumulative
  window over the PRE-AGGREGATED distinct-count-value frame, never the
  per-key (corpus-scaled) frequency frame (VERDICT #1, plan-asserted)
- the budget-overflow warning fires only when the floor actually admits
  volume past the budget, and the fitted caps are unchanged (ADVICE
  skew.py floor/hard-ceiling)
- config vocabulary accepts "auto" / "auto:<budget>" wherever a
  max_*_freq cap is declarative (VERDICT #4)
- committed-batch OUTPUT compaction for stream_token_shards: bounded
  dir/file/marker count, exactly-once reads across replays and
  compactions (VERDICT #3)
- stream_token_shards refuses an out_path whose commit markers carry a
  different query id (fresh checkpoint over old output) (ADVICE
  corpus.py query_id)
- stream_temperature_mix skips dataless staging dirs for empty
  micro-batches (ADVICE corpus.py zero-row batch)
- concurrent-reader isolation: read_token_shards / read_latest_snapshot
  stay exactly-once against half-published batches and mid-compaction
  states (VERDICT #7)
"""

import json
import os
import random
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_round7_hardening import (  # noqa: E402
    _drop_commit,
    _file_stream,
    _shard_oracle,
)


# ---------------------------------------------------------------------------
# auto_frequency_cap budget path (VERDICT r7 finding #1 + ADVICE)
# ---------------------------------------------------------------------------


def test_budget_fit_frame_aggregates_before_window(spark):
    """The cumulative Σcount² window must consume the groupBy(count)
    aggregate (one row per distinct count VALUE, bounded by max df) —
    never the raw per-key frequency frame (one row per distinct KEY,
    corpus-scaled). Regressing to the per-key window re-creates the
    round-7 single-task funnel, so assert the plan shape directly:
    an aggregate keyed on the count value sits BELOW the window."""
    from mini_etl_spark import plans
    from mini_etl_spark.operators.skew import _budget_fit_frame

    freq = spark.createDataFrame(
        [(f"k{i}", (i % 5) + 1) for i in range(100)], "k string, __f long"
    )
    plan = plans.physical_plan(_budget_fit_frame(freq, "__f"), "simple")
    assert "Window" in plan
    win = plan.index("Window")
    agg = plan.find("HashAggregate(keys=[__c", win)
    assert agg != -1, (
        "no per-count-value aggregate below the window — the cumulative "
        "sum is running over the per-key frame again:\n" + plan
    )
    # fitted values are exactly the closed-form cumulative volumes
    rows = {
        r["__c"]: r["__cum"]
        for r in _budget_fit_frame(freq, "__f").collect()
    }
    assert rows == {c: sum(
        v * v * 20 for v in range(1, c + 1)
    ) for c in range(1, 6)}


def test_budget_caps_unchanged_after_preaggregation(spark):
    """Same derived caps as the round-7 (per-key window) implementation
    on the round-7 test distribution."""
    from mini_etl_spark.operators.skew import auto_frequency_cap

    rows = [(f"lo{i}", 2) for i in range(1000)] + [
        (f"hi{i}", 50) for i in range(20)
    ]
    freq = spark.createDataFrame(rows, "k string, __f long")
    assert auto_frequency_cap(freq, floor=1, max_candidate_volume=10_000) == 2
    assert auto_frequency_cap(
        freq, floor=1, max_candidate_volume=10_000_000
    ) >= 50
    assert auto_frequency_cap(freq, floor=7, max_candidate_volume=1) == 7


def test_budget_overflow_warning_only_when_real(spark, caplog):
    """The floor-overrides-budget warning fires iff the final cap
    actually admits volume past the budget — a budget the whole
    distribution fits under must stay silent even though the fitted
    value (max observed df) sits below the floor."""
    import logging

    from mini_etl_spark.operators.skew import auto_frequency_cap

    freq = spark.createDataFrame(
        [(f"k{i}", 3) for i in range(10)], "k string, __f long"
    )  # total volume 90
    with caplog.at_level(logging.WARNING, logger="mini_etl_spark.operators.skew"):
        caplog.clear()
        assert auto_frequency_cap(freq, floor=64, max_candidate_volume=10_000) == 64
        assert not [r for r in caplog.records if "overrides" in r.message]
        caplog.clear()
        # floor 64 admits every f=3 key (volume 90) but budget is 10
        assert auto_frequency_cap(freq, floor=64, max_candidate_volume=10) == 64
        assert [r for r in caplog.records if "overrides" in r.message]


def test_config_accepts_auto_budget_cap(spark, tmp_path):
    """YAML e2e: a remove_spans node with max_span_freq: 'auto:1e9'
    builds and runs; the malformed budget raises at build time."""
    from mini_etl_spark.config import ConfigLoader

    src = tmp_path / "docs"
    rows = [(i, "w x common passage tokens here live y z") for i in range(6)]
    rows[0] = (0, "alpha beta common passage tokens here live gamma")
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        str(src)
    )
    out = tmp_path / "out"
    cfg = tmp_path / "cap.yaml"
    cfg.write_text(
        f"""
name: budgetcap
source: {{type: parquet, path: '{src}'}}
transformers:
  - type: remove_spans
    width: 3
    max_span_freq: "auto:1e9"
sink: {{type: parquet, path: '{out}', mode: overwrite}}
"""
    )
    loader = ConfigLoader()
    config = loader.load(cfg)
    assert config.validate() == []
    loader.build_pipeline(config).run(spark)
    got = spark.read.parquet(str(out)).collect()
    assert len(got) == 6
    survivors = [
        r.doc_id for r in got
        if "common passage tokens here live" in r.clean_text
    ]
    assert survivors in ([], [0])

    bad = tmp_path / "bad.yaml"
    bad.write_text(
        f"""
name: badcap
source: {{type: parquet, path: '{src}'}}
transformers:
  - type: remove_spans
    max_span_freq: "auto:abc"
sink: {{type: parquet, path: '{out}', mode: overwrite}}
"""
    )
    with pytest.raises(ValueError, match="budget must be numeric"):
        loader.build_pipeline(loader.load(bad))


def test_index_dedup_config_accepts_auto_budget(spark, tmp_path):
    """The index_dedup node's max_bucket_freq takes the budget form too."""
    from mini_etl_spark.config import ConfigLoader
    from mini_etl_spark.functions.dedup_index import minhash_index_write

    corpus = [(1, "the quick brown fox jumps over the lazy dog tonight"),
              (2, "completely different sentence about database engines")]
    batch = [(101, corpus[0][1]), (103, "a third novel document entirely")]
    path = str(tmp_path / "idx")
    minhash_index_write(
        spark.createDataFrame(corpus, "doc_id long, text string"), path,
        num_hashes=32, bands=8,
    )
    src = str(tmp_path / "batch.parquet")
    spark.createDataFrame(batch, "doc_id long, text string").write.parquet(src)
    out = str(tmp_path / "out.parquet")
    cfg = {
        "pipeline": {
            "name": "ingest",
            "source": {"type": "parquet", "path": src},
            "transformers": [{
                "type": "index_dedup", "path": path,
                "max_bucket_freq": "auto:1e9",
            }],
            "sink": {"type": "parquet", "path": out, "mode": "w"},
        }
    }
    loader = ConfigLoader()
    loader.build_pipeline(loader.parse(cfg)).run(spark)
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {103}  # exact dup of corpus doc 1 dropped


# ---------------------------------------------------------------------------
# stream_token_shards OUTPUT compaction (VERDICT r7 #3)
# ---------------------------------------------------------------------------


def _out_layout(out):
    """(batch ids on disk, committed marker ids, generation names)."""
    import pathlib

    root = pathlib.Path(out)
    dirs = sorted(
        int(d.name.split("=", 1)[1])
        for d in root.iterdir()
        if d.is_dir() and d.name.startswith("batch=")
    )
    commits = root / "_commits"
    markers = sorted(
        int(p.name[:-5])
        for p in commits.iterdir()
        if p.name.endswith(".json")
    ) if commits.is_dir() else []
    gens = sorted(
        d.name for d in (root / "compact").iterdir() if d.is_dir()
    ) if (root / "compact").is_dir() else []
    return dirs, markers, gens


def test_token_shards_output_compaction_bounded_exactly_once(spark, tmp_path):
    """12 micro-batches at compact_every=4 (compactions at batches 4, 8:
    upto 3 and 7): the directory/marker count stays bounded (grace = one
    cycle), the compacted generation keeps the shard partitioning, and
    read_token_shards returns every row exactly once, equal to the
    prefix-sum oracle — including across a forced replay."""
    from mini_etl_spark.streaming import read_token_shards, stream_token_shards

    schema = "doc_id long, text string"
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    tps = 23
    batches = []
    for b in range(10):
        rows = [(b * 100 + i, "tok " * (2 + (b + i) % 6)) for i in range(6)]
        batches.append(rows)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"f{b:02d}")
        )
    stream_token_shards(_file_stream(spark, src, schema), out, str(ckpt),
                        tokens_per_shard=tps, seed=5, compact_every=4)

    dirs, markers, gens = _out_layout(out)
    # compactions at batch 4 (seal 0-3) and 8 (seal 4-7, GC batches <=3)
    assert dirs == [4, 5, 6, 7, 8, 9]      # 0-3 GC'd, 4-7 grace-retained
    assert markers == [4, 5, 6, 7, 8, 9]
    assert gens == ["seg-0-3", "seg-4-7"]  # two sealed immutable segments
    pointer = json.loads((tmp_path / "out" / "_COMPACT.json").read_text())
    assert pointer["upto"] == 7
    assert [(lo, hi) for lo, hi, _ in pointer["segments"]] == [(0, 3), (4, 7)]
    # segments preserve hive shard partitioning
    import pathlib
    gen = pathlib.Path(out) / "compact" / "seg-4-7"
    assert any(d.name.startswith("shard=") for d in gen.iterdir())

    got = [(r.doc_id, r.shard) for r in read_token_shards(spark, out).collect()]
    assert len(got) == 60 and len(set(i for i, _ in got)) == 60
    assert dict(got) == _shard_oracle(batches, 5, tps)

    # forced replay of the next batch, which is also a compaction batch
    # (batch 12 folds <=11): replayed compaction must be idempotent
    for b in range(10, 13):
        rows = [(b * 100 + i, "tok " * (2 + (b + i) % 6)) for i in range(6)]
        batches.append(rows)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"f{b:02d}")
        )
    stream_token_shards(_file_stream(spark, src, schema), out, str(ckpt),
                        tokens_per_shard=tps, seed=5, compact_every=4)
    _drop_commit(ckpt)     # crash before the last checkpoint commit
    stream_token_shards(_file_stream(spark, src, schema), out, str(ckpt),
                        tokens_per_shard=tps, seed=5, compact_every=4)

    dirs, markers, gens = _out_layout(out)
    assert dirs == [8, 9, 10, 11, 12]      # <=7 GC'd at the upto=11 seal
    assert markers == [8, 9, 10, 11, 12]
    # sealed segments are never rewritten — all three are live
    assert gens == ["seg-0-3", "seg-4-7", "seg-8-11"]
    got = [(r.doc_id, r.shard) for r in read_token_shards(spark, out).collect()]
    assert len(got) == 78 and dict(got) == _shard_oracle(batches, 5, tps)

    with pytest.raises(ValueError, match="compact_every"):
        stream_token_shards(_file_stream(spark, src, schema), out,
                            str(tmp_path / "c2"), compact_every=1)


def test_token_shards_compaction_randomized_replay_soak(spark, tmp_path):
    """Seeded random kill-and-replay soak WITH output compaction live
    (compact_every=3): whatever the crash schedule, read_token_shards is
    exactly-once and equals the prefix-sum oracle."""
    from mini_etl_spark.streaming import read_token_shards, stream_token_shards

    rng = random.Random(827)
    schema = "doc_id long, text string"
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    tps = 17
    batches = []
    for b in range(9):
        rows = [(b * 100 + i, "tok " * rng.randint(2, 7)) for i in range(5)]
        batches.append(rows)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"f{b}")
        )
        stream_token_shards(_file_stream(spark, src, schema), out, str(ckpt),
                            tokens_per_shard=tps, seed=11, compact_every=3)
        if rng.random() < 0.5:  # crash before this batch's commit
            _drop_commit(ckpt)
            stream_token_shards(_file_stream(spark, src, schema), out,
                                str(ckpt), tokens_per_shard=tps, seed=11,
                                compact_every=3)

    got = [(r.doc_id, r.shard) for r in read_token_shards(spark, out).collect()]
    assert len(got) == sum(len(b) for b in batches)
    assert dict(got) == _shard_oracle(batches, 11, tps)
    # compaction actually ran and bounded the layout
    dirs, markers, _ = _out_layout(out)
    assert len(dirs) < 9 and len(markers) < 9


def test_token_shards_reader_grace_across_compaction(spark, tmp_path):
    """VERDICT #7 (concurrent-reader isolation): a DataFrame returned by
    read_token_shards BEFORE a compaction still collects correctly after
    that compaction ran (one-cycle GC grace retains everything it
    listed); a fresh read after the flip is exactly-once too."""
    from mini_etl_spark.streaming import read_token_shards, stream_token_shards
    from mini_etl_spark.streaming.corpus import (
        _checkpoint_query_id,
        _compact_output,
    )

    schema = "doc_id long, text string"
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    batches = []
    for b in range(4):
        rows = [(b * 10 + i, "tok " * (1 + i)) for i in range(4)]
        batches.append(rows)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"f{b}")
        )
    stream_token_shards(_file_stream(spark, src, schema), out, str(ckpt),
                        tokens_per_shard=11, seed=2, compact_every=None)

    reader = read_token_shards(spark, out)      # lists batch dirs 0-3
    qid = _checkpoint_query_id(spark, str(ckpt))
    _compact_output(spark, out, 3, "shard", qid)   # flip mid-"flight"
    want = _shard_oracle(batches, 2, 11)
    got = {r.doc_id: r.shard for r in reader.collect()}
    assert got == want                          # grace kept dirs 0-3 alive
    fresh = {r.doc_id: r.shard
             for r in read_token_shards(spark, out).collect()}
    assert fresh == want


def test_token_shards_half_published_state_invisible(spark, tmp_path):
    """VERDICT #7: readers between publish steps — a batch dir without a
    marker AND a compacted generation without a pointer flip are both
    invisible; the reader sees exactly the committed rows."""
    from mini_etl_spark.streaming import read_token_shards, stream_token_shards

    schema = "doc_id long, text string"
    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    spark.createDataFrame([(1, "a b c"), (2, "d e")], schema).coalesce(
        1
    ).write.parquet(str(src / "f0"))
    stream_token_shards(_file_stream(spark, src, schema), str(out), str(ckpt),
                        tokens_per_shard=4, seed=3)
    # half-published BATCH: data dir, no marker
    spark.createDataFrame([(99, "x y")], schema).write.parquet(
        str(out / "batch=9" / "shard=0")
    )
    # half-published COMPACTION: generation dir, no pointer flip
    spark.createDataFrame([(98, "z"), (1, "a b c")], schema).write.parquet(
        str(out / "compact" / "upto=0" / "shard=0")
    )
    got = sorted(r.doc_id for r in read_token_shards(spark, str(out)).collect())
    assert got == [1, 2]


def test_token_shards_query_id_guard(spark, tmp_path):
    """ADVICE: reusing an out_path with a FRESH checkpoint (batch ids
    restart at 0) raises at stream start instead of silently overwriting
    early batches; resuming the original checkpoint keeps working."""
    from mini_etl_spark.streaming import read_token_shards, stream_token_shards

    schema = "doc_id long, text string"
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    spark.createDataFrame([(1, "a b"), (2, "c")], schema).coalesce(
        1
    ).write.parquet(str(src / "f0"))
    stream_token_shards(_file_stream(spark, src, schema), out, str(ckpt),
                        tokens_per_shard=3, seed=1)

    with pytest.raises(ValueError, match="different checkpoint incarnation"):
        stream_token_shards(_file_stream(spark, src, schema), out,
                            str(tmp_path / "fresh_ckpt"), tokens_per_shard=3,
                            seed=1)

    # the original checkpoint resumes fine
    spark.createDataFrame([(3, "d e f")], schema).coalesce(1).write.parquet(
        str(src / "f1")
    )
    stream_token_shards(_file_stream(spark, src, schema), out, str(ckpt),
                        tokens_per_shard=3, seed=1)
    assert read_token_shards(spark, out).count() == 3


# ---------------------------------------------------------------------------
# stream_temperature_mix: zero-row micro-batches (ADVICE)
# ---------------------------------------------------------------------------


def test_temperature_mix_empty_batch_writes_no_staging_dir(spark, tmp_path):
    """An empty micro-batch (fully filtered / empty source file) writes
    NO staging directory — including as the FIRST batch, where a
    dataless dir used to kill schema inference on the staging read."""
    from mini_etl_spark.functions.mixing import temperature_mix
    from mini_etl_spark.streaming import (
        read_latest_snapshot,
        stream_temperature_mix,
    )

    schema = "doc_id long, source string, text string"
    empty = spark.createDataFrame([], schema)

    # first-batch-empty: the old code died on _read_staging here
    src1 = tmp_path / "src1"
    src1.mkdir()
    empty.coalesce(1).write.parquet(str(src1 / "f0"))
    out1 = str(tmp_path / "out1")
    ckpt1 = str(tmp_path / "ckpt1")
    stream_temperature_mix(_file_stream(spark, src1, schema), out1, ckpt1,
                           budget=10, seed=1)
    assert read_latest_snapshot(spark, out1) is None
    assert not any(
        d.name.startswith("batch=")
        for d in (tmp_path / "ckpt1" / "_seen").iterdir()
    ) if (tmp_path / "ckpt1" / "_seen").is_dir() else True

    # empty batch in the middle: skipped, snapshot equals the batch mix
    rows = [(i, "web" if i % 3 else "code", f"doc {i}") for i in range(20)]
    src2 = tmp_path / "src2"
    src2.mkdir()
    spark.createDataFrame(rows[:10], schema).coalesce(1).write.parquet(
        str(src2 / "f0")
    )
    empty.coalesce(1).write.parquet(str(src2 / "f1"))
    spark.createDataFrame(rows[10:], schema).coalesce(1).write.parquet(
        str(src2 / "f2")
    )
    out2 = str(tmp_path / "out2")
    ckpt2 = tmp_path / "ckpt2"
    stream_temperature_mix(_file_stream(spark, src2, schema), out2,
                           str(ckpt2), budget=12, alpha=0.4, seed=9)
    staged = sorted(
        d.name for d in (ckpt2 / "_seen").iterdir()
        if d.name.startswith("batch=")
    )
    assert staged == ["batch=0", "batch=2"]     # no dataless batch=1
    got = sorted((r.doc_id, r.epoch)
                 for r in read_latest_snapshot(spark, out2).collect())
    want = sorted(
        (r.doc_id, r.epoch)
        for r in temperature_mix(
            spark.createDataFrame(rows, schema), 12, alpha=0.4, seed=9
        ).collect()
    )
    assert got == want


def test_snapshot_reader_ignores_half_published_snap(spark, tmp_path):
    """VERDICT #7 for the snapshot twin: a snap directory written without
    the _LATEST pointer flip (publish crash window) is invisible to
    read_latest_snapshot."""
    from mini_etl_spark.streaming import (
        read_latest_snapshot,
        stream_temperature_mix,
    )

    schema = "doc_id long, source string, text string"
    src = tmp_path / "src"
    src.mkdir()
    rows = [(i, "web", f"doc {i}") for i in range(8)]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(src / "f0")
    )
    out = str(tmp_path / "out")
    stream_temperature_mix(_file_stream(spark, src, schema), out,
                           str(tmp_path / "ckpt"), budget=5, seed=4)
    before = sorted(r.doc_id for r in read_latest_snapshot(spark, out).collect())
    # half-published later snapshot: directory lands, pointer never flips
    spark.createDataFrame([(999, "web", "phantom")], schema).write.parquet(
        str(tmp_path / "out" / "snap=999")
    )
    after = sorted(r.doc_id for r in read_latest_snapshot(spark, out).collect())
    assert after == before and 999 not in after


# ---------------------------------------------------------------------------
# snapshot sinks: replay-safe merge base + bounded snap retention
# ---------------------------------------------------------------------------


def test_lm_update_replay_after_flip_no_double_count(spark, tmp_path):
    """The LM trainer's documented replay caveat is closed: a crash
    AFTER the pointer flip but BEFORE the checkpoint commit replays the
    batch, which now re-merges into the recorded PREDECESSOR snapshot —
    the final model equals training on the full corpus, counts never
    doubled."""
    from mini_etl_spark.functions.lm import train_bigram_lm
    from mini_etl_spark.streaming import read_latest_snapshot
    from mini_etl_spark.streaming.events import stream_lm_update

    schema = "doc_id long, text string"
    src = tmp_path / "src"
    mdir = str(tmp_path / "model")
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    b1 = [(1, "the cat sat on the mat"), (2, "the dog sat")]
    b2 = [(3, "the cat ran far away"), (4, "a dog ran")]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "f0"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "f1"))
    stream_lm_update(_file_stream(spark, src, schema), mdir, str(ckpt))
    # crash in the flip -> checkpoint-commit window: the marker batch
    # replays and re-merges. Pre-fix, its bigram counts doubled.
    _drop_commit(ckpt)
    stream_lm_update(_file_stream(spark, src, schema), mdir, str(ckpt))

    got = {
        (r.prev, r.cur): r.cnt
        for r in read_latest_snapshot(spark, mdir).collect()
    }
    want = {
        (r.prev, r.cur): r.cnt
        for r in train_bigram_lm(
            spark.createDataFrame(b1 + b2, schema)
        ).collect()
    }
    assert got == want


def test_snapshot_retention_bounded_with_reader_grace(spark, tmp_path):
    """Superseded snap= directories are GC'd down to current+predecessor
    after every publish, a reader holding the pre-publish snapshot still
    collects (one-cycle grace), and the final state is the full upsert."""
    from mini_etl_spark.streaming import read_latest_snapshot
    from mini_etl_spark.streaming.events import stream_upsert_to_parquet

    schema = "k long, val string"
    src = tmp_path / "src"
    target = tmp_path / "target"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    for b in range(5):
        spark.createDataFrame(
            [(i, f"v{b}") for i in range(b, b + 3)], schema
        ).coalesce(1).write.parquet(str(src / f"f{b}"))
    stream_upsert_to_parquet(_file_stream(spark, src, schema), str(target),
                             ["k"], ckpt)
    snaps = sorted(d.name for d in target.iterdir()
                   if d.name.startswith("snap="))
    assert snaps == ["snap=3", "snap=4"]   # current + grace predecessor

    reader = read_latest_snapshot(spark, str(target))   # resolves snap=4
    spark.createDataFrame([(100, "tail")], schema).coalesce(
        1
    ).write.parquet(str(src / "f5"))
    stream_upsert_to_parquet(_file_stream(spark, src, schema), str(target),
                             ["k"], ckpt)               # publishes snap=5
    assert {r.k: r.val for r in reader.collect()} == {
        0: "v0", 1: "v1", 2: "v2", 3: "v3", 4: "v4", 5: "v4", 6: "v4"
    }                                                    # grace kept snap=4
    latest = {r.k: r.val
              for r in read_latest_snapshot(spark, str(target)).collect()}
    assert latest[100] == "tail" and len(latest) == 8
    snaps = sorted(d.name for d in target.iterdir()
                   if d.name.startswith("snap="))
    assert snaps == ["snap=4", "snap=5"]


def test_latest_pointer_backcompat_plain_format(spark, tmp_path):
    """A pre-round-8 plain-text _LATEST file still resolves for both the
    reader and the merge base; a replayed FIRST batch (no predecessor)
    rebuilds from an empty base."""
    from mini_etl_spark.streaming import read_latest_snapshot
    from mini_etl_spark.streaming.events import _merge_base

    target = tmp_path / "target"
    target.mkdir()
    spark.createDataFrame([(1, "a")], "k long, v string").write.parquet(
        str(target / "snap=0")
    )
    (target / "_LATEST").write_text("snap=0")   # legacy plain format
    assert [r.k for r in read_latest_snapshot(spark, str(target)).collect()] == [1]
    base = _merge_base(spark, str(target), 1)   # later batch: current snap
    assert [r.k for r in base.collect()] == [1]
    # replay of batch 0 under a legacy pointer: the predecessor was never
    # RECORDED (≠ recorded-as-none), so since round 9 the base falls back
    # to the named snapshot — keeping accumulated state (may-double-count,
    # the pre-upgrade behavior) instead of discarding it (ADVICE r8;
    # warning coverage in tests/test_round9_hardening.py)
    base = _merge_base(spark, str(target), 0)
    assert [r.k for r in base.collect()] == [1]


# ---------------------------------------------------------------------------
# round-8 code-review fixes
# ---------------------------------------------------------------------------


def test_budget_fit_survives_beyond_long_square_overflow(spark):
    """df² for a single key past ~3.04e9 overflows long·long; the volume
    must be computed in double space so the fitted cap stays honest."""
    from mini_etl_spark.operators.skew import _budget_fit_frame, auto_frequency_cap

    freq = spark.createDataFrame(
        [("hot", 4_000_000_000)], "k string, __f long"
    )
    row = _budget_fit_frame(freq, "__f").collect()[0]
    assert row["__cum"] == pytest.approx(1.6e19, rel=1e-6)  # not negative
    # nothing fits a 1e9 budget -> fitted cap degrades to 1 (floor wins)
    assert auto_frequency_cap(freq, floor=1, max_candidate_volume=10**9) == 1


def test_output_compaction_respects_writer_options(spark, tmp_path):
    """The compacted generation is written with the same parquet options
    as the per-batch publishes (compression shows up in file names)."""
    from mini_etl_spark.streaming import stream_token_shards

    schema = "doc_id long, text string"
    src = tmp_path / "src"
    out = tmp_path / "out"
    src.mkdir()
    for b in range(4):
        spark.createDataFrame(
            [(b * 10 + i, "tok " * (1 + i)) for i in range(3)], schema
        ).coalesce(1).write.parquet(str(src / f"f{b}"))
    stream_token_shards(_file_stream(spark, src, schema), str(out),
                        str(tmp_path / "ckpt"), tokens_per_shard=9, seed=1,
                        compact_every=3, options={"compression": "gzip"})
    gen = out / "compact" / "seg-0-2"
    files = list(gen.rglob("*.parquet"))
    assert files and all(".gz.parquet" in f.name for f in files)


def test_read_token_shards_survives_output_relocation(spark, tmp_path):
    """The generation directory is derived from the pointer's upto, not
    its recorded absolute path — a copied output root reads its OWN
    files, so relocation cannot silently serve stale data."""
    import shutil

    from mini_etl_spark.streaming import read_token_shards, stream_token_shards

    schema = "doc_id long, text string"
    src = tmp_path / "src"
    out = tmp_path / "out"
    src.mkdir()
    for b in range(4):
        spark.createDataFrame(
            [(b * 10 + i, "tok " * (1 + i)) for i in range(3)], schema
        ).coalesce(1).write.parquet(str(src / f"f{b}"))
    stream_token_shards(_file_stream(spark, src, schema), str(out),
                        str(tmp_path / "ckpt"), tokens_per_shard=9, seed=1,
                        compact_every=3)
    want = sorted(r.doc_id for r in read_token_shards(spark, str(out)).collect())
    moved = tmp_path / "relocated"
    shutil.copytree(out, moved)
    shutil.rmtree(out)     # the ORIGINAL location is gone
    got = sorted(r.doc_id for r in read_token_shards(spark, str(moved)).collect())
    assert got == want and len(got) == 12


def test_snapshot_sink_incarnation_guard(spark, tmp_path):
    """A fresh checkpoint against an existing merge-shaped snapshot
    target raises at stream start (batch 0 would be misread as a replay
    of the old snap=0 and overwrite the accumulated state); resuming the
    original checkpoint keeps working."""
    from mini_etl_spark.streaming import read_latest_snapshot
    from mini_etl_spark.streaming.events import stream_lm_update

    schema = "doc_id long, text string"
    src = tmp_path / "src"
    mdir = str(tmp_path / "model")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    spark.createDataFrame([(1, "the cat sat")], schema).coalesce(
        1
    ).write.parquet(str(src / "f0"))
    stream_lm_update(_file_stream(spark, src, schema), mdir, ckpt)

    with pytest.raises(ValueError, match="different checkpoint incarnation"):
        stream_lm_update(_file_stream(spark, src, schema), mdir,
                         str(tmp_path / "fresh_ckpt"))

    spark.createDataFrame([(2, "the dog ran")], schema).coalesce(
        1
    ).write.parquet(str(src / "f1"))
    stream_lm_update(_file_stream(spark, src, schema), mdir, ckpt)
    model = read_latest_snapshot(spark, mdir)
    assert model.count() > 0


# ---------------------------------------------------------------------------
# incremental-index compaction (the third streaming surface's retention)
# ---------------------------------------------------------------------------


def test_compact_minhash_index_inplace(spark, tmp_path):
    """Per-batch appends accrue small files in every index component;
    compact_minhash_index folds them in place — probe results identical,
    band hive-partitioning preserved, file count reduced."""
    from mini_etl_spark.functions.dedup_index import (
        minhash_index_append,
        minhash_index_filter,
        minhash_index_write,
    )
    from mini_etl_spark.maintenance import compact_minhash_index, dataset_stats

    def _df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    corpus = [(1, "the quick brown fox jumps over the lazy dog tonight"),
              (2, "completely different sentence about database engines")]
    path = str(tmp_path / "idx")
    minhash_index_write(_df(corpus), path, num_hashes=32, bands=8)
    for b in range(5):  # one small append per "micro-batch"
        minhash_index_append(
            _df([(100 + b, f"novel document number {b} about topic {b}")]),
            path,
        )
    probe = [(900, corpus[0][1]),               # near-dup of indexed doc 1
             (901, "an entirely fresh sentence never indexed before")]
    before_kept = {r.doc_id for r in minhash_index_filter(_df(probe), path).collect()}
    before_files = dataset_stats(spark, path + "/bands")["n_files"]

    stats = compact_minhash_index(spark, path)
    assert set(stats) == {"signatures", "bands"}
    assert stats["bands"]["after"]["n_files"] < before_files
    # hive band layout survives (probes prune by band)
    bands = [d.name for d in (tmp_path / "idx" / "bands").iterdir()
             if d.is_dir()]
    assert bands and all(b.startswith("band=") for b in bands)
    after_kept = {r.doc_id for r in minhash_index_filter(_df(probe), path).collect()}
    assert after_kept == before_kept == {901}


def test_compact_dataset_inplace_crash_recovery(spark, tmp_path):
    """The two-rename swap recovers from every crash window: stray
    .compact-tmp (pre-swap), only-.old (between renames), and a stale
    .old next to the live dataset (post-swap)."""
    import shutil

    from mini_etl_spark.maintenance import compact_dataset_inplace

    d = tmp_path / "ds"
    spark.range(100).selectExpr("id", "id % 3 AS g").repartition(
        8
    ).write.parquet(str(d))
    want = set(range(100))

    # pre-swap crash: stray tmp with garbage must be cleaned, not merged
    (tmp_path / "ds.compact-tmp").mkdir()
    (tmp_path / "ds.compact-tmp" / "junk").write_text("x")
    compact_dataset_inplace(spark, str(d), target_file_mb=128)
    assert {r.id for r in spark.read.parquet(str(d)).collect()} == want
    assert not (tmp_path / "ds.compact-tmp").exists()

    # between-renames crash: only .old exists -> restored then compacted
    shutil.move(str(d), str(tmp_path / "ds.old"))
    compact_dataset_inplace(spark, str(d), target_file_mb=128)
    assert {r.id for r in spark.read.parquet(str(d)).collect()} == want
    assert not (tmp_path / "ds.old").exists()

    # post-swap crash: stale .old next to the live dataset -> deleted
    shutil.copytree(str(d), str(tmp_path / "ds.old"))
    compact_dataset_inplace(spark, str(d), target_file_mb=128)
    assert {r.id for r in spark.read.parquet(str(d)).collect()} == want
    assert not (tmp_path / "ds.old").exists()


def test_cli_compact_dataset_and_index(spark, tmp_path):
    """`mini-etl-spark compact` folds an appended dataset (and an index
    root with --kind index) in place and prints before/after stats."""
    import json as _json

    from click.testing import CliRunner

    from mini_etl_spark.cli import main
    from mini_etl_spark.functions.dedup_index import (
        minhash_index_append,
        minhash_index_write,
    )

    d = tmp_path / "ds"
    for _ in range(4):
        spark.range(50).selectExpr("id").coalesce(2).write.mode(
            "append"
        ).parquet(str(d))
    res = CliRunner().invoke(
        main, ["compact", str(d), "--target-file-mb", "128"]
    )
    assert res.exit_code == 0, res.output
    stats = _json.loads(res.output.strip().splitlines()[-1])
    assert stats["after"]["n_files"] < stats["before"]["n_files"]
    assert spark.read.parquet(str(d)).count() == 200

    idx = tmp_path / "idx"
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    minhash_index_write(mk([(1, "alpha beta gamma delta epsilon zeta")]),
                        str(idx), num_hashes=32, bands=8)
    for b in range(3):
        minhash_index_append(mk([(10 + b, f"fresh doc {b} wholly new")]),
                             str(idx))
    res = CliRunner().invoke(main, ["compact", str(idx), "--kind", "index"])
    assert res.exit_code == 0, res.output
    stats = _json.loads(res.output.strip().splitlines()[-1])
    assert stats["bands"]["after"]["n_files"] < stats["bands"]["before"]["n_files"]
