"""Round-9 hardening regressions — the VERDICT r8 task list and the four
ADVICE findings:

- SEGMENTED compaction for stream_token_shards output and
  stream_temperature_mix staging (VERDICT weak item #1/#2): sealed
  segments are immutable, the pointer carries a segment list, the
  per-cycle write cost is bounded by segment size (LSM merges), and the
  cumulative write volume over a long run is O(n log n) — not the
  quadratic full-history rewrite of round 8
- legacy (round-8 monolithic) pointers are carried as sealed segments
  with no migration rewrite, on both the output and staging sides
- parse_freq_budget rejects non-positive budgets at config-load time
  (ADVICE skew.py)
- _existing_output_query_ids scans ALL max_markers newest markers, so
  interleaved incarnations both surface (ADVICE corpus.py)
- stream_temperature_mix publishes its pointer with the checkpoint's
  query id and refuses a foreign incarnation at stream start (ADVICE
  corpus.py)
- _merge_base falls back to the named snapshot (loud warning) when a
  LEGACY plain pointer names the replayed batch — never replaces
  accumulated LM/CM state with one batch's delta (ADVICE events.py)
- auto_frequency_cap logs an INFO line when the candidate-volume budget
  binds below the quantile cap (VERDICT #4: fit-time observability)
"""

import json
import logging
import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_round7_hardening import (  # noqa: E402
    _file_stream,
    _shard_oracle,
)


# ---------------------------------------------------------------------------
# segmented output compaction: write amplification bounded (VERDICT #1)
# ---------------------------------------------------------------------------


def _fabricate_batch(spark, out, k, rows):
    """A committed batch exactly as stream_token_shards publishes it:
    shard-partitioned batch=K dir, then the commit marker."""
    from mini_etl_spark.streaming.corpus import _commit_dir, _write_state

    spark.createDataFrame(
        rows, "doc_id long, text string, shard int"
    ).write.mode("overwrite").partitionBy("shard").parquet(
        f"{out}/batch={k}"
    )
    _write_state(
        spark, f"{_commit_dir(out)}/{k}.json",
        {"batch_id": k, "query_id": "q", "tokens": 0, "offset_before": 0},
    )


def _seg_listings(out):
    """{segment dir name: sorted (relative file, size) list} for every
    live dir under compact/ — the immutability fingerprint."""
    import pathlib

    root = pathlib.Path(out) / "compact"
    if not root.is_dir():
        return {}
    res = {}
    for d in root.iterdir():
        if d.is_dir():
            res[d.name] = sorted(
                (str(p.relative_to(d)), p.stat().st_size)
                for p in d.rglob("*")
                if p.is_file() and not p.name.startswith(".")
            )
    return res


def test_output_compaction_write_amplification_bounded(spark, tmp_path):
    """24 compaction cycles over unit batches (max_segments=8): sealed
    segments are NEVER rewritten in place (file listings frozen until
    the dir is merged away), per-cycle bytes are segment-bounded, and
    the CUMULATIVE bytes written stay O(n log n) — well under half the
    quadratic full-history-rewrite cost of the round-8 design — while
    read_token_shards stays exactly-once."""
    from mini_etl_spark.streaming import read_token_shards
    from mini_etl_spark.streaming.corpus import _compact_output

    out = str(tmp_path / "out")
    cycles, per_batch = 24, 12
    data_bytes = 0
    total_written = 0
    per_cycle = []
    frozen = {}          # segment name -> first-seen listing
    all_rows = []
    for k in range(cycles):
        rows = [(k * 100 + i, "tok tok tok", i % 3) for i in range(per_batch)]
        all_rows += rows
        _fabricate_batch(spark, out, k, rows)
        import pathlib
        data_bytes += sum(
            p.stat().st_size
            for p in (pathlib.Path(out) / f"batch={k}").rglob("*")
            if p.is_file()
        )
        stats = _compact_output(spark, out, k, "shard", "q", max_segments=8)
        assert stats is not None and stats["upto"] == k
        assert stats["segments"] <= 8
        total_written += stats["bytes_written"]
        per_cycle.append(stats["bytes_written"])
        # immutability: every live segment's listing matches first sight
        now = _seg_listings(out)
        for name, listing in now.items():
            if name in frozen:
                assert listing == frozen[name], (
                    f"sealed segment {name} was rewritten in place"
                )
            else:
                frozen[name] = listing

    # replay no-op: an already-applied compaction returns None
    assert _compact_output(spark, out, cycles - 1, "shard", "q") is None

    # cumulative cost: monolithic would rewrite the output-so-far every
    # cycle = sum(k * unit) ≈ cycles²/2 units; segmented must land in
    # O(n log n) territory — comfortably under half the quadratic cost
    unit = data_bytes / cycles
    monolithic = unit * cycles * (cycles + 1) / 2
    assert total_written < 0.5 * monolithic, (
        f"write amplification regressed: {total_written} vs "
        f"monolithic {monolithic}"
    )
    assert total_written <= unit * cycles * (math.log2(cycles) + 3)
    # per-cycle cost is segment-bounded, not output-so-far: the last
    # cycles must not be rewriting ~everything (monolithic's signature)
    assert max(per_cycle[-4:]) < 0.85 * data_bytes

    got = {r.doc_id: r.shard for r in read_token_shards(spark, out).collect()}
    assert got == {i: s for i, _, s in all_rows}


def test_output_compaction_lsm_bounds_segment_list_with_grace(spark, tmp_path):
    """max_segments=2 forces a merge every cycle: the pointer's list
    stays <= 2, a merged-away segment survives exactly ONE further cycle
    (reader grace) and is then GC'd, and reads stay exactly-once."""
    from mini_etl_spark.streaming import read_token_shards
    from mini_etl_spark.streaming.corpus import _compact_output

    out = str(tmp_path / "out")
    all_rows = []
    live_history = []
    for k in range(6):
        rows = [(k * 10 + i, "t t", i % 2) for i in range(4)]
        all_rows += rows
        _fabricate_batch(spark, out, k, rows)
        _compact_output(spark, out, k, "shard", "q", max_segments=2)
        pointer = json.loads((tmp_path / "out" / "_COMPACT.json").read_text())
        assert len(pointer["segments"]) <= 2
        live_history.append(set(_seg_listings(out)))
    # a segment merged away at cycle k is still on disk at k (grace) but
    # gone by k+2's sweep: the live dir count stays bounded
    assert all(len(live) <= 5 for live in live_history)
    referenced = {name for _, _, name in
                  json.loads((tmp_path / "out" / "_COMPACT.json").read_text())
                  ["segments"]}
    assert referenced <= live_history[-1]
    got = {r.doc_id: r.shard for r in read_token_shards(spark, out).collect()}
    assert got == {i: s for i, _, s in all_rows}


def test_output_legacy_monolithic_pointer_carried_as_segment(spark, tmp_path):
    """A round-8 output (monolithic compact/upto=N generation + v1
    pointer) keeps reading and compacting with NO migration rewrite: the
    legacy generation is carried as a sealed segment under its
    historical name, and is eventually folded away by a normal LSM
    merge."""
    from mini_etl_spark.streaming import read_token_shards
    from mini_etl_spark.streaming.corpus import _compact_output, _write_state

    out = str(tmp_path / "out")
    all_rows = []
    for k in range(6):
        rows = [(k * 10 + i, "t t t", i % 2) for i in range(4)]
        all_rows += rows
        _fabricate_batch(spark, out, k, rows)
    # fabricate the round-8 state: batches 0-2 folded monolithically
    legacy_rows = [r for r in all_rows if r[0] < 30]
    spark.createDataFrame(
        legacy_rows, "doc_id long, text string, shard int"
    ).write.partitionBy("shard").parquet(f"{out}/compact/upto=2")
    _write_state(spark, f"{out}/_COMPACT.json",
                 {"upto": 2, "dir": f"{out}/compact/upto=2",
                  "query_id": "q"})
    import shutil
    for k in range(3):   # the old GC eventually removed folded batches
        shutil.rmtree(f"{out}/batch={k}")
        os.remove(f"{out}/_commits/{k}.json")
        for crc in (f"{out}/_commits/.{k}.json.crc",):
            if os.path.exists(crc):
                os.remove(crc)

    got = {r.doc_id: r.shard for r in read_token_shards(spark, out).collect()}
    assert got == {i: s for i, _, s in all_rows}

    # continue compacting with the segmented code: legacy gen untouched
    stats = _compact_output(spark, out, 5, "shard", "q", max_segments=8)
    assert stats["segments"] == 2
    pointer = json.loads((tmp_path / "out" / "_COMPACT.json").read_text())
    assert pointer["segments"][0] == [0, 2, "upto=2"]
    assert pointer["segments"][1] == [3, 5, "seg-3-5"]
    assert (tmp_path / "out" / "compact" / "upto=2").is_dir()
    got = {r.doc_id: r.shard for r in read_token_shards(spark, out).collect()}
    assert got == {i: s for i, _, s in all_rows}

    # one more cycle at max_segments=1 LSM-merges the legacy dir away
    rows = [(60 + i, "t", i % 2) for i in range(4)]
    all_rows += rows
    _fabricate_batch(spark, out, 6, rows)
    _compact_output(spark, out, 6, "shard", "q", max_segments=1)
    pointer = json.loads((tmp_path / "out" / "_COMPACT.json").read_text())
    assert pointer["segments"] == [[0, 6, "seg-0-6"]]
    got = {r.doc_id: r.shard for r in read_token_shards(spark, out).collect()}
    assert got == {i: s for i, _, s in all_rows}


# ---------------------------------------------------------------------------
# segmented staging compaction (VERDICT #2)
# ---------------------------------------------------------------------------


def _tree_bytes(root):
    import pathlib

    p = pathlib.Path(root)
    if not p.is_dir():
        return {}
    return {
        str(f.relative_to(p)): f.stat().st_size
        for f in p.rglob("*")
        if f.is_file() and not f.name.startswith(".")
    }


def test_staging_compaction_write_amplification_bounded(spark, tmp_path):
    """Same bound on the stream_temperature_mix staging side: per-cycle
    compaction writes are segment-sized, cumulative cost O(n log n) vs
    the quadratic staging-so-far rewrite, and the staged corpus read
    back is always exactly the union of all batches."""
    from mini_etl_spark.streaming.corpus import _compact_staging, _read_staging

    seen = str(tmp_path / "seen")
    cycles, per_batch = 20, 10
    all_ids = set()
    data_bytes, total_written = 0, 0
    prev_files = {}
    for k in range(cycles):
        rows = [(k * 100 + i, f"doc {k}-{i}") for i in range(per_batch)]
        all_ids |= {i for i, _ in rows}
        spark.createDataFrame(rows, "doc_id long, text string").write.mode(
            "overwrite"
        ).parquet(f"{seen}/batch={k}")
        import pathlib
        data_bytes += sum(
            p.stat().st_size
            for p in (pathlib.Path(seen) / f"batch={k}").rglob("*")
            if p.is_file()
        )
        _compact_staging(spark, seen, upto=k, max_segments=8)
        # written bytes this cycle = files under compact/ new since last
        now = _tree_bytes(f"{seen}/compact")
        total_written += sum(
            sz for f, sz in now.items() if f not in prev_files
        )
        prev_files = now
        got = {r.doc_id for r in _read_staging(spark, seen).collect()}
        assert got == all_ids
    unit = data_bytes / cycles
    monolithic = unit * cycles * (cycles + 1) / 2
    assert total_written < 0.5 * monolithic
    assert total_written <= unit * cycles * (math.log2(cycles) + 3)
    pointer = json.loads((tmp_path / "seen" / "_COMPACT.json").read_text())
    assert len(pointer["segments"]) <= 8


def test_staging_legacy_pointer_backcompat(spark, tmp_path):
    """A round-8 staging layout (monolithic compact/upto=N + v1 pointer
    recording an absolute dir) reads correctly — via the DERIVED
    relative name, not the persisted path — and continues compacting
    segmented."""
    from mini_etl_spark.streaming.corpus import (
        _compact_staging,
        _read_staging,
        _write_state,
    )

    seen = str(tmp_path / "seen")
    spark.createDataFrame(
        [(i, "old") for i in range(10)], "doc_id long, text string"
    ).write.parquet(f"{seen}/compact/upto=1")
    _write_state(spark, f"{seen}/_COMPACT.json",
                 {"upto": 1, "dir": f"{seen}/compact/upto=1"})
    spark.createDataFrame(
        [(100 + i, "new") for i in range(5)], "doc_id long, text string"
    ).write.parquet(f"{seen}/batch=2")

    got = {r.doc_id for r in _read_staging(spark, seen).collect()}
    assert got == set(range(10)) | {100, 101, 102, 103, 104}

    _compact_staging(spark, seen, upto=2, max_segments=8)
    pointer = json.loads((tmp_path / "seen" / "_COMPACT.json").read_text())
    assert pointer["segments"] == [[0, 1, "upto=1"], [2, 2, "seg-2-2"]]
    got = {r.doc_id for r in _read_staging(spark, seen).collect()}
    assert got == set(range(10)) | {100, 101, 102, 103, 104}


# ---------------------------------------------------------------------------
# ADVICE: parse_freq_budget positivity (config-load failure, not runtime)
# ---------------------------------------------------------------------------


def test_parse_freq_budget_rejects_nonpositive():
    from mini_etl_spark.config import _parse_freq_cap
    from mini_etl_spark.operators.skew import parse_freq_budget

    assert parse_freq_budget("auto:1e9") == 1_000_000_000
    for bad in ("auto:0", "auto:-1e6", "auto:0.4"):
        with pytest.raises(ValueError, match="positive"):
            parse_freq_budget(bad)
        with pytest.raises(ValueError, match="positive"):
            _parse_freq_cap(bad)
    with pytest.raises(ValueError, match="numeric"):
        parse_freq_budget("auto:abc")


# ---------------------------------------------------------------------------
# ADVICE: marker scan covers all max_markers newest markers
# ---------------------------------------------------------------------------


def test_existing_output_query_ids_scans_all_markers(spark, tmp_path):
    """An output interleaving markers from TWO incarnations within the
    newest-16 window surfaces both ids (the round-8 code broke after the
    first readable one)."""
    from mini_etl_spark.streaming.corpus import (
        _commit_dir,
        _existing_output_query_ids,
        _write_state,
    )

    out = str(tmp_path / "out")
    for k, qid in [(0, "old-incarnation"), (1, "new-incarnation"),
                   (2, "new-incarnation")]:
        _write_state(spark, f"{_commit_dir(out)}/{k}.json",
                     {"batch_id": k, "query_id": qid})
    assert _existing_output_query_ids(spark, out) == {
        "old-incarnation", "new-incarnation"
    }


# ---------------------------------------------------------------------------
# ADVICE: temperature-mix incarnation guard + query-id'd pointer
# ---------------------------------------------------------------------------


def test_temperature_mix_incarnation_guard(spark, tmp_path):
    """The mix pointer records the checkpoint's query id; a FRESH
    checkpoint against the old out_path raises at stream start instead
    of silently reusing snap=B names (and letting snapshot GC delete the
    old incarnation's directories). The original checkpoint resumes."""
    from mini_etl_spark.streaming import stream_temperature_mix
    from mini_etl_spark.streaming.events import _read_pointer

    schema = "doc_id long, source string, text string"
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    spark.createDataFrame(
        [(i, "web", f"d{i}") for i in range(8)], schema
    ).coalesce(1).write.parquet(str(src / "f0"))
    stream_temperature_mix(_file_stream(spark, src, schema), out, str(ckpt),
                           budget=6, seed=1)
    assert _read_pointer(out)["query_id"] != ""

    with pytest.raises(ValueError, match="different checkpoint incarnation"):
        stream_temperature_mix(_file_stream(spark, src, schema), out,
                               str(tmp_path / "fresh"), budget=6, seed=1)

    spark.createDataFrame(
        [(100, "code", "x")], schema
    ).coalesce(1).write.parquet(str(src / "f1"))
    stream_temperature_mix(_file_stream(spark, src, schema), out, str(ckpt),
                           budget=6, seed=1)


# ---------------------------------------------------------------------------
# ADVICE: _merge_base legacy-pointer replay fallback
# ---------------------------------------------------------------------------


def test_merge_base_legacy_pointer_replay_falls_back(spark, tmp_path, caplog):
    """A LEGACY plain-format pointer naming the replayed batch has no
    recorded predecessor: the merge base falls back to the NAMED
    snapshot (the pre-upgrade may-double-count behavior) with a loud
    warning — never to an empty base that would replace accumulated
    LM/CM state with one batch's delta."""
    from mini_etl_spark.streaming.events import _merge_base

    target = tmp_path / "model"
    target.mkdir()
    spark.createDataFrame(
        [("a", 3)], "token string, n long"
    ).write.parquet(str(target / "snap=5"))
    (target / "_LATEST").write_text("snap=5")  # pre-round-8 plain format

    with caplog.at_level(logging.WARNING,
                         logger="mini_etl_spark.streaming.events"):
        caplog.clear()
        base = _merge_base(spark, str(target), 5)   # replay of batch 5
        assert base is not None
        assert base.collect()[0].n == 3
        assert any("LEGACY" in r.message for r in caplog.records)
        caplog.clear()
        # non-replay read through a legacy pointer: normal, no warning
        base = _merge_base(spark, str(target), 6)
        assert base.collect()[0].n == 3
        assert not caplog.records

    # the JSON format distinguishes a GENUINE first-batch replay: prev
    # recorded as null means the base really is empty
    (target / "_LATEST").write_text(
        json.dumps({"snap": "snap=5", "prev": None, "query_id": "q"})
    )
    assert _merge_base(spark, str(target), 5) is None


# ---------------------------------------------------------------------------
# VERDICT #4: budget-cap fit-time observability
# ---------------------------------------------------------------------------


def test_budget_binding_info_log(spark, caplog):
    """When the candidate-volume budget lowers the quantile-derived cap,
    ONE INFO line states the derived cap, the admitted volume and the
    budget; a budget the distribution fits under stays silent."""
    from mini_etl_spark.operators.skew import auto_frequency_cap

    rows = [(f"lo{i}", 2) for i in range(1000)] + [
        (f"hi{i}", 50) for i in range(20)
    ]
    freq = spark.createDataFrame(rows, "k string, __f long")
    with caplog.at_level(logging.INFO,
                         logger="mini_etl_spark.operators.skew"):
        caplog.clear()
        assert auto_frequency_cap(freq, floor=1, max_candidate_volume=10_000) == 2
        binds = [r for r in caplog.records if "budget binds" in r.message]
        assert len(binds) == 1
        msg = binds[0].getMessage()
        assert "-> 2" in msg and "4000" in msg and "10000" in msg
        caplog.clear()
        # budget admits the whole distribution: no INFO line
        assert auto_frequency_cap(
            freq, floor=1, max_candidate_volume=10_000_000
        ) >= 50
        assert not [r for r in caplog.records if "budget binds" in r.message]
        caplog.clear()
        # floor overrides the fitted cap: the WARNING fires, not the
        # (now-inaccurate) "cap lowered to budget_cap" INFO line
        assert auto_frequency_cap(freq, floor=7, max_candidate_volume=1) == 7
        assert not [r for r in caplog.records if "budget binds" in r.message]
