#!/usr/bin/env python
"""Scale sweep for the STREAMING corpus twins (round-9 VERDICT #7): the
batch registry is covered by SCALE10/SCALE20; this drives the streaming
sharder (and the temperature-mix staging side) at replica scale and
records the numbers the 100 TB story turns on:

- ingestion throughput (rows/s, tokens/s) across a many-micro-batch
  availableNow run with segmented compaction LIVE;
- per-compaction-cycle bytes written vs the output-so-far — the round-8
  weak item was a full-history rewrite per cycle (bytes/cycle ≈ output
  size, cumulative cost quadratic); the round-9 segmented design must
  show bytes/cycle bounded by segment size, flat as the output grows;
- directory/file/marker counts over time (bounded at any cadence);
- exactly-once read-back (read_token_shards count == rows ingested).

Replica scaling follows scripts/scale_check.py: doc_ids offset per
replica so the corpus grows like real data (more documents), not
duplicate keys. Output JSON goes to stdout and $SCALE_STREAMING_OUT
(default /tmp/scale_streaming.json).

Usage:
    SCALE_FACTORS=10,20 python scripts/scale_streaming.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = [
    int(x) for x in os.environ.get("SCALE_FACTORS", "10,20").split(",")
]
N_BATCHES = int(os.environ.get("SCALE_STREAM_BATCHES", "32"))
COMPACT_EVERY = int(os.environ.get("SCALE_STREAM_COMPACT_EVERY", "4"))
MAX_SEGMENTS = int(os.environ.get("SCALE_STREAM_MAX_SEGMENTS", "4"))
OFFSET = 100_000_000
OUT = os.environ.get("SCALE_STREAMING_OUT", "/tmp/scale_streaming.json")


def _tree_bytes_files(root: str) -> tuple[int, int]:
    total, files = 0, 0
    for dirpath, _dirnames, filenames in os.walk(root):
        for f in filenames:
            if f.startswith("."):
                continue
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
                files += 1
            except OSError:
                pass
    return total, files


def _layout_counts(out_path: str) -> dict:
    batch_dirs = [d for d in os.listdir(out_path) if d.startswith("batch=")]
    commits = os.path.join(out_path, "_commits")
    markers = (
        len([f for f in os.listdir(commits) if f.endswith(".json")])
        if os.path.isdir(commits)
        else 0
    )
    compact = os.path.join(out_path, "compact")
    segs = sorted(os.listdir(compact)) if os.path.isdir(compact) else []
    total_bytes, total_files = _tree_bytes_files(out_path)
    return {
        "batch_dirs": len(batch_dirs),
        "markers": markers,
        "segments_on_disk": segs,
        "total_bytes": total_bytes,
        "total_files": total_files,
    }


def build_replica_corpus(spark, factor: int, path: str):
    """factor× the sf documents table, doc_ids offset per replica."""
    if os.path.isdir(path):
        return
    docs = spark.read.parquet(f"{BASE}/documents.parquet").select(
        "doc_id", "text"
    )
    parts = [
        docs.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(r * OFFSET)).cast("long")
        )
        for r in range(factor)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    # N_BATCHES source files → N_BATCHES micro-batches at
    # maxFilesPerTrigger=1; even-sized slices via hash-mod on doc_id
    big = big.withColumn("__b", F.pmod(F.xxhash64("doc_id"), F.lit(N_BATCHES)))
    for b in range(N_BATCHES):
        big.filter(F.col("__b") == b).drop("__b").coalesce(2).write.mode(
            "overwrite"
        ).parquet(f"{path}/f{b:03d}")


def run_sharder(spark, factor: int, work: str) -> dict:
    from mini_etl_spark.streaming import corpus as corpus_mod
    from mini_etl_spark.streaming import read_token_shards, stream_token_shards

    src = f"/tmp/scale_stream_src_x{factor}"
    build_replica_corpus(spark, factor, src)
    out = f"{work}/shards"
    ckpt = f"{work}/ckpt"

    # script-level instrumentation: capture each compaction's stats and
    # the output-so-far size at that moment (the amplification evidence)
    cycles = []
    real = corpus_mod._compact_output

    def wrapped(spark_, out_path, upto, shard_col, qid, options=None,
                max_segments=16):
        t0 = time.monotonic()
        stats = real(spark_, out_path, upto, shard_col, qid,
                     options=options, max_segments=max_segments)
        if stats is not None:
            total_bytes, _ = _tree_bytes_files(out_path)
            cycles.append({
                **stats,
                "wall_sec": round(time.monotonic() - t0, 3),
                "output_bytes_after": total_bytes,
                "write_share_of_output": round(
                    stats["bytes_written"] / max(total_bytes, 1), 4
                ),
            })
        return stats

    corpus_mod._compact_output = wrapped
    try:
        schema = spark.read.parquet(f"{src}/f000").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        t0 = time.monotonic()
        stream_token_shards(
            stream, out, ckpt, tokens_per_shard=65536,
            compact_every=COMPACT_EVERY, max_segments=MAX_SEGMENTS,
        )
        wall = time.monotonic() - t0
    finally:
        corpus_mod._compact_output = real

    back = read_token_shards(spark, out)
    n_back = back.count()
    n_in = spark.read.parquet(f"{src}/*").count()
    tokens = int(
        spark.read.parquet(f"{src}/*")
        .select(F.sum(F.size(F.split("text", r"\s+"))))
        .first()[0]
    )
    layout = _layout_counts(out)
    pointer = json.loads(open(f"{out}/_COMPACT.json").read())
    state = json.loads(open(f"{ckpt}/_token_offset.json").read())
    return {
        "factor": factor,
        "rows": n_in,
        "tokens": tokens,
        "micro_batches": int(state["batch_id"]) + 1,
        "compact_every": COMPACT_EVERY,
        "max_segments": MAX_SEGMENTS,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(n_in / wall, 1),
        "tokens_per_sec": round(tokens / wall, 1),
        "readback_rows": n_back,
        "exactly_once": n_back == n_in,
        "pointer_segments": pointer["segments"],
        "compaction_cycles": cycles,
        "max_cycle_write_share_of_output": max(
            (c["write_share_of_output"] for c in cycles), default=None
        ),
        "sum_compaction_bytes": sum(c["bytes_written"] for c in cycles),
        # what the round-8 monolithic design would have written: the
        # whole output-so-far, every cycle
        "monolithic_equiv_bytes": sum(
            c["output_bytes_after"] for c in cycles
        ),
        "final_layout": layout,
    }


def run_mixer_staging(spark, factor: int, work: str) -> dict:
    """The temperature-mix STAGING side at scale: per-cycle staging
    compaction bytes (segmented) while the mix itself recomputes per
    batch — the documented recompute-on-append cost is reported as
    per-batch snapshot wall times."""
    from mini_etl_spark.streaming import corpus as corpus_mod
    from mini_etl_spark.streaming import stream_temperature_mix

    src = f"/tmp/scale_stream_src_x{factor}"
    build_replica_corpus(spark, factor, src)
    out = f"{work}/mix"
    ckpt = f"{work}/mix_ckpt"

    cycles = []
    real = corpus_mod._compact_staging

    def wrapped(spark_, seen, upto, max_segments=16):
        before, _ = _tree_bytes_files(seen)
        files_before = {
            os.path.join(dp, f)
            for dp, _d, fs in os.walk(os.path.join(seen, "compact"))
            for f in fs
        } if os.path.isdir(os.path.join(seen, "compact")) else set()
        real(spark_, seen, upto, max_segments=max_segments)
        staged, _ = _tree_bytes_files(seen)
        written = 0
        for dp, _d, fs in os.walk(os.path.join(seen, "compact")):
            for f in fs:
                p = os.path.join(dp, f)
                if p not in files_before and not f.startswith("."):
                    try:
                        written += os.path.getsize(p)
                    except OSError:
                        pass
        cycles.append({
            "upto": upto,
            "bytes_written": written,
            "staging_bytes_after": staged,
            "write_share_of_staging": round(written / max(staged, 1), 4),
        })

    corpus_mod._compact_staging = wrapped
    try:
        schema = spark.read.parquet(f"{src}/f000").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/f00*")   # first 10 files: mix is O(corpus)/batch
        )
        docs_with_source = stream.withColumn(
            "source",
            F.when(F.pmod(F.col("doc_id"), F.lit(7)) < 2, "code")
            .otherwise("web"),
        )
        t0 = time.monotonic()
        stream_temperature_mix(
            docs_with_source, out, ckpt, budget=5000, alpha=0.5,
            compact_every=3, max_segments=MAX_SEGMENTS,
        )
        wall = time.monotonic() - t0
    finally:
        corpus_mod._compact_staging = real

    return {
        "factor": factor,
        "compaction_cycles_run": len(cycles),
        "wall_sec": round(wall, 2),
        "staging_compaction_cycles": cycles,
        "max_cycle_write_share_of_staging": max(
            (c["write_share_of_staging"] for c in cycles), default=None
        ),
        "monolithic_equiv_bytes": sum(
            c["staging_bytes_after"] for c in cycles
        ),
        "sum_compaction_bytes": sum(c["bytes_written"] for c in cycles),
    }


def main() -> None:
    from mini_etl_spark.session import get_spark

    spark = get_spark("scale-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    result = {"base": BASE, "sharder": {}, "mixer_staging": {}}
    for factor in FACTORS:
        work = f"/tmp/scale_stream_work_x{factor}"
        shutil.rmtree(work, ignore_errors=True)
        os.makedirs(work, exist_ok=True)
        result["sharder"][f"x{factor}"] = run_sharder(spark, factor, work)
        result["mixer_staging"][f"x{factor}"] = run_mixer_staging(
            spark, factor, work
        )
    with open(OUT, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
