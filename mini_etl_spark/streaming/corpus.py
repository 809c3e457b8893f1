"""Streaming twins of the corpus-assembly operators — incremental forms
of :func:`~mini_etl_spark.functions.splits.token_balanced_shard_ids` and
:func:`~mini_etl_spark.functions.mixing.temperature_mix`, built on the
same ``foreachBatch`` patterns as the rest of the streaming surface
(offset-state carry like ``stream_lm_update``'s model, snapshot publish
like ``stream_upsert_to_parquet``).

Reference parity: none — the reference has no streaming surface at all;
these extend the LLM-pipeline operators to continuous ingestion.

Two different incrementality shapes, matched to the operator's math:

- **token sharding is prefix-sum shaped** — a later batch only needs the
  running token total where the previous one stopped, so
  :func:`stream_token_shards` carries ONE integer of state per batch and
  every batch's work is batch-sized. Arrival order becomes the global
  order (a stream cannot re-order history); within a batch the usual
  md5 layout applies, so a replayed batch reproduces its assignment.
- **temperature mixing is a global quota over per-source counts** — any
  new document can change every source's quota, so there is no per-batch
  state smaller than the corpus. :func:`stream_temperature_mix` is
  therefore recompute-on-append: accumulate the stream into a staging
  table, re-run the (deterministic) batch mixture over everything seen,
  and publish it as an atomic snapshot. Cost per batch is one mixture
  job over the corpus-so-far — the honest price of a global quota; at
  100 TB you run it on a cadence (trigger intervals), not per-record,
  exactly like any other snapshot-maintaining sink here.
"""

from __future__ import annotations

import json
import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mini_etl_spark.streaming.events import _publish_snapshot

logger = logging.getLogger(__name__)

__all__ = ["stream_token_shards", "stream_temperature_mix"]


def _state_io(spark: SparkSession, path: str):
    """(fs, hadoop Path) for a small JSON state file — through the Hadoop
    FileSystem API so URI schemes (file://, hdfs://, s3a://) work."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _read_state(spark: SparkSession, path: str) -> dict:
    fs, hpath = _state_io(spark, path)
    if not fs.exists(hpath):
        return {}
    stream = fs.open(hpath)
    try:
        text = spark._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        return json.loads(text)
    finally:
        stream.close()


def _write_state(spark: SparkSession, path: str, doc: dict) -> None:
    fs, hpath = _state_io(spark, path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(json.dumps(doc).encode("utf-8")))
    finally:
        out.close()


def _checkpoint_query_id(spark: SparkSession, checkpoint: str) -> str:
    """The stable streaming-query id Structured Streaming persists at
    ``<checkpoint>/metadata`` — survives restarts of the same checkpoint,
    regenerates when the checkpoint is wiped. This is the identity that
    scopes batch ids: batch numbering restarts at 0 for a fresh
    checkpoint, so replay detection must never match a batch id recorded
    under a different checkpoint incarnation."""
    try:
        doc = _read_state(spark, checkpoint.rstrip("/") + "/metadata")
        return str(doc.get("id", ""))
    except Exception:  # metadata unreadable: disable id scoping, not the op
        return ""


def _resolve_offset(st: dict, batch_id: int, query_id: str = "") -> int:
    """Running-total offset for an incoming batch given the state doc.
    A replayed batch (same id the state was written FOR, under the SAME
    checkpoint incarnation — the at-least-once window between state
    write and checkpoint commit) restarts from ``prev_offset``; its
    tokens are already inside ``offset`` and using it would
    double-count them, permanently shifting every later shard boundary.
    A matching batch id under a DIFFERENT query id is a fresh checkpoint
    reusing id 0, not a replay — it continues from ``offset``. A state
    doc lacking ``prev_offset`` (written before replay tracking) falls
    back to ``offset`` — the documented old may-double-count caveat,
    never a silent reset to 0."""
    if st.get("batch_id") == batch_id and st.get("query_id", query_id) == query_id:
        return int(st.get("prev_offset", st.get("offset", 0)))
    return int(st.get("offset", 0))


def stream_token_shards(
    stream_df: DataFrame,
    out_path: str,
    checkpoint: str,
    tokens_per_shard: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    shard_col: str = "shard",
    state_path: str | None = None,
    available_now: bool = True,
    await_termination: bool = True,
    options: dict | None = None,
):
    """Streaming token-balanced sharding: every micro-batch continues the
    global running token total exactly where the previous batch stopped
    (one-integer state file), assigns shards with the SAME cut rule as
    the batch operator (``shard = cum_before // tokens_per_shard``,
    md5 layout within the batch, documents whole), and appends hive-style
    ``shard=K/`` parquet under ``out_path``.

    Equivalence contract (pytest-gated): streaming over batches B1,B2,…
    equals the batch prefix sum over the batches processed in arrival
    order with the md5 layout applied within each batch — the only
    well-defined global order an unbounded stream has. ``clamp=False``
    on the underlying call: a batch's trailing cut correctly OPENS the
    next shard for the following batch to keep filling (the batch-mode
    clamp is a complete-corpus rule).

    Replay safety: the state document records the batch id it was written
    FOR plus the offset both before and after that batch. A replayed
    batch (same incoming id as the stored one — the at-least-once window
    between the state write and the checkpoint commit) restarts from
    ``prev_offset``, reproducing its original assignment instead of
    double-counting its own tokens into the running total. The remaining
    caveat is duplicate part files from the replayed append — dedup on
    ``id_col`` at read time if the job is crash-prone, or land on a
    table format whose append is transactional.

    The state file defaults to ``<checkpoint>/_token_offset.json`` so its
    lifecycle is TIED to the checkpoint: wiping the checkpoint to
    reprocess from scratch wipes the offset with it (a stale offset
    against a fresh checkpoint would silently shift every assignment).

    ``options`` pass through to the parquet writer (e.g. compression).
    """
    from mini_etl_spark.functions.splits import token_balanced_shard_ids

    if tokens_per_shard < 1:
        raise ValueError("stream_token_shards: tokens_per_shard must be >= 1")
    state = state_path or (checkpoint.rstrip("/") + "/_token_offset.json")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        qid = _checkpoint_query_id(spark, checkpoint)
        offset = _resolve_offset(_read_state(spark, state), batch_id, qid)
        assigned = token_balanced_shard_ids(
            batch_df,
            text_col,
            id_col,
            tokens_per_shard,
            seed,
            keep_columns=True,
            token_count_col="__nt",
            start_offset=offset,
            clamp=False,
        )
        # base frame is materialized (localCheckpoint) inside the call —
        # the total is a cheap second action over it, not a recompute of
        # the batch plan; blocks release when the frame drops
        batch_tokens = int(
            assigned.agg(F.coalesce(F.sum("__nt"), F.lit(0))).first()[0]
        )
        writer = (
            assigned.withColumnRenamed("shard", shard_col)
            .drop("__nt")
            .write.mode("append")
        )
        for k, v in (options or {}).items():
            writer = writer.option(k, v)
        writer.partitionBy(shard_col).parquet(out_path)
        _write_state(
            spark,
            state,
            {
                "offset": offset + batch_tokens,
                "prev_offset": offset,
                "batch_id": batch_id,
                "query_id": qid,
            },
        )
        logger.info(
            "stream_token_shards batch %d: %d tokens, offset now %d",
            batch_id, batch_tokens, offset + batch_tokens,
        )

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if available_now and await_termination:
        query.awaitTermination()
    return query


def stream_temperature_mix(
    stream_df: DataFrame,
    out_path: str,
    checkpoint: str,
    budget: int,
    alpha: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
    repeat: bool = True,
    seen_path: str | None = None,
    available_now: bool = True,
    await_termination: bool = True,
):
    """Streaming temperature-scaled mixture: accumulate arriving documents
    into a staging table (``seen_path``), re-run the deterministic batch
    :func:`~mini_etl_spark.functions.mixing.temperature_mix` over
    everything seen so far, and publish the result as an atomic snapshot
    under ``out_path`` (``snap={batch}`` + ``_LATEST`` pointer — read it
    back with :func:`mini_etl_spark.streaming.events.read_latest_snapshot`).

    Equivalence contract (pytest-gated): after the stream drains, the
    latest snapshot equals the batch ``temperature_mix`` over the full
    input — recompute-on-append over a deterministic operator IS the
    batch result, regardless of how the input was batched. That is the
    point of this shape: per-source quotas are a global property
    (``floor(budget · n_s**alpha / Σ w)``), so no per-batch state smaller
    than the per-source corpus can maintain them; the staging table +
    snapshot is the smallest honest incremental form.
    """
    from mini_etl_spark.functions.mixing import temperature_mix

    if budget <= 0:
        raise ValueError("stream_temperature_mix: budget must be positive")
    seen = seen_path or (out_path.rstrip("/") + "_seen")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # one OVERWRITTEN directory per batch id, so an at-least-once
        # replay of a crashed batch lands on the same directory instead
        # of appending duplicate rows into the staging corpus (the
        # partition-style layout also means the accumulate is idempotent
        # across restarts); the synthetic `batch` partition column is
        # dropped before mixing
        batch_df.write.mode("overwrite").parquet(
            f"{seen.rstrip('/')}/batch={batch_id}"
        )
        full = spark.read.parquet(seen).drop("batch")
        mixed = temperature_mix(
            full, budget, alpha, source_col, id_col, seed, repeat
        )
        _publish_snapshot(mixed, out_path, batch_id)

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if available_now and await_termination:
        query.awaitTermination()
    return query
