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
  Output is published per-batch with a commit marker written LAST, so a
  replayed batch overwrites its own directory and re-commits the same
  marker — :func:`read_token_shards` sees every committed row exactly
  once with no read-time dedup. Committed batch directories are sealed
  into IMMUTABLE compacted segments every ``compact_every`` batches
  (pointer-committed, one-cycle reader grace, LSM-merged when the
  segment list exceeds ``max_segments``), so directory, file and marker
  counts stay bounded at any trigger cadence while each cycle's write
  cost stays segment-sized, not output-so-far.
- **temperature mixing is a global quota over per-source counts** — any
  new document can change every source's quota, so there is no per-batch
  state smaller than the corpus. :func:`stream_temperature_mix` is
  therefore recompute-on-append: accumulate the stream into a staging
  table, re-run the (deterministic) batch mixture over everything seen,
  and publish it as an atomic snapshot. Cost per batch is one mixture
  job over the corpus-so-far — the honest price of a global quota; at
  100 TB you run it on a cadence (trigger intervals), not per-record,
  exactly like any other snapshot-maintaining sink here. The staging
  table is compacted into immutable segments every ``compact_every``
  batches (pointer-committed, replay-safe) so the per-batch directory
  count stays bounded and each cycle rewrites one segment, not the
  staging-so-far.
"""

from __future__ import annotations

import json
import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mini_etl_spark.streaming.events import (
    _publish_snapshot,
    _snapshot_incarnation_guard,
)

logger = logging.getLogger(__name__)

__all__ = ["stream_token_shards", "read_token_shards", "stream_temperature_mix"]


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
        # a crash inside _write_state's no-overwrite fallback (between
        # the rename-to-.bak and the rename-into-place) leaves only the
        # backup — recover the pre-update doc rather than silently
        # resetting to {} (which would restart the offset at 0)
        bak = spark._jvm.org.apache.hadoop.fs.Path(path + ".bak")
        if fs.exists(bak):
            return _read_state(spark, path + ".bak")
        return {}
    stream = fs.open(hpath)
    try:
        text = spark._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    try:
        return json.loads(text)
    except ValueError as exc:
        raise ValueError(
            f"corrupt streaming state file {path!r} ({exc}). Do NOT just "
            f"delete it — a missing state file silently resets the running "
            f"offset to 0 against a live checkpoint, shifting every later "
            f"shard boundary. Recover by restoring the file (a valid "
            f"'{path}.tmp' sibling from an interrupted write may hold the "
            f"intended content), or wipe the checkpoint AND the output "
            f"path together and reprocess from scratch."
        ) from exc


def _write_state(spark: SparkSession, path: str, doc: dict) -> None:
    """Write a small JSON state doc via tmp-file + rename, so a crash
    mid-write leaves the previous doc intact (never a truncated/corrupt
    target). Hadoop's local filesystem rename is an atomic POSIX rename;
    on no-overwrite filesystems (HDFS semantics) the fallback first
    renames the live doc to ``.bak`` and then renames the tmp into
    place — a crash in between leaves the backup, which
    :func:`_read_state` recovers (the conservative pre-update doc),
    never a missing file that would silently reset the offset to 0."""
    jvm = spark._jvm
    fs, hpath = _state_io(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(doc).encode("utf-8")))
    finally:
        out.close()
    bak = jvm.org.apache.hadoop.fs.Path(path + ".bak")
    if not fs.rename(tmp, hpath):
        fs.delete(bak, False)
        fs.rename(hpath, bak)
        if not fs.rename(tmp, hpath):
            raise IOError(f"could not publish state file {path!r}")
    # clear any backup (from this call's fallback or an older crash) so
    # a stale doc can never be resurrected after a successful publish
    fs.delete(bak, False)


def _checkpoint_query_id(spark: SparkSession, checkpoint: str) -> str:
    """The stable streaming-query id Structured Streaming persists at
    ``<checkpoint>/metadata`` — survives restarts of the same checkpoint,
    regenerates when the checkpoint is wiped. This is the identity that
    scopes batch ids: batch numbering restarts at 0 for a fresh
    checkpoint, so replay detection must never match a batch id recorded
    under a different checkpoint incarnation. Unreadable metadata returns
    ``""``, which :func:`_resolve_offset` treats as a WILDCARD match —
    the degraded mode keeps replay protection (conservative direction)
    instead of disabling it."""
    try:
        doc = _read_state(spark, checkpoint.rstrip("/") + "/metadata")
        return str(doc.get("id", ""))
    except Exception:  # metadata unreadable: degrade to wildcard matching
        return ""


def _resolve_offset(st: dict, batch_id: int, query_id: str = "") -> int:
    """Running-total offset for an incoming batch given the state doc.
    A replayed batch (same id the state was written FOR, under the SAME
    checkpoint incarnation — the at-least-once window between state
    write and checkpoint commit) restarts from ``prev_offset``; its
    tokens are already inside ``offset`` and using it would
    double-count them, permanently shifting every later shard boundary.
    A matching batch id under a DIFFERENT query id is a fresh checkpoint
    reusing id 0, not a replay — it continues from ``offset``. An EMPTY
    query id on either side (checkpoint metadata unreadable, or a state
    doc written before id scoping) is a wildcard: the batch-id collision
    is then treated as a replay, because degrading toward ``prev_offset``
    re-runs an identical assignment at worst, while degrading toward
    ``offset`` double-counts — the unsafe direction. A state doc lacking
    ``prev_offset`` (written before replay tracking) falls back to
    ``offset`` — the documented old may-double-count caveat, never a
    silent reset to 0."""
    stored_qid = str(st.get("query_id", ""))
    qid_match = (not query_id) or (not stored_qid) or stored_qid == query_id
    if st.get("batch_id") == batch_id and qid_match:
        return int(st.get("prev_offset", st.get("offset", 0)))
    return int(st.get("offset", 0))


def _commit_dir(out_path: str) -> str:
    return out_path.rstrip("/") + "/_commits"


def _output_pointer(out_path: str) -> str:
    return out_path.rstrip("/") + "/_COMPACT.json"


def _committed_batches(spark: SparkSession, out_path: str) -> list[int]:
    """Batch ids with a published commit marker under ``out_path``."""
    fs, hdir = _state_io(spark, _commit_dir(out_path))
    if not fs.exists(hdir):
        return []
    ids = []
    for status in fs.listStatus(hdir):
        name = status.getPath().getName()
        if name.endswith(".json"):
            try:
                ids.append(int(name[: -len(".json")]))
            except ValueError:
                continue
    return sorted(ids)


def read_token_shards(spark: SparkSession, out_path: str) -> DataFrame | None:
    """Exactly-once reader for :func:`stream_token_shards` output: the
    sealed compacted segments the ``_COMPACT.json`` pointer lists (all
    committed batches up to its ``upto``, if compaction is enabled) plus
    every batch directory NEWER than it that has a published commit
    marker. A crash between data write and marker publish (or a
    half-written replay in flight) is invisible, and no read-time dedup
    is needed — a replayed batch OVERWRITES its own ``batch=K/``
    directory, and a replayed compaction rewrites the same segment
    directories. Returns ``None`` when nothing has been committed yet.
    The synthetic ``batch`` partition column is dropped; the shard
    column survives as the hive-style partition it was written with (in
    the compacted segments too — compaction preserves the shard
    partitioning).

    Concurrency contract: the returned DataFrame lists its directories
    at call time, and compaction GC retains everything a reader could
    have listed for ONE full further compaction cycle (directories are
    deleted only after they have been invisible to new readers since
    the previous pointer flip). Consume the frame within a cycle; a
    FileNotFound on a very stale frame just means re-calling this
    function."""
    root = out_path.rstrip("/")
    # a corrupt pointer RAISES (via _read_state's diagnosis): silently
    # treating it as absent would read grace-retained folded batch dirs
    # in place of the segments and drop every GC'd batch's rows
    st = _read_state(spark, _output_pointer(out_path))
    upto = int(st["upto"]) if st else -1
    ids = [i for i in _committed_batches(spark, out_path) if i > upto]
    parts = []
    segs = _pointer_segments(st)
    # segment dirs derived from the pointer's RELATIVE names (never a
    # persisted absolute path) so a copied/relocated output root reads
    # ITS OWN segments, not the original location's. One read PER segment
    # (unioned) so each dir is its own partition-discovery base — shard=K
    # is a column, and a legacy upto=N generation name can't collide with
    # the seg-… names in one multi-path discovery.
    parts += [
        spark.read.parquet(f"{root}/compact/{name}") for _, _, name in segs
    ]
    if ids:
        dirs = [f"{root}/batch={i}" for i in ids]
        parts.append(
            spark.read.option("basePath", root).parquet(*dirs).drop("batch")
        )
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _output_batch_dirs(spark: SparkSession, out_path: str) -> dict[int, str]:
    """Numeric ``batch=K`` directories under the shard OUTPUT root
    (``_commits/``, ``compact/`` and pointer/marker files are skipped)."""
    fs, hroot = _state_io(spark, out_path)
    if not fs.exists(hroot):
        return {}
    out = {}
    for status in fs.listStatus(hroot):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith("batch="):
            try:
                out[int(name[len("batch="):])] = (
                    f"{out_path.rstrip('/')}/{name}"
                )
            except ValueError:
                continue
    return out


def _existing_output_query_ids(
    spark: SparkSession, out_path: str, max_markers: int = 16
) -> set:
    """Non-empty query ids recorded in the output's compaction pointer
    and its NEWEST ``max_markers`` commit markers — the persisted
    identity of the checkpoint incarnation(s) that produced it.
    Unreadable documents are skipped (they cannot positively identify a
    FOREIGN incarnation). The scan is bounded and newest-first so a
    compaction-disabled output with 10⁵ markers costs ~16 driver-side
    reads at stream start, not one per batch ever published; ALL
    ``max_markers`` newest markers are read (no early exit), so an
    output interleaving markers from two incarnations within that
    window surfaces both ids."""
    qids = set()
    try:
        st = _read_state(spark, _output_pointer(out_path))
        if st.get("query_id"):
            qids.add(str(st["query_id"]))
    except ValueError:
        pass
    newest_first = sorted(_committed_batches(spark, out_path), reverse=True)
    for i in newest_first[:max_markers]:
        try:
            doc = _read_state(spark, f"{_commit_dir(out_path)}/{i}.json")
        except ValueError:
            continue
        if doc.get("query_id"):
            qids.add(str(doc["query_id"]))
    return qids


def _seg_name(lo: int, hi: int) -> str:
    """A sealed segment's directory name under ``compact/`` — derived
    from the batch range it covers, never trusted from a persisted
    absolute path, so a copied/relocated output root keeps working.
    Deliberately NOT ``key=value``-shaped: partition discovery would
    otherwise parse the segment dir itself as a partition component and
    refuse multi-segment reads (CONFLICTING_DIRECTORY_STRUCTURES)."""
    return f"seg-{lo}-{hi}"


def _pointer_segments(st: dict) -> list[tuple[int, int, str]]:
    """``(lo, hi, relative dir name under compact/)`` for every sealed
    segment a ``_COMPACT.json`` pointer references, oldest first. Names
    are RELATIVE to the output root (relocation-safe — the pointer never
    stores an absolute path the reader would trust). A legacy pre-round-9
    pointer (``{"upto", "dir"}`` — the monolithic-generation era) maps to
    ONE segment covering ``0..upto`` under its historical ``upto=<n>``
    directory name; it is carried as a sealed segment from then on and
    eventually merged away by the normal LSM rule — no migration
    rewrite."""
    if not st:
        return []
    segs = st.get("segments")
    if segs is None:
        upto = int(st["upto"])
        return [(0, upto, f"upto={upto}")]
    return [(int(e[0]), int(e[1]), str(e[2])) for e in segs]


def _choose_merge(segments: list[tuple[int, int, str]]) -> int:
    """Index ``i`` of the adjacent pair ``(i, i+1)`` with the smallest
    combined batch span — the size-tiered (LSM-style) merge pick.
    Deterministic from the pointer alone (a replayed compaction must
    rewrite the SAME directories); leftmost wins ties so equal-span
    segments fold oldest-first."""
    best, best_span = 0, None
    for i in range(len(segments) - 1):
        span = (segments[i][1] - segments[i][0] + 1) + (
            segments[i + 1][1] - segments[i + 1][0] + 1
        )
        if best_span is None or span < best_span:
            best, best_span = i, span
    return best


def _compact_output(
    spark: SparkSession,
    out_path: str,
    upto: int,
    shard_col: str,
    query_id: str,
    options: dict | None = None,
    max_segments: int = 16,
) -> dict | None:
    """Seal every COMMITTED ``batch=K`` dir with ``prev_upto < K <= upto``
    into ONE new IMMUTABLE shard-partitioned segment
    (``compact/seg=<lo>-<hi>/``), LSM-merge the two adjacent segments
    with the smallest combined span while the segment list exceeds
    ``max_segments``, flip the ``_COMPACT.json`` pointer atomically
    (it carries the segment LIST), then GC with a ONE-CYCLE GRACE: only
    directories and markers that the PREVIOUS flip already made invisible
    to new readers (batches ``<= prev_upto``, plus ``compact/`` dirs
    referenced by NEITHER the new nor the pre-flip pointer) are deleted —
    anything a concurrent :func:`read_token_shards` call could have
    listed since that flip survives until the next compaction.

    Write amplification — the round-8 weak item this design closes: a
    sealed segment is NEVER rewritten by later cycles, so the bytes
    written per cycle are one new segment (≈ ``compact_every`` batches)
    plus at most one merged pair — bounded by segment size, not by the
    output-so-far. Smallest-adjacent-pair merging gives the binary-counter
    shape (segment sizes ~powers of two), so a row is rewritten
    O(log n_cycles) times over the stream's life instead of once per
    cycle; with the default ``max_segments=16`` the counter holds ~2^16
    cycles (~8 years at an hourly cadence) before a forced large merge.

    Crash-safe at every point (same argument as :func:`_compact_staging`):
    before the pointer flip the new segment and merge dirs are
    unreferenced (a replay re-runs the identical deterministic plan and
    overwrites them); after it, survivors of a failed GC are invisible to
    the read rule and re-swept next cycle. Idempotent on replay — same
    ``upto`` rewrites identical content over the same directories.

    Returns per-cycle stats ``{"upto", "segments", "folded_batches",
    "merges", "bytes_written"}`` (None for a no-op replay) — the scale
    sweep and the write-amplification regression test consume these."""
    root = out_path.rstrip("/")
    pointer = _output_pointer(out_path)
    st = _read_state(spark, pointer)
    prev_upto = int(st["upto"]) if st else -1
    if prev_upto >= upto:
        return None  # replay of an already-applied compaction
    new_ids = [
        i for i in _committed_batches(spark, out_path)
        if prev_upto < i <= upto
    ]
    if not new_ids:
        return None
    jvm = spark._jvm
    fs, _ = _state_io(spark, root)

    def _write_seg(df, name: str) -> None:
        writer = df.repartition(F.col(shard_col)).write.mode("overwrite")
        # same writer options (compression, …) as the per-batch publishes
        # — segments hold nearly all the data, so dropping them here would
        # silently override the sink's configuration for the bulk
        for k, v in (options or {}).items():
            writer = writer.option(k, v)
        writer.partitionBy(shard_col).parquet(f"{root}/compact/{name}")

    # 1. seal the newly committed batches into their own tail segment
    #    (lo tiles from prev_upto+1 so segment ranges partition 0..upto
    #    even when some batch ids in the range were empty)
    prev_segments = _pointer_segments(st)
    tail = (prev_upto + 1, upto, _seg_name(prev_upto + 1, upto))
    _write_seg(
        spark.read.option("basePath", root)
        .parquet(*[f"{root}/batch={i}" for i in new_ids])
        .drop("batch"),
        tail[2],
    )
    written = [tail[2]]
    segments = prev_segments + [tail]
    # 2. bound the list: merge the smallest-span adjacent pair until it
    #    fits (sealed segments other than the merged pair are untouched)
    merges = 0
    while len(segments) > max(1, max_segments):
        i = _choose_merge(segments)
        a, b = segments[i], segments[i + 1]
        m = (a[0], b[1], _seg_name(a[0], b[1]))
        # one read per source segment (unioned): each dir is its own
        # partition-discovery base, so a legacy upto=N generation merges
        # cleanly with seg-… neighbors
        _write_seg(
            spark.read.parquet(f"{root}/compact/{a[2]}").unionByName(
                spark.read.parquet(f"{root}/compact/{b[2]}")
            ),
            m[2],
        )
        written.append(m[2])
        segments[i:i + 2] = [m]
        merges += 1
    # 3. single atomic pointer flip — the reader-visibility point
    _write_state(
        spark,
        pointer,
        {
            "upto": upto,
            "segments": [[lo, hi, name] for lo, hi, name in segments],
            "query_id": query_id,
        },
    )
    bytes_written = sum(
        fs.getContentSummary(
            jvm.org.apache.hadoop.fs.Path(f"{root}/compact/{name}")
        ).getLength()
        for name in written
    )
    # GC (one-cycle grace): compact/ dirs referenced by NEITHER the new
    # nor the PRE-flip pointer (in-flight readers may hold the latter);
    # batch dirs and markers <= prev_upto (invisible since the previous
    # flip — includes replay-orphan rewrites of long-folded batches)
    keep = {name for _, _, name in segments}
    keep |= {name for _, _, name in prev_segments}
    gc = []
    compact_root = jvm.org.apache.hadoop.fs.Path(root + "/compact")
    if fs.exists(compact_root):
        for status in fs.listStatus(compact_root):
            name = status.getPath().getName()
            if name not in keep:
                gc.append(f"{root}/compact/{name}")
    gc += [
        d for k, d in _output_batch_dirs(spark, out_path).items()
        if k <= prev_upto
    ]
    gc += [
        f"{_commit_dir(out_path)}/{i}.json"
        for i in _committed_batches(spark, out_path)
        if i <= prev_upto
    ]
    for d in gc:
        try:
            fs.delete(jvm.org.apache.hadoop.fs.Path(d), True)
        except Exception:
            logger.warning("output compaction GC failed for %s (ignored)", d)
    return {
        "upto": upto,
        "segments": len(segments),
        "folded_batches": len(new_ids),
        "merges": merges,
        "bytes_written": int(bytes_written),
    }


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
    compact_every: int | None = 64,
    max_segments: int = 16,
    available_now: bool = True,
    await_termination: bool = True,
    options: dict | None = None,
):
    """Streaming token-balanced sharding: every micro-batch continues the
    global running token total exactly where the previous batch stopped
    (one-integer state file), assigns shards with the SAME cut rule as
    the batch operator (``shard = cum_before // tokens_per_shard``,
    md5 layout within the batch, documents whole), and publishes
    hive-style ``batch=B/shard=K/`` parquet under ``out_path`` with a
    per-batch commit marker.

    Equivalence contract (pytest-gated): streaming over batches B1,B2,…
    equals the batch prefix sum over the batches processed in arrival
    order with the md5 layout applied within each batch — the only
    well-defined global order an unbounded stream has. ``clamp=False``
    on the underlying call: a batch's trailing cut correctly OPENS the
    next shard for the following batch to keep filling (the batch-mode
    clamp is a complete-corpus rule).

    Replay safety — offsets: the state document records the batch id it
    was written FOR plus the offset both before and after that batch. A
    replayed batch (same incoming id as the stored one — the
    at-least-once window between the state write and the checkpoint
    commit) restarts from ``prev_offset``, reproducing its original
    assignment instead of double-counting its own tokens into the
    running total.

    Replay safety — files (exactly-once publish): each batch writes its
    rows to its OWN ``batch=B/`` directory in overwrite mode and then
    publishes an atomic commit marker (``_commits/B.json``) LAST. A
    replayed batch therefore replaces its earlier attempt's files and
    re-publishes an identical marker — no duplicate part files, ever.
    Read the output with :func:`read_token_shards` (takes the compacted
    generation plus newer committed batches); a plain
    ``spark.read.parquet(out_path)`` is NOT equivalent once compaction
    has run (it would double-count grace-retained folded batch dirs)
    and may see an in-flight uncommitted batch directory.

    Output retention — compaction: at a real trigger cadence the
    per-batch publish accrues one ``batch=B/`` directory plus one
    commit marker per micro-batch forever, and the reader's directory
    list grows with it. Every ``compact_every`` batches the committed
    batch directories are sealed into one IMMUTABLE shard-partitioned
    segment (``compact/seg=<lo>-<hi>/``) behind an atomic
    ``_COMPACT.json`` pointer that carries the segment LIST
    (:func:`_compact_output` — crash-safe, replay-idempotent, one-cycle
    GC grace for concurrent readers), bounding the directory, file and
    marker count at any cadence. A sealed segment is never rewritten;
    when the list exceeds ``max_segments`` the two adjacent segments
    with the smallest combined span LSM-merge into one, so the bytes
    written per cycle are bounded by segment size — not by the
    output-so-far — and a row is rewritten O(log cycles) times over the
    stream's life (the round-8 full-rewrite design rewrote everything
    every cycle). ``compact_every=None`` disables compaction and keeps
    the pure per-batch layout.

    The state file defaults to ``<checkpoint>/_token_offset.json`` so its
    lifecycle is TIED to the checkpoint: wiping the checkpoint to
    reprocess from scratch wipes the offset with it (a stale offset
    against a fresh checkpoint would silently shift every assignment).
    ``out_path`` must be wiped TOGETHER with the checkpoint — batch
    numbering restarts at 0 for a fresh checkpoint, so reprocessing into
    an old output directory would overwrite its early batches while
    leaving later ones stale. This is ENFORCED at stream start: if the
    output's commit markers (or compaction pointer) record a readable
    query id different from the current checkpoint's — a fresh
    checkpoint included — the call raises instead of silently
    corrupting the output.

    ``options`` pass through to the parquet writer (e.g. compression).
    """
    from mini_etl_spark.functions.splits import token_balanced_shard_ids

    if tokens_per_shard < 1:
        raise ValueError("stream_token_shards: tokens_per_shard must be >= 1")
    if compact_every is not None and compact_every < 2:
        raise ValueError("stream_token_shards: compact_every must be >= 2")
    if max_segments < 1:
        raise ValueError("stream_token_shards: max_segments must be >= 1")
    if shard_col == "batch" or "batch" in stream_df.columns:
        raise ValueError(
            "stream_token_shards: a column named 'batch' (shard_col or "
            "input) collides with the per-batch publish partition "
            "directory — partition discovery would shadow the data "
            "column and read_token_shards drops it. Rename it upstream."
        )
    state = state_path or (checkpoint.rstrip("/") + "/_token_offset.json")

    # legacy-layout guard (once, at call time — the condition can only be
    # true before the stream starts): output written by the pre-manifest
    # version (flat shard=K/ at the root, no _commits/) must not be
    # silently continued — the mixed depths break partition discovery and
    # read_token_shards would drop every pre-upgrade row
    _session = stream_df.sparkSession
    fs, hroot = _state_io(_session, out_path)
    if fs.exists(hroot) and not fs.exists(
        _state_io(_session, _commit_dir(out_path))[1]
    ):
        for status in fs.listStatus(hroot):
            if status.getPath().getName().startswith(f"{shard_col}="):
                raise ValueError(
                    f"stream_token_shards: {out_path!r} holds a "
                    "legacy flat shard layout (pre-manifest). Point "
                    "out_path at a fresh directory, or migrate the "
                    "old files into a batch=<n>/ directory with a "
                    "matching _commits/<n>.json marker."
                )

    # incarnation guard (once, at call time): the output's commit markers
    # persist the query id of the checkpoint that produced them. Starting
    # a DIFFERENT checkpoint incarnation (a fresh checkpoint restarts
    # batch ids at 0) against that output would silently overwrite its
    # early batches while read_token_shards keeps serving stale later
    # ones. Skipped only when the current checkpoint EXISTS but its
    # metadata is unreadable (the documented degraded-wildcard mode);
    # a fresh checkpoint (no metadata yet) against foreign markers raises.
    # the checkpoint may live on a DIFFERENT filesystem than out_path
    # (hdfs:// checkpoint, s3a:// output) — resolve its own fs
    _meta_fs, _meta_path = _state_io(
        _session, checkpoint.rstrip("/") + "/metadata"
    )
    _meta_exists = _meta_fs.exists(_meta_path)
    _ckpt_qid = _checkpoint_query_id(_session, checkpoint)
    if not (_meta_exists and not _ckpt_qid):
        _foreign = {
            q for q in _existing_output_query_ids(_session, out_path)
            if q != _ckpt_qid
        }
        if _foreign:
            raise ValueError(
                f"stream_token_shards: {out_path!r} was produced by a "
                f"different checkpoint incarnation (query id(s) "
                f"{sorted(_foreign)} != {_ckpt_qid or '<fresh checkpoint>'}). "
                "Batch ids restart at 0 for a fresh checkpoint, so "
                "continuing would overwrite early batches and corrupt "
                "the output. Wipe out_path TOGETHER with the checkpoint "
                "to reprocess from scratch, or resume the original "
                "checkpoint."
            )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        qid = _checkpoint_query_id(spark, checkpoint)
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            # fold strictly-previous COMMITTED batches before this batch
            # publishes: a replay of this batch re-runs an identical
            # (idempotent) compaction and then overwrites its own
            # directory, so no row ever lands in both the generation and
            # a live batch dir
            _compact_output(
                spark, out_path, batch_id - 1, shard_col, qid,
                options=options, max_segments=max_segments,
            )
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
        totals = assigned.agg(
            F.coalesce(F.sum("__nt"), F.lit(0)).alias("__t"),
            F.count(F.lit(1)).alias("__n"),
        ).first()
        batch_tokens, batch_rows = int(totals[0]), int(totals[1])
        if batch_rows == 0:
            # an empty batch (e.g. fully filtered upstream) publishes no
            # directory and no marker — a partitioned write of zero rows
            # leaves a dataless dir that breaks schema inference on read.
            # State is still advanced so replay bookkeeping stays exact.
            _write_state(spark, state, {
                "offset": offset, "prev_offset": offset,
                "batch_id": batch_id, "query_id": qid,
            })
            return
        writer = (
            assigned.withColumnRenamed("shard", shard_col)
            .drop("__nt")
            .write.mode("overwrite")
        )
        for k, v in (options or {}).items():
            writer = writer.option(k, v)
        batch_dir = f"{out_path.rstrip('/')}/batch={batch_id}"
        writer.partitionBy(shard_col).parquet(batch_dir)
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
        # commit marker LAST — the reader-visibility flip. A crash before
        # this line leaves the batch invisible to read_token_shards; the
        # replay rewrites the same directory and publishes the marker.
        _write_state(
            spark,
            f"{_commit_dir(out_path)}/{batch_id}.json",
            {
                "batch_id": batch_id,
                "query_id": qid,
                "tokens": batch_tokens,
                "offset_before": offset,
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


def _staging_batch_dirs(spark: SparkSession, seen: str) -> dict[int, str]:
    """Numeric ``batch=K`` staging directories under ``seen``. Flat data
    files at the staging ROOT (the oldest legacy layout, which appended
    ``part-*.parquet`` directly under ``seen``) would be silently
    ignored by the batch-directory read rule — every staged row from
    that era would vanish from the mixture — so their presence is an
    error, not a skip."""
    fs, hroot = _state_io(spark, seen)
    if not fs.exists(hroot):
        return {}
    out = {}
    for status in fs.listStatus(hroot):
        name = status.getPath().getName()
        if status.isFile() and name.endswith(".parquet"):
            raise ValueError(
                f"stream_temperature_mix: staging {seen!r} holds flat "
                "data files from the pre-batch layout; the "
                "batch-directory read rule would silently skip them. "
                "Migrate them into a batch=<n>/ subdirectory (any n "
                "below the checkpoint's next batch id), or wipe the "
                "staging together with the checkpoint."
            )
        if status.isDirectory() and name.startswith("batch="):
            try:
                out[int(name[len("batch="):])] = f"{seen.rstrip('/')}/{name}"
            except ValueError:
                continue
    return out


def _read_staging(spark: SparkSession, seen: str) -> DataFrame | None:
    """The corpus-so-far: the sealed compacted segments the pointer lists
    (if any) plus every per-batch directory NEWER than its ``upto``.
    Directories already folded into the compaction pointer are excluded
    even if their deletion failed — orphans are invisible, and re-GC'd
    next compaction. Flat legacy data files at the root raise (see
    _staging_batch_dirs)."""
    root = seen.rstrip("/")
    st = _read_state(spark, root + "/_COMPACT.json")
    upto = int(st["upto"]) if st else -1
    dirs = [f"{root}/compact/{name}" for _, _, name in _pointer_segments(st)]
    dirs += [d for k, d in sorted(_staging_batch_dirs(spark, seen).items())
             if k > upto]
    if not dirs:
        return None
    return spark.read.parquet(*dirs)


def _compact_staging(
    spark: SparkSession, seen: str, upto: int, max_segments: int = 16
) -> None:
    """Seal all ``batch=K`` dirs with ``prev_upto < K <= upto`` into one
    new IMMUTABLE segment (``compact/seg=<lo>-<hi>/``), LSM-merge the
    smallest-span adjacent pair while the segment list exceeds
    ``max_segments``, flip the ``_COMPACT.json`` pointer (carrying the
    segment list) atomically, then best-effort delete the superseded
    directories. Same write-amplification bound as
    :func:`_compact_output`: sealed segments are never rewritten, so a
    cycle's write cost is one batch-sized segment plus at most one
    merged pair — not the staging-so-far. GC here is immediate (no
    grace): staging is read only inside the same foreachBatch call, so
    there are no concurrent readers to protect.

    Crash-safe at every point: before the pointer flip the new
    directories are unreferenced (a replay re-runs the identical
    deterministic plan over them); after it, survivors of a failed
    delete are excluded by the read rule and re-swept next cycle.
    Idempotent on replay — re-running with the same ``upto`` rewrites
    identical content over the same directories and re-flips the pointer
    to the same value."""
    root = seen.rstrip("/")
    pointer = root + "/_COMPACT.json"
    st = _read_state(spark, pointer)
    prev_upto = int(st["upto"]) if st else -1
    batch_dirs = _staging_batch_dirs(spark, seen)
    subsumed = {k: d for k, d in batch_dirs.items() if prev_upto < k <= upto}
    # replay no-op: a re-run whose batches are already folded (pointer at
    # or past `upto`, or the subsumed dirs already GC'd) must not rewrite
    # the live segments over themselves — the pointer is already correct
    if prev_upto >= upto or not subsumed:
        return
    fs, _ = _state_io(spark, root)
    jvm = spark._jvm

    def _write_seg(sources: list[str], name: str) -> None:
        # size the rewrite from the file listing (metadata-only), same
        # rule as maintenance.compact_parquet: ~128 MB output files
        total_bytes = sum(
            fs.getContentSummary(jvm.org.apache.hadoop.fs.Path(d)).getLength()
            for d in sources
        )
        n = max(1, -(-total_bytes // (128 * 1024 * 1024)))
        spark.read.parquet(*sources).repartition(int(n)).write.mode(
            "overwrite"
        ).parquet(f"{root}/compact/{name}")

    prev_segments = _pointer_segments(st)
    tail = (prev_upto + 1, upto, _seg_name(prev_upto + 1, upto))
    _write_seg([d for _, d in sorted(subsumed.items())], tail[2])
    segments = prev_segments + [tail]
    while len(segments) > max(1, max_segments):
        i = _choose_merge(segments)
        a, b = segments[i], segments[i + 1]
        m = (a[0], b[1], _seg_name(a[0], b[1]))
        _write_seg(
            [f"{root}/compact/{a[2]}", f"{root}/compact/{b[2]}"], m[2]
        )
        segments[i:i + 2] = [m]
    _write_state(
        spark,
        pointer,
        {
            "upto": upto,
            "segments": [[lo, hi, name] for lo, hi, name in segments],
        },
    )
    # GC: everything the pointer has superseded — the just-subsumed batch
    # dirs, every compact/ dir the new segment list does NOT reference
    # (merged-away segments, plus orphans a crash between a previous
    # pointer flip and its GC left behind), and any older batch-dir
    # orphans (k <= upto is always excluded by the read rule, so
    # sweeping them here is safe at any time).
    keep = {name for _, _, name in segments}
    gc = [d for k, d in batch_dirs.items() if k <= upto]
    compact_root = jvm.org.apache.hadoop.fs.Path(root + "/compact")
    if fs.exists(compact_root):
        for status in fs.listStatus(compact_root):
            name = status.getPath().getName()
            if name not in keep:
                gc.append(f"{root}/compact/{name}")
    for d in gc:
        try:
            fs.delete(jvm.org.apache.hadoop.fs.Path(d), True)
        except Exception:
            logger.warning("compaction GC failed for %s (orphan, ignored)", d)


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
    compact_every: int | None = 8,
    max_segments: int = 16,
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

    Staging lifecycle: ``seen_path`` defaults to ``<checkpoint>/_seen``
    so wiping the checkpoint to reprocess from scratch wipes the staged
    corpus with it — a stale staging table against a fresh checkpoint
    would mix already-processed documents into every new snapshot. If
    you pass an explicit ``seen_path``, wipe it together with the
    checkpoint. Every ``compact_every`` batches the per-batch staging
    directories are sealed into an immutable compacted segment
    (pointer-committed, replay-idempotent, crash-safe, LSM-merged when
    the list exceeds ``max_segments`` — see :func:`_compact_staging`),
    so the staging file count stays bounded at any trigger cadence
    instead of accruing one ``batch=K/`` directory forever, and each
    cycle's write cost is segment-sized, not staging-so-far.
    ``compact_every=None`` disables compaction.

    Incarnation safety (same protocol as the other snapshot sinks): the
    published ``_LATEST`` pointer records the checkpoint's query id, and
    starting a DIFFERENT checkpoint incarnation against an existing
    ``out_path`` raises at stream start — a fresh checkpoint restarts
    batch ids at 0, which would silently reuse ``snap=B`` names and let
    snapshot GC delete the old incarnation's directories. Wipe
    ``out_path`` together with the checkpoint (and staging) to start
    over.
    """
    from mini_etl_spark.functions.mixing import temperature_mix

    if budget <= 0:
        raise ValueError("stream_temperature_mix: budget must be positive")
    if compact_every is not None and compact_every < 2:
        raise ValueError("stream_temperature_mix: compact_every must be >= 2")
    if max_segments < 1:
        raise ValueError("stream_temperature_mix: max_segments must be >= 1")
    _snapshot_incarnation_guard(stream_df.sparkSession, out_path, checkpoint)
    seen = seen_path or (checkpoint.rstrip("/") + "/_seen")
    if seen_path is None:
        # migration guard (once, at call time): an earlier version staged
        # under <out_path>_seen — resuming its checkpoint with the new
        # checkpoint-scoped default would silently drop every previously
        # staged document from the mixture (the checkpoint blocks
        # re-delivery of the old input)
        fs, legacy = _state_io(
            stream_df.sparkSession, out_path.rstrip("/") + "_seen"
        )
        if fs.exists(legacy):
            raise ValueError(
                "stream_temperature_mix: found a legacy staging "
                f"directory at {out_path.rstrip('/')}_seen but "
                "seen_path was not given (staging now defaults "
                "under the checkpoint). Pass seen_path pointing at "
                "the legacy directory to continue it (flat pre-batch "
                "layouts are detected and refused on read), or remove "
                "it together with the checkpoint to start fresh."
            )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            # same guard as stream_token_shards: a zero-row partitioned
            # write leaves a DATALESS batch=K dir (only _SUCCESS) that
            # breaks parquet schema inference when it is the first/only
            # staging dir — and the staged corpus, mixture and snapshot
            # are all unchanged by an empty batch anyway
            return
        # one OVERWRITTEN directory per batch id, so an at-least-once
        # replay of a crashed batch lands on the same directory instead
        # of appending duplicate rows into the staging corpus; the
        # `batch` partition value never reaches the mixture (directories
        # are read explicitly, not via partition discovery)
        batch_df.write.mode("overwrite").parquet(
            f"{seen.rstrip('/')}/batch={batch_id}"
        )
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            # fold strictly-previous batches only: the current batch dir
            # stays outside the sealed segments, so a replay of this
            # batch re-runs an identical (idempotent) compaction and then
            # overwrites its own directory — no row ever lands in both
            _compact_staging(
                spark, seen, upto=batch_id - 1, max_segments=max_segments
            )
        full = _read_staging(spark, seen)
        if full is None:  # nothing staged yet (unreachable after a write)
            return
        mixed = temperature_mix(
            full, budget, alpha, source_col, id_col, seed, repeat
        )
        _publish_snapshot(
            mixed, out_path, batch_id,
            _checkpoint_query_id(spark, checkpoint),
        )

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
