"""Deterministic dataset splitting and sampling for training pipelines.

``rand()``-based sampling is non-reproducible across runs/engines and
re-rolls every row on retry; training-data pipelines instead assign each
record to train/val/test (or keep/drop) by hashing a stable key. Everything
here is a pure JVM column expression over ``md5`` — bit-identical in
DuckDB, so every operator carries a differential oracle — and adding data
never moves an existing record between splits (the property that matters
when a 100 TB corpus grows incrementally).

No reference parity: the reference has no split/sample operators — this is
the training-data-pipeline extension (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

NUM_BUCKETS = 10_000  # fixed resolution: fractions quantized to 0.01%


def hash_bucket(
    col: Column | str, seed: int = 42, num_buckets: int = NUM_BUCKETS
) -> Column:
    """Uniform bucket in [0, num_buckets) from md5 of (seed, key).

    First 8 hex chars of md5 → 32-bit int → mod num_buckets. md5 (not
    xxhash64) on purpose: bit-identical across engines, so DuckDB oracles
    can replay the exact assignment. The unit separator \\x1f delimits
    seed from key so (seed=1, key='2x') never collides with (12, 'x').
    """
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(
        F.concat_ws("\x1f", F.lit(str(seed)), c.cast("string")).cast("binary")
    )
    v = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    return (v % F.lit(num_buckets)).cast("long")


def split_assign(
    col: Column | str,
    weights: dict[str, float],
    seed: int = 42,
) -> Column:
    """Split label ('train'/'val'/...) for the key column, proportional to
    ``weights`` (normalized; insertion order fixes the bucket layout).
    Pure projection — the 100 TB path is a filter on the result, which
    Catalyst pushes into the scan alongside any partition pruning."""
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    b = hash_bucket(col, seed)
    result: Column | None = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        bound = int(round(cum * NUM_BUCKETS))
        branch = F.when(b < F.lit(bound), F.lit(name))
        result = branch if result is None else result.when(b < F.lit(bound), F.lit(name))
    last = F.lit(names[-1])
    return last if result is None else result.otherwise(last)


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    seed: int = 42,
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose hash bucket
    falls under ``fraction``. Same key → same verdict, every run, either
    engine. Fraction is quantized to 1/NUM_BUCKETS."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    bound = int(round(fraction * NUM_BUCKETS))
    return df.where(hash_bucket(key_col, seed) < F.lit(bound))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sample: each stratum value gets its own
    keep-fraction (e.g. downsample 'en' to 10%, keep all 'fr'). One
    codegen filter — no per-stratum jobs, no ``sampleBy`` randomness."""
    b = hash_bucket(key_col, seed)
    s = F.col(strata_col)
    bound: Column = F.lit(int(round(default_fraction * NUM_BUCKETS)))
    for value, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0, 1]")
        bound = F.when(s == F.lit(value), F.lit(int(round(frac * NUM_BUCKETS)))).otherwise(bound)
    return df.where(b < bound)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    group_col: str | None = None,
    seed: int = 42,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis exponential race): each row draws a uniform u from
    md5(seed, key) and competes with race key ``ln(u) / w``; the ``n``
    largest win. Inclusion is distributed as sequential weighted draws
    without replacement — the standard way to take "n docs, preferring
    high quality-score" from a corpus reproducibly. Zero/negative weights
    never win (filtered out). Same corpus + seed → same sample, every
    run, either engine (the oracle replays the md5 + float chain).

    Scale: the global form is one TakeOrderedAndProject (per-partition
    top-n, no global sort); the grouped form is one hash-partitioned
    window per ``group_col`` value.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    # 32-bit uniform from the same md5 machinery as hash_bucket (mod 2^32
    # over a 32-bit value is the identity), centered to (0, 1) so ln(u)
    # is finite.
    v = hash_bucket(key_col, seed, num_buckets=1 << 32)
    u = (v.cast("double") + F.lit(0.5)) / F.lit(float(1 << 32))
    race = F.log(u) / F.col(weight_col).cast("double")
    out = df.where(F.col(weight_col) > 0).withColumn("__race", race)
    if group_col is None:
        return (
            out.orderBy(F.col("__race").desc(), F.col(key_col))
            .limit(n)
            .drop("__race")
        )
    w = Window.partitionBy(group_col).orderBy(
        F.col("__race").desc(), F.col(key_col)
    )
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= F.lit(n))
        .drop("__race", "__rn")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
    seed: int = 42,
) -> DataFrame:
    """Keep at most ``cap`` rows per ``group_col`` value, chosen
    deterministically by md5(seed, key) order (key as tiebreak).

    The per-domain / per-source frequency cap of web-corpus pipelines
    (C4 and friends cap how much any one host contributes): without it a
    handful of giant domains dominate the mixture. Hash order — not
    arrival order — makes the selection reproducible across engines and
    stable under repartitioning; ties cannot occur because the key
    participates in the ordering.

    Scale: one hash-partitioned window per group (a single shuffle on
    ``group_col``); no global sort. row_number streams each group once,
    so a skewed group costs its own size, never the corpus. If one group
    is pathologically hot (>1 executor's worth of rows), pre-filter with
    an aggregate count and only window the over-cap groups.
    """
    if cap < 0:
        raise ValueError(f"cap must be >= 0, got {cap}")
    order = F.md5(
        F.concat_ws(
            "\x1f", F.lit(str(seed)), F.col(key_col).cast("string")
        ).cast("binary")
    )
    w = Window.partitionBy(group_col).orderBy(order, F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= F.lit(cap))
        .drop("__rn")
    )


def token_balanced_shard_ids(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_per_shard: int = 4096,
    seed: int = 42,
    keep_columns: bool = False,
    with_total: bool = False,
    token_count_col: str = "n_tokens",
    start_offset: int = 0,
    clamp: bool = True,
    order_buckets_hex: int = 2,
):
    """Assign every document to a TOKEN-balanced training shard: rows are
    laid out in deterministic md5 order and cut every
    ``tokens_per_shard`` tokens, so shards carry equal token mass — the
    quantity training actually consumes — instead of equal row counts
    (`sinks.to_training_shards`' contract), which skews badly when
    document lengths do.

    The global running token total is a DISTRIBUTED prefix sum, never a
    single-partition window: the md5 order key's first
    ``order_buckets_hex`` hex chars (default 2 → 256 buckets; raise to
    3 → 4096 at 100 TB for finer partitioning) form lexicographic
    buckets that partition the global order into contiguous runs, so
    (1) one hash aggregate yields per-bucket token totals — a
    16^order_buckets_hex-row driver collect — whose running sum gives
    each bucket's global offset, and (2) a window cumsum WITHIN each
    bucket (hash-partitioned, parallel) plus that offset reconstructs
    the exact global cumulative count. All integer arithmetic — any
    engine's plain global-window cumsum replays it value-for-value (the
    driver oracle does exactly that). The bucket width never changes
    ASSIGNMENTS (the global order is the same whatever the split), only
    partitioning granularity.

    A document straddling a cut belongs to the shard where it STARTS
    (``shard = (cum_before_row) // tokens_per_shard``), so every shard's
    token count is within one document of the budget and every document
    stays whole. NULL/empty text counts as 0 tokens (``F.size`` of a
    NULL array is -1 under non-ANSI — folded to 0, or the prefix sum
    would go negative and shift every later boundary).

    ``id_col`` should be unique and non-null: it is the only
    within-``okey`` tiebreak, so duplicate or NULL ids make the order of
    THOSE rows (and a boundary straddle between them) ambiguous.

    Returns (``id_col``, ``token_count_col``, ``shard``); with
    ``keep_columns=True`` every input column rides along instead (the
    writer path — no join back, so duplicate keys cannot multiply rows
    and NULL keys cannot drop). In that mode ``token_count_col`` (and
    ``shard``) must not collide with an input column — pass a fresh
    ``token_count_col`` name (the shards sink uses ``__n_tokens``) or
    the call raises, never silently shadows a payload column.
    ``with_total=True`` returns ``(frame, n_shards)`` — the number of
    token-budget windows, ``ceil(total_tokens / tokens_per_shard)``
    (0 for an empty frame), already known driver-side from the bucket
    totals. Every assigned shard id is ``< n_shards`` (trailing
    zero-token rows whose cut would land one window past the end are
    clamped back); ids need not be DENSE — a document larger than the
    budget covers whole windows, and those ids stay unoccupied (the
    shards sink's manifest records them as zero-row shards).

    ``start_offset``: begin the global running total at this many tokens
    instead of 0 — the incremental hook: a later batch continues exactly
    where a previous corpus slice stopped (the streaming twin
    :func:`mini_etl_spark.streaming.corpus.stream_token_shards` carries
    the offset as micro-batch state). With an offset the final shard is
    usually still filling, so the streaming caller passes ``clamp=False``
    (a trailing zero-token row correctly opens the next shard the NEXT
    batch keeps filling); ``clamp=True`` stays the right call for a
    complete corpus.

    The bucket stats are collected from a MATERIALIZED frame
    (localCheckpoint) and the same frame feeds the window, so a
    nondeterministic input (sample(), changing directory) cannot desync
    offsets from the cumsum pass; checkpoint blocks release when the
    frame is dropped (no pinned cache entry per call).
    """
    from mini_etl_spark.functions.text import tokens

    if tokens_per_shard < 1:
        raise ValueError(f"tokens_per_shard must be >= 1, got {tokens_per_shard}")
    if not 1 <= order_buckets_hex <= 4:
        raise ValueError(
            f"order_buckets_hex must be in [1, 4] (16..65536 buckets), "
            f"got {order_buckets_hex}"
        )
    carried = df.columns if keep_columns else [id_col]
    if keep_columns:
        for taken in (token_count_col, "shard"):
            if taken in carried:
                raise ValueError(
                    "token_balanced_shard_ids: keep_columns=True would "
                    f"shadow existing input column {taken!r} — pass a "
                    "fresh token_count_col / rename the input column"
                )
    okey = F.md5(
        F.concat_ws(
            "\x1f", F.lit(str(seed)), F.col(id_col).cast("string")
        ).cast("binary")
    )
    # localCheckpoint, not persist: the frame is consumed by the totals
    # collect AND the window pass (and, in the streaming twin, once per
    # micro-batch) — checkpoint blocks are released by the context
    # cleaner when the frame drops, so a long-running stream cannot
    # accumulate one pinned cache entry per batch; determinism guarantee
    # is the same (the materialized rows feed both consumers). Tradeoff:
    # lineage is truncated, so losing an executor between the collect
    # and the window pass fails the job instead of recomputing — on
    # preemptible clusters use reliable checkpointing (set a checkpoint
    # dir and swap localCheckpoint for checkpoint) for this stage.
    base = (
        df.select(
            *carried,
            F.greatest(F.size(tokens(text_col)), F.lit(0))
            .cast("long")
            .alias(token_count_col),
            okey.alias("__okey"),
        )
        .withColumn("__ob", F.substring("__okey", 1, int(order_buckets_hex)))
        .localCheckpoint(eager=True)
    )

    totals = {
        r["__ob"]: r["__t"]
        for r in base.groupBy("__ob")
        .agg(F.sum(token_count_col).alias("__t"))
        .collect()
    }
    if start_offset < 0:
        raise ValueError(f"start_offset must be >= 0, got {start_offset}")
    running, offsets = int(start_offset), {}
    for b in sorted(totals):  # hex-lexicographic == global okey order
        offsets[b] = running
        running += int(totals[b])
    # n_shards from the driver-side totals: 0 for an empty frame, else
    # enough shards for the token mass (>=1 even when every row is
    # zero-token). max_shard clamps trailing zero-token rows: a
    # zero-token row sorting last when `running` is an exact multiple of
    # tokens_per_shard would otherwise get shard = running/tps — one
    # past the final token-bearing shard.
    if not totals:
        n_shards = 0
    elif running > 0:
        n_shards = (running - 1) // int(tokens_per_shard) + 1
    else:
        n_shards = 1
    max_shard = max(n_shards - 1, 0)
    offset_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )

    w = (
        Window.partitionBy("__ob")
        .orderBy("__okey", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_count_col).over(w) + F.element_at(
        offset_map, F.col("__ob")
    )
    raw_shard = F.floor(
        (cum - F.col(token_count_col)) / F.lit(int(tokens_per_shard))
    )
    out = base.select(
        *carried,
        token_count_col,
        (F.least(raw_shard, F.lit(max_shard)) if clamp else raw_shard)
        .cast("long")
        .alias("shard"),
    )
    if with_total:
        return out, n_shards
    return out
