"""Corpus mixing: deterministic source-weighted sampling under token
budgets, and reproducible corpus shuffling for training order.

The last step of training-corpus assembly: given cleaned, deduplicated
documents from many sources, draw a mixture — "this run trains on 30B
tokens of web, 5B of code, 1B of reference" — reproducibly, so reruns and
engines agree document-for-document.

Scale stance: everything is one window function over a (source,
hash-order) partitioning — one shuffle, map-side nothing to combine, no
driver state. Budgets are enforced per source independently, so skewed
sources don't interact; the md5-order makes the selection a uniform
random-but-deterministic sample of each source.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mini_etl_spark.functions.text import tokens

__all__ = [
    "curriculum_order",
    "mix_by_token_budget",
    "shuffle_order",
    "temperature_mix",
]


def _order_hash(key: Column, seed: int) -> Column:
    """md5-derived deterministic order key — reproducible across engines
    (DuckDB twin: ``md5(seed || '|' || key)``), unlike xxhash64."""
    return F.md5(F.concat_ws("|", F.lit(str(seed)), key.cast("string")))


def mix_by_token_budget(
    df: DataFrame,
    budgets: dict[str, int],
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Select documents per source until each source's token budget fills.

    Documents are taken in deterministic md5 order (a uniform pseudo-random
    permutation per seed); a document is kept while the budget has ANY room
    left when it starts (running total of previously-taken tokens <
    budget), so each source may overshoot by at most one document — the
    standard greedy contract, and the one a SQL window replays exactly.
    Sources absent from ``budgets`` are dropped.

    Returns the selected rows with ``n_tokens`` attached. One window
    (partitionBy source, orderBy hash) — a single shuffle at any scale.
    """
    if not budgets:
        raise ValueError("mix_by_token_budget: budgets must be non-empty")
    sized = df.withColumn(
        "n_tokens", F.size(tokens(text_col)).cast("long")
    ).filter(F.col(source_col).isin(list(budgets)))
    budget_expr = F.coalesce(
        *[
            F.when(F.col(source_col) == s, F.lit(int(b)))
            for s, b in budgets.items()
        ]
    )
    w = (
        Window.partitionBy(source_col)
        .orderBy(_order_hash(F.col(id_col), seed), id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum("n_tokens").over(w)
    return (
        sized.withColumn("__cum", running)
        .filter(F.col("__cum") - F.col("n_tokens") < budget_expr)
        .drop("__cum")
    )


def shuffle_order(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 42,
    order_col: str = "shuffle_order",
    partitions: int | None = None,
) -> DataFrame:
    """Attach a deterministic global shuffle rank (0-based) — the training-
    order permutation. Same seed → same order, across runs and engines.

    Computed WITHOUT a global single-partition window (the naive
    ``row_number over orderBy`` moves the whole corpus to one task):

    1. range-partition on the (md5 hash, id) sort key;
    2. one tiny aggregate collects per-partition row counts (driver holds
       ``partitions`` ints) → cumulative offsets;
    3. rank = offset[partition] + row_number within the partition.

    Where the sampled range boundaries land cannot change the result —
    the sort key is unique per row (id breaks ties), so offset + local
    rank IS the global rank for any boundary placement. Costs one extra
    count pass over the shuffled frame; at scale, write the result
    partitioned by ``order_col div docs_per_shard`` and readers stream
    shards in order.
    """
    key = _order_hash(F.col(id_col), seed)
    spark = df.sparkSession
    n_parts = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    rp = df.repartitionByRange(n_parts, key, F.col(id_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    sizes = {
        r["__pid"]: r["__n"]
        for r in rp.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n")).collect()
    }
    offsets, acc = [], 0
    for p in range(n_parts):
        offsets.append(acc)
        acc += sizes.get(p, 0)
    off = F.element_at(
        F.array(*[F.lit(o).cast("long") for o in offsets]), F.col("__pid") + 1
    )
    w = Window.partitionBy("__pid").orderBy(key, id_col)
    return (
        rp.withColumn(
            order_col, (off + F.row_number().over(w) - F.lit(1)).cast("long")
        )
        .drop("__pid")
    )


def temperature_mix(
    df: DataFrame,
    budget: int,
    alpha: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
    repeat: bool = True,
) -> DataFrame:
    """Temperature-scaled source mixture: draw ~``budget`` documents with
    per-source quotas proportional to ``n_source ** alpha`` — the mT5 /
    multilingual-LM sampling rule (arXiv:2010.11934 §3.1). ``alpha=1``
    reproduces the natural distribution, ``alpha=0`` gives every source an
    equal share, and the usual 0.2–0.7 range boosts low-resource sources.

    Quotas are ``floor(budget * w_s / W)`` with ``w_s = n_s ** alpha`` and
    ``W = Σ w_s`` accumulated in source-name order (a pinned left-assoc
    float chain, so an engine replaying the same doubles gets the same
    quotas — same trick as the PQ oracle). The draw itself is the
    deterministic md5-order take of :func:`mix_by_token_budget`.

    ``repeat=True`` (the mT5 behavior) lets a low-resource source fill a
    quota LARGER than the source by replaying it for multiple epochs: each
    epoch is a fresh md5 permutation (seed folded with the epoch number),
    and the output carries an ``epoch`` column (0-based) so downstream
    training order can interleave epochs. ``repeat=False`` caps each
    quota at the source size (``epoch`` is all-zero). Rows with a NULL
    ``source_col`` are dropped (they belong to no source's quota — same
    drop semantics as :func:`mix_by_token_budget`'s unknown sources).

    Scale: one vocabulary-sized aggregate (per-source counts — the
    single-partition window over it holds #sources rows, same stance as
    ``shuffle_order``'s partition-count pass), a broadcast join of the
    quota table back onto the corpus, and one (source, epoch) window —
    a single full shuffle of the corpus at any scale.
    """
    if budget <= 0:
        raise ValueError("temperature_mix: budget must be positive")
    if alpha < 0:
        raise ValueError("temperature_mix: alpha must be >= 0")
    # NULL sources are dropped BEFORE the quota math (same drop semantics
    # as mix_by_token_budget's unknown-source filter) — otherwise the null
    # group's weight would inflate the normalizer and shrink every real
    # source's quota while its rows silently vanish in the join
    df = df.filter(F.col(source_col).isNotNull())
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    w_cum = Window.orderBy(source_col).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    quotas = (
        counts.withColumn(
            "__w", F.pow(F.col("__n").cast("double"), F.lit(float(alpha)))
        )
        .withColumn("__cumw", F.sum("__w").over(w_cum))
        # NB: "__wtot", not "__W" — Spark resolves column names
        # case-insensitively by default, so "__W" would silently REPLACE
        # "__w" and make every quota equal to the full budget
        .withColumn("__wtot", F.max("__cumw").over(w_all))
        .withColumn(
            "__quota",
            F.floor(F.lit(int(budget)) * F.col("__w") / F.col("__wtot")).cast(
                "long"
            ),
        )
        .select(source_col, "__n", "__quota")
    )
    joined = df.join(F.broadcast(quotas), source_col)
    if repeat:
        emax = F.expr("(__quota + __n - 1) DIV __n")
        epoch_seq = F.when(
            emax > 0, F.sequence(F.lit(0).cast("long"), (emax - 1).cast("long"))
        ).otherwise(F.array().cast("array<long>"))
        joined = joined.withColumn("epoch", F.explode(epoch_seq))
    else:
        joined = joined.withColumn("epoch", F.lit(0).cast("long")).filter(
            F.col("__quota") > 0
        )
    # _order_hash(seed, "epoch|id") == md5("seed|epoch|id") — the module's
    # pinned engine-portable hash contract, epoch folded into the key so
    # every epoch draws a fresh permutation
    order_key = _order_hash(
        F.concat_ws(
            "|", F.col("epoch").cast("string"), F.col(id_col).cast("string")
        ),
        seed,
    )
    w = Window.partitionBy(source_col, "epoch").orderBy(order_key, id_col)
    rank = F.col("epoch") * F.col("__n") + F.row_number().over(w)
    cap = F.col("__quota") if repeat else F.least(F.col("__quota"), F.col("__n"))
    return (
        joined.withColumn("__rank", rank.cast("long"))
        .filter(F.col("__rank") <= cap)
        .drop("__n", "__quota", "__rank")
    )


def curriculum_order(
    df: DataFrame,
    difficulty_col: str,
    id_col: str = "doc_id",
    buckets: int = 4,
    seed: int = 42,
    method: str = "approx",
    bucket_col: str = "bucket",
    order_col: str = "curriculum_key",
) -> DataFrame:
    """Curriculum training order: quantile-bucket the corpus by a
    difficulty score, shuffle deterministically WITHIN each bucket.
    Sorting the output by (``bucket_col``, ``order_col``) yields the
    easy→hard schedule curriculum-learning recipes train on; each stage
    is still a uniform random (but reproducible) permutation of its
    difficulty band, so no batch sees sorted data.

    Buckets come from quantile cutoffs at i/buckets, i=1..buckets-1 —
    cutoffs round to 6 decimals before comparison so two engines
    computing interpolated quantiles in different float orders still
    assign identical buckets (difficulty scores are typically
    coarse-grained: lengths, counts, integer-ish ratios). Bucket id is
    ``Σ_i (difficulty > cutoff_i)`` — 0-based, 0 = easiest.

    ``method="approx"`` (default) uses ``approx_percentile`` — the scale
    path (sketch-mergeable, one pass, no value materialization).
    ``method="exact"`` uses exact ``percentile`` — engine-replayable
    cutoffs for differential testing, at the cost of an exact-quantile
    aggregate (collects the difficulty column per group internally; fine
    at oracle scale, not the 100 TB default).

    One aggregate (cutoffs — a 1-row frame broadcast into the
    projection) + one projection; no shuffle of the corpus at all. The
    order key is the module's md5 contract (``md5(seed|id)``), so the
    within-bucket permutation replays in any engine.
    """
    if buckets < 2:
        raise ValueError("curriculum_order: buckets must be >= 2")
    if method not in ("approx", "exact"):
        raise ValueError(
            f"curriculum_order: method must be 'approx' or 'exact', "
            f"got {method!r}"
        )
    fracs = [i / buckets for i in range(1, buckets)]
    d = F.col(difficulty_col).cast("double")
    if method == "exact":
        cut_agg = F.percentile(d, F.array(*[F.lit(p) for p in fracs]))
    else:
        cut_agg = F.approx_percentile(
            d, F.array(*[F.lit(p) for p in fracs]), F.lit(10000)
        )
    cuts = df.agg(cut_agg.alias("__cuts")).select(
        *[
            F.round(F.element_at("__cuts", i + 1), 6).alias(f"__c{i}")
            for i in range(len(fracs))
        ]
    )
    bucket = sum(
        (d > F.col(f"__c{i}")).cast("int") for i in range(len(fracs))
    )
    return (
        df.crossJoin(F.broadcast(cuts))
        .withColumn(bucket_col, bucket)
        .withColumn(order_col, _order_hash(F.col(id_col), seed))
        .drop(*[f"__c{i}" for i in range(len(fracs))])
    )
