"""Link-graph analytics over edge DataFrames: degrees, PageRank, triangles.

Web-corpus curation uses the hyperlink graph as a quality prior (domain/
page centrality feeds crawl frontier ranking and doc-quality features), and
entity graphs from `dedup`/`fuzzy` pair outputs need structural metrics.
These operators work on a plain (``src``, ``dst``) edge DataFrame — no
graph library, no RDDs: every step is joins + aggregates Catalyst can
plan, the same shapes GraphX/GraphFrames lower to.

Scale notes (100 TB edge lists):

- ``degree_stats`` — one map-side-combined aggregate per direction.
- ``pagerank`` — per iteration: ONE equi-join (ranks × edges on src) and
  ONE hash aggregate (sum contributions by dst). State between iterations
  is a (node, rank) frame persisted and re-derived, never an adjacency
  materialization; lineage is cut by the persist each round. Dangling
  nodes (no out-edges) leak their mass to the teleport term — the
  standard simplification, documented; handle them upstream by adding
  self-loops if mass conservation matters.
- ``triangle_count`` — the two-path join is ordered (``a < b < c`` on
  node ids) so each triangle is built exactly once and the join never
  materializes both directions; candidate volume is Σ deg(v)² on the
  ordered graph, the standard bound. Degree-ordering (orienting edges
  from lower- to higher-degree endpoints) tightens the bound on skewed
  graphs and composes with this operator by renumbering ids by degree
  rank first.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

__all__ = ["degree_stats", "pagerank", "triangle_count"]


def degree_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node, out_degree, in_degree) for every node appearing in any edge.
    Two partial aggregates + one full-outer merge on node id."""
    out_d = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_d = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        out_d.join(in_d, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    dangling: str = "teleport",
    personalized: list | None = None,
    broadcast_state_limit: int = 10_000_000,
) -> DataFrame:
    """(node, rank) after ``iterations`` of the power method:
    rank = (1 − d) + d · Σ_in rank(u)/out_degree(u), uniform start at 1.0
    (the classic un-normalized formulation — ranks sum to ~N, not 1).

    Fixed iteration count, left-associated float chain, and deterministic
    join/agg semantics make the result replayable in any engine — the
    DuckDB oracle unrolls the same iterations as chained CTEs. Nodes with
    no in-edges settle at 1 − d.

    ``dangling`` picks what happens to the rank mass of nodes with no
    out-edges (sinks):

    - ``"teleport"`` (default): the mass leaks to the teleport term —
      the classic simplification; total rank decays below N when sinks
      exist. Zero extra cost.
    - ``"redistribute"``: each iteration spreads the sinks' aggregate
      rank uniformly over all nodes (rank = (1 − d) + d · (Σ_in + S/N))
      — the mass-conserving formulation (Σ rank stays exactly ~N) that
      ranking a real crawl graph wants. Costs one tiny aggregate per
      iteration (a 1-row frame, broadcast cross-joined — no extra
      shuffle of the rank table).

    ``personalized``: a seed-node list makes this PERSONALIZED PageRank
    — the whole teleport mass (1 − d)·N lands on the seeds
    ((1 − d)·N/|S| each) instead of uniformly, so ranks measure
    proximity to the seed set (topic-conditioned crawl authority,
    "more like these sites" expansion). Seeds ride along as an `isin`
    literal (seed sets are vocabulary-sized); under
    ``dangling="redistribute"`` the sinks' mass also returns to the
    seeds (the consistent PPR formulation — sinks teleport by the same
    distribution). Kept un-normalized like the classic mode (Σ rank
    stays ~N with redistribute).
    """
    if iterations < 1:
        raise ValueError("pagerank: iterations must be >= 1")
    if dangling not in ("teleport", "redistribute"):
        raise ValueError(
            f"pagerank: dangling must be 'teleport' or 'redistribute', "
            f"got {dangling!r}"
        )
    seeds_list: list | None = None
    if personalized is not None:
        seeds_list = sorted(set(personalized))
        if not seeds_list:
            raise ValueError("pagerank: personalized seed list is empty")
    # Both `nodes` and `routed` scan the edge list; persisting it once
    # means the caller's (possibly expensive) edge derivation runs a single
    # time instead of once per consumer.
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    # (src, dst, __deg): the contribution routing table, reused every
    # iteration — persist once instead of re-joining degrees each round.
    routed = e.join(out_deg, "src").persist()

    try:
        # The node count drives the join strategy every iteration: the rank
        # state is a localCheckpoint frame, which reports NO size stats, so
        # without an explicit hint the per-iteration joins lower to
        # sort-merge — the (much larger) routing table gets exchanged and
        # sorted once per iteration for a state table that is O(V) and tiny
        # on most graphs. Broadcasting rank/contrib frames whenever
        # V <= broadcast_state_limit (10M nodes × 16B ≈ 160 MB — fine on a
        # real executor) keeps `routed` pinned in place all rounds; above
        # the limit the planner's shuffle strategies take over. `nodes` is
        # persisted, so the count is one cheap job (redistribute and
        # personalized modes needed it anyway).
        n_nodes = nodes.count()
        _hint = F.broadcast if n_nodes <= broadcast_state_limit else (lambda d: d)
        if dangling == "redistribute":
            # static sink set (no out-edges) — one pass
            sinks = nodes.join(
                out_deg.select(F.col("src").alias("node")), "node", "left_anti"
            ).localCheckpoint(eager=True)

        if seeds_list is None:
            tele = F.lit(1.0 - damping)
        else:
            # fail loudly on a fully-stale seed list: seeds absent from
            # the graph receive no teleport mass (isin matches nothing),
            # so zero overlap would silently drive every rank toward 0.
            # Partial overlap is allowed but warned — the absent seeds'
            # share of the (1-d)*N mass is dropped, like a dangling leak.
            # The check counts SEEDS with a graph match, using the same
            # implicit-cast equality semantics as the teleport isin —
            # a Python set comparison would false-alarm whenever the
            # node type coerces (string nodes vs int seeds), and
            # counting matched NODES would let one multi-matching seed
            # mask another that is absent.
            seeds_df = nodes.sparkSession.createDataFrame(
                [(s,) for s in seeds_list], ["__seed"]
            )
            n_present = seeds_df.join(
                nodes, F.col("__seed") == F.col("node"), "left_semi"
            ).count()
            if n_present == 0:
                raise ValueError(
                    "pagerank: none of the personalized seeds appear in the "
                    f"graph's node set (seeds: {seeds_list[:5]!r}…) — every "
                    "rank would decay toward 0; check the seed ids"
                )
            if n_present < len(seeds_list):
                logger.warning(
                    "pagerank: only %d/%d personalized seeds present in the "
                    "graph — absent seeds' teleport share is dropped",
                    n_present, len(seeds_list),
                )
            # whole teleport mass on the seeds; float chain fixed as
            # ((1-d) * N) / |S| so SQL oracles replay the same double
            per_seed = ((1.0 - damping) * float(n_nodes)) / float(
                len(seeds_list)
            )
            tele = F.when(
                F.col("node").isin(seeds_list), F.lit(per_seed)
            ).otherwise(F.lit(0.0))

        ranks = nodes.select("node", F.lit(1.0).alias("rank"))
        for _i in range(iterations):
            contrib = (
                routed.join(_hint(ranks), routed.src == ranks.node)
                .groupBy("dst")
                .agg(F.sum(F.col("rank") / F.col("__deg")).alias("__in"))
            )
            if dangling == "redistribute":
                # sinks' aggregate rank this iteration: a 1-row frame,
                # broadcast into every row — the rank table itself never
                # re-shuffles for it
                dang = ranks.join(sinks, "node", "left_semi").agg(
                    F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang")
                )
                if seeds_list is None:
                    dang_share = F.col("__dang") / F.lit(float(n_nodes))
                else:
                    # sinks teleport by the personalization distribution
                    dang_share = F.when(
                        F.col("node").isin(seeds_list),
                        F.col("__dang") / F.lit(float(len(seeds_list))),
                    ).otherwise(F.lit(0.0))
                incoming = F.coalesce("__in", F.lit(0.0)) + dang_share
                merged = nodes.join(
                    _hint(contrib), nodes.node == contrib.dst, "left"
                ).crossJoin(F.broadcast(dang))
            else:
                incoming = F.coalesce("__in", F.lit(0.0))
                merged = nodes.join(
                    _hint(contrib), nodes.node == contrib.dst, "left"
                )
            # localCheckpoint (eager) materializes the state AND cuts its
            # lineage; old blocks are released by the context cleaner when
            # the previous frame is dropped. But every eager checkpoint is
            # its own Spark JOB — at a handful of power iterations the
            # per-job latency dominates the tiny per-iteration compute, so
            # the state is checkpointed every 4th round (bounding lineage
            # depth and broadcast nesting) and unconditionally on the LAST
            # round, which preserves the returned-frame-is-data contract
            # the finally-block unpersist relies on. Values are unchanged:
            # chained-lazy iterations execute the identical float chain in
            # one job instead of one job each.
            ranks = merged.select(
                "node",
                (tele + F.lit(damping) * incoming).alias("rank"),
            )
            # redistribute references the previous state TWICE per round
            # (contrib join + dangling-mass aggregate): chaining lazily
            # would double the plan each iteration, so that mode
            # materializes every round. The single-reference modes
            # checkpoint every 4th.
            if (
                _i == iterations - 1
                or dangling == "redistribute"
                or (_i + 1) % 4 == 0
            ):
                ranks = ranks.localCheckpoint(eager=True)
    finally:
        # the returned frame is checkpointed data — it no longer depends
        # on these, so their cache entries can be released immediately;
        # the finally also covers an error (or interrupt) mid-iteration,
        # which would otherwise leave both pinned for the session
        routed.unpersist()
        nodes.unpersist()
        e.unpersist()
    return ranks


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    broadcast_edge_limit: int = 8_000_000,
) -> DataFrame:
    """Total triangle count in the UNDIRECTED graph induced by the edge
    list (direction and duplicate/self edges ignored): one row
    (``triangles`` bigint).

    Canonicalize each edge to (lo, hi), then count 2-paths a<b<c with
    both (a,b),(b,c) present and close them against (a,c) — each triangle
    counted exactly once. Two equi-joins, no explosion of both edge
    directions.

    When the canonical edge set has at most ``broadcast_edge_limit`` rows
    (two longs each — 8M rows is ~128 MB of key/value payload, well inside
    executor memory on any real cluster) both joins broadcast it, so the
    2-path stream — the Σ deg² blowup, orders of magnitude larger than the
    edge set itself — is generated and closed inside one pipelined stage
    and never shuffled or sorted. Above the limit the joins fall back to
    shuffle strategies chosen by the planner. The edge set is checkpointed
    anyway, so the row count used for the decision is a metadata read, not
    an extra job over the input."""
    # localCheckpoint, not persist: the canonical edge set serves three
    # join references, then must NOT stay pinned in executor storage after
    # the one-row aggregate is consumed — checkpoint blocks are freed by
    # the context cleaner with the frame, a persist would live forever.
    # Repartition to full parallelism BEFORE the checkpoint: AQE coalesces
    # the small distinct() output to a handful of partitions, and the
    # broadcast-join probe stage below inherits exactly that partitioning —
    # 3 tasks generating a 270M-row 2-path stream is a straggler by
    # construction. Spreading the (small) edge set is one cheap exchange;
    # the huge intermediate then fans out across every core.
    sc = edges.sparkSession.sparkContext
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .repartition(sc.defaultParallelism)
        .localCheckpoint(eager=True)
    )
    # A checkpointed frame reports no size stats to the planner, so without
    # the explicit hint BOTH joins become sort-merge: the Σ deg² 2-path
    # stream gets exchanged AND sorted — the dominant cost of the whole
    # operator (measured 12.8x slower at sf0.1).
    small = und.count() <= broadcast_edge_limit
    hint = F.broadcast if small else (lambda df: df)
    ab = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    bc = hint(und.select(F.col("a").alias("y2"), F.col("b").alias("z")))
    paths = ab.join(bc, ab.y == bc.y2).select("x", "z")
    # und is distinct on (a, b), so every 2-path matches at most one edge:
    # the inner-join row count equals the semi-join row count, and the semi
    # probe neither materializes joined rows nor scans duplicate matches.
    closed = paths.join(
        hint(und.select(F.col("a").alias("x"), F.col("b").alias("z"))),
        ["x", "z"],
        "left_semi",
    )
    return closed.agg(F.count(F.lit(1)).cast("long").alias("triangles"))
