"""Focused locks for the round-13 optimizations.

Structural pins (so a refactor cannot silently re-introduce removed
work) plus bit-level equivalence tests for the rewritten fast paths:

- iterative state joins (``pagerank``, ``connected_components``) must
  broadcast the node-bounded state each round, never sort-merge the
  routing table / edge list per round (the r12 fix, now pinned — the
  returned frames are checkpoint-truncated, so the per-round plans are
  captured by wrapping ``localCheckpoint``);
- ``triangle_count``'s closure joins stay broadcast + left-semi;
- ``ivf_assign``'s Arrow twin is bit-identical to the expression form
  on adversarial inputs (nulls, NaN, ragged lengths, ties, ±0.0) and on
  dense random batches;
- ``cell_cosine_pairs(method="expr")``'s GEMM prefilter + exact rescore
  equals the direct per-pair-expression join bit-for-bit;
- ``_span_postings`` drops document-frequency-1 spans (they cannot form
  a pair) before the self-join;
- the exact-percentile scale guard falls back (loudly) to
  ``percentile_approx`` above the size limit and stays exact below it;
- the ``embedding_cosine_pairs`` block-GEMM guard routes oversized
  inputs to the LSH path with a warning.
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mini_etl_spark import plans  # noqa: E402


def _capture_checkpoint_plans(monkeypatch):
    """Wrap DataFrame.localCheckpoint to record each frame's physical
    plan at checkpoint time (the per-round state of iterative
    operators), then run the real checkpoint."""
    # Spark 4: pyspark.sql.DataFrame is a facade; classic sessions run
    # instances of the classic subclass, whose methods override it —
    # patch the class the instances actually resolve to
    from pyspark.sql.classic.dataframe import DataFrame

    captured: list[str] = []
    orig = DataFrame.localCheckpoint

    def wrapper(self, eager=True):
        captured.append(plans.physical_plan(self))
        return orig(self, eager=eager)

    monkeypatch.setattr(DataFrame, "localCheckpoint", wrapper)
    return captured


def _join_nodes(plan: str) -> list[str]:
    return re.findall(
        r"^\(\d+\) (SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
        re.M,
    )


def test_pagerank_rounds_broadcast_state(spark, monkeypatch):
    from mini_etl_spark.functions import graph

    captured = _capture_checkpoint_plans(monkeypatch)
    edges = spark.createDataFrame(
        [(i, (i * 7 + 1) % 40) for i in range(200)], ["src", "dst"]
    )
    graph.pagerank(edges, iterations=5).collect()
    round_plans = [p for p in captured if "rank" in p]
    assert round_plans, "no per-round state plans captured"
    for p in round_plans:
        joins = _join_nodes(p)
        # exactly one SMJ may appear: the ONE-TIME routing-table build
        # (edges × out-degrees), which lives inside the persisted
        # InMemoryRelation's printed lineage and never re-executes. The
        # per-round state joins (contrib, merge) must all be broadcast —
        # pre-r12 every round sort-merged the routing table.
        assert joins.count("SortMergeJoin") <= 1, p
        assert joins.count("BroadcastHashJoin") >= 2, p


def test_connected_components_rounds_broadcast_state(spark, monkeypatch):
    from mini_etl_spark.functions import dedup as dd

    captured = _capture_checkpoint_plans(monkeypatch)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 60, 2)] + [(0, 2), (4, 8)],
        ["id_a", "id_b"],
    )
    dd.connected_components(pairs).collect()
    # per-round candidate frames (join of labels with neighbor mins);
    # the init frame has no join — filter to plans that do
    round_plans = [p for p in captured if _join_nodes(p)]
    assert round_plans, "no per-round label plans captured"
    for p in round_plans:
        joins = _join_nodes(p)
        assert "SortMergeJoin" not in joins, p
        assert "BroadcastHashJoin" in joins, p


def test_triangles_closure_stays_broadcast_semi(spark):
    from mini_etl_spark.functions import graph

    edges = spark.createDataFrame(
        [(i, j) for i in range(30) for j in range(i + 1, 30) if (i + j) % 3]
        , ["src", "dst"]
    )
    df = graph.triangle_count(edges)
    plan = plans.physical_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "LeftSemi" in plan, plan


ADVERSARIAL_VECS = [
    (1, [0.1, 0.2, 0.3, 0.4]),
    (2, [1.0, 0.0, 0.0, 0.0]),
    (3, [float("nan"), 1.0, 1.0, 1.0]),
    (4, [None, 1.0, 1.0, 1.0]),
    (5, [1.0, 2.0]),
    (6, [1.0, 2.0, 3.0, 4.0, 5.0]),
    (7, []),
    (8, None),
    (9, [0.0, 0.0, 0.0, 0.0]),
    (10, [-0.0, 0.0, -0.0, 0.0]),
    (11, [float("inf"), 1.0, -1.0, 0.5]),
    (12, [float("-inf"), float("inf"), 1.0, 0.5]),
    (13, [1e300, 1e300, -1e300, 1e-300]),
]


def _vec_frame(spark, rows, float32=False):
    from pyspark.sql import types as T

    elem = T.FloatType() if float32 else T.DoubleType()
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(elem)),
        ]
    )
    if float32:
        rows = [
            (i, None if v is None else [None if x is None else float(x) for x in v])
            for i, v in rows
        ]
    return spark.createDataFrame(rows, schema)


@pytest.mark.parametrize("float32", [False, True])
def test_ivf_assign_arrow_matches_expr_adversarial(spark, float32):
    from mini_etl_spark.functions import similarity as sim

    cents = sim.random_unit_centroids(dim=4, k=5, seed=7)
    # duplicate centroids force argmax ties
    cents = np.vstack([cents[0], cents[0], cents[1], cents[2]])
    df = _vec_frame(spark, ADVERSARIAL_VECS, float32=float32)
    expr = {
        r["vec_id"]: r["ivf_cell"]
        for r in sim.ivf_assign(df, cents, "embedding", method="expr").collect()
    }
    arrow = {
        r["vec_id"]: r["ivf_cell"]
        for r in sim.ivf_assign(df, cents, "embedding", method="arrow").collect()
    }
    assert expr == arrow


def test_ivf_assign_arrow_matches_expr_dense(spark):
    from mini_etl_spark.functions import similarity as sim

    rng = np.random.default_rng(13)
    cents = sim.random_unit_centroids(dim=16, k=8, seed=3)
    rows = [
        (int(i), [float(x) for x in rng.standard_normal(16)])
        for i in range(500)
    ]
    df = _vec_frame(spark, rows)
    expr = {
        r["vec_id"]: r["ivf_cell"]
        for r in sim.ivf_assign(df, cents, "embedding", method="expr").collect()
    }
    arrow = {
        r["vec_id"]: r["ivf_cell"]
        for r in sim.ivf_assign(df, cents, "embedding", method="arrow").collect()
    }
    assert expr == arrow


def test_ivf_assign_arrow_ships_only_the_vector_column(spark):
    """The Arrow twin must stay a column expression (ArrowEvalPython over
    the vec column), not an opaque mapInArrow over the whole row — column
    pruning for the rest of the frame is the §4 contract."""
    from pyspark.sql import functions as F

    from mini_etl_spark.functions import similarity as sim

    cents = sim.random_unit_centroids(dim=4, k=3, seed=7)
    df = _vec_frame(spark, [(1, [0.1, 0.2, 0.3, 0.4])]).withColumn(
        "wide_payload", F.lit("x" * 10)
    )
    plan = plans.physical_plan(sim.ivf_assign(df, cents, "embedding"))
    assert "ArrowEvalPython" in plan, plan
    assert "MapInArrow" not in plan, plan


def test_cell_cosine_pairs_expr_rescore_is_bit_identical(spark):
    """GEMM prefilter + exact rescore == the direct per-pair expression
    join, bit for bit (ids AND cosines)."""
    from pyspark.sql import functions as F

    from mini_etl_spark.functions import similarity as sim

    rng = np.random.default_rng(5)
    # planted near-dup structure so pairs actually pass the threshold
    base_vecs = rng.standard_normal((12, 8))
    rows = []
    vid = 0
    for b in base_vecs:
        for _ in range(6):
            rows.append(
                (vid, [float(x) for x in (b + 0.01 * rng.standard_normal(8))])
            )
            vid += 1
    df = _vec_frame(spark, rows)
    cents = sim.random_unit_centroids(dim=8, k=4, seed=7)

    got = sim.cell_cosine_pairs(
        df, cents, threshold=0.5, method="expr"
    ).collect()

    # the pre-r13 expr plan, inlined: in-cell self-join + per-pair
    # zip_with dot, the form every SQL oracle replays
    assigned = sim.ivf_assign(df, cents, "embedding", method="expr")
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    b0 = assigned.select(
        F.col("vec_id").alias("__id"),
        F.col("embedding").alias("__v"),
        F.col("ivf_cell").alias("__cell"),
        norm.alias("__n"),
    )
    a, b = b0.alias("a"), b0.alias("b")
    dot = F.aggregate(
        F.zip_with(
            F.col("a.__v"), F.col("b.__v"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    want = (
        a.join(
            b,
            (F.col("a.__cell") == F.col("b.__cell"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .withColumn("cosine", F.round(dot / (F.col("a.__n") * F.col("b.__n")), 4))
        .filter(F.col("cosine") >= 0.5)
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__cell").alias("cell"),
            "cosine",
        )
        .collect()
    )
    key = lambda r: (r["id_a"], r["id_b"])  # noqa: E731
    assert sorted(map(tuple, got), key=lambda t: t[:2]) == sorted(
        map(tuple, want), key=lambda t: t[:2]
    )
    assert len(want) > 0  # the fixture actually exercises the filter


def test_span_postings_drop_df1_spans(spark):
    from pyspark.sql import functions as F

    from mini_etl_spark.functions.dedup import _span_postings

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta other words here"),
            (3, "totally unrelated text with unique spans only"),
        ],
        ["doc_id", "text"],
    )
    spans = _span_postings(docs, 4, "text", "doc_id", 1000)
    rows = spans.collect()
    # doc 3 shares nothing: all its spans are df=1 and must be gone
    assert all(r["__id"] != 3 for r in rows), rows
    # the shared 4-gram postings survive for docs 1 and 2
    assert {r["__id"] for r in rows} == {1, 2}, rows
    # every surviving hash appears in >= 2 docs
    from collections import Counter

    c = Counter(r["__h"] for r in rows)
    assert all(v >= 2 for v in c.values()), c


def test_exact_percentile_guard_falls_back_loudly(spark, monkeypatch):
    from pyspark.sql import functions as F

    from mini_etl_spark import maintenance as mt

    df = spark.range(1000).select(
        (F.col("id") % 7).alias("g"), (F.col("id") * 1.5).alias("v")
    )
    monkeypatch.setenv("MINI_ETL_EXACT_PERCENTILE_LIMIT_BYTES", "1")
    with pytest.warns(UserWarning, match="falling back to percentile_approx"):
        out = mt.quantile_buckets(df, "v", buckets=4)
    assert "qbucket" in out.columns
    with pytest.warns(UserWarning, match="falling back to percentile_approx"):
        mt.robust_outliers(df, "v", group_col="g").collect()


def test_exact_percentile_guard_stays_exact_below_limit(spark, monkeypatch):
    import warnings

    from pyspark.sql import functions as F

    from mini_etl_spark import maintenance as mt

    df = spark.range(1000).select((F.col("id") * 1.5).alias("v"))
    monkeypatch.delenv("MINI_ETL_EXACT_PERCENTILE_LIMIT_BYTES", raising=False)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out = mt.quantile_buckets(df, "v", buckets=4)
    # exact quartile boundaries of 0, 1.5, ..., 1498.5 at scale=100:
    # deterministic check that the exact branch ran
    import collections

    counts = collections.Counter(r["qbucket"] for r in out.collect())
    assert counts == {0: 250, 1: 250, 2: 250, 3: 250}, counts


def test_embedding_gemm_guard_routes_to_lsh(spark, monkeypatch):
    from mini_etl_spark.functions import dedup as dd

    rng = np.random.default_rng(3)
    rows = [
        (int(i), [float(x) for x in rng.standard_normal(8)]) for i in range(50)
    ]
    df = _vec_frame(spark, rows)
    monkeypatch.setenv("MINI_ETL_EMBED_GEMM_LIMIT_BYTES", "1")
    with pytest.warns(UserWarning, match="Routing .*lsh"):
        out = dd.embedding_cosine_pairs(df, "embedding", "vec_id", 0.95)
    assert out.columns == ["id_a", "id_b", "cosine"]
    monkeypatch.setenv("MINI_ETL_EMBED_GEMM_LIMIT_BYTES", "0")
    # 0 disables the guard entirely
    dd.embedding_cosine_pairs(df, "embedding", "vec_id", 0.95).collect()
