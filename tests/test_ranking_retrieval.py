"""ranking (majority vote, Bradley–Terry) and retrieval (RRF fusion,
hard-negative mining) — unit semantics plus brute-force cross-checks."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mini_etl_spark.functions.ranking import bradley_terry, majority_label
from mini_etl_spark.functions.retrieval import hard_negatives, rrf_fuse


# ---------------------------------------------------------------------------
# majority_label
# ---------------------------------------------------------------------------

def test_majority_label_plurality_and_ties(spark):
    rows = [
        (1, "cat"), (1, "cat"), (1, "dog"),          # clear majority
        (2, "b"), (2, "a"),                           # tie → smallest label
        (3, "x"),                                     # singleton
    ]
    df = spark.createDataFrame(rows, "item_id long, label string")
    out = {r["item_id"]: r for r in majority_label(df).collect()}
    assert out[1]["label"] == "cat" and out[1]["votes"] == 2.0
    assert abs(out[1]["agreement"] - round(2 / 3, 4)) < 1e-9
    assert out[2]["label"] == "a" and out[2]["agreement"] == 0.5
    assert out[3]["label"] == "x" and out[3]["agreement"] == 1.0


def test_majority_label_weighted(spark):
    rows = [(1, "a", 1.0), (1, "b", 5.0), (1, "a", 1.0)]
    df = spark.createDataFrame(rows, "item_id long, label string, w double")
    (r,) = majority_label(df, weight_col="w").collect()
    assert r["label"] == "b" and r["votes"] == 5.0 and r["total_votes"] == 7.0


# ---------------------------------------------------------------------------
# bradley_terry
# ---------------------------------------------------------------------------

def _bt_numpy(pairs, iterations=5):
    """Driver-side replay of the exact regularized MM chain."""
    items = sorted({p[0] for p in pairs} | {p[1] for p in pairs})
    wins = {i: 1.0 for i in items}
    games: dict[tuple, float] = {}
    for w, l in pairs:
        wins[w] += 1.0
        games[(w, l)] = games.get((w, l), 0.0) + 1.0
        games[(l, w)] = games.get((l, w), 0.0) + 1.0
    s = {i: 1.0 for i in items}
    for _ in range(iterations):
        new = {}
        for i in items:
            d = sum(
                n / (s[i] + s[j]) for (a, j), n in games.items() if a == i
            )
            new[i] = wins[i] / (d + 2.0 / (s[i] + 1.0))
        s = new
    anchor = s[items[0]]
    return {i: round(v / anchor, 6) for i, v in s.items()}


def test_bradley_terry_orders_by_skill(spark):
    # 3 beats everyone, 2 beats 1, repeated — strengths must order 3>2>1
    pairs = [(3, 1), (3, 2), (3, 1), (3, 2), (2, 1), (2, 1)]
    df = spark.createDataFrame(pairs, "winner long, loser long")
    got = {r["item"]: r["strength"] for r in bradley_terry(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[3] > got[2] > got[1]
    assert got[1] == 1.0  # anchor = smallest id
    exp = _bt_numpy(pairs)
    for i in got:
        assert abs(got[i] - exp[i]) <= 2e-6, (i, got[i], exp[i])


def test_bradley_terry_disconnected_and_undefeated(spark):
    # undefeated item and a disconnected component stay finite
    pairs = [(1, 2), (1, 2), (3, 4)]
    df = spark.createDataFrame(pairs, "winner long, loser long")
    got = {r["item"]: r["strength"] for r in bradley_terry(df).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert all(math.isfinite(v) and v > 0 for v in got.values())
    assert got[1] > got[2] and got[3] > got[4]
    with pytest.raises(ValueError, match="iterations"):
        bradley_terry(df, iterations=0)


# ---------------------------------------------------------------------------
# rrf_fuse
# ---------------------------------------------------------------------------

def test_rrf_fuse_single_query(spark):
    a = spark.createDataFrame(
        [(10, 5.0), (11, 4.0), (12, 3.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(12, 0.9), (10, 0.8), (13, 0.7)], "doc_id long, score double"
    )
    out = {r["doc_id"]: r for r in rrf_fuse([a, b], k=10, c=60.0).collect()}
    # doc 10: rank 1 + rank 2; doc 12: rank 3 + rank 1
    assert out[10]["rrf_score"] == round(1 / 61 + 1 / 62, 6)
    assert out[12]["rrf_score"] == round(1 / 63 + 1 / 61, 6)
    assert out[10]["n_lists"] == 2 and out[13]["n_lists"] == 1
    assert out[10]["best_rank"] == 1 and out[11]["best_rank"] == 2
    # both-list docs beat single-list docs here
    assert out[10]["rrf_score"] > out[11]["rrf_score"]


def test_rrf_fuse_batched_per_query_and_k(spark):
    rows_a = [(1, 10, 2.0), (1, 11, 1.0), (2, 20, 9.0)]
    rows_b = [(1, 11, 0.5), (2, 21, 0.6)]
    a = spark.createDataFrame(rows_a, "q long, doc_id long, score double")
    b = spark.createDataFrame(rows_b, "q long, doc_id long, score double")
    out = rrf_fuse([a, b], query_col="q", k=1).collect()
    got = {r["q"]: r["doc_id"] for r in out}
    assert len(out) == 2                      # one winner per query
    assert got[1] == 11                       # in both lists → wins
    with pytest.raises(ValueError, match="k must be"):
        rrf_fuse([a], k=0)
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])


# ---------------------------------------------------------------------------
# hard_negatives
# ---------------------------------------------------------------------------

def test_hard_negatives_label_mismatch_and_band(spark):
    from mini_etl_spark.functions.similarity import random_unit_centroids

    rng = np.random.default_rng(5)
    # two planted clusters with labels 0/1 + noise, 64-dim like testdata
    base0 = rng.standard_normal(16)
    base1 = rng.standard_normal(16)
    rows = []
    for i in range(40):
        center = base0 if i % 2 == 0 else base1
        v = center + 0.05 * rng.standard_normal(16)
        rows.append((i, (v / np.linalg.norm(v)).tolist(), i % 2))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    cents = random_unit_centroids(dim=16, k=4, seed=3)
    out = hard_negatives(
        df, df, cents, k=3, k_search=20, nprobe=4, lo=-1.0, hi=0.999
    ).collect()
    assert out, "expected some negatives"
    for r in out:
        assert r["query_label"] != r["corpus_label"]
        assert -1.0 <= r["cosine"] <= 0.999
        assert 1 <= r["neg_rank"] <= 3
    # per-query ranks are dense from 1
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["neg_rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    with pytest.raises(ValueError, match="k <= k_search"):
        hard_negatives(df, df, cents, k=30, k_search=5)
    with pytest.raises(ValueError, match="lo must be"):
        hard_negatives(df, df, cents, lo=0.9, hi=0.1)


def test_hard_negatives_expr_matches_arrow(spark):
    from mini_etl_spark.functions.similarity import random_unit_centroids

    rng = np.random.default_rng(11)
    rows = [
        (i, (lambda v: (v / np.linalg.norm(v)).tolist())(rng.standard_normal(8)), i % 3)
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    cents = random_unit_centroids(dim=8, k=2, seed=9)
    kw = dict(k=4, k_search=10, nprobe=2, lo=-1.0, hi=1.0)
    a = {(r["query_id"], r["corpus_id"], r["neg_rank"]) for r in
         hard_negatives(df, df, cents, method="arrow", **kw).collect()}
    e = {(r["query_id"], r["corpus_id"], r["neg_rank"]) for r in
         hard_negatives(df, df, cents, method="expr", **kw).collect()}
    assert a == e


# ---------------------------------------------------------------------------
# curriculum_order
# ---------------------------------------------------------------------------

def test_curriculum_order_buckets_and_determinism(spark):
    from mini_etl_spark.functions.mixing import curriculum_order

    rows = [(i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, difficulty double")
    out = curriculum_order(df, "difficulty", buckets=4, method="exact")
    got = {r["doc_id"]: r for r in out.collect()}
    assert len(got) == 100
    # exact quartile cutoffs on 0..99 → 24.75/49.5/74.25
    assert got[0]["bucket"] == 0 and got[24]["bucket"] == 0
    assert got[25]["bucket"] == 1 and got[49]["bucket"] == 1
    assert got[50]["bucket"] == 2 and got[74]["bucket"] == 2
    assert got[75]["bucket"] == 3 and got[99]["bucket"] == 3
    # same seed → same keys; different seed → different permutation
    again = {r["doc_id"]: r["curriculum_key"]
             for r in curriculum_order(df, "difficulty", buckets=4,
                                       method="exact").collect()}
    assert again == {k: v["curriculum_key"] for k, v in got.items()}
    other = {r["doc_id"]: r["curriculum_key"]
             for r in curriculum_order(df, "difficulty", buckets=4, seed=7,
                                       method="exact").collect()}
    assert other != again
    # monotone: no doc in a lower bucket is harder than one in a higher
    b_max = {b: max(r["difficulty"] for r in got.values() if r["bucket"] == b)
             for b in range(4)}
    assert b_max[0] < b_max[1] < b_max[2] < b_max[3]
    with pytest.raises(ValueError, match="buckets"):
        curriculum_order(df, "difficulty", buckets=1)
    with pytest.raises(ValueError, match="method"):
        curriculum_order(df, "difficulty", method="nope")


def test_curriculum_order_approx_close_to_exact(spark):
    from mini_etl_spark.functions.mixing import curriculum_order

    rows = [(i, float(i % 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, difficulty double")
    ex = {r["doc_id"]: r["bucket"]
          for r in curriculum_order(df, "difficulty", method="exact").collect()}
    ap = {r["doc_id"]: r["bucket"]
          for r in curriculum_order(df, "difficulty", method="approx").collect()}
    agree = sum(ex[i] == ap[i] for i in ex) / len(ex)
    assert agree >= 0.95, agree
