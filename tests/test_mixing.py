"""mix_by_token_budget / shuffle_order invariants (exact values are gated
by the `token_mixture` / `corpus_shuffle` DuckDB oracles)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_etl_spark.functions.mixing import mix_by_token_budget, shuffle_order


@pytest.fixture(scope="module")
def sources(spark):
    rows = [
        (i, "web" if i % 2 == 0 else "code", " ".join("t" for _ in range(10)))
        for i in range(100)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_budget_binds_with_one_doc_overshoot(spark, sources):
    out = mix_by_token_budget(sources, {"web": 95, "code": 300})
    sums = {
        r["source"]: r["s"]
        for r in out.groupBy("source").agg(F.sum("n_tokens").alias("s")).collect()
    }
    # 10-token docs against a 95 budget: greedy keeps 10 docs (overshoot ≤ 1 doc)
    assert sums["web"] == 100
    assert sums["code"] == 300
    # absent sources dropped entirely
    out2 = mix_by_token_budget(sources, {"web": 50})
    assert out2.filter("source = 'code'").count() == 0


def test_mixture_deterministic_and_subset_stable(spark, sources):
    a = sorted(r["doc_id"] for r in mix_by_token_budget(sources, {"web": 100}).collect())
    b = sorted(r["doc_id"] for r in mix_by_token_budget(sources, {"web": 100}).collect())
    assert a == b  # same seed → same draw
    c = sorted(r["doc_id"] for r in mix_by_token_budget(sources, {"web": 100}, seed=7).collect())
    assert a != c  # different seed → different draw (overwhelmingly)
    # a larger budget's selection extends the smaller one (prefix property
    # of the greedy hash order)
    big = sorted(r["doc_id"] for r in mix_by_token_budget(sources, {"web": 200}).collect())
    assert set(a) <= set(big)


def test_shuffle_order_is_permutation(spark, sources):
    out = shuffle_order(sources)
    ranks = sorted(r["shuffle_order"] for r in out.collect())
    assert ranks == list(range(100))
    first = [r["doc_id"] for r in out.orderBy("shuffle_order").limit(5).collect()]
    again = [
        r["doc_id"]
        for r in shuffle_order(sources).orderBy("shuffle_order").limit(5).collect()
    ]
    assert first == again  # deterministic
    assert first != [0, 1, 2, 3, 4]  # actually shuffled


def test_empty_budgets_raise(sources):
    with pytest.raises(ValueError):
        mix_by_token_budget(sources, {})
