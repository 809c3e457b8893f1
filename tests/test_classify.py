"""NB domain/quality classifier (functions.classify): training semantics,
held-out classification, DSIR log-ratio weights, empty-doc handling."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mini_etl_spark.functions import classify as cl

TRAIN = [
    (1, "code", "def main return value import module function class"),
    (2, "code", "compile function stack trace import module error"),
    (3, "code", "class method return import function module"),
    (4, "news", "election results announced by the government today"),
    (5, "news", "the government said results of the election arrived"),
    (6, "news", "officials announced the election results today"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_nb_classify_heldout_docs(spark):
    model = cl.nb_train(_df(spark, TRAIN), label_col="source")
    test = spark.createDataFrame(
        [
            (10, "import function return class module"),
            (11, "the government announced election results"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["label"] for r in cl.nb_classify(model, test).collect()}
    assert got == {10: "code", 11: "news"}


def test_nb_score_matches_hand_computation(spark):
    """Tiny corpus where the smoothed log-posterior is hand-checkable."""
    rows = [(1, "a", "x x y"), (2, "b", "z")]
    model = cl.nb_train(_df(spark, rows), label_col="source")
    test = spark.createDataFrame([(9, "x q")], "doc_id long, text string")
    got = {
        r["label"]: r["score"] for r in cl.nb_score(model, test).collect()
    }
    # V = 3 (x, y, z); class a: ct=3, class b: ct=1
    # a: ln(1/2) + ln((2+1)/(3+3)) + ln(1/(3+3))   [x seen twice, q unseen]
    want_a = round(math.log(0.5) + math.log(3 / 6) + math.log(1 / 6), 6)
    # b: ln(1/2) + ln(1/(1+3)) + ln(1/(1+3))       [x and q both unseen]
    want_b = round(math.log(0.5) + math.log(1 / 4) * 2, 6)
    assert got == {"a": pytest.approx(want_a), "b": pytest.approx(want_b)}


def test_nb_empty_doc_scores_prior_only(spark):
    model = cl.nb_train(_df(spark, TRAIN), label_col="source")
    test = spark.createDataFrame([(7, "")], "doc_id long, text string")
    scored = {r["label"]: r["score"] for r in cl.nb_score(model, test).collect()}
    # both classes have 3 of 6 docs → prior ln(0.5) exactly, no token terms
    assert set(scored) == {"code", "news"}
    assert all(v == pytest.approx(round(math.log(0.5), 6)) for v in scored.values())
    # and the doc still classifies (tie → lexicographically smallest label)
    best = cl.nb_classify(model, test).collect()
    assert len(best) == 1 and best[0]["label"] == "code"


def test_log_ratio_weights_rank_target_docs_higher(spark):
    model = cl.nb_train(_df(spark, TRAIN), label_col="source")
    test = spark.createDataFrame(
        [
            (20, "function import module return"),
            (21, "election government results announced"),
            (22, "module election"),
        ],
        "doc_id long, text string",
    )
    w = {
        r["doc_id"]: r["logratio"]
        for r in cl.log_ratio_weights(model, test, "code", "news").collect()
    }
    assert w[20] > w[22] > w[21]
    assert w[20] > 0 > w[21]


def test_min_count_prunes_rare_tokens(spark):
    model = cl.nb_train(_df(spark, TRAIN), label_col="source", min_count=3)
    kept = {r["token"] for r in model.token_lp.collect()}
    # 'function'/'import'/'module' appear 3x in code; 'compile' only once
    assert {"function", "import", "module"} <= kept
    assert "compile" not in kept


def test_nb_save_load_roundtrip(spark, tmp_path):
    """Persisted model scores identically to the in-memory one (the
    build-once serve-many contract)."""
    model = cl.nb_train(_df(spark, TRAIN), label_col="source")
    path = str(tmp_path / "nb_model")
    cl.nb_save(model, path)
    loaded = cl.nb_load(spark, path)
    test = spark.createDataFrame(
        [(30, "function import module"), (31, "election government today")],
        "doc_id long, text string",
    )
    a = sorted((r["doc_id"], r["label"], r["score"])
               for r in cl.nb_score(model, test).collect())
    b = sorted((r["doc_id"], r["label"], r["score"])
               for r in cl.nb_score(loaded, test).collect())
    assert a == b and len(a) == 4


def test_nb_classify_config_node(spark, tmp_path):
    """Declarative form: a YAML pipeline scores a parquet batch against a
    persisted model and keeps one class."""
    from mini_etl_spark.config import ConfigLoader

    model = cl.nb_train(_df(spark, TRAIN), label_col="source")
    mpath = str(tmp_path / "model")
    cl.nb_save(model, mpath)
    src = str(tmp_path / "batch.parquet")
    spark.createDataFrame(
        [
            (40, "import module function return class"),
            (41, "government election results announced today"),
        ],
        "doc_id long, text string",
    ).write.parquet(src)
    out = str(tmp_path / "kept.parquet")
    cfg = {
        "pipeline": {
            "name": "nb_gate",
            "source": {"type": "parquet", "path": src},
            "transformers": [
                {"type": "nb_classify", "path": mpath, "keep_label": "code"}
            ],
            "sink": {"type": "parquet", "path": out, "mode": "w"},
        }
    }
    loader = ConfigLoader()
    loader.build_pipeline(loader.parse(cfg)).run(spark)
    rows = spark.read.parquet(out).collect()
    assert [(r["doc_id"], r["label"]) for r in rows] == [(40, "code")]
    assert "score" in rows[0].asDict()


def test_nb_train_validates_inputs(spark):
    empty = spark.createDataFrame([], "doc_id long, source string, text string")
    with pytest.raises(ValueError, match="empty"):
        cl.nb_train(empty, label_col="source")
    nulls = spark.createDataFrame(
        [(1, None, "some text")], "doc_id long, source string, text string"
    )
    with pytest.raises(ValueError, match="NULL"):
        cl.nb_train(nulls, label_col="source")
