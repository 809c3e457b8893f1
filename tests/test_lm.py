"""Bigram LM: hand-computed probabilities, smoothing paths, persistence.

The oracle battery (test_oracle.py::lm_perplexity) already replays the
full chain in DuckDB at SF_ORACLE; these tests pin the semantics on a
corpus small enough to verify by hand.
"""

from __future__ import annotations

import math

import pytest

from mini_etl_spark.functions import lm


def _train_corpus(spark):
    return spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "the dog sat")],
        "doc_id long, text string",
    )


def test_train_counts(spark):
    model = {
        (r.prev, r.cur): r.cnt
        for r in lm.train_bigram_lm(_train_corpus(spark)).collect()
    }
    assert model == {
        ("the", "cat"): 2,
        ("the", "dog"): 1,
        ("cat", "sat"): 1,
        ("cat", "ran"): 1,
        ("dog", "sat"): 1,
    }


def test_score_hand_computed(spark):
    """Score 'the cat sat' under the 3-doc model, add-one smoothing.

    V = 5 (the, cat, dog, sat, ran); ctx(the)=3, ctx(cat)=2, ctx(dog)=1.
    p(cat|the) = (2+1)/(3+5);  p(sat|cat) = (1+1)/(2+5).
    """
    model = lm.train_bigram_lm(_train_corpus(spark))
    doc = spark.createDataFrame([(10, "the cat sat")], "doc_id long, text string")
    row = lm.bigram_logprob_score(doc, model).collect()[0]
    expected = (math.log(3 / 8) + math.log(2 / 7)) / 2
    assert row.n_bigrams == 2
    assert row.lm2_score == pytest.approx(round(expected, 4), abs=1e-9)
    assert row.perplexity == pytest.approx(round(math.exp(-round(expected, 4)), 4), abs=1e-9)


def test_unseen_context_and_bigram(spark):
    """Wholly unseen context → p = α/(αV) = 1/V; unseen bigram in a seen
    context → (0+α)/(ctx+αV)."""
    model = lm.train_bigram_lm(_train_corpus(spark))
    doc = spark.createDataFrame(
        [(11, "zebra quux"), (12, "the ran")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in lm.bigram_logprob_score(doc, model).collect()}
    assert rows[11].lm2_score == pytest.approx(round(math.log(1 / 5), 4), abs=1e-9)
    assert rows[12].lm2_score == pytest.approx(round(math.log(1 / 8), 4), abs=1e-9)


def test_short_docs_absent_and_order_sensitivity(spark):
    model = lm.train_bigram_lm(_train_corpus(spark))
    docs = spark.createDataFrame(
        [(20, "single"), (21, ""), (22, "the cat"), (23, "cat the")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in lm.bigram_logprob_score(docs, model).collect()}
    assert set(rows) == {22, 23}  # <2-token docs absent
    # word ORDER matters (the thing the unigram proxy can't see):
    assert rows[22].lm2_score > rows[23].lm2_score


def test_model_roundtrip(spark, tmp_path):
    model = lm.train_bigram_lm(_train_corpus(spark))
    path = str(tmp_path / "bigram_model")
    model.write.parquet(path)
    doc = spark.createDataFrame([(30, "the cat sat")], "doc_id long, text string")
    direct = lm.bigram_logprob_score(doc, model).collect()[0]
    served = lm.bigram_logprob_score(doc, spark.read.parquet(path)).collect()[0]
    assert direct == served


def test_merge_equals_retrain(spark):
    """merge(train(A), train(B)) == train(A ∪ B): counts are additive and
    document boundaries isolate pairs — the incremental-update guarantee."""
    a = spark.createDataFrame(
        [(i, f"alpha beta gamma doc {i} alpha beta") for i in range(10)],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(100 + i, f"beta gamma delta doc {i}") for i in range(7)],
        "doc_id long, text string",
    )
    merged = {
        (r.prev, r.cur): r.cnt
        for r in lm.merge_bigram_lms(
            lm.train_bigram_lm(a), lm.train_bigram_lm(b)
        ).collect()
    }
    full = {
        (r.prev, r.cur): r.cnt
        for r in lm.train_bigram_lm(a.unionByName(b)).collect()
    }
    assert merged == full
    with pytest.raises(ValueError):
        lm.merge_bigram_lms()


def test_stream_lm_gate_matches_batch(spark, tmp_path):
    """The streaming perplexity gate keeps exactly the rows the batch
    scorer would keep, with the same scores attached."""
    from mini_etl_spark.streaming.events import stream_lm_gate

    train = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)],
        "doc_id long, text string",
    )
    model = lm.train_bigram_lm(train)
    mdir = str(tmp_path / "lm_model")
    model.write.parquet(mdir)

    batch = spark.createDataFrame(
        [
            (100, "the quick brown fox"),       # fluent under the model
            (101, "dog lazy the over jumps"),   # shuffled — high perplexity
            (102, "zz qq xx yy ww"),            # gibberish — high perplexity
            (103, "one"),                       # <2 tokens — dropped
        ],
        "doc_id long, text string",
    )
    scored = {
        r.doc_id: r for r in lm.bigram_logprob_score(batch, model).collect()
    }
    cut = scored[100].perplexity + 0.5  # keep only the fluent doc
    assert scored[101].perplexity > cut and scored[102].perplexity > cut

    src = str(tmp_path / "in")
    batch.write.parquet(src)
    out = str(tmp_path / "out")
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    stream_lm_gate(
        stream, mdir, out, checkpoint=str(tmp_path / "cp"), max_perplexity=cut
    )
    rows = spark.read.parquet(out).collect()
    assert [r.doc_id for r in rows] == [100]
    assert rows[0].perplexity == scored[100].perplexity
    assert rows[0].lm2_score == scored[100].lm2_score


def test_alpha_guard(spark):
    model = lm.train_bigram_lm(_train_corpus(spark))
    with pytest.raises(ValueError, match="alpha"):
        lm.bigram_logprob_score(_train_corpus(spark), model, alpha=0.0)


def test_stream_lm_update_matches_retrain(spark, tmp_path):
    """Incremental streaming trainer: two micro-batches merged into the
    persisted model equal one batch retrain on all the data; readers see
    only complete snapshots through the _LATEST pointer."""
    from mini_etl_spark.streaming import read_latest_snapshot, stream_lm_update

    src = str(tmp_path / "in")
    a = spark.createDataFrame(
        [(i, f"alpha beta gamma slice one {i}") for i in range(8)],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(100 + i, f"beta gamma delta slice two {i}") for i in range(6)],
        "doc_id long, text string",
    )
    a.coalesce(1).write.parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)

    mdir = str(tmp_path / "model")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)  # force >= 2 micro-batches
        .parquet(src)
    )
    stream_lm_update(stream, mdir, checkpoint=str(tmp_path / "cp"))

    served = {
        (r.prev, r.cur): r.cnt for r in read_latest_snapshot(spark, mdir).collect()
    }
    full = {
        (r.prev, r.cur): r.cnt
        for r in lm.train_bigram_lm(a.unionByName(b)).collect()
    }
    assert served == full


def test_config_transformer(spark, tmp_path):
    from mini_etl_spark.config import ConfigLoader

    src = tmp_path / "docs"
    _train_corpus(spark).write.parquet(str(src))
    out = tmp_path / "scored"
    cfg = tmp_path / "lm.yaml"
    cfg.write_text(
        f"""
name: bigram-gate
source: {{type: parquet, path: '{src}'}}
transformers:
  - type: bigram_score
    output: ppl_score
sink: {{type: parquet, path: '{out}', mode: overwrite}}
"""
    )
    loader = ConfigLoader()
    config = loader.load(cfg)
    assert config.validate() == []
    loader.build_pipeline(config).run(spark)
    back = spark.read.parquet(str(out))
    assert {"doc_id", "n_bigrams", "ppl_score", "perplexity"} <= set(back.columns)
    assert back.count() == 3
