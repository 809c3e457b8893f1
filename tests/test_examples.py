"""The shipped example configs must load, validate, and run end-to-end
against the test tables (⇐ the reference ships runnable sample configs)."""

from __future__ import annotations

import pytest

from mini_etl_spark.config import ConfigLoader

from tests.conftest import SF_SMALL


@pytest.mark.parametrize(
    "name,env",
    [
        ("corpus_pipeline.yaml", {"DOCS_DIR": f"{SF_SMALL}/documents.parquet"}),
        ("chunk_pack.yaml", {"DOCS_DIR": f"{SF_SMALL}/documents.parquet"}),
        ("incremental_events.yaml", {"ORDERS_DIR": f"{SF_SMALL}/orders.parquet"}),
        ("streaming_quality_gate.yaml", {"DOCS_DIR": f"{SF_SMALL}/documents.parquet"}),
        ("tokenize_corpus.yaml", {"DOCS_DIR": f"{SF_SMALL}/documents.parquet"}),
        ("governed_release.yaml", {"DOCS_DIR": f"{SF_SMALL}/documents.parquet"}),
        ("mix_and_shard.yaml", {"DOCS_DIR": f"{SF_SMALL}/documents.parquet"}),
    ],
)
def test_example_config_runs(spark, tmp_path, monkeypatch, name, env):
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    monkeypatch.setenv("OUT_DIR", str(tmp_path))
    loader = ConfigLoader()
    config = loader.load(f"examples/{name}")
    assert config.validate() == []
    stats = loader.build_pipeline(config).run(spark)
    assert stats["errors"] == 0
    assert stats["rows"] > 0


def test_perplexity_gate_example_runs(spark, tmp_path, monkeypatch):
    """The LM-gated curation example: self-fit bigram LM, filter on
    perplexity; every surviving row is at or under the YAML cutoff."""
    monkeypatch.setenv("DOCS_DIR", f"{SF_SMALL}/documents.parquet")
    monkeypatch.setenv("OUT_DIR", str(tmp_path))
    loader = ConfigLoader()
    config = loader.load("examples/perplexity_gate.yaml")
    assert config.validate() == []
    stats = loader.build_pipeline(config).run(spark)
    assert stats["errors"] == 0 and stats["rows"] > 0
    out = spark.read.parquet(str(tmp_path / "fluent_corpus"))
    assert out.count() == stats["rows"]
    assert out.filter("perplexity > 800").count() == 0
    assert {"lm2_score", "n_bigrams"} <= set(out.columns)


def test_domain_gate_example_runs(spark, tmp_path, monkeypatch):
    """The model-gated curation example: train+persist an NB model, then
    the YAML pipeline scores, gates on the target label, and splits."""
    from mini_etl_spark.functions import classify as cl

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    model = cl.nb_train(docs, label_col="source")
    mdir = str(tmp_path / "model")
    cl.nb_save(model, mdir)

    monkeypatch.setenv("DOCS_DIR", f"{SF_SMALL}/documents.parquet")
    monkeypatch.setenv("MODEL_DIR", mdir)
    monkeypatch.setenv("TARGET_LABEL", "src0")
    monkeypatch.setenv("OUT_DIR", str(tmp_path))
    loader = ConfigLoader()
    config = loader.load("examples/domain_gate.yaml")
    assert config.validate() == []
    stats = loader.build_pipeline(config).run(spark)
    assert stats["errors"] == 0 and stats["rows"] > 0
    out = spark.read.parquet(str(tmp_path / "gated_corpus"))
    labels = {r["label"] for r in out.select("label").distinct().collect()}
    assert labels == {"src0"}
    assert {r["split"] for r in out.select("split").distinct().collect()} <= {"train", "holdout"}


def test_web_curation_example_runs(spark, tmp_path, monkeypatch):
    """The web front-end example: blocklist → parse+normalize → canonical
    URL dedup → per-domain cap, from YAML."""
    pages = spark.createDataFrame(
        [
            (i,
             # ids 0/1 are the same page modulo scheme+tracking params;
             # ids ending in 9 live on a blocklisted site
             f"{'http' if i == 0 else 'https'}://www.site{i % 10 if i % 10 != 9 else ''}"
             f"{'' if i % 10 != 9 else 'x.spam.example'}.org/p/{i // 10}"
             f"{'?utm_source=x' if i % 2 == 0 else ''}")
            for i in range(200)
        ],
        "page_id bigint, url string",
    )
    # make ids 0 and 1 true canonical duplicates
    from pyspark.sql import functions as F
    pages = pages.withColumn(
        "url",
        F.when(F.col("page_id") == 1, F.lit("https://www.site0.org/p/0?utm_source=y"))
        .when(F.col("page_id") == 0, F.lit("https://www.site0.org:443/p/0#frag"))
        .otherwise(F.col("url")),
    )
    src = tmp_path / "pages"
    pages.write.parquet(str(src))

    monkeypatch.setenv("PAGES_DIR", str(src))
    monkeypatch.setenv("OUT_DIR", str(tmp_path))
    loader = ConfigLoader()
    config = loader.load("examples/web_curation.yaml")
    assert config.validate() == []
    stats = loader.build_pipeline(config).run(spark)
    assert stats["errors"] == 0 and stats["rows"] > 0
    out = spark.read.parquet(str(tmp_path / "curated_pages"))
    doms = {r[0] for r in out.select("url_domain").distinct().collect()}
    assert "spam.example" not in doms  # suffix blocklist caught sitex.spam.example
    assert all("spam" not in d for d in doms)
    # canonical dedup: pages 0 (default port + fragment) and 1 (tracking
    # param) normalize identically → keep=first keeps page 0 only
    surv = [r["page_id"] for r in out.filter("page_id in (0, 1)").collect()]
    assert surv == [0]
    assert out.groupBy("url_domain").count().agg({"count": "max"}).first()[0] <= 50


def test_crawl_to_corpus_example_runs(spark, tmp_path, monkeypatch):
    """WARC → filter → html_text → parse_urls → dedup → features, from
    YAML: the full crawl on-ramp as a declarative pipeline."""
    import gzip as _gzip

    from tests.test_warc import HTML_A, _archive, _http_response, _record

    wd = tmp_path / "warcs"
    wd.mkdir()
    (wd / "a.warc").write_bytes(_archive())
    (wd / "b.warc.gz").write_bytes(
        _gzip.compress(
            _record(
                "response",
                "https://c.example.io/z",
                _http_response(b"<html><body><p>" + b"useful words here " * 20 + b"</p></body></html>"),
                extra="Content-Type: application/http; msgtype=response",
            )
        )
    )

    monkeypatch.setenv("WARC_DIR", str(wd))
    monkeypatch.setenv("OUT_DIR", str(tmp_path))
    loader = ConfigLoader()
    config = loader.load("examples/crawl_to_corpus.yaml")
    assert config.validate() == []
    stats = loader.build_pipeline(config).run(spark)
    assert stats["errors"] == 0 and stats["rows"] > 0
    out = spark.read.parquet(str(tmp_path / "crawl_corpus"))
    rows = {r["url_host"]: r for r in out.collect()}
    assert "c.example.io" in rows
    assert "useful words here" in rows["c.example.io"]["text"]
    assert "<" not in rows["c.example.io"]["text"]
    assert {"lang_id", "quality", "ws_tokens"} <= set(out.columns)


def test_streaming_web_gate_example_runs(spark, tmp_path, monkeypatch):
    """VERDICT r4 #7: the web curation ops (url_blocklist, parse_urls,
    html_text) under readStream — availableNow e2e, then a second run
    over one NEW file proving incremental exactly-once (only the new
    drop is processed)."""
    from pyspark.sql import functions as F

    def _pages(id_lo, id_hi):
        return spark.range(id_lo, id_hi).select(
            F.col("id").alias("page_id"),
            F.concat(
                F.lit("https://"),
                F.when(F.col("id") % 5 == 0, F.lit("bad.spam.example"))
                 .otherwise(F.concat(F.lit("site"), (F.col("id") % 7).cast("string"), F.lit(".org"))),
                F.lit("/p/"), F.col("id").cast("string"),
                F.lit("?utm_source=feed"),
            ).alias("url"),
            F.concat(
                F.lit("<html><body><h1>Page</h1><p>plenty of useful readable "
                      "words in this body text for the quality gate to score "),
                F.col("id").cast("string"),
                F.lit("</p></body></html>"),
            ).alias("html"),
        )

    src = tmp_path / "pages"
    _pages(0, 60).coalesce(1).write.mode("append").parquet(str(src))

    monkeypatch.setenv("PAGES_DIR", str(src))
    monkeypatch.setenv("OUT_DIR", str(tmp_path))
    from mini_etl_spark.config import ConfigLoader

    loader = ConfigLoader()
    config = loader.load("examples/streaming_web_gate.yaml")
    assert config.validate() == []
    stats = loader.build_pipeline(config).run(spark)
    assert stats["errors"] == 0 and stats["rows"] > 0

    out = spark.read.parquet(str(tmp_path / "gated_pages"))
    first = out.count()
    assert first == 48  # 60 pages minus the 12 blocklisted (id % 5 == 0)
    doms = {r[0] for r in out.select("url_domain").distinct().collect()}
    assert "spam.example" not in doms and all("spam" not in d for d in doms)
    row = out.filter("page_id = 1").first()
    assert row["url_host"] == "site1.org"
    assert "?utm_source" not in row["url_norm"]  # tracking param stripped
    assert "<" not in row["text"] and "useful readable words" in row["text"]

    # second drop: only the new file is processed (checkpointed source)
    _pages(100, 110).coalesce(1).write.mode("append").parquet(str(src))
    stats2 = loader.build_pipeline(config).run(spark)
    assert stats2["errors"] == 0
    out2 = spark.read.parquet(str(tmp_path / "gated_pages"))
    assert out2.count() == first + 8  # 10 new minus 2 blocklisted
    assert out2.filter("page_id = 1").count() == 1  # old rows not reprocessed


def test_sft_release_example_runs(spark, tmp_path, monkeypatch):
    """The conversation-modality release pipeline from YAML: parse ->
    validate -> redact -> PII bound -> prompt dedup -> render -> quality
    gate."""
    import json

    lines = []
    body = ("please explain the useful common words that make quality "
            "scoring pass for this transcript ")
    for i in range(30):
        msgs = [
            {"role": "user", "content": f"prompt {i % 10}: {body}"},
            {"role": "assistant",
             "content": f"answer {i} {body} mail bot{i}@x.example"},
        ]
        lines.append(json.dumps({"conv_id": i, "chat_json": json.dumps(msgs)}))
    # malformed + invalid structure rows must be gated out
    lines.append(json.dumps({"conv_id": 900, "chat_json": "not json"}))
    lines.append(json.dumps({"conv_id": 901, "chat_json": json.dumps(
        [{"role": "assistant", "content": "reply with no prompt"}])}))
    src = tmp_path / "chats"
    src.mkdir()
    (src / "part.jsonl").write_text("\n".join(lines))

    monkeypatch.setenv("CHATS_DIR", str(src))
    monkeypatch.setenv("OUT_DIR", str(tmp_path))
    from mini_etl_spark.config import ConfigLoader

    loader = ConfigLoader()
    config = loader.load("examples/sft_release.yaml")
    assert config.validate() == []
    stats = loader.build_pipeline(config).run(spark)
    assert stats["errors"] == 0 and stats["rows"] > 0

    out = spark.read.parquet(str(tmp_path / "sft_release"))
    rows = out.collect()
    ids = sorted(r.conv_id for r in rows)
    assert ids == list(range(10))  # 10 distinct prompts, min-id keepers
    assert all(r.conv_id not in (900, 901) for r in rows)
    for r in rows:
        assert "@" not in r.text and "<EMAIL>" in r.text  # redacted in render
        assert r.n_pii == 1
        assert r.quality >= 0.1


def test_streaming_shard_ingest_example_runs(spark, tmp_path, monkeypatch):
    """r6: the declarative streaming shard-ingest pipeline — two drops,
    two runs on one checkpoint; the offset state carries so the second
    drop continues the final partially-filled shard instead of
    restarting at shard 0."""
    from pyspark.sql import functions as F

    src = tmp_path / "docs"
    out = tmp_path / "o"

    def _docs(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("tok "), F.repeat(F.lit("word "), 99)).alias("text"),
        )

    _docs(0, 30).coalesce(1).write.mode("append").parquet(str(src))
    monkeypatch.setenv("DOCS_DIR", str(src))
    monkeypatch.setenv("OUT_DIR", str(out))
    from mini_etl_spark.config import ConfigLoader

    loader = ConfigLoader()
    config = loader.load("examples/streaming_shard_ingest.yaml")
    assert config.validate() == []
    loader.build_pipeline(config).run(spark)
    first = spark.read.parquet(str(out / "token_shards"))
    # 30 docs x 100 tokens = 3000 tokens -> shard 0 full at 4096? no:
    # 3000 < 4096, everything in shard 0
    assert first.count() == 30
    assert {r.shard for r in first.select("shard").distinct().collect()} == {0}

    _docs(100, 130).coalesce(1).write.mode("append").parquet(str(src))
    loader.build_pipeline(config).run(spark)
    both = spark.read.parquet(str(out / "token_shards"))
    assert both.count() == 60
    # 6000 tokens total: the second drop fills shard 0 to 4096 and opens
    # shard 1 — offset state carried, no restart at 0
    shards = {r.shard for r in both.select("shard").distinct().collect()}
    assert shards == {0, 1}


def test_decontaminate_release_example_runs(spark, tmp_path, monkeypatch):
    """The eval-hygiene release gate: Bloom membership screen + graded
    containment pass. Eval docs sampled FROM the corpus must all be
    dropped (they share every n-gram with themselves); the rest of the
    corpus survives."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    eval_ids = [r["doc_id"] for r in docs.select("doc_id").limit(3).collect()]
    bench = str(tmp_path / "eval.parquet")
    docs.filter(docs.doc_id.isin(eval_ids)).select("doc_id", "text").write.parquet(bench)
    monkeypatch.setenv("DOCS_DIR", f"{SF_SMALL}/documents.parquet")
    monkeypatch.setenv("EVAL_DIR", bench)
    monkeypatch.setenv("OUT_DIR", str(tmp_path))
    loader = ConfigLoader()
    config = loader.load("examples/decontaminate_release.yaml")
    assert config.validate() == []
    stats = loader.build_pipeline(config).run(spark)
    assert stats["errors"] == 0 and stats["rows"] > 0
    out = spark.read.parquet(str(tmp_path / "released_corpus"))
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert not (set(eval_ids) & kept)  # leaked docs are gone
    assert kept  # but the gate is not a drop-everything
    assert "lang_id" in out.columns  # text_features ran downstream


def test_streaming_drift_gate_example_runs(spark, tmp_path, monkeypatch):
    """The declarative streaming drift gate: batch 1 (same distribution
    as the baseline) publishes exactly-once under its batch_id
    partition; a later shifted batch fails the run and leaves nothing
    new behind. Re-running the SAME config continues the checkpoint —
    the scheduled-ingestion shape."""
    base_dir = str(tmp_path / "baseline")
    spark.range(1000).selectExpr(
        "id", "CAST(id % 100 AS DOUBLE) AS value"
    ).write.parquet(base_dir)
    events = str(tmp_path / "events")
    spark.range(2000, 2500).selectExpr(
        "id", "CAST(id % 100 AS DOUBLE) AS value"
    ).coalesce(1).write.mode("append").parquet(events)

    monkeypatch.setenv("EVENTS_DIR", events)
    monkeypatch.setenv("BASELINE_DIR", base_dir)
    monkeypatch.setenv("OUT_DIR", str(tmp_path))
    loader = ConfigLoader()
    config = loader.load("examples/streaming_drift_gate.yaml")
    assert config.validate() == []
    stats = loader.build_pipeline(config).run(spark)
    assert stats["errors"] == 0 and stats["rows"] == 500
    out = spark.read.parquet(str(tmp_path / "gated"))
    assert out.count() == 500
    assert {r["batch_id"] for r in out.select("batch_id").distinct().collect()} == {0}
    assert spark.read.parquet(str(tmp_path / "drift_reports")).count() == 10

    # a shifted epoch arrives: the gate refuses the batch, nothing lands
    spark.range(9000, 9400).selectExpr(
        "id", "CAST(500 + id % 100 AS DOUBLE) AS value"
    ).coalesce(1).write.mode("append").parquet(events)
    config2 = loader.load("examples/streaming_drift_gate.yaml")
    with pytest.raises(Exception, match="exceeds max_psi"):
        loader.build_pipeline(config2).run(spark)
    assert spark.read.parquet(str(tmp_path / "gated")).count() == 500

    # misuse guard: the drift_gate sink on a BATCH source fails loudly
    batch_cfg = loader.parse({
        "name": "bad",
        "source": {"type": "parquet", "path": base_dir},
        "transformers": [],
        "sink": {
            "type": "drift_gate", "path": str(tmp_path / "x"),
            "baseline": base_dir, "checkpoint": str(tmp_path / "xcp"),
            "column": "value", "max_psi": 0.2,
        },
    })
    with pytest.raises(Exception, match="streaming source"):
        loader.build_pipeline(batch_cfg).run(spark)


def test_streaming_classify_gate_example_runs(spark, tmp_path, monkeypatch):
    """The declarative NB model gate (VERDICT r11 #7): only keep_label
    rows publish, exactly-once under batch_id partitions; missing
    required sink keys fail at BUILD time with a named ValueError, not a
    KeyError mid-run (ADVICE r11)."""
    from mini_etl_spark.functions import classify as cl

    train = spark.createDataFrame(
        [
            (1, "code", "def main return import module function class"),
            (2, "code", "compile function stack import module error"),
            (3, "news", "election results announced by the government"),
            (4, "news", "the government said election results arrived"),
        ],
        "doc_id long, source string, text string",
    )
    mdir = str(tmp_path / "model")
    cl.nb_save(cl.nb_train(train, label_col="source"), mdir)

    docs = str(tmp_path / "docs")
    spark.createDataFrame(
        [(100, "import function module return"),
         (101, "government election results today"),
         (102, "class import module function")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(docs)

    monkeypatch.setenv("DOCS_DIR", docs)
    monkeypatch.setenv("MODEL_DIR", mdir)
    monkeypatch.setenv("OUT_DIR", str(tmp_path))
    monkeypatch.setenv("KEEP_LABEL", "code")
    loader = ConfigLoader()
    config = loader.load("examples/streaming_classify_gate.yaml")
    assert config.validate() == []
    stats = loader.build_pipeline(config).run(spark)
    assert stats["errors"] == 0
    out = spark.read.parquet(str(tmp_path / "kept"))
    assert {r["doc_id"] for r in out.collect()} == {100, 102}
    assert all(r["label"] == "code" for r in out.collect())
    assert "batch_id" in out.columns  # exactly-once partition layout

    # missing required keys → named config error at build, not KeyError
    bad = loader.parse({
        "name": "bad",
        "source": {"type": "parquet", "path": docs, "stream": True},
        "transformers": [],
        "sink": {"type": "classify_gate", "path": str(tmp_path / "x"),
                 "checkpoint": str(tmp_path / "xcp")},
    })
    with pytest.raises(ValueError, match="classify_gate sink.*model"):
        loader.build_pipeline(bad)
    # missing path can't silently flow None into out_path
    bad2 = loader.parse({
        "name": "bad2",
        "source": {"type": "parquet", "path": docs, "stream": True},
        "transformers": [],
        "sink": {"type": "classify_gate", "model": mdir,
                 "checkpoint": str(tmp_path / "xcp"), "keep_label": "code"},
    })
    with pytest.raises(ValueError, match="classify_gate sink.*path"):
        loader.build_pipeline(bad2)


def test_streaming_lm_gate_example_runs(spark, tmp_path, monkeypatch):
    """The declarative perplexity gate: fluent rows publish, gibberish is
    dropped; a batch source fails loudly; drift_gate's missing-key
    validation is shared across the gate family."""
    from mini_etl_spark.functions import lm

    train = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)],
        "doc_id long, text string",
    )
    mdir = str(tmp_path / "lm_model")
    lm.train_bigram_lm(train).write.parquet(mdir)
    cut = (
        lm.bigram_logprob_score(
            spark.createDataFrame(
                [(0, "the quick brown fox")], "doc_id long, text string"
            ),
            spark.read.parquet(mdir),
        ).collect()[0].perplexity
        + 0.5
    )

    docs = str(tmp_path / "docs")
    spark.createDataFrame(
        [(100, "the quick brown fox"), (101, "zz qq xx yy ww")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(docs)

    monkeypatch.setenv("DOCS_DIR", docs)
    monkeypatch.setenv("MODEL_DIR", mdir)
    monkeypatch.setenv("OUT_DIR", str(tmp_path))
    monkeypatch.setenv("MAX_PPL", str(cut))
    loader = ConfigLoader()
    config = loader.load("examples/streaming_lm_gate.yaml")
    assert config.validate() == []
    stats = loader.build_pipeline(config).run(spark)
    assert stats["errors"] == 0
    out = spark.read.parquet(str(tmp_path / "kept"))
    assert [r["doc_id"] for r in out.collect()] == [100]
    assert "perplexity" in out.columns and "batch_id" in out.columns

    # batch source misuse fails loudly, mirroring drift_gate
    batch_cfg = loader.parse({
        "name": "bad",
        "source": {"type": "parquet", "path": docs},
        "transformers": [],
        "sink": {"type": "lm_gate", "path": str(tmp_path / "x"),
                 "model": mdir, "checkpoint": str(tmp_path / "xcp"),
                 "max_perplexity": 100.0},
    })
    with pytest.raises(Exception, match="streaming source"):
        loader.build_pipeline(batch_cfg).run(spark)

    # drift_gate shares the up-front key validation (ADVICE r11)
    bad_drift = loader.parse({
        "name": "bad_drift",
        "source": {"type": "parquet", "path": docs, "stream": True},
        "transformers": [],
        "sink": {"type": "drift_gate", "path": str(tmp_path / "y"),
                 "checkpoint": str(tmp_path / "ycp"), "column": "v"},
    })
    with pytest.raises(ValueError, match="drift_gate sink.*baseline"):
        loader.build_pipeline(bad_drift)
