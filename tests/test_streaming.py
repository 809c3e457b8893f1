"""Streaming tests: drive real streaming queries over the events parquet
(availableNow → memory sink), and check streaming windows against their
batch equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_etl_spark import streaming as st
from mini_etl_spark.sources import read_parquet

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_batch(spark):
    return read_parquet(f"{SF_SMALL}/events.parquet", ns_timestamp_columns=["ts"])(spark)


@pytest.fixture(scope="module")
def events_stream(spark):
    return st.read_events_stream(spark, f"{SF_SMALL}/events.parquet")


def test_tumbling_window_matches_batch(spark, events_batch, events_stream):
    streamed = st.run_stream_to_memory(
        st.tumbling_window_agg(events_stream, window="1 hour"), "tumble_test"
    )
    batch = (
        events_batch.groupBy(
            F.window("ts", "1 hour").alias("win"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_sliding_window_overlap(spark, events_stream):
    out = st.run_stream_to_memory(
        st.sliding_window_agg(events_stream, window="1 hour", slide="30 minutes"),
        "slide_test",
    )
    # every event falls into 2 sliding windows → total count doubles
    total_sliding = out.agg(F.sum("n_events")).collect()[0][0]
    tumbled = st.run_stream_to_memory(
        st.tumbling_window_agg(events_stream, window="1 hour"), "tumble_for_slide"
    )
    total_tumbling = tumbled.agg(F.sum("n_events")).collect()[0][0]
    assert total_sliding == 2 * total_tumbling


def test_session_window_stream_runs(spark, events_stream):
    out = st.run_stream_to_memory(
        st.session_window_agg(events_stream, gap="30 minutes"), "session_test"
    )
    assert out.count() > 0
    row = out.first()
    assert row.session_end >= row.session_start


def test_batch_sessionize_semantics(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 10:00",
                    "2024-01-01 10:10",   # same session (gap 10m)
                    "2024-01-01 11:30",   # new session (gap 80m)
                    "2024-01-01 11:40",
                    "2024-01-01 09:00",
                ]
            ),
            "value": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    df = spark.createDataFrame(pdf)
    out = st.batch_sessionize(df, gap_minutes=30).orderBy("user_id", "session_seq")
    rows = out.collect()
    assert [(r.user_id, r.n_events, r.value_sum) for r in rows] == [
        (1, 2, 3.0),
        (1, 2, 7.0),
        (2, 1, 5.0),
    ]


def test_batch_sessionize_matches_session_window(spark, events_batch, events_stream):
    """Session windows (streaming) and lag+cumsum (batch) must produce the
    same sessions on bounded data."""
    streamed = st.run_stream_to_memory(
        st.session_window_agg(events_stream, gap="30 minutes"), "session_vs_batch"
    ).select("user_id", "session_start", "n_events", "value_sum")
    batch = st.batch_sessionize(events_batch, gap_minutes=30).select(
        "user_id", "session_start", "n_events", "value_sum"
    )
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): state must carry
    across micro-batches — input split into 2 files, 1 file per trigger."""
    from pyspark.sql import functions as F

    src = read_parquet(f"{SF_SMALL}/events.parquet", ns_timestamp_columns=["ts"])(spark)
    half = tmp_path / "stream_in"
    a = src.filter("event_id % 2 = 0")
    b = src.filter("event_id % 2 = 1")
    a.coalesce(1).write.parquet(str(half / "f0"))
    b.coalesce(1).write.parquet(str(half / "f1"))

    stream = (
        spark.readStream.schema(a.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(half / "*"))
    )
    out = st.running_totals(stream, key="user_id", value_col="value")
    query = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_totals")
        .trigger(availableNow=True)
        .start()
    )
    query.processAllAvailable()
    query.stop()
    got = spark.sql(
        "SELECT user_id, max(n_events) AS n, max(value_sum) AS s "
        "FROM stateful_totals GROUP BY user_id"
    )
    expect = src.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s")
    )
    assert got.count() == expect.count()
    assert got.exceptAll(expect).count() == 0


def test_streaming_dedup_collapses_replayed_batches(spark, tmp_path):
    """An at-least-once source replaying every event (same rows in two
    micro-batches) must collapse to exactly-once output under
    dropDuplicatesWithinWatermark — equal to batch dropDuplicates."""
    src = read_parquet(f"{SF_SMALL}/events.parquet", ns_timestamp_columns=["ts"])(spark)
    replay = tmp_path / "replay_in"
    src.coalesce(1).write.parquet(str(replay / "f0"))
    src.coalesce(1).write.parquet(str(replay / "f1"))  # the replay

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(replay / "*"))
    )
    deduped = st.streaming_dedup(stream, keys=["event_id"], watermark="10 days")
    out = st.run_stream_to_memory(deduped, "stream_dedup", output_mode="append")
    assert out.count() == src.count()  # every duplicate collapsed
    assert out.select("event_id").distinct().count() == src.count()


def test_stream_static_join_matches_batch(spark, events_batch, events_stream):
    """Stream-static broadcast enrichment must equal the batch join."""
    static_dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"), ("purchase", "revenue")],
        "event_type string, category string",
    )
    joined = st.stream_static_join(events_stream, static_dim, on="event_type")
    streamed = st.run_stream_to_memory(
        joined.select("event_id", "event_type", "category"),
        "stream_static",
        output_mode="append",
    )
    batch = events_batch.join(static_dim, "event_type").select(
        "event_id", "event_type", "category"
    )
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0


def test_stream_to_files_exactly_once_restart(spark, tmp_path):
    """File sink + checkpoint: a restart with the same checkpoint must not
    re-emit already-committed batches; new input is picked up."""
    from mini_etl_spark.streaming.events import stream_to_files

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    spark.range(100).withColumnRenamed("id", "v").coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    stream = spark.readStream.schema("v bigint").parquet(str(src))
    stream_to_files(stream, out, ckpt)
    assert spark.read.parquet(out).count() == 100

    # restart with NO new input: nothing may be re-emitted
    stream2 = spark.readStream.schema("v bigint").parquet(str(src))
    stream_to_files(stream2, out, ckpt)
    assert spark.read.parquet(out).count() == 100

    # append new input, restart again: only the delta lands
    spark.range(100, 130).withColumnRenamed("id", "v").coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    stream3 = spark.readStream.schema("v bigint").parquet(str(src))
    stream_to_files(stream3, out, ckpt)
    got = sorted(r.v for r in spark.read.parquet(out).collect())
    assert got == list(range(130))


def test_streaming_corpus_quality_filter(spark, tmp_path):
    """The text operators are pure column expressions, so the corpus
    quality/language gate runs unchanged under Structured Streaming —
    stream-filter a document feed and compare against the batch twin."""
    from pyspark.sql import functions as F

    from mini_etl_spark.functions.text import add_text_features
    from mini_etl_spark.streaming.events import run_stream_to_memory

    src = tmp_path / "docfeed"
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.mode("overwrite").parquet(str(src))

    def gate(df):
        feats = add_text_features(df)
        return feats.filter(
            (F.col("quality") >= 0.3) & (F.col("lang_id") == "en")
        ).select("doc_id", "lang_id", "quality")

    stream = spark.readStream.schema(docs.schema).parquet(str(src))
    got = run_stream_to_memory(
        gate(stream), "corpus_gate", output_mode="append"
    ).collect()
    want = gate(docs).collect()
    assert sorted(r["doc_id"] for r in got) == sorted(r["doc_id"] for r in want)
    assert len(want) > 0


def test_stream_stream_join_matches_batch(spark, events_batch, events_stream):
    """Watermarked stream-stream attribution join (clicks within 1 hour of
    a view by the same user) must equal the batch join with the same
    time-range predicate."""
    views = events_stream.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    clicks = events_stream.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    joined = st.stream_stream_join(
        views, clicks, on="user_id", within="1 hour", left_watermark="10 days",
        right_watermark="10 days",
    ).select("event_id", "event_id_r")
    got = st.run_stream_to_memory(joined, "ss_join", output_mode="append")

    bv = events_batch.filter(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("ts"), F.col("event_id")
    )
    bc = events_batch.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("user_id_r"),
        F.col("ts").alias("ts_r"),
        F.col("event_id").alias("event_id_r"),
    )
    want = bv.join(
        bc,
        (F.col("user_id") == F.col("user_id_r"))
        & (F.col("ts_r") >= F.col("ts"))
        & (F.col("ts_r") <= F.col("ts") + F.expr("INTERVAL 1 hour")),
    ).select("event_id", "event_id_r")
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0


def test_stream_upsert_to_parquet_cdc_apply(spark, tmp_path):
    """foreachBatch CDC apply: two micro-batches where the second updates
    half the keys and inserts new ones; the published snapshot must equal
    batch merge_upsert, and a checkpointed restart with no new input must
    not re-merge or flip the snapshot pointer."""
    src = tmp_path / "cdc_src"
    target = str(tmp_path / "cdc_target")
    ckpt = str(tmp_path / "cdc_ckpt")
    src.mkdir()

    b0 = spark.createDataFrame(
        [(i, f"v0_{i}") for i in range(10)], "k int, val string"
    )
    b1 = spark.createDataFrame(
        [(i, f"v1_{i}") for i in range(5, 15)], "k int, val string"
    )
    b0.coalesce(1).write.parquet(str(src / "b0"))
    stream = (
        spark.readStream.schema("k int, val string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    st.stream_upsert_to_parquet(stream, target, ["k"], ckpt)
    first = st.read_latest_snapshot(spark, target)
    assert sorted(r.k for r in first.collect()) == list(range(10))

    b1.coalesce(1).write.parquet(str(src / "b1"))
    stream2 = (
        spark.readStream.schema("k int, val string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    st.stream_upsert_to_parquet(stream2, target, ["k"], ckpt)
    got = {r.k: r.val for r in st.read_latest_snapshot(spark, target).collect()}
    want = {i: (f"v1_{i}" if i >= 5 else f"v0_{i}") for i in range(15)}
    assert got == want

    # restart, no new input: pointer and contents unchanged
    with open(f"{target}/_LATEST") as fh:
        pointer_before = fh.read()
    stream3 = (
        spark.readStream.schema("k int, val string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    st.stream_upsert_to_parquet(stream3, target, ["k"], ckpt)
    with open(f"{target}/_LATEST") as fh:
        assert fh.read() == pointer_before
    got2 = {r.k: r.val for r in st.read_latest_snapshot(spark, target).collect()}
    assert got2 == want


def test_streaming_pipeline_programmatic(spark, tmp_path):
    """The SAME Pipeline surface runs incrementally when the source is a
    stream: checkpointed exactly-once output, restart picks up only new
    input, stats rows come from query progress."""
    from mini_etl_spark.pipeline import Pipeline
    from mini_etl_spark import operators as ops
    from mini_etl_spark.sinks import to_parquet

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    src.mkdir()
    spark.range(100).selectExpr("id AS v").coalesce(1).write.mode("append").parquet(str(src))

    def build():
        return (
            Pipeline("stream_pipe")
            .set_source(read_parquet(str(src), stream=True))
            .add_transformer(ops.filter_rows("v % 2 = 0"))
            .set_sink(to_parquet(out, checkpoint=str(tmp_path / "ckpt")))
        )

    stats = build().run(spark)
    assert stats["rows"] == 50 and stats["errors"] == 0
    assert spark.read.parquet(out).count() == 50

    # restart with no new input: nothing re-emitted
    stats2 = build().run(spark)
    assert stats2["rows"] == 0
    assert spark.read.parquet(out).count() == 50

    # append input; only the delta lands
    spark.range(100, 140).selectExpr("id AS v").coalesce(1).write.mode("append").parquet(str(src))
    stats3 = build().run(spark)
    assert stats3["rows"] == 20
    assert spark.read.parquet(out).count() == 70


def test_streaming_pipeline_from_config(spark, tmp_path):
    """stream: true in YAML turns the declarative pipeline incremental."""
    from mini_etl_spark.config import ConfigLoader

    src = tmp_path / "csrc"
    out = tmp_path / "cout"
    spark.range(60).selectExpr("id AS v").coalesce(1).write.parquet(str(src))
    cfg = tmp_path / "s.yaml"
    cfg.write_text(
        f"""
name: stream_cfg
source: {{type: parquet, path: '{src}', stream: true}}
transformers:
  - {{type: filter, condition: "v < 30"}}
sink: {{type: parquet, path: '{out}', checkpoint: '{tmp_path}/cckpt'}}
"""
    )
    loader = ConfigLoader()
    config = loader.load(cfg)
    assert config.validate() == []
    stats = loader.build_pipeline(config).run(spark)
    assert stats["rows"] == 30
    assert spark.read.parquet(str(out)).count() == 30


def test_stream_upsert_last_write_wins_within_batch(spark, tmp_path):
    """A micro-batch carrying several versions of one key must keep the
    max-order_col row, not an arbitrary one."""
    src = tmp_path / "lww_src"
    target = str(tmp_path / "lww_target")
    src.mkdir()
    rows = [(1, 0, "old"), (1, 5, "new"), (2, 1, "only"), (1, 3, "mid")]
    spark.createDataFrame(rows, "k int, ver int, val string").coalesce(1).write.parquet(
        str(src / "b0")
    )
    stream = spark.readStream.schema("k int, ver int, val string").parquet(str(src / "*"))
    st.stream_upsert_to_parquet(
        stream, target, ["k"], str(tmp_path / "lww_ckpt"), order_col="ver"
    )
    got = {r.k: (r.ver, r.val) for r in st.read_latest_snapshot(spark, target).collect()}
    assert got == {1: (5, "new"), 2: (1, "only")}


def test_single_file_stream_restart_not_reingested(spark, tmp_path):
    """Checkpointed restart over a SINGLE-FILE streaming source must not
    re-ingest the file (the symlink dir is derived from the file path, so
    the checkpoint's seen-files log stays valid across runs)."""
    from mini_etl_spark.pipeline import Pipeline
    from mini_etl_spark.sinks import to_parquet

    f = tmp_path / "single.csv"
    f.write_text("v\n1\n2\n3\n")
    out = str(tmp_path / "sf_out")

    def run():
        from mini_etl_spark.sources import read_csv

        return (
            Pipeline("single_file_stream")
            .set_source(read_csv(str(f), stream=True, infer_schema=True))
            .set_sink(to_parquet(out, checkpoint=str(tmp_path / "sf_ckpt")))
            .run(spark)
        )

    assert run()["rows"] == 3
    assert run()["rows"] == 0  # restart: nothing new
    assert spark.read.parquet(out).count() == 3


def test_batch_sessionize_boundary_matches_session_window(spark):
    """Boundary semantics pinned against the REAL operator: an event at
    exactly prev + gap EXTENDS the session (Spark merges adjacent session
    windows); one microsecond past the gap starts a new one. The batch
    twin must agree on both."""
    import pandas as pd
    from pyspark.sql import functions as F

    def n_sessions(ts_strings):
        pdf = pd.DataFrame(
            {
                "user_id": [1] * len(ts_strings),
                "ts": pd.to_datetime(ts_strings),
                "value": [1.0] * len(ts_strings),
            }
        )
        df = spark.createDataFrame(pdf)
        batch = st.batch_sessionize(df, gap_minutes=30).count()
        sw = (
            df.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .count()
        )
        assert batch == sw, f"batch {batch} != session_window {sw} for {ts_strings}"
        return batch

    # exact boundary merges (10:30 touches [10:00, 10:30))
    assert n_sessions(["2024-01-01 10:00:00.000000", "2024-01-01 10:30:00.000000"]) == 1
    # one microsecond past the gap splits — requires micro precision
    assert n_sessions(["2024-01-01 10:00:00.000000", "2024-01-01 10:30:00.000001"]) == 2


def test_stream_dedup_against_index_two_streams(spark, tmp_path):
    """Continuous-ingestion gate: stream 1 seeds survivors into the index;
    stream 2 (a new query, later 'day') must drop re-submissions of
    stream-1 docs AND corpus docs, and pass novel ones."""
    from mini_etl_spark.functions.dedup_index import minhash_index_write
    from mini_etl_spark.streaming.events import stream_dedup_against_index

    corpus_text = "the quick brown fox jumps over the lazy dog by the river"
    novel1 = "completely new essay about distributed query engines at scale"
    novel2 = "another unseen document describing garden landscaping advice"

    idx = str(tmp_path / "idx")
    corpus = spark.createDataFrame(
        [(1, corpus_text)], "doc_id long, text string"
    )
    minhash_index_write(corpus, idx, num_hashes=32, bands=8)

    src1 = str(tmp_path / "in1")
    spark.createDataFrame(
        [(100, corpus_text), (101, novel1)], "doc_id long, text string"
    ).write.parquet(src1)
    out = str(tmp_path / "out")
    stream1 = spark.readStream.schema("doc_id long, text string").parquet(src1)
    stream_dedup_against_index(
        stream1, idx, out, checkpoint=str(tmp_path / "cp1")
    )
    kept1 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept1 == {101}  # corpus dup dropped, novel doc kept + indexed

    src2 = str(tmp_path / "in2")
    spark.createDataFrame(
        [(200, novel1), (201, novel2)], "doc_id long, text string"
    ).write.parquet(src2)
    stream2 = spark.readStream.schema("doc_id long, text string").parquet(src2)
    stream_dedup_against_index(
        stream2, idx, out, checkpoint=str(tmp_path / "cp2")
    )
    kept_all = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept_all == {101, 201}  # stream-1 survivor now blocks its copy


def test_stream_classify_gate(spark, tmp_path):
    """Streaming model gate: micro-batches score against a persisted NB
    model; only the keep_label class lands in the sink, with label and
    score columns attached."""
    from mini_etl_spark.functions import classify as cl
    from mini_etl_spark.streaming.events import stream_classify_gate

    train = spark.createDataFrame(
        [
            (1, "code", "def main return import module function class"),
            (2, "code", "compile function stack import module error"),
            (3, "news", "election results announced by the government"),
            (4, "news", "the government said election results arrived"),
        ],
        "doc_id long, source string, text string",
    )
    model = cl.nb_train(train, label_col="source")
    mdir = str(tmp_path / "model")
    cl.nb_save(model, mdir)

    src = str(tmp_path / "in")
    spark.createDataFrame(
        [
            (100, "import function module return"),
            (101, "government election results today"),
            (102, "class import module function"),
        ],
        "doc_id long, text string",
    ).write.parquet(src)
    out = str(tmp_path / "out")
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    stream_classify_gate(
        stream, mdir, out, checkpoint=str(tmp_path / "cp"), keep_label="code"
    )
    rows = spark.read.parquet(out).collect()
    assert {r["doc_id"] for r in rows} == {100, 102}
    assert all(r["label"] == "code" for r in rows)
    assert all(r["score"] < 0 for r in rows)  # log-posteriors


def test_stream_cm_update_equals_batch_sketch(spark, tmp_path):
    """Mergeability e2e: the CM table accumulated over two stream drops
    must equal cm_sketch_table over the full corpus in one shot (sketch
    of a union = cell-wise sum), and probes through the published
    snapshot never underestimate."""
    from pyspark.sql import functions as F

    from mini_etl_spark.functions.text import cm_merge, cm_probe, cm_sketch_table
    from mini_etl_spark.streaming import read_latest_snapshot, stream_cm_update

    def _docs(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("alpha beta common words batch text number "),
                F.col("id").cast("string"),
            ).alias("text"),
        )

    src = tmp_path / "docs"
    _docs(0, 40).coalesce(1).write.mode("append").parquet(str(src))

    def _run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(str(src))
        )
        stream_cm_update(
            stream,
            str(tmp_path / "cm"),
            str(tmp_path / "ckpt"),
            depth=4,
            width=256,
        )

    _run()
    _docs(100, 130).coalesce(1).write.mode("append").parquet(str(src))
    _run()

    live = read_latest_snapshot(spark, str(tmp_path / "cm"))
    assert live is not None
    batch = cm_sketch_table(
        spark.read.parquet(str(src)), depth=4, width=256
    )
    got = sorted(map(tuple, live.collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want  # exact mergeability, cell for cell

    est = {r.token: r.cm_estimate for r in
           cm_probe(live, ["alpha", "common", "absent"], depth=4, width=256).collect()}
    assert est["alpha"] >= 70      # true count 70, never underestimated
    assert est["common"] >= 70
    assert est["absent"] >= 0


def test_stream_drift_gate_matches_batch_and_refuses(spark, tmp_path):
    """Streaming PSI gate twin: a staged two-batch run (maxFilesPerTrigger=1)
    where batch 1 matches the baseline and batch 2 is shifted — batch 1
    lands in the sink with its audit report equal to the BATCH monitor's
    report (stream == batch equivalence at pinned lo/hi), batch 2 fails
    the query and leaves nothing behind."""
    import pytest as pt

    from mini_etl_spark import maintenance as mt
    from mini_etl_spark.streaming.events import stream_drift_gate

    base = str(tmp_path / "baseline")
    spark.range(1000).selectExpr(
        "id", "CAST(id % 100 AS DOUBLE) AS v"
    ).write.parquet(base)

    src = str(tmp_path / "in")
    ok = spark.range(2000, 2500).selectExpr("id", "CAST(id % 100 AS DOUBLE) AS v")
    ok.coalesce(1).write.mode("append").parquet(src)
    out = str(tmp_path / "out")
    rep = str(tmp_path / "rep")
    cp = str(tmp_path / "cp")

    def run():
        stream = (
            spark.readStream.schema("id long, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return stream_drift_gate(
            stream, base, out, cp, "v", max_psi=0.1,
            lo=0.0, hi=100.0, report_path=rep,
        )

    run()
    assert spark.read.parquet(out).count() == 500
    srep = spark.read.parquet(rep)
    assert srep.select("batch_id").distinct().count() == 1
    # stream report == batch monitor report at the same pinned range
    batch_rows = sorted(
        (r["bin"], r["count_a"], r["count_b"], round(r["psi_contrib"], 9))
        for r in mt.distribution_drift(
            spark.read.parquet(base), ok, "v", bins=10, lo=0.0, hi=100.0
        ).collect()
    )
    stream_rows = sorted(
        (r["bin"], r["count_a"], r["count_b"], round(r["psi_contrib"], 9))
        for r in srep.collect()
    )
    assert stream_rows == batch_rows

    # batch 2: shifted — the query fails and nothing is appended
    spark.range(3000, 3500).selectExpr(
        "id", "CAST(70 + id % 100 AS DOUBLE) AS v"
    ).coalesce(1).write.mode("append").parquet(src)
    with pt.raises(Exception, match="exceeds max_psi"):
        run()
    assert spark.read.parquet(out).count() == 500
    assert spark.read.parquet(rep).select("batch_id").distinct().count() == 1


def test_stream_drift_gate_categorical(spark, tmp_path):
    """Categorical mode: value-mix gate over a stream; same-mix batch
    passes, a collapsed-mix batch is refused."""
    import pytest as pt

    from mini_etl_spark.streaming.events import stream_drift_gate

    base = str(tmp_path / "baseline")
    spark.range(400).selectExpr(
        "id", "CAST(id % 4 AS STRING) AS src"
    ).write.parquet(base)

    src_dir = str(tmp_path / "in")
    spark.range(400, 600).selectExpr(
        "id", "CAST(id % 4 AS STRING) AS src"
    ).coalesce(1).write.mode("append").parquet(src_dir)
    out = str(tmp_path / "out")

    def run(cp):
        stream = (
            spark.readStream.schema("id long, src string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        return stream_drift_gate(
            stream, base, out, str(tmp_path / cp), "src",
            max_psi=0.1, mode="categorical",
        )

    run("cp1")
    assert spark.read.parquet(out).count() == 200

    spark.range(700, 900).selectExpr(
        "id", "'only_one' AS src"
    ).coalesce(1).write.mode("append").parquet(src_dir)
    with pt.raises(Exception, match="exceeds max_psi"):
        run("cp1")
    assert spark.read.parquet(out).count() == 200

    with pt.raises(ValueError, match="mode must be"):
        stream_drift_gate(
            spark.readStream.schema("id long, src string").parquet(src_dir),
            base, out, str(tmp_path / "cpx"), "src", 0.1, mode="bogus",
        )


def test_stream_drift_gate_empty_batch_is_skipped_not_poisoned(spark, tmp_path):
    """An empty micro-batch (all rows dropped upstream) must commit as a
    no-op — gating it would read as maximal drift (every baseline bin ->
    epsilon), raise, and replay forever: a poison pill no baseline
    refresh can clear."""
    from mini_etl_spark.streaming.events import stream_drift_gate

    base = str(tmp_path / "baseline")
    spark.range(500).selectExpr(
        "id", "CAST(id % 100 AS DOUBLE) AS v"
    ).write.parquet(base)

    src = str(tmp_path / "in")
    # file 1: survives the upstream filter; file 2: fully filtered out
    spark.range(1000, 1400).selectExpr(
        "id", "CAST(id % 100 AS DOUBLE) AS v"
    ).coalesce(1).write.mode("append").parquet(src)
    spark.range(5000, 5200).selectExpr(
        "id", "CAST(-1 AS DOUBLE) AS v"
    ).coalesce(1).write.mode("append").parquet(src)
    out = str(tmp_path / "out")

    stream = (
        spark.readStream.schema("id long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .filter("v >= 0")  # empties the second file's batch entirely
    )
    stream_drift_gate(
        stream, base, out, str(tmp_path / "cp"), "v",
        max_psi=0.1, lo=0.0, hi=100.0,
    )
    # the non-empty batch landed; the empty one neither raised nor wrote
    assert spark.read.parquet(out).count() == 400


def test_stream_drift_gate_replay_is_exactly_once(spark, tmp_path):
    """Kill-and-replay: deleting a batch's checkpoint COMMIT marker (but
    keeping its offsets entry) reproduces the exact at-least-once window
    — crash after the output write, before the checkpoint commit. On
    restart the batch re-executes with the SAME batch id; the per-batch
    dynamic-overwrite partition must replace its earlier attempt, never
    append a duplicate (pre-r11 this sink was a bare mode("append") and
    the replay doubled the batch; VERDICT r10 #3 / ADVICE r10)."""
    import os

    from mini_etl_spark.streaming.events import stream_drift_gate

    base = str(tmp_path / "baseline")
    spark.range(1000).selectExpr(
        "id", "CAST(id % 100 AS DOUBLE) AS v"
    ).write.parquet(base)

    src = str(tmp_path / "in")
    spark.range(2000, 2500).selectExpr(
        "id", "CAST(id % 100 AS DOUBLE) AS v"
    ).coalesce(1).write.mode("append").parquet(src)
    spark.range(4000, 4300).selectExpr(
        "id", "CAST(id % 100 AS DOUBLE) AS v"
    ).coalesce(1).write.mode("append").parquet(src)
    out = str(tmp_path / "out")
    rep = str(tmp_path / "rep")
    cp = str(tmp_path / "cp")

    def run():
        stream = (
            spark.readStream.schema("id long, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return stream_drift_gate(
            stream, base, out, cp, "v", max_psi=0.1,
            lo=0.0, hi=100.0, report_path=rep,
        )

    run()
    assert spark.read.parquet(out).count() == 800
    assert spark.read.parquet(rep).select("batch_id").distinct().count() == 2

    # simulate the crash window: batch 1's output is on disk but its
    # checkpoint commit never landed → restart replays batch 1
    # (the Hadoop .crc sidecar must go with it or the re-commit's
    # rename fails on the stale checksum)
    os.remove(os.path.join(cp, "commits", "1"))
    crc = os.path.join(cp, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run()
    got = spark.read.parquet(out)
    assert got.count() == 800  # replay replaced, not duplicated
    per_batch = {
        r["batch_id"]: r["n"]
        for r in got.groupBy("batch_id").agg(F.count("*").alias("n")).collect()
    }
    assert sorted(per_batch.values()) == [300, 500]
    # the audit report replays the same way
    assert spark.read.parquet(rep).groupBy("batch_id").count().filter(
        "count != 10"
    ).isEmpty()
    # ids survive intact — no row lost or doubled
    assert got.select("id").distinct().count() == 800


def test_stream_drift_gate_default_range_is_stationary(spark, tmp_path):
    """With lo/hi unset the bin range comes from the BASELINE alone: a
    mean-shifted batch whose own outlier would stretch a shared
    (baseline∪batch) range until both epochs collapse into bin 0 — the
    pre-r11 default, PSI ≈ 0, batch accepted — must now clamp into the
    baseline's edge bin and be refused."""
    import pytest as pt

    from mini_etl_spark.streaming.events import stream_drift_gate

    base = str(tmp_path / "baseline")
    spark.range(1000).selectExpr(
        "id", "CAST(id % 100 AS DOUBLE) AS v"
    ).write.parquet(base)

    src = str(tmp_path / "in")
    shifted = spark.range(2000, 2200).selectExpr(
        "id", "CAST(500 + id % 100 AS DOUBLE) AS v"
    ).union(
        spark.range(1).selectExpr("9999999 AS id", "CAST(1e9 AS DOUBLE) AS v")
    )
    shifted.coalesce(1).write.mode("append").parquet(src)
    out = str(tmp_path / "out")

    stream = spark.readStream.schema("id long, v double").parquet(src)
    with pt.raises(Exception, match="exceeds max_psi"):
        stream_drift_gate(
            stream, base, out, str(tmp_path / "cp"), "v", max_psi=0.25
        )
    import os

    assert not os.path.exists(out) or spark.read.parquet(out).count() == 0

    # an empty-column baseline cannot seed a range: loud refusal
    ebase = str(tmp_path / "ebase")
    spark.range(10).selectExpr(
        "id", "CAST(NULL AS DOUBLE) AS v"
    ).write.parquet(ebase)
    stream2 = spark.readStream.schema("id long, v double").parquet(src)
    with pt.raises(Exception, match="no non-null values"):
        stream_drift_gate(
            stream2, ebase, out, str(tmp_path / "cp2"), "v", max_psi=0.25
        )


def _force_replay(cp: str, batch: int) -> None:
    """Simulate the foreachBatch crash window: delete the batch's
    checkpoint COMMIT marker (keeping its offsets entry) so restart
    re-executes that batch id — crash after the sink write, before the
    checkpoint commit. The Hadoop .crc sidecar must go too or the
    re-commit's rename fails on the stale checksum."""
    import os

    os.remove(os.path.join(cp, "commits", str(batch)))
    crc = os.path.join(cp, "commits", f".{batch}.crc")
    if os.path.exists(crc):
        os.remove(crc)


def test_stream_classify_gate_replay_is_exactly_once(spark, tmp_path):
    """Kill-and-replay for the model gate (mirrors the drift gate's
    test): replaying a batch must REPLACE its batch_id partition, never
    append a duplicate — pre-r12 this sink was a bare mode('append') and
    its docstring overclaimed replay-idempotence (VERDICT r11 #1)."""
    from mini_etl_spark.functions import classify as cl
    from mini_etl_spark.streaming.events import stream_classify_gate

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

    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(100, "import function module return"),
         (101, "government election results today")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(200, "class import module function"),
         (201, "def return import class")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        stream_classify_gate(stream, mdir, out, cp, keep_label="code")

    run()
    got = spark.read.parquet(out)
    assert {r["doc_id"] for r in got.collect()} == {100, 200, 201}
    assert got.select("batch_id").distinct().count() == 2

    _force_replay(cp, 1)
    run()
    got = spark.read.parquet(out)
    assert got.count() == 3  # replay replaced its partition, no dupes
    assert {r["doc_id"] for r in got.collect()} == {100, 200, 201}
    assert all(r["label"] == "code" for r in got.collect())


def test_stream_lm_gate_replay_is_exactly_once(spark, tmp_path):
    """Kill-and-replay for the perplexity gate — same contract as the
    classify/drift gates (VERDICT r11 #1)."""
    from mini_etl_spark.functions import lm
    from mini_etl_spark.streaming.events import stream_lm_gate

    train = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)],
        "doc_id long, text string",
    )
    mdir = str(tmp_path / "lm_model")
    lm.train_bigram_lm(train).write.parquet(mdir)

    fluent = "the quick brown fox"
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(100, fluent), (101, "zz qq xx yy ww")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(200, fluent)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)

    batch = spark.createDataFrame([(0, fluent)], "doc_id long, text string")
    cut = (
        lm.bigram_logprob_score(batch, spark.read.parquet(mdir))
        .collect()[0]
        .perplexity
        + 0.5
    )

    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        stream_lm_gate(stream, mdir, out, cp, max_perplexity=cut)

    run()
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {100, 200}

    _force_replay(cp, 1)
    run()
    got = spark.read.parquet(out)
    assert got.count() == 2  # no duplicate of doc 200
    per_batch = {
        r["batch_id"]: r["n"]
        for r in got.groupBy("batch_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_batch == {0: 1, 1: 1}


def test_stream_dedup_against_index_replay_directions(spark, tmp_path):
    """The dedup gate's documented failure directions (VERDICT r11 #2):

    default (at-most-once): a replayed batch re-probes, finds itself
    indexed, and appends NOTHING — out_path never duplicates; a survivor
    stranded 'indexed but unwritten' by the crash window is dropped on
    replay (never written), and the drop is observable in the index.

    at_least_once=True: the stranded state is the opposite ('written but
    unindexed'), and the replay appends the survivor AGAIN — duplicates
    possible, drops impossible."""
    from mini_etl_spark.functions.dedup_index import (
        minhash_index_filter,
        minhash_index_write,
    )
    from mini_etl_spark.streaming.events import stream_dedup_against_index

    corpus_text = "the quick brown fox jumps over the lazy dog by the river"
    novel1 = "completely new essay about distributed query engines at scale"
    novel2 = "another unseen document describing garden landscaping advice"
    novel3 = "a third fresh text on watercolor painting techniques at home"

    idx = str(tmp_path / "idx")
    corpus = spark.createDataFrame(
        [(1, corpus_text)], "doc_id long, text string"
    )
    minhash_index_write(corpus, idx, num_hashes=32, bands=8)

    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(100, corpus_text), (101, novel1)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(200, novel2)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        stream_dedup_against_index(stream, idx, out, checkpoint=cp)

    run()
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {101, 200}

    # replay batch 1: doc 200 is already indexed → re-probe drops it →
    # nothing appended → no duplicate
    _force_replay(cp, 1)
    run()
    assert spark.read.parquet(out).count() == 2

    # the 'indexed but unwritten' stranded state: index a survivor the
    # way the gate's first write does, then let the stream see it as a
    # NEW batch — the replayed probe finds it indexed and DROPS it
    stranded = spark.createDataFrame(
        [(300, novel3)], "doc_id long, text string"
    )
    minhash_index_filter(stranded, idx, append_survivors=True).count()
    stranded.coalesce(1).write.mode("append").parquet(src)
    run()
    kept_ids = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert 300 not in kept_ids  # dropped, not duplicated (at-most-once)
    # ...and the drop is observable: the index knows doc 300
    import os

    idx_ids = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(idx, "signatures"))
        .select("doc_id")
        .collect()
    }
    assert 300 in idx_ids

    # at_least_once=True: simulate the opposite stranded state — output
    # written, index append lost — by pre-seeding out_path; the replay
    # (fresh checkpoint) keeps the doc again → duplicate, never a drop
    idx2 = str(tmp_path / "idx2")
    minhash_index_write(corpus, idx2, num_hashes=32, bands=8)
    src2 = str(tmp_path / "in2")
    spark.createDataFrame(
        [(400, novel1)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src2)
    out2 = str(tmp_path / "out2")
    spark.createDataFrame(
        [(400, novel1)], "doc_id long, text string"
    ).write.mode("append").parquet(out2)  # the crash-stranded output
    stream2 = spark.readStream.schema("doc_id long, text string").parquet(src2)
    stream_dedup_against_index(
        stream2, idx2, out2, checkpoint=str(tmp_path / "cp2"),
        at_least_once=True,
    )
    dup = spark.read.parquet(out2).filter(F.col("doc_id") == 400)
    assert dup.count() == 2  # duplicated, not dropped
    idx2_ids = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(idx2, "signatures"))
        .select("doc_id")
        .collect()
    }
    assert 400 in idx2_ids  # index append landed after the output


def test_gates_refuse_pre_partition_output_layout(spark, tmp_path):
    """Migration guard (ADVICE r11): resuming a batch_id-partitioned gate
    over an out_path holding ROOT-LEVEL part files (the plain-append era
    layout) would break parquet partition discovery — the gate must
    refuse up front with a migration message, for out_path AND
    report_path, before any query starts."""
    import pytest as pt

    from mini_etl_spark.streaming.events import (
        stream_classify_gate,
        stream_drift_gate,
        stream_lm_gate,
    )

    import os

    old_out = str(tmp_path / "old_out")
    spark.range(3).write.parquet(old_out)  # root-level part files
    base = str(tmp_path / "base")
    spark.range(100).selectExpr("CAST(id AS DOUBLE) AS v").write.parquet(base)
    os.makedirs(str(tmp_path / "never_read"))
    os.makedirs(str(tmp_path / "never_read2"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(tmp_path / "never_read")
    )

    for gate, kwargs in [
        (stream_classify_gate, dict(model_path="m", keep_label="x")),
        (stream_lm_gate, dict(model_path="m", max_perplexity=1.0)),
        (stream_drift_gate, dict(baseline_path=base, column="v", max_psi=1.0)),
    ]:
        with pt.raises(ValueError, match="root-level"):
            gate(stream, out_path=old_out, checkpoint=str(tmp_path / "cp"),
                 **kwargs)

    # report_path is guarded the same way
    with pt.raises(ValueError, match="root-level"):
        stream_drift_gate(
            stream, base, str(tmp_path / "fresh_out"), str(tmp_path / "cp"),
            "v", max_psi=1.0, report_path=old_out,
        )

    # a batch_id input column collides with the overwrite partition
    bad = spark.readStream.schema("batch_id long, text string").parquet(
        str(tmp_path / "never_read2")
    )
    with pt.raises(ValueError, match="batch_id"):
        stream_lm_gate(
            bad, "m", str(tmp_path / "o"), str(tmp_path / "cp"),
            max_perplexity=1.0,
        )

    # an already-partitioned (batch_id=N) output resumes fine: the guard
    # must not false-positive on the gate's own layout
    import os

    ok_out = str(tmp_path / "ok_out")
    os.makedirs(os.path.join(ok_out, "batch_id=0"))
    from mini_etl_spark.streaming.events import _guard_batch_partition_sink

    _guard_batch_partition_sink(
        spark.range(1).selectExpr("id AS doc_id"), "g", ok_out, None
    )


def test_stream_drift_gate_constant_baseline_raises(spark, tmp_path):
    """ADVICE r11: a CONSTANT baseline column yields a zero-width derived
    bin range — one bucket, PSI ~ 0 for ANY batch, silent false negative.
    The gate must refuse and demand explicit lo/hi; pinned lo/hi over the
    same baseline still gates (shifted batch clamps into an edge bin)."""
    import pytest as pt

    from mini_etl_spark.streaming.events import stream_drift_gate

    base = str(tmp_path / "base")
    spark.range(1000).selectExpr("CAST(5.0 AS DOUBLE) AS v").write.parquet(base)
    src = str(tmp_path / "in")
    spark.range(200).selectExpr(
        "CAST(500.0 AS DOUBLE) AS v"
    ).coalesce(1).write.parquet(src)
    out = str(tmp_path / "out")

    stream = spark.readStream.schema("v double").parquet(src)
    with pt.raises(Exception, match="zero-width"):
        stream_drift_gate(
            stream, base, out, str(tmp_path / "cp"), "v", max_psi=0.1
        )
    import os

    assert not os.path.exists(out) or spark.read.parquet(out).count() == 0

    # with a pinned design range the same mean-shifted batch is refused
    # as DRIFT (clamps into the hi edge bin), not accepted
    stream2 = spark.readStream.schema("v double").parquet(src)
    with pt.raises(Exception, match="exceeds max_psi"):
        stream_drift_gate(
            stream2, base, out, str(tmp_path / "cp2"), "v", max_psi=0.1,
            lo=0.0, hi=10.0,
        )
