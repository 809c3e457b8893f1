"""Round-6 hardening regressions — one test per ADVICE.md finding:

1. robust_outliers: NULL group keys keep their own group stats (null-safe
   stats joins) instead of vanishing through an inner join.
2. to_training_shards token mode: a payload column named ``n_tokens``
   survives the write (internal ``__n_tokens`` assignment column).
3. token_balanced_shard_ids with_total: trailing zero-token rows clamp
   onto the final shard; empty input reports 0 shards.
4. dedup_conversations: keyless rows with NULL ids never collapse.
5. personalized pagerank: a fully-absent seed list fails loudly.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def test_robust_outliers_null_group_rows_kept(spark):
    """ADVICE r5: rows whose group key is NULL must not be dropped by the
    stats joins — flag mode returns EVERY row, and the NULL group gets
    its own median/MAD (its spike flags, its bulk does not)."""
    from mini_etl_spark.maintenance import robust_outliers

    rows = [(i, "g", 100.0 + (i % 10)) for i in range(50)]
    rows += [(100 + i, None, 200.0 + (i % 10)) for i in range(50)]
    rows += [(900, "g", 5000.0), (901, None, 9000.0)]
    df = spark.createDataFrame(rows, "id long, grp string, x double")

    flagged = robust_outliers(df, "x", group_col="grp", mode="flag").collect()
    assert len(flagged) == 102  # every-row contract incl. NULL-group rows
    by_id = {r.id: r for r in flagged}
    assert by_id[901].is_outlier  # NULL-group spike vs NULL-group stats
    assert by_id[900].is_outlier
    assert not by_id[120].is_outlier  # NULL-group bulk stays clean
    # NULL-group rows carry the NULL group's own stats, not another's
    assert by_id[120].group_median == by_id[901].group_median

    out = robust_outliers(df, "x", group_col="grp").collect()
    assert sorted(r.id for r in out) == [900, 901]


def test_shards_sink_preserves_payload_n_tokens(spark, tmp_path):
    """ADVICE r5: an input column named n_tokens (lm_score et al. emit
    one) must survive the token-balanced write — the sink's internal
    token-count column uses a prefixed name, so .drop() cannot take the
    payload copy with it."""
    from mini_etl_spark.sinks.shards import to_training_shards

    rows = [(i, "tok " * 10, i * 7) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_tokens long")
    path = str(tmp_path / "tb_payload")
    to_training_shards(path, tokens_per_shard=50, fmt="parquet")(df)
    back = spark.read.parquet(path)
    assert "n_tokens" in back.columns
    got = {r.doc_id: r.n_tokens for r in back.collect()}
    assert got == {i: i * 7 for i in range(20)}


def test_token_shard_ids_collision_guard(spark):
    """keep_columns=True with a conflicting token-count (or shard) column
    raises instead of silently shadowing the payload."""
    from mini_etl_spark.functions.splits import token_balanced_shard_ids

    df = spark.createDataFrame(
        [(1, "a b", 9)], "doc_id long, text string, n_tokens long"
    )
    with pytest.raises(ValueError, match="shadow"):
        token_balanced_shard_ids(df, keep_columns=True)
    # a fresh internal name threads through cleanly
    out = token_balanced_shard_ids(
        df, keep_columns=True, token_count_col="__nt"
    ).collect()
    assert out[0].n_tokens == 9 and out[0]["__nt"] == 2


def test_token_shard_ids_trailing_zero_token_clamp(spark):
    """ADVICE r5: a zero-token row sorting LAST in md5 order when the
    running total is an exact multiple of tokens_per_shard must clamp to
    the final shard — n_shards == 1 + max(shard) always."""
    from mini_etl_spark.functions.splits import token_balanced_shard_ids

    # Craft the layout deterministically: same okey formula as the
    # implementation (md5("42\\x1f<id>")); the id sorting LAST gets the
    # empty text, everything else 10 tokens -> total 290, tps 29 ->
    # exactly 10 shards, zero-token row lands at running == 290.
    ids = list(range(30))
    okey = lambda i: hashlib.md5(f"42\x1f{i}".encode()).hexdigest()
    last = max(ids, key=okey)
    rows = [(i, "" if i == last else "tok " * 10) for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out, n_shards = token_balanced_shard_ids(
        df, tokens_per_shard=29, with_total=True
    )
    got = {r.doc_id: r.shard for r in out.collect()}
    assert n_shards == 10
    assert max(got.values()) == n_shards - 1  # was n_shards pre-fix
    assert got[last] == n_shards - 1  # clamped onto the final shard

    empty = spark.createDataFrame([], "doc_id long, text string")
    eout, en = token_balanced_shard_ids(empty, with_total=True)
    assert en == 0 and eout.count() == 0

    # all-zero-token corpus still occupies one shard
    zdf = spark.createDataFrame([(1, ""), (2, None)], "doc_id long, text string")
    zout, zn = token_balanced_shard_ids(zdf, with_total=True)
    assert zn == 1 and {r.shard for r in zout.collect()} == {0}


def test_dedup_conversations_null_id_keyless_rows_kept(spark):
    """ADVICE r5: keyless rows (NULL messages) with NULL ids must each
    survive — the fallback key coalesces to a per-row synthetic id, so
    they cannot pool in one NULL partition and collapse."""
    from mini_etl_spark.functions.conversations import dedup_conversations

    msg_t = "array<struct<role:string,content:string>>"
    rows = [
        (1, [("user", "hi"), ("assistant", "yo")]),
        (2, [("user", "hi"), ("assistant", "yo")]),  # dup of 1
        (None, None),  # keyless + NULL id
        (None, None),  # keyless + NULL id — must ALSO survive
    ]
    df = spark.createDataFrame(rows, f"conv_id long, messages {msg_t}")
    out = dedup_conversations(df, by="full").collect()
    assert sorted((r.conv_id is None, r.conv_id or 0) for r in out) == [
        (False, 1), (True, 0), (True, 0)
    ]


def test_personalized_pagerank_stale_seeds_fail_loudly(spark):
    """ADVICE r5: seeds entirely absent from the graph raise (otherwise
    isin matches nothing and every rank decays toward 0); partial
    overlap still runs, dropping only the absent seeds' share."""
    from mini_etl_spark.functions.graph import pagerank

    e = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src int, dst int")
    with pytest.raises(ValueError, match="none of the personalized seeds"):
        pagerank(e, iterations=2, personalized=[99, 100])
    ranks = {r["node"]: r["rank"]
             for r in pagerank(e, iterations=5, personalized=[1, 99]).collect()}
    assert set(ranks) == {1, 2, 3}
    assert ranks[1] > ranks[3] > 0  # seed-proximate ordering survives


def test_percentile_ops_approx_path(spark):
    """r6: exact=False swaps exact percentile for percentile_approx
    (mergeable sketch) with the same shape — outlier verdicts on a
    clean-bulk-plus-spike corpus agree, and quantile_buckets keeps its
    invariants (buckets-1 monotone boundaries, near-equal frequencies)."""
    from mini_etl_spark.maintenance import quantile_buckets, robust_outliers

    rows = [(i, "g", 100.0 + (i % 10)) for i in range(200)]
    rows += [(900, "g", 5000.0), (901, "g", 0.5)]
    df = spark.createDataFrame(rows, "id long, grp string, x double")
    approx = robust_outliers(df, "x", group_col="grp", exact=False).collect()
    assert sorted(r.id for r in approx) == [900, 901]

    vals = spark.createDataFrame(
        [(i, float(i)) for i in range(1000)], "id long, v double"
    )
    out = quantile_buckets(vals, "v", buckets=10, exact=False)
    counts = {r.qbucket: r.n for r in
              out.groupBy("qbucket").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(range(10))  # all 10 buckets populated
    assert all(50 <= c <= 200 for c in counts.values())  # near-equal freq
    # monotone: bucket id non-decreasing in v
    seq = [r.qbucket for r in out.orderBy("v").collect()]
    assert seq == sorted(seq)


def _file_stream(spark, src, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )


def test_stream_token_shards_equals_batch_prefix_sum(spark, tmp_path):
    """r6: the streaming sharder over batches B1,B2 must equal the global
    prefix sum over (B1 in md5 order, then B2 in md5 order) — computed
    here with an independent pure-Python oracle. The offset state carries
    across separately-started runs on one checkpoint, and a partially
    filled shard is continued, not restarted."""
    from mini_etl_spark.streaming import stream_token_shards

    schema = "doc_id long, text string"
    src = tmp_path / "sts_src"
    out = str(tmp_path / "sts_out")
    ckpt = str(tmp_path / "sts_ckpt")
    src.mkdir()
    b1_rows = [(i, "tok " * (5 + i % 7)) for i in range(20)]
    b2_rows = [(100 + i, "tok " * (3 + i % 5)) for i in range(15)]
    tps = 37

    spark.createDataFrame(b1_rows, schema).coalesce(1).write.parquet(str(src / "b1"))
    stream_token_shards(_file_stream(spark, src, schema), out, ckpt,
                        tokens_per_shard=tps, seed=42)
    spark.createDataFrame(b2_rows, schema).coalesce(1).write.parquet(str(src / "b2"))
    stream_token_shards(_file_stream(spark, src, schema), out, ckpt,
                        tokens_per_shard=tps, seed=42)

    got = {r.doc_id: r.shard for r in spark.read.parquet(out).collect()}

    # independent oracle: md5 layout within each batch, arrival order
    # across batches, one global running total
    okey = lambda i: hashlib.md5(f"42\x1f{i}".encode()).hexdigest()
    cum, want = 0, {}
    for batch in (b1_rows, b2_rows):
        for i, text in sorted(batch, key=lambda r: (okey(r[0]), r[0])):
            n = len(text.split())
            want[i] = cum // tps
            cum += n
    assert got == want
    # batch 2 continued the shard batch 1 left partially filled
    b1_max = max(want[i] for i, _ in b1_rows)
    b2_min = min(want[i] for i, _ in b2_rows)
    assert b2_min == b1_max


def test_stream_temperature_mix_equals_batch(spark, tmp_path):
    """r6: recompute-on-append — after the stream drains, the latest
    snapshot equals the batch temperature_mix over the full input,
    however the input was batched."""
    from mini_etl_spark.functions.mixing import temperature_mix
    from mini_etl_spark.streaming import read_latest_snapshot, stream_temperature_mix

    schema = "doc_id long, source string, text string"
    src = tmp_path / "stm_src"
    out = str(tmp_path / "stm_out")
    ckpt = str(tmp_path / "stm_ckpt")
    src.mkdir()
    rows = [(i, "web" if i % 10 else "code", f"doc {i}") for i in range(120)]
    b1, b2 = rows[:70], rows[70:]

    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "b1"))
    stream_temperature_mix(_file_stream(spark, src, schema), out, ckpt,
                           budget=60, alpha=0.3, seed=7)
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "b2"))
    stream_temperature_mix(_file_stream(spark, src, schema), out, ckpt,
                           budget=60, alpha=0.3, seed=7)

    snap = read_latest_snapshot(spark, out)
    got = sorted((r.doc_id, r.source, r.epoch) for r in snap.collect())
    full = spark.createDataFrame(rows, schema)
    want = sorted(
        (r.doc_id, r.source, r.epoch)
        for r in temperature_mix(full, 60, alpha=0.3, seed=7).collect()
    )
    assert got == want and len(want) > 0
    # low-resource source (code) is boosted above its natural share
    code_share = sum(1 for _, s, _ in got if s == "code") / len(got)
    assert code_share > 12 / 120


def test_auto_frequency_cap_matches_manual_on_boilerplate_corpus(spark):
    """r6: max_*_freq="auto" derives the hot-key cap from the observed
    doc-frequency distribution — on a boilerplate-heavy corpus it must cut
    the same stop-shingles as a hand-tuned cap (identical pair sets) while
    an uncapped run drowns in boilerplate-only pairs."""
    from mini_etl_spark.functions.dedup import jaccard_pairs
    from mini_etl_spark.operators.skew import auto_frequency_cap

    # 300 docs, each ~24 unique tokens + one shared 8-token boilerplate
    # sentence (doc-freq 300 for its shingles; everything else freq 1-2);
    # two planted near-dup pairs overlap heavily in unique content.
    boiler = "click here to accept cookies and privacy terms"
    rows = []
    for i in range(300):
        uniq = " ".join(f"w{i}x{j}" for j in range(24))
        rows.append((i, f"{uniq} {boiler}"))
    rows.append((1000, rows[5][1]))   # exact dup of 5 -> jaccard 1.0
    rows.append((1001, rows[7][1] + " extra tail tokens here"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    want = {(5, 1000), (7, 1001)}
    auto = {(r.id_a, r.id_b)
            for r in jaccard_pairs(df, threshold=0.3, max_shingle_freq="auto").collect()}
    manual = {(r.id_a, r.id_b)
              for r in jaccard_pairs(df, threshold=0.3, max_shingle_freq=100).collect()}
    assert auto == manual == want
    # without any cap, boilerplate-only pairs flood the join
    uncapped = jaccard_pairs(df, threshold=0.1, max_shingle_freq=None).count()
    capped = jaccard_pairs(df, threshold=0.1, max_shingle_freq="auto").count()
    assert uncapped > 1000 and capped < 10

    # the helper itself: known distribution -> multiplier x quantile,
    # floored; empty frame -> floor
    freq = spark.createDataFrame(
        [(f"k{i}", 1 if i else 500) for i in range(1000)], "k string, __f long"
    )
    cap = auto_frequency_cap(freq, floor=8)
    assert 8 <= cap < 500  # the freq-500 spike sits above the derived cap
    empty = spark.createDataFrame([], "k string, __f long")
    assert auto_frequency_cap(empty, floor=64) == 64
    with pytest.raises(ValueError, match="frequency cap"):
        jaccard_pairs(df, max_shingle_freq="nope").count()


def test_driver_path_guards(spark, tmp_path, caplog):
    """r6: the documented driver-side paths get size guard rails — the
    guard raises before buffering when a max is set, warns past the 1M
    threshold, and leaves small writes untouched."""
    import logging

    from mini_etl_spark.sinks.dbapi import to_dbapi
    from mini_etl_spark.sinks.writers import to_excel, to_json
    from mini_etl_spark.sources.local import from_memory

    small = spark.range(10).selectExpr("id AS v")

    # to_excel: guard raises BEFORE toPandas when over the limit
    with pytest.raises(ValueError, match="max_driver_rows"):
        to_excel(str(tmp_path / "x.xlsx"), max_driver_rows=5)(small)
    to_excel(str(tmp_path / "ok.xlsx"))(small)  # under default: writes
    assert (tmp_path / "ok.xlsx").exists()

    # to_json array form: warn-only by default, error when flagged
    with pytest.raises(ValueError, match="max_driver_rows"):
        to_json(str(tmp_path / "a.json"), lines=False, max_driver_rows=5)(small)
    to_json(str(tmp_path / "b.json"), lines=False)(small)
    assert (tmp_path / "b.json").exists()

    # to_dbapi: aborts before COMMIT when over max_rows — table left empty
    import sqlite3
    db = str(tmp_path / "g.db")
    connect = lambda: sqlite3.connect(db)
    with pytest.raises(ValueError, match="max_rows"):
        to_dbapi(connect, "t", if_exists="replace", max_rows=5)(small)
    con = sqlite3.connect(db)
    assert con.execute("SELECT count(*) FROM t").fetchone()[0] == 0
    con.close()
    to_dbapi(connect, "t", if_exists="replace")(small)
    con = sqlite3.connect(db)
    assert con.execute("SELECT count(*) FROM t").fetchone()[0] == 10
    con.close()

    # from_memory: small payloads silent; the >1M warning is log-gated
    with caplog.at_level(logging.WARNING, logger="mini_etl_spark.sources.local"):
        assert from_memory([{"v": 1}, {"v": 2}])(spark).count() == 2
    assert not [r for r in caplog.records if "from_memory" in r.message]


def test_index_dedup_auto_bucket_cap(spark, tmp_path):
    """r6: the persisted-index probe accepts max_bucket_freq="auto" —
    derived from the index's own bucket-size distribution — and matches
    the default hand-tuned cap on an ordinary corpus."""
    from mini_etl_spark.functions.dedup_index import (
        minhash_index_dedup,
        minhash_index_write,
    )

    corpus = spark.createDataFrame(
        [(i, f"base document number {i} with words " + "pad " * (i % 5))
         for i in range(40)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    minhash_index_write(corpus, path)
    batch = spark.createDataFrame(
        [(100, "base document number 7 with words " + "pad " * 2),
         (101, "entirely unrelated fresh content nothing shared")],
        "doc_id long, text string",
    )
    manual = {(r.batch_id, r.corpus_id)
              for r in minhash_index_dedup(spark, path, batch).collect()}
    auto = {(r.batch_id, r.corpus_id)
            for r in minhash_index_dedup(
                spark, path, batch, max_bucket_freq="auto").collect()}
    assert auto == manual and (100, 7) in auto


def test_shards_sink_streaming_modes(spark, tmp_path):
    """r6: the declarative shards sink accepts streaming frames — row
    mode as a stateless checkpointed partitioned append, token mode via
    the offset-carrying streaming sharder; assignments equal the batch
    forms."""
    from mini_etl_spark.functions.splits import hash_bucket, token_balanced_shard_ids
    from mini_etl_spark.sinks.shards import to_training_shards

    schema = "doc_id long, text string"
    src = tmp_path / "s_src"
    src.mkdir()
    rows = [(i, "tok " * (4 + i % 6)) for i in range(30)]
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.parquet(str(src / "b0"))
    stream = lambda: (spark.readStream.schema(schema)
                      .option("maxFilesPerTrigger", 1).parquet(str(src / "*")))

    # row-balance mode: shard == hash_bucket, hive layout prunes
    out_rows = str(tmp_path / "rows_out")
    to_training_shards(out_rows, num_shards=4, fmt="parquet")(stream())
    got = {r.doc_id: r.shard for r in spark.read.parquet(out_rows).collect()}
    want = {r.doc_id: r.shard
            for r in df.withColumn("shard", hash_bucket("doc_id", 42, 4)).collect()}
    assert got == want

    # token-balance mode: equals the batch sharder on a single batch
    out_tok = str(tmp_path / "tok_out")
    to_training_shards(out_tok, tokens_per_shard=40, fmt="parquet")(stream())
    got_t = {r.doc_id: r.shard for r in spark.read.parquet(out_tok).collect()}
    want_t = {r.doc_id: r.shard
              for r in token_balanced_shard_ids(df, tokens_per_shard=40, clamp=False).collect()}
    assert got_t == want_t

    with pytest.raises(ValueError, match="parquet"):
        to_training_shards(str(tmp_path / "x"), num_shards=2, fmt="jsonl")(stream())


def test_order_buckets_hex_invariant(spark):
    """r6: the prefix-bucket width is a partitioning knob only — 1, 2, or
    3 hex chars must yield IDENTICAL shard assignments (the global md5
    order is the same whatever the split)."""
    from mini_etl_spark.functions.splits import token_balanced_shard_ids

    df = spark.createDataFrame(
        [(i, "tok " * (3 + i % 9)) for i in range(120)],
        "doc_id long, text string",
    )
    base = {r.doc_id: r.shard
            for r in token_balanced_shard_ids(df, tokens_per_shard=50).collect()}
    for width in (1, 3):
        got = {r.doc_id: r.shard
               for r in token_balanced_shard_ids(
                   df, tokens_per_shard=50, order_buckets_hex=width).collect()}
        assert got == base, width
    with pytest.raises(ValueError, match="order_buckets_hex"):
        token_balanced_shard_ids(df, order_buckets_hex=5)


def test_group_trend_wide_decimal_path(spark):
    """r6: wide=True (DECIMAL-38 sums, the 100 TB overflow guard) must
    be bit-identical to the long path wherever long doesn't overflow,
    and survive products that WOULD overflow a long."""
    from mini_etl_spark.maintenance import group_linear_trend

    rows = [(i % 3, float(i), 2.5 * i + (i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "g int, x double, y double")
    a = sorted(map(tuple, group_linear_trend(df, "x", "y", ["g"]).collect()))
    b = sorted(map(tuple, group_linear_trend(df, "x", "y", ["g"], wide=True).collect()))
    assert a == b and len(a) == 3

    # magnitudes where n*sxy overflows long (x,y ~ 1e8 fixed -> products
    # ~1e16, sums over 5000 rows ~5e19 > 2^63): wide stays finite/sane
    big = spark.createDataFrame(
        [(0, 1e6 + i, 3.0 * (1e6 + i)) for i in range(5000)],
        "g int, x double, y double",
    )
    w = group_linear_trend(big, "x", "y", ["g"], wide=True).collect()[0]
    assert w.slope_e6 is not None and abs(w.slope_e6 - 3_000_000) <= 1


def test_stream_offset_replay_and_manifest_gaps(spark, tmp_path):
    """Review follow-ups: (a) a replayed batch (same id as the stored
    state) restarts from prev_offset instead of double-counting its own
    tokens; (b) the token-mode manifest records window-count shards
    including zero-row gaps left by oversized documents; (c) pagerank's
    seed check uses Spark isin semantics (int seeds vs string nodes do
    not false-alarm)."""
    from mini_etl_spark.functions.graph import pagerank
    from mini_etl_spark.sinks.shards import read_shard_manifest, to_training_shards
    from mini_etl_spark.streaming.corpus import _resolve_offset

    # (a) pure offset logic, scoped by checkpoint incarnation
    st = {"batch_id": 3, "prev_offset": 100, "offset": 150, "query_id": "q1"}
    assert _resolve_offset(st, 3, "q1") == 100   # replay of batch 3
    assert _resolve_offset(st, 4, "q1") == 150   # next batch continues
    assert _resolve_offset({}, 0, "q1") == 0     # fresh stream
    # same batch id under a DIFFERENT checkpoint incarnation = fresh
    # checkpoint reusing id 0, NOT a replay: continue from offset
    assert _resolve_offset(st, 3, "q2") == 150
    # legacy state without prev_offset: fall back to offset (the old
    # may-double-count caveat), never a silent reset to 0
    assert _resolve_offset({"batch_id": 3, "offset": 150}, 3, "") == 150

    # (b) one 10-token doc then (in md5 order) one 500-token doc spanning
    # whole windows: manifest must still record every window id
    rows = [(1, "tok " * 10), (2, "tok " * 500)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "gaps")
    to_training_shards(path, tokens_per_shard=100, fmt="parquet")(df)
    man = read_shard_manifest(path, spark)
    assert man["num_shards"] == 6  # ceil(510/100)
    assert set(man["shards"]) == {str(i) for i in range(6)}
    assert sum(v for v in man["shards"].values()) == 2  # rows conserved
    assert any(v == 0 for v in man["shards"].values())  # gap shards recorded

    # (c) string nodes + int seeds: isin coerces, check must not raise
    e = spark.createDataFrame([("1", "2"), ("2", "3"), ("3", "1")],
                              "src string, dst string")
    ranks = {r["node"]: r["rank"]
             for r in pagerank(e, iterations=3, personalized=[1]).collect()}
    assert set(ranks) == {"1", "2", "3"} and ranks["1"] > 0
