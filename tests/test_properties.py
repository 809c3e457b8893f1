"""Property-based tests (hypothesis): operator invariants that must hold on
arbitrary frames — a layer the reference lacked entirely (SURVEY §5)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mini_etl_spark import operators as ops
from mini_etl_spark.functions import text as tx

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows = st.lists(
    st.tuples(
        st.integers(min_value=-1000, max_value=1000),
        st.sampled_from(["a", "b", "c"]),
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=32)),
    ),
    min_size=1,
    max_size=40,
)


def _df(spark, data):
    pdf = pd.DataFrame(data, columns=["id", "cat", "val"])
    return spark.createDataFrame(pdf.astype({"id": "int64", "cat": "object"}))


@SLOW
@given(data=rows)
def test_dedup_any_idempotent_and_bounded(spark, data):
    df = _df(spark, data)
    once = ops.deduplicate(["cat"])(df)
    twice = ops.deduplicate(["cat"])(once)
    assert once.count() == twice.count()
    assert once.count() <= min(df.count(), 3)  # ≤ distinct cats


@SLOW
@given(data=rows)
def test_filter_partitions_rows(spark, data):
    df = _df(spark, data)
    hi = ops.filter_rows("id > 0")(df).count()
    lo = ops.filter_rows("id <= 0")(df).count()
    assert hi + lo == df.count()


@SLOW
@given(data=rows)
def test_fillna_removes_all_nulls_and_preserves_values(spark, data):
    df = _df(spark, data)
    filled = ops.fill_na(0.0, columns=["val"])(df)
    assert filled.filter("val IS NULL").count() == 0
    # filled result == original with None replaced by 0.0 (values untouched)
    expect = sorted(0.0 if r.val is None else r.val for r in df.collect())
    got = sorted(r.val for r in filled.collect())
    assert got == expect


@SLOW
@given(data=rows)
def test_group_agg_count_totals(spark, data):
    df = _df(spark, data)
    agg = ops.group_agg("cat", {"id": "count"})(df)
    total = sum(r.id_count for r in agg.collect())
    assert total == df.count()


@SLOW
@given(data=rows)
def test_sort_is_permutation_and_ordered(spark, data):
    df = _df(spark, data)
    out = [r.id for r in ops.sort_rows("id")(df).collect()]
    assert out == sorted(r.id for r in df.collect())


@SLOW
@given(texts=st.lists(st.text(max_size=80), min_size=1, max_size=20))
def test_fingerprint_is_token_set_invariant(spark, texts):
    pdf = pd.DataFrame({"text": texts})
    df = spark.createDataFrame(pdf)
    rows_ = df.select(
        tx.tokens("text").alias("toks"), tx.fingerprint("text").alias("fp")
    ).collect()
    by_set: dict[frozenset, set] = {}
    for r in rows_:
        by_set.setdefault(frozenset(r.toks), set()).add(r.fp)
    # identical token set ⇒ identical fingerprint (and vice versa per md5)
    assert all(len(fps) == 1 for fps in by_set.values())


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=25), st.integers(min_value=0, max_value=25)
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=30,
)


@SLOW
@given(edges=edges_strategy)
def test_connected_components_equals_union_find_property(spark, edges):
    """On arbitrary small graphs, min-label propagation must agree with a
    driver-side union-find (components keyed by min member)."""
    from mini_etl_spark.functions import dedup as dd

    norm = [(min(a, b), max(a, b)) for a, b in edges]
    df = spark.createDataFrame(norm, "id_a bigint, id_b bigint")
    got = {r.node: r.component for r in dd.connected_components(df).collect()}

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in norm:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {n: find(n) for n in parent}
    assert got == truth
    # the star contraction must agree on the same arbitrary graph
    star = {
        r.node: r.component
        for r in dd.connected_components(df, algorithm="star").collect()
    }
    assert star == truth


@SLOW
@given(
    texts=st.lists(
        st.text(alphabet="abc xyz", min_size=0, max_size=40), min_size=1, max_size=15
    ),
    n=st.integers(min_value=2, max_value=4),
)
def test_shingles_properties(spark, texts, n):
    pdf = pd.DataFrame({"text": texts})
    df = spark.createDataFrame(pdf)
    rows_ = df.select(
        tx.tokens("text").alias("toks"), tx.shingles("text", n).alias("sh")
    ).collect()
    for r in rows_:
        k = len(r.toks)
        if k < n:
            assert r.sh == []
        else:
            assert len(r.sh) <= k - n + 1  # distinct ≤ total grams
            assert all(len(g.split(" ")) == n for g in r.sh)

@SLOW
@given(
    keys=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=200, unique=True),
    w1=st.integers(min_value=1, max_value=8),
    w2=st.integers(min_value=1, max_value=8),
)
def test_split_assign_is_total_partition(spark, keys, w1, w2):
    """Every key lands in exactly one split, for any weight vector."""
    from mini_etl_spark.functions import splits as sp

    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    w = {"a": float(w1), "b": float(w2), "c": 1.0}
    got = {r.k: r.s for r in df.select("k", sp.split_assign("k", w).alias("s")).collect()}
    assert set(got) == set(keys)
    assert set(got.values()) <= {"a", "b", "c"}


@SLOW
@given(texts=st.lists(st.text(alphabet="abcdefgh \n.,-", max_size=60), min_size=1, max_size=20))
def test_redact_pii_noop_without_pii(spark, texts):
    """Text with no digits and no '@' must pass through unchanged."""
    import pandas as pd

    from mini_etl_spark.functions import text as txf

    pdf = pd.DataFrame({"text": texts})
    df = spark.createDataFrame(pdf)
    out = df.select("text", txf.redact_pii("text").alias("clean"),
                    txf.pii_count("text").alias("n")).collect()
    for r in out:
        assert r.clean == r.text and r.n == 0


doc_texts = st.lists(
    st.text(alphabet="abc xyz01 ", max_size=60), min_size=1, max_size=15
)


@SLOW
@given(texts=doc_texts, window=st.integers(2, 6), stride=st.integers(1, 6))
def test_chunks_preserve_token_stream(spark, texts, window, stride):
    """With stride ≤ window, splicing the first `stride` tokens of each
    chunk (plus the last chunk's tail) reproduces each document's token
    stream exactly — chunking loses nothing and invents nothing."""
    from mini_etl_spark.functions.chunking import chunk_documents
    from mini_etl_spark.functions.text import tokens as tok_expr
    import pyspark.sql.functions as F

    stride = min(stride, window)
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    want = {
        r["doc_id"]: r["t"]
        for r in df.select("doc_id", tok_expr("text").alias("t")).collect()
    }
    chunks = chunk_documents(df, window=window, stride=stride).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, toks in want.items():
        got = sorted(by_doc.get(doc_id, []), key=lambda r: r["chunk_id"])
        if not toks:
            assert got == []
            continue
        rebuilt: list[str] = []
        for r in got[:-1]:
            rebuilt.extend(r["chunk_text"].split()[:stride])
        rebuilt.extend(got[-1]["chunk_text"].split())
        assert rebuilt == toks, (doc_id, window, stride)


@SLOW
@given(
    sizes=st.lists(st.integers(0, 30), min_size=1, max_size=30),
    max_tokens=st.integers(5, 40),
)
def test_pack_sequences_totality_and_capacity(spark, sizes, max_tokens):
    from mini_etl_spark.functions.chunking import pack_sequences
    import pyspark.sql.functions as F

    rows = [(i, " ".join("t" for _ in range(n))) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, max_tokens=max_tokens, group_size=10)
    got = out.collect()
    assert sorted(r["doc_id"] for r in got) == list(range(len(sizes)))
    # a bin exceeds capacity only if it holds a single oversized doc
    per_bin: dict[int, list] = {}
    for r in got:
        per_bin.setdefault(r["bin_id"], []).append(r["n_tokens"])
    for members in per_bin.values():
        if sum(members) > max_tokens:
            # only an oversized doc overflows a bin; zero-token docs may
            # share it (they occupy no capacity in the greedy walk)
            nonzero = [m for m in members if m > 0]
            assert len(nonzero) == 1 and nonzero[0] > max_tokens


@SLOW
@given(
    budget=st.integers(1, 400),
    sizes=st.lists(st.integers(0, 30), min_size=1, max_size=25),
)
def test_mixture_budget_overshoot_bounded(spark, budget, sizes):
    """Selected token mass never exceeds budget + (largest single doc), and
    growing the budget never drops a previously selected doc."""
    from mini_etl_spark.functions.mixing import mix_by_token_budget

    rows = [(i, "s", " ".join("t" for _ in range(n))) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = mix_by_token_budget(df, {"s": budget}).collect()
    total = sum(r["n_tokens"] for r in got)
    assert total <= budget + max(sizes)
    bigger = mix_by_token_budget(df, {"s": budget + 50}).collect()
    assert {r["doc_id"] for r in got} <= {r["doc_id"] for r in bigger}


words_strategy = st.lists(
    st.tuples(
        st.text(alphabet="abcdef", min_size=1, max_size=8),
        st.integers(min_value=1, max_value=50),
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


@SLOW
@given(hist=words_strategy, n=st.integers(min_value=0, max_value=40))
def test_bpe_merges_deterministic_and_reconstructive(hist, n):
    """Pure-driver properties: training is a deterministic function of the
    histogram (input order irrelevant), and encoding any trained word
    reconstructs it exactly."""
    from mini_etl_spark.functions import bpe

    m1 = bpe.train_bpe_merges(hist, n)
    m2 = bpe.train_bpe_merges(list(reversed(hist)), n)
    assert m1 == m2
    ranks = {p: i for i, p in enumerate(m1)}
    for w, _ in hist:
        syms = bpe._encode_word(w, ranks)
        assert "".join(syms).replace(bpe.END, "") == w


@SLOW
@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
            min_size=3,
            max_size=3,
        ),
        min_size=2,
        max_size=15,
    ),
    levels=st.sampled_from([2, 16, 256]),
)
def test_quantize_codes_in_range_and_monotone(spark, vecs, levels):
    """Codes stay in [0, levels-1] and preserve per-dimension order: if
    x <= y in some dimension, code(x) <= code(y)."""
    from mini_etl_spark.functions import similarity as sim

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>",
    )
    got = {r.vec_id: r.codes for r in sim.quantize_embeddings(df, levels=levels).collect()}
    assert got.keys() == {i for i in range(len(vecs))}
    for codes in got.values():
        assert all(0 <= c <= levels - 1 for c in codes)
    for d in range(3):
        order = sorted(range(len(vecs)), key=lambda i: vecs[i][d])
        cs = [got[i][d] for i in order]
        assert cs == sorted(cs)


@SLOW
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 100), st.integers(0, 2)), min_size=1, max_size=25
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 100), st.integers(0, 2), st.integers(-50, 50)),
        min_size=1,
        max_size=25,
    ),
)
def test_asof_join_equals_pandas_merge_asof(spark, lefts, rights):
    """asof_join (union+window composition) must agree with pandas
    merge_asof per key, both directions, on arbitrary inputs."""
    from mini_etl_spark.operators.joins import asof_join

    ldf = pd.DataFrame(lefts, columns=["t", "k"]).drop_duplicates(["t", "k"])
    rdf = (
        pd.DataFrame(rights, columns=["t", "k", "v"])
        .drop_duplicates(["t", "k"])  # one right row per (t, k)
    )
    sl = spark.createDataFrame(ldf.astype("int64"))
    sr = spark.createDataFrame(rdf.astype("int64"))
    for direction in ("backward", "forward"):
        got = (
            asof_join(sl, sr, on="t", by="k", direction=direction)
            .orderBy("k", "t")
            .toPandas()
        )
        want = pd.merge_asof(
            ldf.sort_values("t").astype("int64"),
            rdf.sort_values("t").astype("int64"),
            on="t",
            by="k",
            direction=direction,
        ).sort_values(["k", "t"]).reset_index(drop=True)
        assert list(got["t"]) == list(want["t"])
        assert list(got["k"]) == list(want["k"])
        gv = [None if pd.isna(x) else int(x) for x in got["v"]]
        wv = [None if pd.isna(x) else int(x) for x in want["v"]]
        assert gv == wv, (direction, gv, wv)


@SLOW
@given(
    values=st.lists(st.integers(-100, 100), min_size=1, max_size=30),
    intervals=st.lists(
        st.tuples(st.integers(-100, 100), st.integers(0, 40)),
        min_size=1,
        max_size=15,
    ),
    width=st.sampled_from([1.0, 3.0, 7.5, 40.0]),
)
def test_range_join_bucketized_equals_naive(spark, values, intervals, width):
    """The bucketized decomposition (equi-join on exploded buckets + exact
    filter) must return exactly the naive theta-join's pairs for any
    bucket width — bucket boundaries can't lose or duplicate matches."""
    from mini_etl_spark.operators.joins import range_join

    left = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "lid int, v bigint"
    )
    right = spark.createDataFrame(
        [(j, lo, lo + w) for j, (lo, w) in enumerate(intervals)],
        "rid int, lo bigint, hi bigint",
    )
    naive = {
        (r["lid"], r["rid"])
        for r in range_join(left, right, "v", "lo", "hi").collect()
    }
    bucketized = {
        (r["lid"], r["rid"])
        for r in range_join(
            left, right, "v", "lo", "hi", bucket_width=width
        ).collect()
    }
    assert bucketized == naive


@SLOW
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", categories=["L", "N", "P", "Z", "C"]
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_normalize_text_invariants(spark, texts):
    """normalize_text on arbitrary unicode: idempotent fixed point; no
    stripped control chars, no CR, no space/tab runs, no 3+ newline runs
    survive; never introduces characters the input didn't imply."""
    import re

    pdf = pd.DataFrame({"text": texts})
    out = [
        r.t
        for r in spark.createDataFrame(pdf)
        .select(tx.normalize_text("text").alias("t"))
        .collect()
    ]
    out2 = [
        r.t
        for r in spark.createDataFrame(pd.DataFrame({"text": out}))
        .select(tx.normalize_text("text").alias("t"))
        .collect()
    ]
    assert out == out2  # idempotence on arbitrary input
    for s in out:
        assert not re.search(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f\r]", s)
        assert not re.search(r"[ \t]{2,}", s) and "\t" not in s
        assert not re.search(r"\n{3,}", s)
        assert s == s.strip(" ")


# URL-shaped strings: mixed-case scheme/host, optional userinfo/port,
# path/query with tracking and real params, optional fragment.
_label = st.text(alphabet="abcDEF09", min_size=1, max_size=6)
_urls = st.builds(
    lambda sch, user, labels, port, path, params, frag: (
        sch
        + "://"
        + (user + "@" if user else "")
        + ".".join(labels)
        + (f":{port}" if port else "")
        + path
        + ("?" + "&".join(params) if params else "")
        + ("#" + frag if frag else "")
    ),
    sch=st.sampled_from(["http", "https", "HTTP", "HtTpS"]),
    user=st.one_of(st.just(""), st.just("u:pw")),
    labels=st.lists(_label, min_size=1, max_size=4),
    port=st.one_of(st.just(""), st.sampled_from(["80", "443", "8080"])),
    path=st.one_of(st.just(""), st.just("/"), st.just("/A/b%20c")),
    params=st.lists(
        st.sampled_from(
            ["utm_source=x", "utm_campaign", "fbclid=1", "ref=nav", "q=1", "Id=2", "refx=keep"]
        ),
        max_size=4,
    ),
    frag=st.one_of(st.just(""), st.just("Sec1")),
)


@SLOW
@given(urls=st.lists(_urls, min_size=1, max_size=20))
def test_normalize_url_invariants(spark, urls):
    """normalize_url on generated URLs: idempotent; host lower-cased with
    userinfo gone; no fragment; no default port for the scheme; no
    tracking params survive while non-tracking params do (refx= is not
    ref=); path never empty."""
    import re

    from mini_etl_spark.functions import web

    pdf = pd.DataFrame({"url": urls})
    out = [
        r.n
        for r in spark.createDataFrame(pdf)
        .select(web.normalize_url("url").alias("n"))
        .collect()
    ]
    out2 = [
        r.n
        for r in spark.createDataFrame(pd.DataFrame({"url": out}))
        .select(web.normalize_url("url").alias("n"))
        .collect()
    ]
    assert out == out2  # idempotence
    for src, n in zip(urls, out):
        assert "#" not in n and "@" not in n
        m = re.match(r"^(https?)://([^/]+)(/.*)?$", n)
        assert m, n
        scheme, hostport, rest = m.groups()
        assert scheme in ("http", "https")
        host = hostport.split(":")[0]
        assert host == host.lower()
        if ":" in hostport:
            port = hostport.rsplit(":", 1)[1]
            assert not (scheme == "http" and port == "80")
            assert not (scheme == "https" and port == "443")
        assert rest and rest.startswith("/")
        assert "utm_" not in n and "fbclid" not in n and "ref=" not in n
        if "refx=keep" in src:
            assert "refx=keep" in n
        if "q=1" in src:
            assert "q=1" in n


corpus_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # doc ids (may repeat -> deduped)
        st.integers(min_value=0, max_value=30),      # token count for the doc
    ),
    min_size=0,
    max_size=40,
)


@SLOW
@given(data=corpus_rows, tps=st.integers(min_value=1, max_value=50))
def test_token_shard_invariants(spark, data, tps):
    """r6 properties for token_balanced_shard_ids on arbitrary corpora:
    (1) n_shards == 1 + max(shard) (0 for empty); (2) shard ids dense
    from 0; (3) each non-final shard's token mass stays within one
    document of the budget; (4) splitting the corpus anywhere and
    continuing with start_offset reproduces the single-pass assignment."""
    from mini_etl_spark.functions.splits import token_balanced_shard_ids

    uniq = {i: n for i, n in data}  # unique ids (contract requires it)
    rows = [(i, "t " * n) for i, n in sorted(uniq.items())]
    df = spark.createDataFrame(rows, "doc_id long, text string") if rows else (
        spark.createDataFrame([], "doc_id long, text string"))
    out, n_shards = token_balanced_shard_ids(df, tokens_per_shard=tps, with_total=True)
    got = {r.doc_id: (r.n_tokens, r.shard) for r in out.collect()}
    if not rows:
        assert n_shards == 0 and not got
        return
    shards = sorted({s for _, s in got.values()})
    # every assigned id fits the driver-reported window count (the clamp
    # guarantee); ids need NOT be dense — a doc larger than the budget
    # covers whole windows, leaving those shard ids unoccupied
    assert shards[0] == 0 and shards[-1] <= n_shards - 1
    mass = {}
    for n, s in got.values():
        mass[s] = mass.get(s, 0) + n
    assert sum(mass.values()) == sum(uniq.values())  # nothing lost
    max_doc = max(n for n, _ in got.values())
    for s in shards[:-1]:
        assert mass[s] < tps + max(max_doc, 1)  # within one doc of budget

    # offset composition: process the md5-order prefix, then the suffix
    # with start_offset = prefix mass; union must equal the single pass
    import hashlib
    order = sorted(uniq, key=lambda i: (hashlib.md5(f"42\x1f{i}".encode()).hexdigest(), i))
    cut = len(order) // 2
    head, tail = set(order[:cut]), set(order[cut:])
    # clamp=False on the head (stream semantics: final shard still open)
    h = token_balanced_shard_ids(
        df.filter(df.doc_id.isin(list(head))) if head else df.limit(0),
        tokens_per_shard=tps, clamp=False)
    h_rows = {r.doc_id: r.shard for r in h.collect()}
    h_mass = sum(uniq[i] for i in head)
    t = token_balanced_shard_ids(
        df.filter(df.doc_id.isin(list(tail))) if tail else df.limit(0),
        tokens_per_shard=tps, start_offset=h_mass, clamp=False)
    t_rows = {r.doc_id: r.shard for r in t.collect()}
    combined = {**h_rows, **t_rows}
    single = {r.doc_id: r.shard
              for r in token_balanced_shard_ids(df, tokens_per_shard=tps, clamp=False).collect()}
    assert combined == single
