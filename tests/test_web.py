"""URL curation (functions.web): part extraction on adversarial URLs,
registered-domain heuristic, normalization idempotence, in-text URL
extraction, and the broadcast blocklist filter's subdomain semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_etl_spark.functions.web import (
    extract_urls,
    filter_url_blocklist,
    normalize_url,
    registered_domain,
    url_host,
    with_url_parts,
)

URLS = [
    (1, "https://www.Example.COM/a/b?id=1&utm_source=feed#frag"),
    (2, "http://user:pw@sub.news.example.co.uk:8080/path?x=1"),
    (3, "https://example.org:443/"),
    (4, "http://example.org:80"),
    (5, "https://192.168.10.1/admin"),
    (6, "ftp://files.example.net/pub"),
    (7, "not a url at all"),
    (8, "https://localhost/x?utm_campaign=a&utm_medium=b"),
]


def _df(spark):
    return spark.createDataFrame(URLS, ["id", "url"])


def test_url_parts(spark):
    rows = {
        r["id"]: r
        for r in with_url_parts(_df(spark)).collect()
    }
    r1 = rows[1]
    assert r1["url_scheme"] == "https"
    assert r1["url_host"] == "www.example.com"
    assert r1["url_domain"] == "example.com"
    assert r1["url_path"] == "/a/b"
    assert r1["url_query"] == "id=1&utm_source=feed"
    assert r1["url_fragment"] == "frag"
    r2 = rows[2]
    assert r2["url_host"] == "sub.news.example.co.uk"  # userinfo+port gone
    assert r2["url_port"] == "8080"
    assert r2["url_domain"] == "example.co.uk"  # multi-part suffix
    assert rows[5]["url_domain"] == "192.168.10.1"  # IPv4 passes whole
    assert rows[7]["url_host"] == ""  # non-URL → empty parts, never null
    assert rows[4]["url_path"] == ""  # no path component at all


def test_normalize_url_semantics(spark):
    out = {
        r["id"]: r["n"]
        for r in _df(spark).select("id", normalize_url("url").alias("n")).collect()
    }
    # lower host, tracking param dropped, fragment dropped, kept param order
    assert out[1] == "https://www.example.com/a/b?id=1"
    # non-default port kept, userinfo dropped, real param kept
    assert out[2] == "http://sub.news.example.co.uk:8080/path?x=1"
    # default ports stripped for their schemes
    assert out[3] == "https://example.org/"
    assert out[4] == "http://example.org/"  # and empty path → '/'
    # all params tracking → no '?' at all
    assert out[8] == "https://localhost/x"


def test_normalize_url_idempotent(spark):
    df = _df(spark).where(F.col("id") != 7)  # non-URLs are out of contract
    once = df.select("id", normalize_url("url").alias("n"))
    twice = once.select("id", normalize_url("n").alias("n"))
    assert sorted(once.collect()) == sorted(twice.collect())


def test_extract_urls(spark):
    df = spark.createDataFrame(
        [
            (1, 'see https://a.example.com/x. then (http://b.org/y?z=1) and "https://c.net".'),
            (2, "no links here"),
        ],
        ["id", "text"],
    )
    got = {r["id"]: r["u"] for r in df.select("id", extract_urls("text").alias("u")).collect()}
    assert got[1] == [
        "https://a.example.com/x",
        "http://b.org/y?z=1",
        "https://c.net",
    ]
    assert got[2] == []


def test_blocklist_suffix_vs_domain(spark):
    df = _df(spark)
    # suffix mode: example.com blocks www.example.com but NOT example.co.uk
    kept = filter_url_blocklist(df, blocked=["example.com"], match="suffix")
    assert sorted(r["id"] for r in kept.collect()) == [2, 3, 4, 5, 6, 7, 8]
    # domain mode: registered-domain equality — blocks id 1 only as well
    kept2 = filter_url_blocklist(df, blocked=["example.org"], match="domain")
    assert sorted(r["id"] for r in kept2.collect()) == [1, 2, 5, 6, 7, 8]
    # keep mode inverts
    only = filter_url_blocklist(df, blocked=["example.co.uk"], mode="keep")
    assert [r["id"] for r in only.collect()] == [2]
    # DataFrame-shaped blocklist, case-insensitive entries
    bl = spark.createDataFrame([("Example.COM",)], ["domain"])
    kept3 = filter_url_blocklist(df, blocked=bl)
    assert 1 not in {r["id"] for r in kept3.collect()}


def test_blocklist_broadcast_plan(spark):
    """The 100 TB contract: the document side must not shuffle — the
    blocklist is broadcast in both match modes."""
    df = _df(spark)
    for match in ("suffix", "domain"):
        out = filter_url_blocklist(df, blocked=["example.com"], match=match)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan


def test_blocklist_arg_validation(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        filter_url_blocklist(df, blocked=["x.com"], mode="bogus")
    with pytest.raises(ValueError):
        filter_url_blocklist(df, blocked=["x.com"], match="bogus")
    with pytest.raises(ValueError):
        filter_url_blocklist(df)


def test_html_to_text(spark):
    from mini_etl_spark.functions.web import html_to_text

    html = (
        "<html><head><title>T</title><script>var x = '<p>';</script>"
        "<style>p { color: red }</style></head>"
        "<body><!-- note --><h1>Big News</h1>"
        "<p>Tom &amp; Jerry&nbsp;say &quot;hi&quot; &#39;now&#39;</p>"
        "<div>1 &lt; 2 &gt; 0</div>"
        "<table><tr><td>a</td><td>b</td></tr></table>"
        "<span>inline</span> tail</body></html>"
    )
    out = (
        spark.createDataFrame([(html,)], ["h"])
        .select(html_to_text("h").alias("t"))
        .first()[0]
    )
    assert "var x" not in out and "color" not in out and "note" not in out
    lines = out.split("\n")
    assert "Big News" in lines
    assert 'Tom & Jerry say "hi" \'now\'' in lines
    assert "1 < 2 > 0" in lines
    assert "a" in lines and "b" in lines  # cells don't fuse
    assert any(l.endswith("inline tail") for l in lines)
    assert "<" not in out.replace("1 < 2 > 0", "")  # no tags survive


def test_html_to_text_double_encoded_stays(spark):
    """Double-encoded entities decode exactly ONE level, matching what a
    browser renders: '&amp;lt;' is '&lt;' on screen, not '<'. Decoding
    &amp; LAST guarantees the '&lt;' it produces is never re-decoded."""
    from mini_etl_spark.functions.web import html_to_text

    out = (
        spark.createDataFrame([("<p>&amp;lt;tag&amp;gt;</p>",)], ["h"])
        .select(html_to_text("h").alias("t"))
        .first()[0]
    )
    assert out == "&lt;tag&gt;"  # browser-equivalent: one level decoded


def test_with_registered_domain_psl(spark):
    """PSL-exact mode: longest-suffix wins via broadcast joins, fallback
    is last-two-labels, IPv4 and single-label pass whole."""
    from mini_etl_spark.functions.web import with_registered_domain

    psl = ["com", "org", "co.uk", "gov.uk", "k12.ca.us", "uk"]
    df = spark.createDataFrame(
        [
            (1, "www.example.com"),
            (2, "a.b.example.co.uk"),      # co.uk beats uk (longest wins)
            (3, "school.k12.ca.us"),       # exactly suffix+1 labels: registrable as-is
            (4, "deep.school.k12.ca.us"),
            (5, "example.unknowntld"),     # no entry -> last-two fallback
            (6, "single"),
            (7, "10.1.2.3"),
            (8, "co.uk"),                  # bare suffix: no label above -> fallback
        ],
        ["id", "host"],
    )
    out = {r["id"]: r["registered_domain"]
           for r in with_registered_domain(df, "host", psl).collect()}
    assert out[1] == "example.com"
    assert out[2] == "example.co.uk"
    assert out[3] == "school.k12.ca.us"
    assert out[4] == "school.k12.ca.us"
    assert out[5] == "example.unknowntld"
    assert out[6] == "single"
    assert out[7] == "10.1.2.3"
    assert out[8] == "co.uk"  # PSL says unregistrable; honest passthrough


def test_with_registered_domain_plan_no_shuffle(spark):
    """All suffix joins broadcast; the host side never exchanges."""
    from mini_etl_spark.functions.web import with_registered_domain

    df = spark.createDataFrame([(1, "www.example.com")], ["id", "host"])
    out = with_registered_domain(df, "host", ["com", "co.uk"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 1


def test_with_registered_domain_df_suffixes_deduped(spark):
    """DataFrame suffix lists with duplicate entries must not duplicate
    host rows (plain left joins, unlike the blocklist's semi/anti)."""
    from mini_etl_spark.functions.web import with_registered_domain

    df = spark.createDataFrame([(1, "www.example.com")], ["id", "host"])
    sfx = spark.createDataFrame([("com",), ("COM",), ("com",)], ["suffix"])
    out = with_registered_domain(df, "host", sfx)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["registered_domain"] == "example.com"


def test_normalize_url_schemeless_passthrough(spark):
    from mini_etl_spark.functions.web import normalize_url

    df = spark.createDataFrame([("not a url",), ("/rel/path?x=1",)], ["url"])
    out = [r[0] for r in df.select(normalize_url("url")).collect()]
    assert out == ["not a url", "/rel/path?x=1"]


def test_blocklist_empty_list(spark):
    from mini_etl_spark.functions.web import filter_url_blocklist

    df = _df(spark)
    assert filter_url_blocklist(df, blocked=[], mode="drop").count() == df.count()
    assert filter_url_blocklist(df, blocked=[], mode="keep").count() == 0


def test_with_url_features(spark):
    from mini_etl_spark.functions.web import with_url_features

    df = spark.createDataFrame(
        [
            (1, "https://www.shop.example.com/cat/items/2024/01/15/view?id=99&s=abc"),
            (2, "https://example.com/"),
            (3, "https://example.com"),
            (4, "not a url"),
        ],
        ["id", "url"],
    )
    rows = {r["id"]: r for r in with_url_features(df).collect()}
    r1 = rows[1]
    assert r1["urlf_path_depth"] == 6  # cat items 2024 01 15 view
    assert r1["urlf_n_params"] == 2
    assert r1["urlf_host_labels"] == 4
    assert r1["urlf_has_query"] is True
    assert r1["urlf_is_index"] is False
    assert r1["urlf_digit_ratio"] > 0.15  # 2024/01/15 + 99 heavy in digits? path+host len
    assert rows[2]["urlf_is_index"] is True and rows[2]["urlf_path_depth"] == 0
    assert rows[3]["urlf_is_index"] is True  # empty path counts as index
    r4 = rows[4]
    assert r4["urlf_host_labels"] == 0 and r4["urlf_path_depth"] == 0


def test_query_never_leaks_from_fragment(spark):
    """RFC 3986: everything after the first '#' is fragment — a '?' in a
    SPA hash route is NOT a query."""
    from mini_etl_spark.functions.web import normalize_url, with_url_parts

    df = spark.createDataFrame(
        [(1, "https://app.example.com/#/search?q=1"),
         (2, "https://a.com/p?x=1#frag?y=2")],
        ["id", "url"],
    )
    rows = {r["id"]: r for r in with_url_parts(df).collect()}
    assert rows[1]["url_query"] == ""
    assert rows[1]["url_fragment"] == "/search?q=1"
    assert rows[2]["url_query"] == "x=1"  # real query before '#' still found
    norm = {r["id"]: r["n"]
            for r in df.select("id", normalize_url("url").alias("n")).collect()}
    assert norm[1] == "https://app.example.com/"  # no promoted fragment state
    assert norm[2] == "https://a.com/p?x=1"


def test_blocklist_leading_dots_normalized(spark):
    from mini_etl_spark.functions.web import filter_url_blocklist

    df = _df(spark)
    # '.example.com'-style entries (the circulated form) must still match
    kept = filter_url_blocklist(df, blocked=[".example.com"])
    assert 1 not in {r["id"] for r in kept.collect()}
    bl = spark.createDataFrame([(".Example.COM",)], ["d"])
    kept2 = filter_url_blocklist(df, blocked=bl)
    assert 1 not in {r["id"] for r in kept2.collect()}


def test_warc_empty_record_types_is_empty_filter(spark, tmp_path):
    from tests.test_warc import _archive

    (tmp_path / "a.warc").write_bytes(_archive())
    from mini_etl_spark.sources.warc import read_warc

    assert read_warc(str(tmp_path), record_types=())(spark).count() == 0


def test_bundled_psl_mode_resolves_and_broadcasts(spark):
    """VERDICT r4 #6: the vendored public-suffix snapshot ships as a
    loadable asset behind suffixes='psl' (also the None default), with
    example.co.uk-class zones resolving exactly and the suffix joins all
    broadcast (host side never exchanges)."""
    from mini_etl_spark.functions.web import with_registered_domain

    df = spark.createDataFrame(
        [
            (1, "a.b.example.co.uk"),
            (2, "www.example.com.au"),
            (3, "shop.example.co.jp"),
            (4, "alice.github.io"),      # private section: own site
            (5, "www.example.com"),      # plain TLD -> two-label fallback
            (6, "cdn.example.ac.in"),
        ],
        ["id", "host"],
    )
    out = {r["id"]: r["registered_domain"]
           for r in with_registered_domain(df, "host", "psl").collect()}
    assert out[1] == "example.co.uk"
    assert out[2] == "example.com.au"
    assert out[3] == "example.co.jp"
    assert out[4] == "alice.github.io"
    assert out[5] == "example.com"
    assert out[6] == "example.ac.in"
    # default (None) is the same bundled snapshot
    d2 = with_registered_domain(df, "host").collect()
    assert {r["id"]: r["registered_domain"] for r in d2} == out
    # icann-only: platform subdomains group under the platform
    icann = {r["id"]: r["registered_domain"]
             for r in with_registered_domain(df, "host", "psl-icann").collect()}
    assert icann[4] == "github.io"
    # plan: every suffix join broadcast, no host-side exchange
    plan = (
        with_registered_domain(df, "host", "psl")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("BroadcastHashJoin") >= 1
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown suffix mode"):
        with_registered_domain(df, "host", "nope")


def test_load_psl_file(tmp_path):
    from mini_etl_spark.assets import load_psl_file

    dat = tmp_path / "public_suffix_list.dat"
    dat.write_text(
        "// ===BEGIN ICANN DOMAINS===\n"
        "com\n"
        "co.uk\n"
        "*.ck\n"
        "!www.ck\n"
        "\n"
        "// ===BEGIN PRIVATE DOMAINS===\n"
        "github.io\n"
    )
    full = load_psl_file(str(dat))
    assert full == ["ck", "co.uk", "com", "github.io"]
    icann = load_psl_file(str(dat), include_private=False)
    assert icann == ["ck", "co.uk", "com"]
