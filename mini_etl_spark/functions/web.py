"""URL parsing, normalization, and blocklist filtering — web-corpus curation.

The reference (yoadjei/mini-etl) has no web/URL surface; this module is
part of the training-data extension set: the C4/CCNet-shaped front end of
a crawl pipeline, where documents arrive tagged with (or containing) URLs
and the first curation decisions are *per-host*: extract the host, reduce
it to a registered domain, cap/filter/deduplicate by that key (compose
with ``splits.cap_per_group`` for the per-domain frequency cap and
``operators.skew.key_skew_stats`` for the hot-host preflight).

Everything here is a pure codegen expression chain — ``regexp_extract`` /
``regexp_replace`` / higher-order array functions, zero UDFs, zero
shuffles — so URL handling rides inside whole-stage codegen on the scan
projection, exactly like ``text.normalize_text``. Every pattern is valid
in BOTH Java regex (Spark) and RE2 (DuckDB), so the full chain replays
engine-side for the differential oracles (``url_parse`` /
``url_blocklist`` in ``__spark_entry__``).

At 100 TB the blocklist is the only stateful piece: it is
vocabulary-sized (thousands of domains, not billions of rows), so
``filter_url_blocklist`` broadcasts it and the document table never
shuffles — the suffix-aware match is a BroadcastNestedLoopJoin whose
inner side is the tiny list, which is the correct asymmetry.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "url_scheme",
    "url_host",
    "url_port",
    "url_path",
    "url_query",
    "url_fragment",
    "registered_domain",
    "with_registered_domain",
    "with_url_parts",
    "with_url_features",
    "normalize_url",
    "extract_urls",
    "filter_url_blocklist",
    "html_to_text",
]

# Matches an absolute URL's pieces. Kept as separate single-purpose
# extracts (not one mega-pattern with many groups) so each column is an
# independent, auditable expression and unused parts prune away with the
# projection.
_SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_HOSTPORT_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_PATH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
# anchored so a '?' AFTER '#' is never mistaken for a query: per RFC 3986
# everything past the first '#' is fragment (SPA hash-routing URLs like
# /#/search?q=1 have NO query)
_QUERY_RE = "^[^#?]*\\?([^#]*)"
_FRAGMENT_RE = "#(.*)$"

# Multi-part public-suffix heuristic: second-level labels that act as a
# TLD under a two-letter country code (example.co.uk → registered domain
# is example.co.uk, not co.uk). A deliberate, documented *heuristic* —
# the real Public Suffix List is ~10k rules and belongs in a broadcast
# lookup table if exactness matters; this covers the overwhelming bulk
# of real crawl traffic with one RE2-safe alternation.
_MULTI_SUFFIX_RE = "([^.]+\\.(?:co|com|net|org|gov|edu|ac|mil)\\.[a-z][a-z])$"
_TWO_LABEL_RE = "([^.]+\\.[^.]+)$"
_IPV4_RE = "^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$"

# Tracking query parameters stripped by normalize_url, as one anchored
# alternation over the param name. The `(=|$)` tail matches both
# `name=value` and valueless `?utm_campaign` forms while leaving
# prefix-sharing params (`refx=`) alone.
TRACKING_PARAM_RE = "^(utm_[^=&]*|fbclid|gclid|msclkid|ref)(=|$)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(col: Column | str) -> Column:
    """Lower-cased scheme (``https``), or '' for scheme-less strings."""
    return F.lower(F.regexp_extract(_c(col), _SCHEME_RE, 1))


def _hostport(col: Column | str) -> Column:
    # authority with any userinfo@ prefix removed; port still attached
    return F.regexp_replace(
        F.regexp_extract(_c(col), _HOSTPORT_RE, 1), "^[^@]*@", ""
    )


def url_host(col: Column | str) -> Column:
    """Lower-cased host with userinfo and port stripped ('' if no
    authority — relative references parse to empty parts, never null)."""
    return F.lower(F.regexp_replace(_hostport(col), ":[0-9]+$", ""))


def url_port(col: Column | str) -> Column:
    """Explicit port as a string ('' when absent — the caller decides
    scheme defaults; see ``normalize_url`` for the canonical handling)."""
    return F.regexp_extract(_hostport(col), ":([0-9]+)$", 1)


def url_path(col: Column | str) -> Column:
    """Path component, '' when absent (NOT defaulted to '/' here — that
    canonicalization is ``normalize_url``'s job)."""
    return F.regexp_extract(_c(col), _PATH_RE, 1)


def url_query(col: Column | str) -> Column:
    """Query string without the '?' ('' when absent)."""
    return F.regexp_extract(_c(col), _QUERY_RE, 1)


def url_fragment(col: Column | str) -> Column:
    """Fragment without the '#' ('' when absent)."""
    return F.regexp_extract(_c(col), _FRAGMENT_RE, 1)


def registered_domain(host: Column | str) -> Column:
    """Registrable domain of a host: ``a.b.example.co.uk`` →
    ``example.co.uk``, ``www.example.com`` → ``example.com``, IPv4
    literals and single-label hosts pass through whole.

    Heuristic multi-part-suffix handling (see ``_MULTI_SUFFIX_RE``); for
    PSL-exact grouping, join against a broadcast suffix table instead.
    This is the canonical *grouping key* for per-domain caps, blocklists
    and host-level dedup — grouping by raw host splits one site across
    ``www.`` / regional / CDN subdomains and defeats the cap."""
    h = _c(host)
    multi = F.regexp_extract(h, _MULTI_SUFFIX_RE, 1)
    two = F.regexp_extract(h, _TWO_LABEL_RE, 1)
    return (
        F.when(h.rlike(_IPV4_RE), h)
        .when(multi != "", multi)
        .when(two != "", two)
        .otherwise(h)
    )


def with_registered_domain(
    df: DataFrame,
    host_col: str,
    suffixes: list[str] | DataFrame | None = None,
    out_col: str = "registered_domain",
    max_suffix_labels: int = 4,
) -> DataFrame:
    """Exact public-suffix-list grouping: the registrable domain is one
    label more than the LONGEST suffix-list entry that matches the tail
    of the host (``a.b.example.co.uk`` + entry ``co.uk`` →
    ``example.co.uk``). This is the PSL-exact upgrade of the
    ``registered_domain`` regex heuristic, for when correctness of the
    per-site key matters more than zero joins.

    Scale shape: the suffix list (~10k rows for the real PSL) is
    vocabulary-sized state, so each candidate length becomes one
    **broadcast left join** — ``max_suffix_labels`` of them, longest
    first, coalesced — and the document side never shuffles or explodes.
    Hosts matching no entry fall back to the last-two-labels rule (the
    PSL ``*`` default); IPv4 literals and single-label hosts pass
    through whole.

    Input contract: entries are LITERAL dotted suffixes (leading dots
    tolerated and stripped). The real PSL's ~100 wildcard (``*.x.jp``)
    and exception (``!city.x.jp``) rules are NOT interpreted — expand
    wildcards against your host population (or drop them) before passing
    the list, or those zones fall back to the two-label rule.

    ``suffixes`` forms: ``None`` or ``"psl"`` → the bundled public-
    suffix snapshot (``mini_etl_spark.assets.public_suffixes``, ICANN +
    private sections); ``"psl-icann"`` → ICANN zones only (platform
    subdomains like ``alice.github.io`` then group under ``github.io``);
    a ``list[str]`` or 1-column DataFrame → your own table (e.g.
    ``assets.load_psl_file()`` over the full publicsuffix.org download).
    """
    if suffixes is None or isinstance(suffixes, str):
        from mini_etl_spark.assets import public_suffixes

        mode = "psl" if suffixes is None else suffixes
        if mode == "psl":
            suffixes = public_suffixes(include_private=True)
        elif mode == "psl-icann":
            suffixes = public_suffixes(include_private=False)
        else:
            raise ValueError(
                f"with_registered_domain: unknown suffix mode {mode!r} "
                "(expected 'psl', 'psl-icann', a list, or a DataFrame)"
            )
    spark = df.sparkSession
    if isinstance(suffixes, DataFrame):
        scol = suffixes.columns[0]
        # distinct is REQUIRED here (unlike the blocklist's semi/anti
        # joins): these are plain left joins, and a duplicated suffix
        # entry would duplicate every matching host row; leading dots
        # stripped to match the list-input path
        sfx = suffixes.select(
            F.regexp_replace(F.lower(F.col(scol)), "^\\.+", "").alias("__sfx")
        ).distinct()
    else:
        sfx = spark.createDataFrame(
            sorted({(s.lower().lstrip("."),) for s in suffixes}), ["__sfx"]
        )

    host = F.lower(F.col(host_col))
    labels = F.split(host, "\\.")
    n = F.size(labels)
    out = df.withColumn("__rd_host", host)
    match_cols = []
    for k in range(max_suffix_labels, 0, -1):
        cand = F.when(
            n > k, F.array_join(F.slice(labels, n - k + 1, F.lit(k)), ".")
        )  # need at least one label ABOVE the suffix to register under it
        reg = F.when(n > k, F.array_join(F.slice(labels, n - k, F.lit(k + 1)), "."))
        out = (
            out.withColumn(f"__cand{k}", cand)
            .join(
                F.broadcast(sfx.withColumnRenamed("__sfx", f"__m{k}")),
                F.col(f"__cand{k}") == F.col(f"__m{k}"),
                "left",
            )
            .withColumn(
                f"__reg{k}", F.when(F.col(f"__m{k}").isNotNull(), reg)
            )
        )
        match_cols.append(F.col(f"__reg{k}"))

    two = F.regexp_extract(F.col("__rd_host"), _TWO_LABEL_RE, 1)
    fallback = (
        F.when(F.col("__rd_host").rlike(_IPV4_RE), F.col("__rd_host"))
        .when(two != "", two)
        .otherwise(F.col("__rd_host"))
    )
    out = out.withColumn(out_col, F.coalesce(*match_cols, fallback))
    drop = ["__rd_host"] + [c for k in range(1, max_suffix_labels + 1)
                            for c in (f"__cand{k}", f"__m{k}", f"__reg{k}")]
    return out.drop(*drop)


def with_url_parts(
    df: DataFrame,
    url_col: str = "url",
    prefix: str = "url_",
) -> DataFrame:
    """Attach scheme/host/port/path/query/fragment/registered-domain
    columns in ONE projection — a single codegen stage over the scan,
    no shuffle, no UDF. Unreferenced part columns are pruned by
    Catalyst, so requesting all seven costs only what downstream uses."""
    u = F.col(url_col)
    host = url_host(u)
    return df.withColumns(
        {
            f"{prefix}scheme": url_scheme(u),
            f"{prefix}host": host,
            f"{prefix}port": url_port(u),
            f"{prefix}path": url_path(u),
            f"{prefix}query": url_query(u),
            f"{prefix}fragment": url_fragment(u),
            f"{prefix}domain": registered_domain(host),
        }
    )


def with_url_features(
    df: DataFrame,
    url_col: str = "url",
    prefix: str = "urlf_",
) -> DataFrame:
    """URL-shape quality signals, one codegen projection — the features
    URL-based page-quality classifiers use (forum/calendar/search-result
    pages betray themselves in the URL long before you fetch them):

    - ``{p}path_depth``  — number of path segments
    - ``{p}path_len``    — path character length
    - ``{p}n_params``    — query parameter count
    - ``{p}host_labels`` — subdomain depth (``a.b.c.com`` → 4)
    - ``{p}digit_ratio`` — digits / length over host+path (session ids,
      timestamps, auto-generated pages score high)
    - ``{p}is_index``    — path is ``/`` or empty (site landing page)
    - ``{p}has_query``   — any query string at all

    Feed into ``classify.nb_train`` / ``log_ratio_weights`` after
    bucketing, or threshold directly. Pure expressions — composes into
    the scan stage with ``with_url_parts``."""
    u = F.col(url_col)
    host = url_host(u)
    path = url_path(u)
    query = url_query(u)
    hostpath = F.concat(host, path)
    digits = F.length(F.regexp_replace(hostpath, "[^0-9]", ""))
    return df.withColumns(
        {
            f"{prefix}path_depth": F.size(
                F.filter(F.split(path, "/"), lambda s: s != "")
            ),
            f"{prefix}path_len": F.length(path),
            f"{prefix}n_params": F.size(
                F.filter(F.split(query, "&"), lambda s: s != "")
            ),
            f"{prefix}host_labels": F.when(host == "", F.lit(0)).otherwise(
                F.size(F.split(host, "\\."))
            ),
            f"{prefix}digit_ratio": F.round(
                digits / F.greatest(F.length(hostpath), F.lit(1)), 4
            ),
            f"{prefix}is_index": (path == "") | (path == "/"),
            f"{prefix}has_query": query != "",
        }
    )


def normalize_url(col: Column | str) -> Column:
    """Canonical URL for dedup/grouping, applied strictly in this order:

    1. scheme and host lower-cased, userinfo dropped;
    2. default ports stripped (``http:80``, ``https:443``), any other
       explicit port kept;
    3. fragment dropped (never reaches the server);
    4. tracking query params removed (``TRACKING_PARAM_RE``: ``utm_*``,
       ``fbclid``, ``gclid``, ``msclkid``, ``ref``), remaining params
       kept in original order — NOT resorted, since param order can be
       semantic and resorting would merge genuinely different URLs;
    5. empty path canonicalized to ``/``.

    Idempotent (property-tested) and deliberately conservative: no
    percent-decoding, no case-folding of path/query (both case-
    sensitive per RFC 3986). Exact-dedup on this column collapses the
    ``http``/``https``/``#frag``/``utm_*`` variants of one page —
    the standard crawl-frontier canonicalization — while never merging
    URLs a server could distinguish.

    Pure codegen: regexp chain + split/filter/array_join higher-order
    functions, replayed verbatim by the DuckDB oracle."""
    u = _c(col)
    scheme = url_scheme(u)
    host = url_host(u)
    port = url_port(u)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == F.lit("80")))
        & ~((scheme == F.lit("https")) & (port == F.lit("443")))
    )
    path = url_path(u)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = url_query(u)
    kept_params = F.array_join(
        F.filter(
            F.split(query, "&"),
            lambda p: ~p.rlike(TRACKING_PARAM_RE) & (p != ""),
        ),
        "&",
    )
    built = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(kept_params != "", F.concat(F.lit("?"), kept_params)).otherwise(
            F.lit("")
        ),
    )
    # scheme-less strings are out of the URL contract: pass them through
    # instead of emitting ":///" junk (relative refs, garbage rows)
    return F.when(scheme == "", u).otherwise(built)


# HTML → text extraction chain, applied strictly in order. Same contract
# as text.NORMALIZE_STEPS: every pattern (incl. the (?is) inline flags and
# non-greedy spans) is valid in BOTH Java regex and RE2, so the DuckDB
# `html_text` oracle folds this exact list into regexp_replace(..., 'g')
# calls. Numeric character references (&#x2019; etc.) are deliberately
# NOT decoded — that needs a codepoint computation, not a rewrite; the
# common named entities below cover the bulk of crawl HTML.
HTML_STEPS: list[tuple[str, str]] = [
    ("(?s)<!--.*?-->", ""),                      # comments
    ("(?is)<script[^>]*>.*?</script>", ""),      # script blocks, content too
    ("(?is)<style[^>]*>.*?</style>", ""),        # style blocks
    # block-level boundaries become newlines so headings/paragraphs/cells
    # don't fuse into one token
    ("(?i)</?(p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|blockquote|section"
     "|article|header|footer|nav|pre)[^>]*>", "\n"),
    ("<[^>]+>", ""),                             # remaining inline tags
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),                              # LAST: no double-decode
    ("[ \\t]+", " "),                            # collapse spaces/tabs
    (" ?\\n ?", "\n"),                           # strip spaces hugging \n
    ("\\n{3,}", "\n\n"),                         # cap blank-line runs
    ("^[ \\n]+", ""),                            # trim edges (incl. \n,
    ("[ \\n]+$", ""),                            #  which SQL trim() keeps)
]


def html_to_text(col: Column | str) -> Column:
    """Visible text of an HTML document: comments/script/style removed
    (content included), block-level tags turned into line breaks, inline
    tags stripped, common named entities decoded, whitespace tidied.

    A fixed ordered ``regexp_replace`` chain — pure whole-stage-codegen,
    no parser library, no UDF — which is the right trade at crawl scale:
    a DOM parse per document would drag every byte through Python, while
    this stays JVM-side and fuses into the scan projection. The cost is
    parser fidelity on pathological markup (unclosed ``<script``,
    ``]]>`` games); curation quality filters downstream are the backstop,
    exactly as in C4's regex-based pipeline. Compose with
    ``text.normalize_text`` for the full cleanup."""
    c = _c(col)
    for pat, rep in HTML_STEPS:
        c = F.regexp_replace(c, pat, rep)
    return F.trim(c)


# Conservative in-text URL shape: scheme://, then everything up to
# whitespace or a character that in prose almost always terminates a
# link (quotes, angle brackets, closing paren). Trailing sentence
# punctuation (.,;:!?) is stripped afterwards — "see https://x.com." is
# a link to x.com, not "x.com.".
_INLINE_URL_RE = "https?://[^\\s<>\"')\\]]+"


def extract_urls(col: Column | str) -> Column:
    """All http(s) URLs appearing in a text column, document order, as
    ``array<string>`` with trailing sentence punctuation stripped per
    URL. ``regexp_extract_all`` + a ``transform`` lambda — codegen only.
    Feed the result through ``posexplode`` → ``url_host`` →
    ``registered_domain`` to build outlink/host graphs for
    ``functions.graph.pagerank``."""
    return F.transform(
        F.regexp_extract_all(_c(col), F.lit(_INLINE_URL_RE), 0),
        lambda u: F.regexp_replace(u, "[.,;:!?]+$", ""),
    )


def filter_url_blocklist(
    df: DataFrame,
    url_col: str = "url",
    blocked: list[str] | DataFrame | None = None,
    mode: str = "drop",
    match: str = "suffix",
) -> DataFrame:
    """Drop (or keep) rows whose URL host falls under any blocked domain.

    ``match="suffix"`` (default) is subdomain-aware: ``ads.example.com``
    is blocked by ``example.com`` (host equals the entry or ends with
    ``"." + entry``). ``match="domain"`` compares the registered domain
    by equality only — cheaper (pure equi-join) and equivalent when the
    blocklist already contains registered domains.

    ``blocked`` is a Python list or a 1-column DataFrame. Either way it
    is vocabulary-sized state and is **broadcast**: the document side
    never shuffles, which is the only acceptable shape when ``df`` is
    the 100 TB crawl. Suffix mode is a BroadcastNestedLoopJoin (tiny
    inner, fine); domain mode stays a broadcast hash join.
    """
    if mode not in ("drop", "keep"):
        raise ValueError(f"mode must be 'drop' or 'keep', got {mode!r}")
    if match not in ("suffix", "domain"):
        raise ValueError(f"match must be 'suffix' or 'domain', got {match!r}")
    if blocked is None:
        raise ValueError("filter_url_blocklist: blocked list is required")
    if not isinstance(blocked, DataFrame) and len(blocked) == 0:
        # empty blocklist: drop mode keeps everything, keep mode keeps nothing
        return df if mode == "drop" else df.limit(0)

    spark = df.sparkSession
    if isinstance(blocked, DataFrame):
        bcol = blocked.columns[0]
        # no distinct(): semi/anti joins ignore right-side duplicates, and
        # deduping would add a pointless exchange on the broadcast side.
        # Leading dots stripped: blocklists circulate in '.example.com'
        # form, which would otherwise silently match nothing.
        bl = blocked.select(
            F.regexp_replace(F.lower(F.col(bcol)), "^\\.+", "").alias(
                "__blocked_domain"
            )
        )
    else:
        bl = spark.createDataFrame(
            sorted({(d.lower().lstrip("."),) for d in blocked}),
            ["__blocked_domain"],
        )

    host = url_host(F.col(url_col))
    if match == "domain":
        probe = df.withColumn("__probe", registered_domain(host))
        cond = F.col("__probe") == F.col("__blocked_domain")
    else:
        probe = df.withColumn("__probe", host)
        cond = (F.col("__probe") == F.col("__blocked_domain")) | F.col(
            "__probe"
        ).endswith(F.concat(F.lit("."), F.col("__blocked_domain")))

    how = "left_anti" if mode == "drop" else "left_semi"
    return probe.join(F.broadcast(bl), cond, how).drop("__probe")
