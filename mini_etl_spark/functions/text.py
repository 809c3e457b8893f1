"""Text analysis operators: language ID, quality scoring, token counting,
fingerprinting.

Everything here is a JVM-side column expression (``pyspark.sql.functions``
compositions — no Python UDFs), so the hot path stays inside whole-stage
codegen and scales linearly with partitions. Each operator has an exact
DuckDB-SQL twin in ``__spark_entry__.oracle_sql`` for differential testing;
the shared semantic contract is documented per function.

No reference parity here: the reference has no text operators — this is the
training-data-pipeline extension (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ASCII-only stopword marker sets (public high-frequency function words).
# ASCII-only on purpose: tokenization is `[^a-z0-9]+` splitting, identical
# under Java regex and RE2/DuckDB, so the oracle matches byte-for-byte.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "was", "for", "with", "that"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "nicht", "ein", "auf"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des"],
    "es": ["el", "los", "las", "es", "en", "para", "por", "una", "del", "como"],
}

# Word/number/punctuation-run tokenizer, a BPE-ish pre-tokenization pattern
# (similar in spirit to GPT-2's regex pre-tokenizer, reduced to portable
# character classes).
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def tokens(col: Column | str) -> Column:
    """Lowercased alphanumeric tokens: split on runs of non-[a-z0-9],
    empties removed. Contract (both engines): tokens(x) =
    filter(split(regexp_replace(lower(x), '[^a-z0-9]+', ' '), ' '), t != '')."""
    c = F.col(col) if isinstance(col, str) else col
    # Single regex pass: extracting [a-z0-9]+ runs is set-identical to
    # replace-split-filter (runs of everything else are separators in both
    # forms, empties never materialize) but does one engine scan of the
    # string instead of two plus an array filter — measured 1.7x on the
    # sf0.1 corpus, 0 differing rows (guide §1 measure / §4 keep it in the
    # engine). The DuckDB oracle keeps replaying the documented
    # replace-split-filter contract; both produce the same token arrays.
    return F.regexp_extract_all(F.lower(c), F.lit("[a-z0-9]+"), 0)


def exploded_tokens(
    df: DataFrame, text_col: str, id_col: str, id_alias: str, tok_alias: str
) -> DataFrame:
    """(id, token) postings — one row per token occurrence.

    Materializes the token array in its own projection and explodes with
    ``explode_outer`` + a post-generate null filter instead of a plain
    ``explode``: plain explode makes Catalyst infer ``size(tokens(x)) > 0``
    and push it below the projection, re-inlining (and re-evaluating) the
    regex tokenize chain per row. The null filter on the generated column
    cannot sink, so the tokenizer runs exactly once per document.
    Token-less documents are dropped, same as explode."""
    return (
        df.withColumn("__toks", tokens(text_col))
        .select(F.col(id_col).alias(id_alias), F.explode_outer("__toks").alias(tok_alias))
        .filter(F.col(tok_alias).isNotNull())
    )


def whitespace_token_count(col: Column | str) -> Column:
    """Tokens by whitespace splitting of the trimmed text (0 for blank)."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    # long, not int: keeps output dtype identical to SQL oracles (DuckDB
    # len() is BIGINT) so differential value-hashing never sees a width diff
    return (
        F.when(trimmed == "", F.lit(0))
        .otherwise(F.size(F.split(trimmed, "\\s+")))
        .cast("long")
    )


def regex_token_count(col: Column | str) -> Column:
    """BPE-ish token count: number of TOKEN_PATTERN matches (letter runs,
    digit runs, single punctuation marks)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(TOKEN_PATTERN)).cast("long")


def language_id(col: Column | str, min_hits: int = 1) -> Column:
    """n-gram-free stopword-marker language ID over {en, de, fr, es}.

    score(lang) = |distinct(tokens) ∩ stopwords(lang)|; winner is the
    highest score with ties broken in the fixed order en > de > fr > es;
    'unknown' when the best score < ``min_hits``. The CASE-chain form is
    chosen over argmax-by-struct because it is expressible identically in
    DuckDB SQL.
    """
    toks = tokens(col)
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in STOPWORDS.items()
    }
    s = scores
    result = F.lit("unknown")
    # build the CASE chain back-to-front: es, fr, de, en (en checked first)
    result = F.when(
        (s["es"] >= F.lit(min_hits)), F.lit("es")
    ).otherwise(result)
    result = F.when(
        (s["fr"] >= F.lit(min_hits)) & (s["fr"] >= s["es"]), F.lit("fr")
    ).otherwise(result)
    result = F.when(
        (s["de"] >= F.lit(min_hits)) & (s["de"] >= s["fr"]) & (s["de"] >= s["es"]),
        F.lit("de"),
    ).otherwise(result)
    result = F.when(
        (s["en"] >= F.lit(min_hits)) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]),
        F.lit("en"),
    ).otherwise(result)
    return result


def quality_score(col: Column | str) -> Column:
    """Heuristic document quality in [0,1], rounded to 4 decimals:

    0.3·min(n_ws_tokens/100, 1) + 0.4·alpha_ratio
    + 0.3·min(en_stopword_hits/8, 1) − 0.2·digit_ratio,  clamped to [0,1].

    alpha_ratio / digit_ratio are character-class fractions of the raw
    length. Deliberately simple and portable — the point is the *shape*
    (cheap, columnar, shuffle-free scoring you can filter 100 TB with).
    """
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.greatest(F.length(c), F.lit(1)).cast("double")
    n_tokens = whitespace_token_count(c).cast("double")
    alpha_ratio = F.length(F.regexp_replace(F.lower(c), "[^a-z]", "")) / n_chars
    digit_ratio = F.length(F.regexp_replace(c, "[^0-9]", "")) / n_chars
    stop_hits = F.size(
        F.array_intersect(tokens(c), F.array(*[F.lit(w) for w in STOPWORDS["en"]]))
    ).cast("double")
    raw = (
        F.lit(0.3) * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + F.lit(0.4) * alpha_ratio
        + F.lit(0.3) * F.least(stop_hits / F.lit(8.0), F.lit(1.0))
        - F.lit(0.2) * digit_ratio
    )
    return F.round(F.greatest(F.least(raw, F.lit(1.0)), F.lit(0.0)), 4)


def fingerprint(col: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 hex of the sorted distinct
    token set joined by single spaces. Two documents with the same token
    *set* (any order/multiplicity) collide — the cheap first-pass dedup key.
    md5 is used (not xxhash64) because it is bit-identical across engines.
    """
    toks = tokens(col)
    canonical = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return F.md5(canonical.cast("binary"))


def ngrams_from_tokens(toks: Column, n: int = 3) -> Column:
    """All token n-grams (non-distinct, in order) from a *materialized*
    token array column. ``toks`` MUST be a plain column reference
    (``withColumn`` it first): every reference here re-evaluates the
    expression it's given, so passing the raw ``tokens(text)`` expression
    turns O(len) into O(len²) regex work — measured 5× slower at sf0.1.

    Formulation: transform-with-index + element_at (out-of-range gives
    null, concat_ws drops it), then slice off the trailing n-1 partial
    grams. slice length 0 handles docs shorter than n."""
    count = F.size(toks)
    grams = F.transform(
        toks,
        lambda x, i: F.concat_ws(
            " ", x, *[F.element_at(toks, i + F.lit(j)) for j in range(2, n + 1)]
        ),
    )
    return F.slice(grams, 1, F.greatest(count - F.lit(n - 1), F.lit(0)))


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Token n-gram shingles (distinct) from a *materialized* token array
    column — see :func:`ngrams_from_tokens` for the evaluation caveat."""
    return F.array_distinct(ngrams_from_tokens(toks, n))


def exploded_shingles(
    df: DataFrame,
    text_col: str,
    id_col: str,
    id_alias: str,
    gram_alias: str,
    n: int = 3,
) -> DataFrame:
    """(id, shingle) postings — one row per DISTINCT token n-gram per doc,
    for single-consumer explode chains. Same explode_outer + null-filter
    barrier as :func:`exploded_tokens`: a plain ``explode`` over the
    shingle projection lets Catalyst re-inline the tokenize+ngram chain
    per OUTPUT row (measured 25× slower at sf0.1 — 19.7s vs 0.8s), while
    the un-sinkable null filter pins one evaluation per document with no
    cache and no shuffle. Multi-consumer chains (e.g. jaccard's
    sizes+postings) persist the shingled frame instead — see
    dedup._pair_shingle_stats. Docs shorter than ``n`` vanish, same as
    plain explode."""
    return (
        df.withColumn("__toks", tokens(text_col))
        .withColumn("__shg", shingles_from_tokens(F.col("__toks"), n))
        .select(
            F.col(id_col).alias(id_alias),
            F.explode_outer("__shg").alias(gram_alias),
        )
        .filter(F.col(gram_alias).isNotNull())
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Token n-gram shingles from raw text. Convenience form — fine for
    small frames and tests; hot paths should materialize tokens first and
    use :func:`shingles_from_tokens` (see dedup.py)."""
    return shingles_from_tokens(tokens(col), n)


# ---------------------------------------------------------------------------
# PII redaction (training-data hygiene)
# ---------------------------------------------------------------------------

# (name, pattern, replacement) applied IN THIS ORDER — email first so its
# digit/dot substrings can't be half-eaten by the ip/phone patterns.
# Patterns are RE2-safe (no backreferences/lookaround) so the exact same
# regexes run in DuckDB for the differential oracle; \b is supported by
# both Java regex and RE2 as an ASCII word boundary.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
]


def redact_pii(col: Column | str) -> Column:
    """Replace emails, SSNs, IPv4 addresses, and NANP-style phone numbers
    with typed placeholder tags. A chain of JVM `regexp_replace`s — one
    codegen projection, no UDFs. Heuristic by design (recall-oriented
    regexes, not a legal-grade scrubber); extend PII_PATTERNS for more."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pattern, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, repl)
    return c


def pii_count(col: Column | str) -> Column:
    """Total PII matches in the ORIGINAL text (each pattern counted
    independently, non-overlapping left-to-right per pattern — identical
    semantics in Java regex and RE2)."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.lit(0)
    for _, pattern, _ in PII_PATTERNS:
        total = total + F.regexp_count(c, F.lit(pattern))
    return total.cast("long")


# ---------------------------------------------------------------------------
# Unicode script detection (multilingual-corpus triage)
# ---------------------------------------------------------------------------

# (name, Java-regex char class) — BMP ranges only (parquet text is almost
# entirely BMP; astral scripts fall into `other`). The DuckDB oracle twin
# uses the same ranges in RE2 \x{...} syntax (__spark_entry__).
SCRIPT_RANGES = [
    # 00d7 (×) and 00f7 (÷) are math signs inside the Latin-1 letter
    # block — excluded so "3 × 4" counts zero latin letters
    ("latin", "A-Za-z\\u00c0-\\u00d6\\u00d8-\\u00f6\\u00f8-\\u024f"),
    ("cyrillic", "\\u0400-\\u04ff"),
    ("greek", "\\u0370-\\u03ff"),
    ("arabic", "\\u0600-\\u06ff"),
    ("hebrew", "\\u0590-\\u05ff"),
    ("devanagari", "\\u0900-\\u097f"),
    ("cjk", "\\u4e00-\\u9fff\\u3040-\\u30ff\\uac00-\\ud7af"),
]


def script_counts(col: Column | str) -> Column:
    """struct of per-script character counts plus ``letters`` (their sum).
    Counting is subtraction of a character-class strip — one
    ``regexp_replace`` per script, all inside a single codegen projection,
    and the identical trick replays in any regex-bearing engine."""
    c = F.col(col) if isinstance(col, str) else col
    fields = []
    total = F.lit(0).cast("long")
    for name, cls in SCRIPT_RANGES:
        cnt = (
            F.length(c) - F.length(F.regexp_replace(c, f"[{cls}]", ""))
        ).cast("long")
        fields.append(cnt.alias(name))
        total = total + cnt
    return F.struct(*fields, total.alias("letters"))


def dominant_script(col: Column | str, min_fraction: float = 0.5) -> Column:
    """Name of the script holding > ``min_fraction`` of the script-letter
    mass, else ``'mixed'``; ``'unknown'`` for text with no script letters
    at all (digits/punctuation only). With the default 0.5 at most one
    script can pass the strict >; below 0.5 the first-listed passing
    script wins — deterministic either way, in any engine."""
    s = script_counts(col)
    letters = s["letters"]
    out = F.lit("mixed")
    # reversed so earlier-listed scripts take precedence when several pass
    # (possible only with min_fraction < 0.5)
    for name, _ in reversed(SCRIPT_RANGES):
        out = F.when(
            s[name].cast("double") > letters.cast("double") * F.lit(min_fraction),
            F.lit(name),
        ).otherwise(out)
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(letters == 0, F.lit("unknown"))
        .otherwise(out)
    )


# ---------------------------------------------------------------------------
# Repetition / boilerplate metrics (Gopher-style quality signals)
# ---------------------------------------------------------------------------

def lines_nonempty(col: Column | str) -> Column:
    """Trimmed, non-empty lines of the text (split on ``\\n``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.transform(F.split(c, "\n"), lambda line: F.trim(line)),
        lambda line: line != F.lit(""),
    )


def duplicate_line_ratio_from_lines(lines: Column) -> Column:
    """Fraction of non-empty lines that are repeats of an earlier line:
    1 − distinct/total, 0.0 for line-less documents. High values flag
    boilerplate (nav bars, repeated headers) — the classic Gopher
    repetition filter. ``lines`` must be a materialized column
    (see :func:`ngrams_from_tokens` for why)."""
    n = F.size(lines)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double") / n, 4
        )
    )


def repeated_ngram_ratio_from_tokens(toks: Column, n: int = 2) -> Column:
    """Fraction of token n-grams that are repeats: 1 − distinct/total,
    0.0 when the document has fewer than n tokens. Gopher-style
    duplicate-n-gram signal; columnar, shuffle-free."""
    total = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    distinct = F.size(F.array_distinct(ngrams_from_tokens(toks, n)))
    return F.when(total == 0, F.lit(0.0)).otherwise(
        F.round(F.lit(1.0) - distinct.cast("double") / total, 4)
    )


def mean_word_length_from_tokens(toks: Column) -> Column:
    """Mean token length (0.0 for token-less docs). Computed as
    total-characters/num-tokens via ``concat_ws`` so it stays inside
    codegen (no interpreted array-aggregate HOF)."""
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.round(F.length(F.concat_ws("", toks)).cast("double") / n, 4)
    )


def add_repetition_features(
    df: DataFrame,
    text_col: str = "text",
    prefix: str = "",
) -> DataFrame:
    """Attach repetition/boilerplate quality signals:

    - ``rep_bigram_ratio`` / ``rep_trigram_ratio`` — duplicate token-n-gram
      fraction,
    - ``mean_word_len`` — mean token length,
    - ``dup_line_ratio`` — duplicate non-empty-line fraction.

    Token and line arrays are materialized once and referenced multiple
    times, which keeps CollapseProject from re-inlining the regex work
    (single evaluation each); metrics themselves are pure codegen
    expressions — zero shuffles, zero UDFs."""
    c = F.col(text_col)
    out = df.withColumns({"__toks": tokens(c), "__lines": lines_nonempty(c)})
    toks, lns = F.col("__toks"), F.col("__lines")
    out = out.withColumns(
        {
            f"{prefix}rep_bigram_ratio": repeated_ngram_ratio_from_tokens(toks, 2),
            f"{prefix}rep_trigram_ratio": repeated_ngram_ratio_from_tokens(toks, 3),
            f"{prefix}mean_word_len": mean_word_length_from_tokens(toks),
            f"{prefix}dup_line_ratio": duplicate_line_ratio_from_lines(lns),
        }
    )
    return out.drop("__toks", "__lines")


def top_token_fraction(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "top_token_fraction",
) -> DataFrame:
    """Per document, the fraction of tokens taken by the single most
    frequent token (Gopher's most-common-word filter). Documents with no
    tokens are absent from the result (left-join it back if needed).

    Relational formulation — explode → (doc, token) count → per-doc
    max/sum — because an array-mode would need an interpreted aggregate
    HOF. Two hash aggregates with map-side partials; scales linearly and
    the per-doc cardinality is bounded by vocabulary size."""
    exploded = exploded_tokens(df, text_col, id_col, id_col, "__tok")
    per_tok = exploded.groupBy(id_col, "__tok").agg(F.count("*").alias("__n"))
    return per_tok.groupBy(id_col).agg(
        F.round(F.max("__n").cast("double") / F.sum("__n"), 4).alias(out_col)
    )


# Normalization chain, applied strictly in order. Every pattern is valid
# in BOTH Java regex (Spark) and RE2 (DuckDB) — literal unicode chars for
# the punctuation classes, escape-form for control chars — so the DuckDB
# oracle replays the chain verbatim (see __spark_entry__ `normalized_text`).
NORMALIZE_STEPS: list[tuple[str, str]] = [
    ("[’‘‚‛]", "'"),            # curly single quotes
    ("[“”„‟]", '"'),            # curly double quotes
    ("[–—‒―]", "-"),            # en/em/figure/horizontal dashes
    ("…", "..."),                              # ellipsis
    ("[  -​ 　]", " "),     # unicode spaces → ASCII
    ("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", ""),  # control chars (keep \t \n \r)
    ("\\r\\n?", "\n"),                              # CRLF / bare CR → LF
    ("[ \\t]+", " "),                               # collapse spaces/tabs
    ("\\n{3,}", "\n\n"),                            # cap blank-line runs
]


def normalize_text(col: Column | str) -> Column:
    """Pre-tokenization text cleanup (the CCNet/Dolma normalize stage):
    smart quotes/dashes/ellipsis → ASCII, unicode spaces → plain space,
    control characters stripped, CRLF unified, whitespace runs collapsed,
    blank-line runs capped at one empty line, ends trimmed. A fixed
    ordered ``regexp_replace`` chain — pure codegen, no UDF, and the
    exact same chain replays in any RE2/PCRE engine (full DuckDB
    oracle). Deliberately conservative: no case folding, no accent
    stripping, no tokenization — those belong to ``tokens()`` — so the
    output is still the document, just hygienic."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in NORMALIZE_STEPS:
        c = F.regexp_replace(c, pat, rep)
    return F.trim(c)


def add_text_features(
    df: DataFrame,
    text_col: str = "text",
    prefix: str = "",
) -> DataFrame:
    """Convenience: attach all text-analysis columns in one projection —
    one codegen stage, zero shuffles."""
    c = F.col(text_col)
    return df.withColumns(
        {
            f"{prefix}ws_tokens": whitespace_token_count(c),
            f"{prefix}bpe_tokens": regex_token_count(c),
            f"{prefix}lang_id": language_id(c),
            f"{prefix}quality": quality_score(c),
            f"{prefix}fingerprint": fingerprint(c),
        }
    )


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str | None = None,
) -> DataFrame:
    """Intra-document line dedup: drop repeated lines, keeping each line's
    FIRST occurrence in document order (menus, nav bars, and repeated
    footers inside one page are the classic offenders).

    Relational formulation so order is explicit and engine-portable:
    posexplode lines → min(position) per (doc, line) → position-sorted
    re-assembly. Two hash aggregates, map-side partials; the document
    body never rides through a Python worker."""
    out_col = out_col or text_col
    lines = df.select(
        F.col(id_col).alias("__did"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    )
    firsts = lines.groupBy("__did", "__line").agg(F.min("__pos").alias("__pos"))
    rebuilt = (
        firsts.groupBy("__did")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                    lambda s: s["__line"],
                ),
                "\n",
            ).alias("__clean")
        )
    )
    return (
        df.join(rebuilt, F.col(id_col) == F.col("__did"), "left")
        .withColumn(out_col, F.coalesce("__clean", F.col(text_col)))
        .drop("__did", "__clean")
    )


def strip_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_frac: float = 0.3,
    min_doc_count: int = 2,
    out_col: str | None = None,
) -> DataFrame:
    """Corpus-level boilerplate removal (the CCNet/C4 move): a non-empty
    line appearing in more than ``max_doc_frac`` of all documents (and at
    least ``min_doc_count`` of them) is template chrome — cookie banners,
    nav text, license footers — and is dropped from EVERY document, with
    the survivors re-joined in original order.

    Plan shape: one explode → per-(doc, line) dedup → line document-
    frequency aggregate; the boilerplate line set is broadcast back as an
    anti-join (it is vocabulary-sized, not corpus-sized). The total-doc
    count rides in as a 1-row broadcast (scalar-subquery shape)."""
    out_col = out_col or text_col
    lines = df.select(
        F.col(id_col).alias("__did"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    )
    n_docs = df.select(F.count(F.lit(1)).cast("double").alias("__n"))
    doc_freq = (
        lines.filter(F.trim("__line") != "")
        .select("__did", "__line")
        .distinct()
        .groupBy("__line")
        .agg(F.count(F.lit(1)).alias("__df"))
    )
    boiler = (
        doc_freq.join(F.broadcast(n_docs))
        .filter(
            (F.col("__df") >= F.lit(min_doc_count))
            & (F.col("__df") > F.col("__n") * F.lit(max_doc_frac))
        )
        .select("__line")
    )
    kept = lines.join(F.broadcast(boiler), "__line", "left_anti")
    rebuilt = kept.groupBy("__did").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
            "\n",
        ).alias("__clean")
    )
    return (
        df.join(rebuilt, F.col(id_col) == F.col("__did"), "left")
        .withColumn(out_col, F.coalesce("__clean", F.lit("")))
        .drop("__did", "__clean")
    )


def dedup_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
    min_chars: int = 1,
    out_col: str | None = None,
) -> DataFrame:
    """Corpus-WIDE exact paragraph dedup (the Dolma/CCNet paragraph move):
    each distinct paragraph keeps only its global first occurrence —
    ordered by (``id_col``, position) — and is excised from every later
    document, survivors re-joined in original order. Complements
    ``dedup_lines`` (intra-document) and ``strip_boilerplate_lines``
    (doc-frequency chrome): this is the cross-document form that kills
    syndicated articles and quoted passages once, deterministically.
    Paragraphs shorter than ``min_chars`` after trim are exempt (they'd
    otherwise weld unrelated docs together on "Introduction").

    ``sep`` is a Spark split REGEX; it doubles as the literal re-join
    separator, so keep it metacharacter-free (the default ``\\n\\n`` is).

    Plan: posexplode → one ``min(struct(id, pos))`` hash-aggregate picks
    the global winner per paragraph (no corpus-wide window) → md5-keyed
    equi-join back (narrow 32-byte shuffle keys, never the paragraph
    body) → position-sorted reassembly. The winner frame is distinct-
    paragraph-sized; every shuffle keys on paragraph-hash or doc id."""
    out_col = out_col or text_col
    paras = (
        df.select(
            F.col(id_col).alias("__did"),
            F.posexplode(F.split(F.col(text_col), sep)).alias(
                "__pos", "__para"
            ),
        )
        .withColumn("__h", F.md5(F.col("__para").cast("binary")))
        .withColumn(
            "__elig", F.length(F.trim("__para")) >= F.lit(int(min_chars))
        )
    )
    winners = (
        paras.filter("__elig")
        .groupBy("__h")
        .agg(F.min(F.struct("__did", "__pos")).alias("__w"))
    )
    kept = paras.join(winners, "__h", "left").where(
        ~F.col("__elig") | (F.struct("__did", "__pos") == F.col("__w"))
    )
    rebuilt = kept.groupBy("__did").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__para"))),
                lambda s: s["__para"],
            ),
            sep,
        ).alias("__clean")
    )
    return (
        df.join(rebuilt, F.col(id_col) == F.col("__did"), "left")
        .withColumn(out_col, F.coalesce("__clean", F.lit("")))
        .drop("__did", "__clean")
    )


def unigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "lm_score",
) -> DataFrame:
    """Language-model quality proxy: mean unigram log-probability per
    document, with the model fit on the corpus itself (add-one smoothing
    over the observed vocabulary). The cheap, model-free stand-in for a
    KenLM perplexity filter: gibberish and boilerplate-token soup score
    low, fluent text scores near the corpus mode.

    Returns (id, ``n_tokens``, ``lm_score`` = Σ ln p(tok) / n, rounded to
    4; zero-token docs are absent). Plan: one explode feeds BOTH the
    vocabulary aggregate and the per-doc join — corpus scans once; the
    (token, count) model is vocabulary-sized and joins per token with
    map-side partial sums. Scalar totals ride in as a 1-row broadcast."""
    toks = exploded_tokens(df, text_col, id_col, "__did", "__tok")
    vocab = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c"))
    totals = vocab.agg(
        F.sum("__c").cast("double").alias("__total"),
        F.count(F.lit(1)).cast("double").alias("__vsize"),
    )
    scored = (
        toks.join(vocab, "__tok")
        .join(F.broadcast(totals))
        .select(
            "__did",
            (
                F.log((F.col("__c") + 1.0) / (F.col("__total") + F.col("__vsize")))
            ).alias("__lp"),
        )
        .groupBy("__did")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg("__lp"), 4).alias(out_col),
        )
    )
    return scored.withColumnRenamed("__did", id_col)


def hashed_doc_vectors(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    seed: int = 42,
    out_col: str = "embedding",
    scale: int | None = None,
) -> DataFrame:
    """Model-free document vectors by the hashing trick: token counts
    folded into ``dim`` md5 buckets, L2-normalized — a deterministic,
    engine-reproducible featurizer that makes every embedding operator
    (cosine top-k, cell-scoped dedup, centroid pooling) applicable to a
    plain text corpus with no model at all.

    Returns (id, ``out_col`` length ``dim``, ``n_tokens``). Zero-token
    documents are absent. One explode → (doc, bucket) count → per-doc map
    assembly.

    ``scale=None`` (default): ``array<double>`` weights rounded to 6
    decimals — the embedding-operator input shape. ``scale=N`` (e.g.
    ``10**6``): ``array<long>`` integer weights ``round(w * N)`` computed
    directly from the exact IEEE quotient ``count/norm`` — bit-replayable
    across engines. Two engines' ``round(x, 6)`` can disagree in the
    invisible binary tail or at half-way ties of the DECIMAL re-quantize,
    but nearest-integer rounding of the same IEEE double is exact in
    both, so cross-engine hashes (driver correctness gates, external
    replications) should compare the scaled form."""
    from mini_etl_spark.functions.splits import hash_bucket

    toks = exploded_tokens(df, text_col, id_col, "__did", "__tok")
    counts = toks.groupBy(
        "__did", hash_bucket("__tok", seed, dim).alias("__b")
    ).agg(F.count(F.lit(1)).alias("__c"))
    per_doc = counts.groupBy("__did").agg(
        F.map_from_entries(F.collect_list(F.struct("__b", "__c"))).alias("__m"),
        F.sqrt(F.sum(F.col("__c") * F.col("__c"))).alias("__nrm"),
        F.sum("__c").cast("long").alias("n_tokens"),
    )

    def _weight(i):
        raw = (
            F.coalesce(F.element_at("__m", i.cast("long")), F.lit(0))
            / F.col("__nrm")
        )
        if scale is None:
            return F.round(raw, 6)
        return F.round(raw * F.lit(int(scale))).cast("long")

    vec = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), _weight)
    return per_doc.select(
        F.col("__did").alias(id_col), vec.alias(out_col), "n_tokens"
    )


def common_ngrams(
    df: DataFrame,
    n: int = 3,
    min_docs: int = 2,
    top_k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide repeated n-gram census — the memorization/boilerplate
    audit: which exact token n-grams appear in the most documents?

    Returns at most ``top_k`` rows ``(ngram, n_docs, occurrences)`` for
    n-grams seen in ≥ ``min_docs`` distinct documents, ordered by
    (n_docs desc, occurrences desc, ngram) — fully deterministic, so the
    result is engine-replayable. Feed the survivors to
    :func:`strip_boilerplate_lines`-style removal or use them to audit
    eval-set leakage before training.

    Scale: one explode (n-gram postings, ~tokens×1 rows since each token
    starts at most one n-gram) into one hash aggregate; the distinct-doc
    count is a two-phase aggregate on (ngram, doc) then (ngram). The
    top-k is TakeOrderedAndProject — no global sort. The explode uses the
    ``explode_outer`` + null-filter barrier (see :func:`exploded_tokens`)
    so the tokenizer chain evaluates once per document.
    """
    if n < 1:
        raise ValueError("common_ngrams: n must be >= 1")
    grams = (
        df.withColumn("__toks", tokens(text_col))
        .withColumn("__grams", ngrams_from_tokens(F.col("__toks"), n))
        .select(F.col(id_col).alias("__doc"), F.explode_outer("__grams").alias("ngram"))
        .filter(F.col("ngram").isNotNull())
    )
    per_doc = grams.groupBy("ngram", "__doc").agg(
        F.count(F.lit(1)).alias("__occ")
    )
    agg = per_doc.groupBy("ngram").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__occ").alias("occurrences"),
    )
    return (
        agg.filter(F.col("n_docs") >= F.lit(int(min_docs)))
        .orderBy(F.desc("n_docs"), F.desc("occurrences"), F.asc("ngram"))
        .limit(int(top_k))
    )


def heavy_hitters_cm(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    depth: int = 4,
    width: int = 1024,
    top_k: int = 20,
    seed: int = 1000,
) -> DataFrame:
    """Count-min-sketch heavy hitters with exact ground truth riding
    along — the streaming/mergeable frequency-sketch member of the
    sketch family (HLL cardinality, quantile sketch, now CM counts).

    The CM table is the 100 TB shape: ONE pass over the token stream
    explodes each token into ``depth`` (row, md5-bucket) entries and
    hash-aggregates to a fixed ``depth × width`` table — constant memory
    regardless of corpus size, mergeable across partitions/days by
    addition. The estimate for a token is min over rows of its bucket
    counts; CM never underestimates, and overshoot is bounded by bucket
    collisions (≈ N/width per row, min across ``depth`` rows).

    Candidates here are the exact top-``top_k`` tokens (count desc, token
    asc) so the output certifies sketch quality against truth:
    (``token``, ``exact_count``, ``cm_estimate``, ``overcount``) — all
    exact longs. md5 bucketing (splits.hash_bucket) keeps the whole
    sketch engine-replayable: the driver oracle rebuilds the identical
    table in DuckDB. In production the same sketch serves ad-hoc
    frequency probes without the exact side (drop the top-k join).

    Plan: one explode feeds BOTH the sketch aggregate and the exact
    count; the sketch (≤ depth·width rows) broadcasts back to the
    candidate probe — no shuffle scales beyond the token count
    aggregate.
    """
    from mini_etl_spark.functions.splits import hash_bucket

    if depth < 1 or width < 1:
        raise ValueError(f"depth and width must be >= 1, got {depth}, {width}")
    toks = exploded_tokens(df, text_col, id_col, "__did", "__tok")
    buckets = [
        hash_bucket("__tok", seed + d, width).alias(f"__b{d}") for d in range(depth)
    ]
    # one tokenize+explode feeds BOTH the sketch and the exact count:
    # the sketch is derived from the same `stream` frame (identical to
    # cm_sketch_table's output — bucket expressions are shared), never a
    # second scan of the corpus
    stream = toks.select("__tok", *buckets)
    sketch = (
        stream.select(
            F.posexplode(
                F.array(*[F.col(f"__b{d}") for d in range(depth)])
            ).alias("__d", "__b")
        )
        .groupBy("__d", "__b")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    exact = (
        stream.groupBy("__tok", *[f"__b{d}" for d in range(depth)])
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), F.col("__tok").asc())
        .limit(top_k)
    )
    probes = exact.select(
        "__tok",
        "exact_count",
        F.posexplode(F.array(*[F.col(f"__b{d}") for d in range(depth)])).alias(
            "__d", "__b"
        ),
    )
    est = (
        probes.join(F.broadcast(sketch), ["__d", "__b"])
        .groupBy("__tok", "exact_count")
        .agg(F.min("__c").cast("long").alias("cm_estimate"))
    )
    return est.select(
        F.col("__tok").alias("token"),
        F.col("exact_count").cast("long").alias("exact_count"),
        "cm_estimate",
        (F.col("cm_estimate") - F.col("exact_count")).cast("long").alias("overcount"),
    )


def cm_sketch_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    depth: int = 4,
    width: int = 1024,
    seed: int = 1000,
) -> DataFrame:
    """The raw count-min table as data: ``(d, b, c)`` — row, md5 bucket,
    count — for the corpus's token stream. Fixed ``depth × width`` rows
    regardless of corpus size, and MERGEABLE BY ADDITION: the sketch of
    a union is the cell-wise sum of the sketches (:func:`cm_merge`), so
    shards/days/streams sketch independently and fold — the property
    that makes frequency state viable at 100 TB. Persist it and probe
    with :func:`cm_probe`; :func:`heavy_hitters_cm` composes it with
    exact top-k ground truth."""
    from mini_etl_spark.functions.splits import hash_bucket

    if depth < 1 or width < 1:
        raise ValueError(f"depth and width must be >= 1, got {depth}, {width}")
    toks = exploded_tokens(df, text_col, id_col, "__did", "__tok")
    return (
        toks.select(
            F.posexplode(
                F.array(*[hash_bucket("__tok", seed + d, width) for d in range(depth)])
            ).alias("d", "b")
        )
        .groupBy("d", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of count-min tables built with the SAME
    (depth, width, seed) — sketch(A ∪ B) = cm_merge(sketch(A),
    sketch(B)) exactly (counts are sums; md5 buckets depend only on the
    token). The incremental/streaming accumulation step."""
    if not sketches:
        raise ValueError("cm_merge: need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "b").agg(F.sum("c").cast("long").alias("c"))


def cm_probe(
    sketch: DataFrame,
    tokens_: list[str],
    depth: int = 4,
    width: int = 1024,
    seed: int = 1000,
) -> DataFrame:
    """Frequency estimates for specific tokens from a persisted CM
    table: min over rows of the token's bucket counts. Returns
    (``token``, ``cm_estimate``); never underestimates the true count.
    The probe list is vocabulary-sized (broadcast side); the sketch is
    depth×width rows — both tiny, so probing is free at any corpus
    scale."""
    from mini_etl_spark.functions.splits import hash_bucket

    spark = sketch.sparkSession
    probes = spark.createDataFrame([(t,) for t in tokens_], ["token"]).select(
        "token",
        F.posexplode(
            F.array(*[hash_bucket("token", seed + d, width) for d in range(depth)])
        ).alias("d", "b"),
    )
    return (
        probes.join(sketch, ["d", "b"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("cm_estimate"))
    )
