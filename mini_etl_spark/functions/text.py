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
    parts = F.split(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "), " ")
    return F.filter(parts, lambda t: t != F.lit(""))


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


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Token n-gram shingles (distinct) from a *materialized* token array
    column. ``toks`` MUST be a plain column reference (``withColumn`` it
    first): every reference here re-evaluates the expression it's given, so
    passing the raw ``tokens(text)`` expression turns O(len) into O(len²)
    regex work — measured 5× slower at sf0.1.

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
    return F.array_distinct(
        F.slice(grams, 1, F.greatest(count - F.lit(n - 1), F.lit(0)))
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Token n-gram shingles from raw text. Convenience form — fine for
    small frames and tests; hot paths should materialize tokens first and
    use :func:`shingles_from_tokens` (see dedup.py)."""
    return shingles_from_tokens(tokens(col), n)


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
