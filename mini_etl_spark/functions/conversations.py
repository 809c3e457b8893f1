"""Conversation (chat / SFT) data operators.

Instruction-tuning corpora are conversations, not documents: an ordered
list of (role, content) turns per record. This module gives that modality
first-class columnar treatment with the engine's usual contracts — pure
JVM expressions (array HOFs over ``array<struct<role,content>>``), no
Python row UDFs, engine-replayable hashes for dedup keys.

Schema convention: a conversation column is
``array<struct<role: string, content: string>>`` (the JSON chat format
every SFT stack exchanges, minus extra keys). Build it from flat turn
logs with :func:`from_turns`; everything downstream is a projection.

Scale stance: ``from_turns`` is ONE hash aggregate (collect_list per
conversation — a conversation must fit in an executor row, the same
bound every chat format implies); stats/validation/rendering are
zero-shuffle projections; dedup is the standard md5-key one-shuffle
group-by. Rendered text feeds every existing text operator (quality,
MinHash dedup, decontamination) unchanged.

No reference parity: the reference has no conversation surface — this is
the training-data-pipeline extension (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mini_etl_spark.functions.text import tokens

__all__ = [
    "from_turns",
    "conversation_stats",
    "validate_conversations",
    "render_chat",
    "dedup_conversations",
    "preference_pairs",
    "redact_conversations",
    "parse_chat_json",
    "to_turns",
]

CHAT_SCHEMA = "array<struct<role: string, content: string>>"

DEFAULT_ROLES = ("system", "user", "assistant")


def _msgs(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def from_turns(
    df: DataFrame,
    id_col: str = "conv_id",
    role_col: str = "role",
    content_col: str = "content",
    order_col: str = "turn_idx",
    messages_col: str = "messages",
) -> DataFrame:
    """Group a flat turn log into ``(id, messages)`` conversations.

    One hash aggregate: turns are collected per conversation and sorted
    by ``order_col`` inside the array (``array_sort`` on a struct whose
    FIRST field is the order key — no window, no per-group sort pass).
    The order key is then stripped so the output is the canonical
    ``array<struct<role, content>>``.
    """
    packed = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(order_col).alias("o"),
                F.col(role_col).alias("role"),
                F.col(content_col).alias("content"),
            )
        )
    )
    msgs = F.transform(
        packed,
        lambda m: F.struct(
            m["role"].alias("role"), m["content"].alias("content")
        ),
    )
    return df.groupBy(id_col).agg(msgs.alias(messages_col))


def parse_chat_json(
    df: DataFrame,
    json_col: str = "chat_json",
    messages_col: str = "messages",
    drop_source: bool = True,
) -> DataFrame:
    """JSONL-chat on-ramp: parse a JSON string column of
    ``[{"role": ..., "content": ...}, ...]`` records (the interchange
    format every SFT dataset ships as) into the canonical
    ``array<struct<role, content>>`` messages column — one ``from_json``
    projection, distributed, no UDF. Extra keys in the JSON objects are
    ignored by the schema; malformed JSON yields NULL (route through
    :func:`validate_conversations`, whose ``empty`` rule catches it).
    Inverse of ``F.to_json(messages)`` — the round trip is identity
    (driver-oracled)."""
    out = df.withColumn(
        messages_col, F.from_json(F.col(json_col), CHAT_SCHEMA)
    )
    return out.drop(json_col) if drop_source and json_col != messages_col else out


def to_turns(
    df: DataFrame,
    id_col: str = "conv_id",
    messages_col: str = "messages",
) -> DataFrame:
    """Flatten conversations back to a turn log — the inverse of
    :func:`from_turns`: one ``posexplode`` to
    (``id``, ``turn_idx``, ``role``, ``content``) rows (0-based turn
    index, conversation order preserved). The bridge back onto row-level
    operators (per-turn filtering, joins against moderation labels)."""
    return df.select(
        F.col(id_col), F.posexplode(messages_col).alias("turn_idx", "__m")
    ).select(
        id_col,
        F.col("turn_idx").cast("long").alias("turn_idx"),
        F.col("__m")["role"].alias("role"),
        F.col("__m")["content"].alias("content"),
    )


def conversation_stats(
    df: DataFrame, messages_col: str = "messages"
) -> DataFrame:
    """Attach per-conversation shape stats in one zero-shuffle projection:
    ``n_turns``, ``n_user`` / ``n_assistant`` / ``n_system`` turn counts,
    ``n_tokens`` (summed over all contents, same tokenizer contract as
    text.py), ``first_role`` / ``last_role``."""
    m = _msgs(messages_col)
    tok_counts = F.transform(m, lambda x: F.size(tokens(x["content"])))

    def role_count(role: str) -> Column:
        return F.size(F.filter(m, lambda x: x["role"] == F.lit(role)))

    return (
        df.withColumn("n_turns", F.size(m))
        .withColumn("n_user", role_count("user"))
        .withColumn("n_assistant", role_count("assistant"))
        .withColumn("n_system", role_count("system"))
        .withColumn(
            "n_tokens",
            F.aggregate(
                tok_counts, F.lit(0).cast("long"), lambda acc, x: acc + x
            ),
        )
        .withColumn(
            "first_role",
            F.when(F.size(m) > 0, F.element_at(m, 1)["role"]),
        )
        .withColumn(
            "last_role",
            F.when(F.size(m) > 0, F.element_at(m, -1)["role"]),
        )
    )


def validate_conversations(
    df: DataFrame,
    messages_col: str = "messages",
    allowed_roles: tuple[str, ...] = DEFAULT_ROLES,
    errors_col: str = "conv_errors",
    valid_col: str = "conv_valid",
) -> DataFrame:
    """Attach ``conv_errors`` (array of violated-rule labels, empty = ok)
    and ``conv_valid`` in one projection. Rules (the standard SFT gates):

    - ``empty``: no turns at all;
    - ``unknown_role``: a role outside ``allowed_roles``;
    - ``empty_content``: a turn whose content is NULL/whitespace;
    - ``bad_opening``: first turn is ``assistant`` (a reply with no
      prompt); ``system``/``user`` both open legally;
    - ``consecutive_role``: two adjacent turns with the same role
      (templates require alternation after collapsing);
    - ``no_assistant``: nothing for the model to learn from.

    NULL-safe: every predicate coalesces to a violation, and a NULL
    ``messages`` array folds into ``empty`` (``F.size(NULL)`` is -1 under
    non-ANSI, so the check is ``isNull | size <= 0``), so a NULL array,
    role, or content can never slip through as valid.
    """
    m = _msgs(messages_col)
    n = F.size(m)
    allowed = F.array(*[F.lit(r) for r in allowed_roles])
    unknown = F.exists(
        m, lambda x: ~F.coalesce(F.array_contains(allowed, x["role"]), F.lit(False))
    )
    empty_content = F.exists(
        m, lambda x: F.coalesce(F.trim(x["content"]) == "", F.lit(True))
    )
    bad_opening = F.when(n > 0, F.element_at(m, 1)["role"] == "assistant").otherwise(
        F.lit(False)
    )
    # adjacent-pair role equality: zip the array with itself shifted by one
    pairs = F.zip_with(
        F.slice(m, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(m, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.coalesce(a["role"] == b["role"], F.lit(True)),
    )
    consecutive = F.exists(pairs, lambda x: x)
    no_assistant = ~F.exists(
        m, lambda x: F.coalesce(x["role"] == "assistant", F.lit(False))
    )

    checks: list[tuple[str, Column]] = [
        ("empty", m.isNull() | (n <= 0)),
        ("unknown_role", F.coalesce(unknown, F.lit(False))),
        ("empty_content", F.coalesce(empty_content, F.lit(False))),
        ("bad_opening", F.coalesce(bad_opening, F.lit(False))),
        ("consecutive_role", F.coalesce(consecutive, F.lit(False))),
        ("no_assistant", F.coalesce(no_assistant, F.lit(False))),
    ]
    errors = F.filter(
        F.array(
            *[F.when(cond, F.lit(label)).otherwise(F.lit(None)) for label, cond in checks]
        ),
        lambda x: x.isNotNull(),
    )
    out = df.withColumn(errors_col, errors)
    return out.withColumn(valid_col, F.size(F.col(errors_col)) == 0)


def render_chat(
    df: DataFrame,
    messages_col: str = "messages",
    out_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Flatten a conversation to one text column (``role: content`` lines)
    — the bridge onto every document operator (quality scoring, MinHash
    dedup, decontamination, token counting) without new machinery. Pure
    projection; the separator/format is deliberately plain (training
    templates are a tokenizer concern, not a storage one)."""
    m = _msgs(messages_col)
    rendered = F.array_join(
        F.transform(
            m, lambda x: F.concat_ws(": ", x["role"], F.coalesce(x["content"], F.lit("")))
        ),
        sep,
    )
    return df.withColumn(out_col, rendered)


def dedup_conversations(
    df: DataFrame,
    id_col: str = "conv_id",
    messages_col: str = "messages",
    by: str = "full",
) -> DataFrame:
    """Drop duplicate conversations, keeping the minimum ``id_col`` per
    key — the exact-dedup contract (dedup.exact_dedup's keeper rule).

    ``by="full"``: key = md5 of the full rendering (role+content of every
    turn) — exact-duplicate transcripts.
    ``by="prompt"``: key = md5 of the FIRST user turn's content — one
    response kept per distinct prompt (the SFT answer-dedup move; pair it
    with a quality score + ``keep_by`` ordering upstream if "first by id"
    is not the keeper you want).

    Rows with a NULL key are never collapsed: a conversation with no user
    turn (prompt mode) or a NULL messages array has nothing comparable,
    so every such row is kept as-is rather than silently merged under one
    shared empty key. Implementation keys those rows by their own id
    (no one giant shared key); rows where BOTH the key and the id are
    NULL keep a NULL key and are passed through the window's keep-filter
    wholesale — deterministic under task retry (no synthetic row ids),
    still one scan and one shuffle.

    One md5 projection + one window on the key (single shuffle).
    """
    m = _msgs(messages_col)
    if by == "full":
        key_src = F.array_join(
            F.transform(
                m,
                lambda x: F.concat_ws(
                    "\x1f", x["role"], F.coalesce(x["content"], F.lit(""))
                ),
            ),
            "\x1e",
        )
    elif by == "prompt":
        firsts = F.filter(m, lambda x: x["role"] == F.lit("user"))
        key_src = F.when(F.size(firsts) > 0, F.element_at(firsts, 1)["content"])
    else:
        raise ValueError(
            f"dedup_conversations: by must be 'full' or 'prompt', got {by!r}"
        )
    # keyless NULL-id rows have no deterministic per-row key at all (any
    # synthetic id — monotonically_increasing_id, rand — is recomputed
    # differently on partial stage retry/speculation, the known Spark
    # hazard that can duplicate or drop rows across the window's
    # shuffle). But they also never lose a dedup contest (every one is
    # kept, per the guarantee above), so their key stays NULL and the
    # keep-filter passes the whole NULL partition through: one scan, one
    # shuffle, fully deterministic output. The NULL partition's size is
    # the count of rows with neither a key nor an id — degenerate rows
    # that are ~absent from any real corpus, so no skew in practice.
    keyed = df.withColumn(
        "__ck",
        F.when(key_src.isNotNull(), F.md5(key_src.cast("binary"))).otherwise(
            # keyless rows with an id: keyed by their own id => rn=1
            # whenever ids are unique, no skew, never a shared empty key
            F.when(
                F.col(id_col).isNotNull(),
                F.concat(F.lit("\x00nokey:"), F.col(id_col).cast("string")),
            )
        ),
    )
    w = Window.partitionBy("__ck").orderBy(id_col)
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__ck").isNull() | (F.col("__rn") == 1))
        .drop("__ck", "__rn")
    )


def redact_conversations(
    df: DataFrame,
    messages_col: str = "messages",
    count_col: str | None = "n_pii",
) -> DataFrame:
    """PII redaction INSIDE the messages array — the conversation-modality
    form of :func:`~mini_etl_spark.functions.text.redact_pii`: one nested
    ``transform`` rewrites every turn's content in place (same
    email/SSN/IPv4/phone chain, same placeholders), with no
    explode → redact → re-aggregate round trip, so conversation order
    and the one-row-per-conversation shape never leave the executor.

    ``count_col`` (None to skip) attaches the total PII hits across all
    turns — the audit metric for gating (e.g. drop conversations whose
    count exceeds a policy bound instead of shipping redacted husks).
    Pure projection; zero shuffle."""
    from mini_etl_spark.functions.text import pii_count, redact_pii

    m = _msgs(messages_col)
    red = F.transform(
        m,
        lambda x: F.struct(
            x["role"].alias("role"), redact_pii(x["content"]).alias("content")
        ),
    )
    out = df
    if count_col:
        counts = F.aggregate(
            F.transform(m, lambda x: pii_count(x["content"])),
            F.lit(0).cast("long"),
            lambda acc, v: acc + F.coalesce(v, F.lit(0)),
        )
        out = out.withColumn(count_col, counts)
    return out.withColumn(messages_col, red)


def preference_pairs(
    df: DataFrame,
    prompt_col: str = "prompt_id",
    id_col: str = "completion_id",
    score_col: str = "score",
    min_margin: float = 0.0,
) -> DataFrame:
    """Build (chosen, rejected) preference pairs per prompt from scored
    completions — the DPO/RLHF pair-construction step.

    chosen = the completion maximizing (score, then smallest id on ties);
    rejected = the one minimizing (score, then LARGEST id on ties) — the
    opposite tie-break, so a two-way tie still yields two distinct rows.
    Prompts whose margin (score_chosen − score_rejected) is below
    ``min_margin``, or with only one completion, produce no pair (a pair
    the model can't learn a preference from is noise, not data).

    One hash aggregate per prompt (max_by/min_by over a struct ordering —
    no window, no per-group sort; shuffle carries one row per (map
    partition, prompt)). Returns (prompt, chosen id/score, rejected
    id/score, margin); join back on the id for payload columns.
    """
    i, s = F.col(id_col), F.col(score_col).cast("double")
    # NULL-scored completions cannot participate in preference
    # construction: under non-ANSI ordering a NULL (-s) sorts FIRST in
    # the min_by struct, so an unscored row would win `chosen` while
    # chosen_score reported max(s) of a different row (r5 review catch)
    df = df.filter(s.isNotNull())
    # one ordering key serves both ends, negating only the SCORE (numeric
    # by contract) so the id is always compared in its native ascending
    # order — string/uuid completion ids stay deterministic (a negated id
    # would cast to NULL under non-ANSI and scramble tie winners):
    #   min over (-s, id)  = (high score, tie -> smallest id) = chosen
    #   max over (-s, id)  = (low score,  tie -> LARGEST id)  = rejected
    # — opposite tie-breaks by construction, so a two-way tie still
    # yields two distinct rows
    ordkey = F.struct((-s).alias("ns"), i.alias("ti"))
    agg = df.groupBy(prompt_col).agg(
        F.min_by(i, ordkey).alias("chosen_id"),
        F.max(s).alias("chosen_score"),
        F.max_by(i, ordkey).alias("rejected_id"),
        F.min(s).alias("rejected_score"),
        F.count(F.lit(1)).alias("__n"),
    )
    return (
        agg.filter(
            (F.col("__n") >= 2)
            & (F.col("chosen_id") != F.col("rejected_id"))
            & (
                F.col("chosen_score") - F.col("rejected_score")
                >= F.lit(float(min_margin))
            )
        )
        .withColumn(
            "margin", F.col("chosen_score") - F.col("rejected_score")
        )
        .drop("__n")
    )
