"""Conversation (chat/SFT) operators: builder ordering, stats, validation
rules, rendering, and dedup keeper semantics (exact values for the composed
chain are gated by the `conversation_stats` DuckDB oracle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_etl_spark.functions.conversations import (
    conversation_stats,
    dedup_conversations,
    from_turns,
    render_chat,
    validate_conversations,
)


@pytest.fixture(scope="module")
def convs(spark):
    # flat turn log, deliberately out of order within conversations
    rows = [
        (1, 1, "assistant", "hi there"),
        (1, 0, "user", "hello bot"),
        (1, 2, "user", "how are you"),
        (1, 3, "assistant", "fine thanks"),
        (2, 0, "system", "be helpful"),
        (2, 1, "user", "question"),
        (2, 2, "assistant", "answer"),
        (3, 0, "user", "only me talking"),
        (3, 1, "user", "still me"),  # consecutive same role, no assistant
        (4, 0, "assistant", "unprompted reply"),  # bad opening
        (5, 0, "user", ""),  # empty content
        (5, 1, "assistant", "reply"),
    ]
    flat = spark.createDataFrame(
        rows, "conv_id long, turn_idx long, role string, content string"
    )
    return from_turns(flat)


def test_from_turns_orders_by_turn_idx(convs):
    msgs = {r["conv_id"]: r["messages"] for r in convs.collect()}
    assert [m["role"] for m in msgs[1]] == ["user", "assistant", "user", "assistant"]
    assert msgs[1][0]["content"] == "hello bot"
    # the order key is stripped from the output structs
    assert set(msgs[1][0].asDict()) == {"role", "content"}


def test_conversation_stats(convs):
    out = {r["conv_id"]: r for r in conversation_stats(convs).collect()}
    assert out[1]["n_turns"] == 4
    assert out[1]["n_user"] == 2 and out[1]["n_assistant"] == 2
    assert out[2]["n_system"] == 1
    assert out[1]["n_tokens"] == 9  # 2+2+3+2
    assert out[1]["first_role"] == "user" and out[1]["last_role"] == "assistant"
    assert out[2]["first_role"] == "system"


def test_validation_rules(convs):
    out = {r["conv_id"]: r for r in validate_conversations(convs).collect()}
    assert out[1]["conv_valid"] and out[1]["conv_errors"] == []
    assert out[2]["conv_valid"]
    assert set(out[3]["conv_errors"]) == {"consecutive_role", "no_assistant"}
    assert out[4]["conv_errors"] == ["bad_opening"]
    assert out[5]["conv_errors"] == ["empty_content"]
    # unknown role + NULL content are violations, never silently valid
    extra = from_turns(
        convs.sparkSession.createDataFrame(
            [(9, 0, "tool", None)],
            "conv_id long, turn_idx long, role string, content string",
        )
    )
    row = validate_conversations(extra).collect()[0]
    assert "unknown_role" in row["conv_errors"]
    assert "empty_content" in row["conv_errors"]


def test_render_chat(convs):
    out = {r["conv_id"]: r["text"] for r in render_chat(convs).collect()}
    assert out[2] == "system: be helpful\nuser: question\nassistant: answer"


def test_dedup_conversations_full_and_prompt(spark):
    rows = [
        (10, 0, "user", "same prompt"),
        (10, 1, "assistant", "answer one"),
        (11, 0, "user", "same prompt"),
        (11, 1, "assistant", "answer two"),
        (12, 0, "user", "same prompt"),
        (12, 1, "assistant", "answer one"),  # full duplicate of 10
        (13, 0, "user", "different prompt"),
        (13, 1, "assistant", "answer one"),
    ]
    convs = from_turns(
        spark.createDataFrame(
            rows, "conv_id long, turn_idx long, role string, content string"
        )
    )
    full = sorted(r["conv_id"] for r in dedup_conversations(convs, by="full").collect())
    assert full == [10, 11, 13]  # 12 is the exact transcript dup of 10
    prompt = sorted(
        r["conv_id"] for r in dedup_conversations(convs, by="prompt").collect()
    )
    assert prompt == [10, 13]  # one response per distinct first user prompt
    with pytest.raises(ValueError, match="by must be"):
        dedup_conversations(convs, by="nope")


def test_preference_pairs(spark):
    from mini_etl_spark.functions.conversations import preference_pairs

    rows = [
        # prompt 1: clear winner/loser
        (1, 10, 0.9), (1, 11, 0.2), (1, 12, 0.5),
        # prompt 2: all tied — opposite tie-breaks pick distinct rows,
        # margin 0 passes min_margin=0
        (2, 20, 0.5), (2, 21, 0.5),
        # prompt 3: single completion — no pair
        (3, 30, 1.0),
    ]
    df = spark.createDataFrame(rows, "prompt_id long, completion_id long, score double")
    out = {r["prompt_id"]: r for r in preference_pairs(df).collect()}
    assert set(out) == {1, 2}
    assert out[1]["chosen_id"] == 10 and out[1]["rejected_id"] == 11
    assert abs(out[1]["margin"] - 0.7) < 1e-9
    # tied prompt: smaller id chosen, larger id rejected, margin 0
    assert out[2]["chosen_id"] == 20 and out[2]["rejected_id"] == 21
    assert out[2]["margin"] == 0.0
    # a positive min_margin drops the tied prompt
    strict = {r["prompt_id"] for r in preference_pairs(df, min_margin=0.1).collect()}
    assert strict == {1}


def test_validate_null_messages_is_invalid(spark):
    """ADVICE r4: a NULL messages array must fold into the 'empty' rule —
    F.size(NULL) is -1 under non-ANSI, so a bare ``n == 0`` check misses
    it and every other predicate coalesces to false."""
    df = spark.createDataFrame(
        [(1, None)],
        "conv_id long, messages array<struct<role:string,content:string>>",
    )
    row = validate_conversations(df).collect()[0]
    assert row["conv_errors"] == ["empty"]
    assert row["conv_valid"] is False


def test_dedup_prompt_keeps_all_userless_conversations(spark):
    """ADVICE r4: conversations with no user turn have no prompt key —
    they must all survive by='prompt' dedup rather than collapsing onto
    one shared empty-string key."""
    rows = [
        (1, 0, "assistant", "unprompted one"),
        (2, 0, "assistant", "unprompted two"),
        (3, 0, "user", "real prompt"),
        (4, 0, "user", "real prompt"),
    ]
    convs = from_turns(
        spark.createDataFrame(
            rows, "conv_id long, turn_idx long, role string, content string"
        )
    )
    kept = sorted(
        r["conv_id"] for r in dedup_conversations(convs, by="prompt").collect()
    )
    assert kept == [1, 2, 3]  # both user-less rows kept; 4 deduped onto 3


def test_preference_pairs_string_ids_deterministic_ties(spark):
    """ADVICE r4: tie-breaks must not negate the id (casts string ids to
    NULL under non-ANSI) — the ordering key negates only the score, so
    string completion ids break ties deterministically."""
    from mini_etl_spark.functions.conversations import preference_pairs

    rows = [
        ("p1", "c-b", 0.5),
        ("p1", "c-a", 0.5),
        ("p1", "c-c", 0.5),
    ]
    df = spark.createDataFrame(
        rows, "prompt_id string, completion_id string, score double"
    )
    out = preference_pairs(df).collect()
    assert len(out) == 1
    # all tied: chosen = lexicographically smallest id, rejected = largest
    assert out[0]["chosen_id"] == "c-a"
    assert out[0]["rejected_id"] == "c-c"
    assert out[0]["margin"] == 0.0


def test_redact_conversations_in_place(spark):
    """Nested redaction: every turn's content rewritten in place, order
    and shape preserved, per-conversation hit count attached."""
    from mini_etl_spark.functions.conversations import redact_conversations

    rows = [
        (1, 0, "user", "mail me at a.b@x.org from 10.0.0.1"),
        (1, 1, "assistant", "noted, no pii here"),
        (2, 0, "user", "ssn 123-45-6789 and phone 555-123-4567"),
    ]
    convs = from_turns(
        spark.createDataFrame(
            rows, "conv_id long, turn_idx long, role string, content string"
        )
    )
    out = {r.conv_id: r for r in redact_conversations(convs).collect()}
    c1 = [m["content"] for m in out[1]["messages"]]
    assert c1 == ["mail me at <EMAIL> from <IP>", "noted, no pii here"]
    assert [m["role"] for m in out[1]["messages"]] == ["user", "assistant"]
    assert out[1]["n_pii"] == 2
    c2 = [m["content"] for m in out[2]["messages"]]
    assert c2 == ["ssn <SSN> and phone <PHONE>"]
    assert out[2]["n_pii"] == 2
    # count_col=None: no audit column
    no_count = redact_conversations(convs, count_col=None)
    assert "n_pii" not in no_count.columns


def test_preference_pairs_null_scores_excluded(spark):
    """r5 review: a NULL-scored completion must not win chosen/rejected
    (under non-ANSI ordering a NULL (-s) sorts first in the min_by
    struct) - unscored rows are excluded from pair construction."""
    from mini_etl_spark.functions.conversations import preference_pairs

    df = spark.createDataFrame(
        [("p", "a", None), ("p", "b", 1.0), ("p", "c", 0.5)],
        "prompt_id string, completion_id string, score double",
    )
    out = preference_pairs(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.chosen_id, r.rejected_id) == ("b", "c")
    assert r.chosen_score == 1.0 and r.rejected_score == 0.5
    # only NULL-scored completions for a prompt -> no pair at all
    only_null = spark.createDataFrame(
        [("q", "x", None), ("q", "y", None)],
        "prompt_id string, completion_id string, score double",
    )
    assert preference_pairs(only_null).count() == 0


def test_parse_chat_json_and_to_turns(spark):
    """JSONL on-ramp: valid chat JSON parses to the canonical schema
    (extra keys ignored), malformed JSON yields NULL (caught by the
    'empty' validation rule), and to_turns inverts from_turns."""
    from mini_etl_spark.functions.conversations import parse_chat_json, to_turns

    rows = [
        (1, '[{"role":"user","content":"hi \\"there\\""},'
            '{"role":"assistant","content":"yo","extra":42}]'),
        (2, "not json at all"),
    ]
    df = spark.createDataFrame(rows, "conv_id long, chat_json string")
    parsed = parse_chat_json(df)
    assert "chat_json" not in parsed.columns
    by_id = {r.conv_id: r.messages for r in parsed.collect()}
    assert [(m["role"], m["content"]) for m in by_id[1]] == [
        ("user", 'hi "there"'), ("assistant", "yo"),
    ]
    assert by_id[2] is None
    v = validate_conversations(parsed).filter("conv_id = 2").first()
    assert v["conv_errors"] == ["empty"]
    turns = to_turns(parsed.filter("conv_id = 1")).collect()
    assert [(r.turn_idx, r.role) for r in turns] == [(0, "user"), (1, "assistant")]
