"""Conversation-format QC (ops/chatqc.py): crafted conversations covering
every flag direction, out-of-order turn_idx delivery, empty turns, and
tool-usage shares."""

from __future__ import annotations

import pytest

from nlp4l_spark.ops.chatqc import (
    role_profile,
    tool_usage,
    validate_conversations,
)

TURNS = [
    # conv 0: perfectly valid 4-turn chat
    (0, 0, "user", "hi", None),
    (0, 1, "assistant", "hello", "search"),
    (0, 2, "user", "thanks", None),
    (0, 3, "assistant", "welcome", None),
    # conv 1: starts with assistant, ends with user
    (1, 0, "assistant", "proactive", None),
    (1, 1, "user", "ok", None),
    # conv 2: two consecutive user turns (alternation break)
    (2, 0, "user", "first", None),
    (2, 1, "user", "second", "code"),
    (2, 2, "assistant", "reply", "code"),
    # conv 3: whitespace-only turn
    (3, 0, "user", "   ", None),
    (3, 1, "assistant", "non-empty", "search"),
    # conv 4: rows arrive out of turn_idx order — order is the column
    (4, 1, "assistant", "second", None),
    (4, 0, "user", "first", None),
]
SCHEMA = "conv_id long, turn_idx int, role string, text string, tool string"


@pytest.fixture(scope="module")
def turns(spark):
    return spark.createDataFrame(TURNS, SCHEMA)


def test_validate_flags(spark, turns):
    got = {
        r["conv_id"]: r.asDict()
        for r in validate_conversations(turns).collect()
    }
    assert got[0] == {
        "conv_id": 0,
        "n_turns": 4,
        "starts_with_user": True,
        "ends_with_assistant": True,
        "roles_alternate": True,
        "has_empty_turn": False,
        "valid": True,
    }
    assert not got[1]["starts_with_user"]
    assert not got[1]["ends_with_assistant"]
    assert got[1]["roles_alternate"] and not got[1]["valid"]
    assert not got[2]["roles_alternate"] and not got[2]["valid"]
    assert got[3]["has_empty_turn"] and not got[3]["valid"]
    # out-of-order delivery must not corrupt order-derived flags
    assert got[4]["starts_with_user"] and got[4]["ends_with_assistant"]
    assert got[4]["roles_alternate"] and got[4]["valid"]


def test_tool_usage(spark, turns):
    got = {r["tool"]: r.asDict() for r in tool_usage(turns).collect()}
    assert set(got) == {"search", "code"}
    assert got["search"]["n_calls"] == 2 and got["search"]["n_convs"] == 2
    assert got["code"]["n_calls"] == 2 and got["code"]["n_convs"] == 1
    assert got["search"]["share"] == pytest.approx(0.5)
    assert got["code"]["share"] == pytest.approx(0.5)


def test_role_profile(spark, turns):
    got = {r["role"]: r.asDict() for r in role_profile(turns).collect()}
    n_user = sum(1 for t in TURNS if t[2] == "user")
    n_asst = sum(1 for t in TURNS if t[2] == "assistant")
    assert got["user"]["n_turns"] == n_user
    assert got["assistant"]["n_turns"] == n_asst
    assert got["user"]["share"] == pytest.approx(n_user / len(TURNS), abs=1e-6)
    chars = [len(t[3]) for t in TURNS if t[2] == "assistant"]
    assert got["assistant"]["avg_chars"] == pytest.approx(
        sum(chars) / len(chars), abs=1e-6
    )


def test_single_turn_conversation(spark):
    df = spark.createDataFrame([(9, 0, "user", "solo", None)], SCHEMA)
    r = validate_conversations(df).collect()[0]
    # one turn: trivially alternating, starts user but can't end assistant
    assert r["roles_alternate"] and r["starts_with_user"]
    assert not r["ends_with_assistant"] and not r["valid"]


def test_detect_turn_loops(spark):
    from nlp4l_spark.ops.chatqc import detect_turn_loops

    rows = [
        # conv 0: agent stuck — same normalized text 3x in a row
        (0, 0, "u", "do the thing", None),
        (0, 1, "a", "Retrying   tool call", None),
        (0, 2, "a", "retrying tool call", None),
        (0, 3, "a", " RETRYING TOOL CALL ", None),
        (0, 4, "u", "stop", None),
        # conv 1: repeats but never consecutively
        (1, 0, "u", "ping", None),
        (1, 1, "a", "pong", None),
        (1, 2, "u", "ping", None),
        # conv 2: two runs of 2 — earliest run must win the tie
        (2, 0, "a", "bb", None),
        (2, 1, "a", "bb", None),
        (2, 2, "a", "cc", None),
        (2, 3, "a", "cc", None),
        # conv 3: out-of-order delivery of a run
        (3, 2, "a", "zz", None),
        (3, 0, "a", "zz", None),
        (3, 1, "a", "zz", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, text string, tool string"
    )
    got = {r["conv_id"]: r.asDict() for r in detect_turn_loops(df).collect()}
    assert got[0]["max_run"] == 3 and got[0]["has_loop"]
    assert got[0]["loop_key"] == "retrying tool call"
    assert got[1]["max_run"] == 1 and not got[1]["has_loop"]
    assert got[2]["max_run"] == 2 and got[2]["loop_key"] == "bb"
    assert not got[2]["has_loop"]  # min_repeats defaults to 3
    assert got[3]["max_run"] == 3 and got[3]["has_loop"]
    # min_repeats boundary
    got2 = {
        r["conv_id"]: r["has_loop"]
        for r in detect_turn_loops(df, min_repeats=2).collect()
    }
    assert got2 == {0: True, 1: False, 2: True, 3: True}


def test_flagged_turn_triage(spark):
    from nlp4l_spark.ops.chatqc import flagged_turn_triage

    turns2 = spark.createDataFrame(
        [
            # conv 0: assistant flagged at turn 1 (token 'sorry'), not 3
            (0, 0, "user", "please do x", None),
            (0, 1, "assistant", "sorry I cannot", None),
            (0, 2, "user", "why", None),
            (0, 3, "assistant", "policy reasons", None),
            # conv 1: nothing flagged
            (1, 0, "user", "hi", None),
            (1, 1, "assistant", "hello there", None),
            # conv 2: user turn contains the term but only the
            # assistant role is screened
            (2, 0, "user", "sorry to bother", None),
            (2, 1, "assistant", "no problem", None),
        ],
        "conv_id long, turn_idx int, role string, text string, tool string",
    )
    got = {
        r["conv_id"]: (
            r["n_role_turns"],
            r["n_flagged"],
            r["flag_rate"],
            r["first_flag_turn"],
        )
        for r in flagged_turn_triage(turns2, ["sorry", "cannot"]).collect()
    }
    assert got == {
        0: (2, 1, 0.5, 1),
        1: (1, 0, 0.0, None),
        2: (1, 0, 0.0, None),
    }


def test_truncate_context_edges(spark):
    from nlp4l_spark.ops.chatqc import truncate_context

    rows = [
        # conv 0: 3 turns of 2/3/4 tokens; budget 7 keeps suffix (1,2)
        (0, 0, "u", "a b"),
        (0, 1, "a", "c d e"),
        (0, 2, "u", "f g h i"),
        # conv 1: single turn over budget -> kept 0, first_kept null
        (1, 0, "u", "t1 t2 t3 t4 t5 t6 t7 t8"),
        # conv 2: everything fits
        (2, 0, "u", "x"),
        (2, 1, "a", "y z"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, text string"
    )
    got = {
        r["conv_id"]: (
            r["n_turns"],
            r["total_tokens"],
            r["kept_turns"],
            r["kept_tokens"],
            r["first_kept_turn"],
        )
        for r in truncate_context(df, budget=7).collect()
    }
    assert got == {
        0: (3, 9, 2, 7, 1),
        1: (1, 8, 0, 0, None),
        2: (2, 3, 2, 3, 0),
    }


def test_pack_with_loss_mask_layout(spark):
    from nlp4l_spark.ops.chatqc import pack_with_loss_mask

    rows = [
        (0, 0, "user", "a b c"),
        (0, 1, "assistant", "d e"),
        (1, 0, "user", "x"),
        (1, 1, "assistant", "y z w"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, text string"
    )
    out = pack_with_loss_mask(df, seq_len=4, n_shards=1).collect()
    by_turn = {(r["conv_id"], r["turn_idx"]): r for r in out}
    # conv-atomic stream in conv_id order: conv 0 at 0..4, conv 1 at 5..8
    assert by_turn[(0, 0)]["tok_start"] == 0
    assert by_turn[(0, 1)]["tok_start"] == 3
    assert by_turn[(1, 0)]["tok_start"] == 5
    assert by_turn[(1, 1)]["tok_start"] == 6
    # loss mask on assistant turns only
    assert [by_turn[k]["loss_mask"] for k in sorted(by_turn)] == [0, 1, 0, 1]
    # a turn straddling the seq_len=4 boundary spans both sequences
    assert (by_turn[(0, 1)]["seq_first"], by_turn[(0, 1)]["seq_last"]) == (0, 1)
    # offsets within a shard never overlap: token intervals are disjoint
    ivs = sorted(
        (r["tok_start"], r["tok_start"] + r["n_tokens"]) for r in out
    )
    assert all(a[1] <= b[0] for a, b in zip(ivs, ivs[1:]))
