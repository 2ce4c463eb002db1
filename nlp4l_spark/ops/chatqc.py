"""Conversation-format QC for multi-turn chat / agent transcripts — the
SFT-data validation pass a training pipeline runs before packing: role
alternation, first/last-speaker checks, empty-turn detection, per-tool
usage stats, and per-role profiling.

Extension ops over the target transcript shape (conv_id, turn_idx, role,
text, tool, ts) from the task's input hint; the reference has no chat
concept (its records are flat Lucene docs), so these are beyond-reference
operators in the same spirit as its Validator SPI
(/root/reference/app/org/nlp4l/framework/processors/Processor.scala —
per-record validation chained in a pipeline).

Scale shape: everything is ONE window pass (lag over conv_id/turn_idx)
plus ONE groupBy(conv_id) — a single shuffle on the conversation key,
pure JVM expressions, no arrays collected per conversation (a 10^12-turn
corpus would blow per-conv collect_list on head conversations; lag +
count_if never materializes a turn list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def validate_conversations(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    user_role: str = "user",
    assistant_role: str = "assistant",
) -> DataFrame:
    """Per-conversation format flags for chat-SFT data:

    * ``starts_with_user`` — the lowest-``turn_idx`` turn has the user role
    * ``ends_with_assistant`` — the highest-``turn_idx`` turn is assistant
    * ``roles_alternate`` — no two consecutive turns share a role
    * ``has_empty_turn`` — any turn whose text trims to ''
    * ``valid`` — all of the above in their passing direction

    Turn order is the ``turn_idx`` column, not arrival order. One window
    pass + one aggregation; boolean flags are plain count_if/min_by
    aggregates, so the plan is a single shuffle on ``conv_col``.
    """
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    prev = F.lag(F.col(role_col)).over(w)
    turns = df.select(
        F.col(conv_col).alias("conv_id"),
        F.col(turn_col).alias("turn_idx"),
        F.col(role_col).alias("role"),
        (F.trim(F.col(text_col)) == "").alias("_empty"),
    ).withColumn("_same_as_prev", F.col("role") == prev)
    return (
        turns.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            (F.min_by("role", "turn_idx") == user_role).alias(
                "starts_with_user"
            ),
            (F.max_by("role", "turn_idx") == assistant_role).alias(
                "ends_with_assistant"
            ),
            (F.count_if(F.col("_same_as_prev")) == 0).alias(
                "roles_alternate"
            ),
            (F.count_if(F.col("_empty")) > 0).alias("has_empty_turn"),
        )
        .withColumn(
            "valid",
            F.col("starts_with_user")
            & F.col("ends_with_assistant")
            & F.col("roles_alternate")
            & ~F.col("has_empty_turn"),
        )
    )


def detect_turn_loops(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
    min_repeats: int = 3,
    key=None,
) -> DataFrame:
    """Agent-loop detection: the longest run of CONSECUTIVE turns in a
    conversation whose loop key repeats (an agent stuck retrying emits
    near-identical turns back-to-back). ``key`` defaults to the
    whitespace-normalized lowercased turn text; pass a coarser Column
    (e.g. a fingerprint or the leading tokens) for near-duplicate loops.

    Returns (conv_id, max_run, loop_key, has_loop): the longest run
    length, the key of that run (earliest run wins ties), and whether it
    reaches ``min_repeats``.

    One shuffle: both window passes and the aggregations partition on the
    conversation key; runs are found with the run-id island trick
    (sum of change-flags over the turn order), never by materializing a
    per-conversation turn list.
    """
    if key is None:
        key = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    turns = df.select(
        F.col(conv_col).alias("conv_id"),
        F.col(turn_col).alias("turn_idx"),
        key.alias("_key"),
    )
    change = F.when(
        F.lag("_key").over(
            Window.partitionBy("conv_id").orderBy("turn_idx")
        ).isNull()
        | (
            F.col("_key")
            != F.lag("_key").over(
                Window.partitionBy("conv_id").orderBy("turn_idx")
            )
        ),
        1,
    ).otherwise(0)
    runs = (
        turns.withColumn(
            "_run",
            F.sum(change).over(
                Window.partitionBy("conv_id")
                .orderBy("turn_idx")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("conv_id", "_run")
        .agg(
            F.count("*").alias("run_len"),
            # every row in a run shares the key by construction, so
            # first() is deterministic here
            F.first("_key").alias("_key"),
            F.min("turn_idx").alias("_start"),
        )
    )
    pick = Window.partitionBy("conv_id").orderBy(
        F.desc("run_len"), F.asc("_start")
    )
    return (
        runs.withColumn("_rn", F.row_number().over(pick))
        .filter(F.col("_rn") == 1)
        .select(
            "conv_id",
            F.col("run_len").alias("max_run"),
            F.col("_key").alias("loop_key"),
            (F.col("run_len") >= min_repeats).alias("has_loop"),
        )
    )


def tool_usage(
    df: DataFrame,
    conv_col: str = "conv_id",
    tool_col: str = "tool",
) -> DataFrame:
    """Per-tool usage stats over agent transcripts: call count, number of
    distinct conversations that used the tool, and the tool's share of
    all tool calls (round 6). NULL ``tool`` means no call on that turn.
    One filter + one groupBy; the share normalizer is a broadcast scalar
    cross-join over the tools-sized aggregate, not a corpus window.
    """
    calls = df.filter(F.col(tool_col).isNotNull()).select(
        F.col(tool_col).alias("tool"), F.col(conv_col).alias("conv_id")
    )
    agg = calls.groupBy("tool").agg(
        F.count("*").alias("n_calls"),
        F.countDistinct("conv_id").alias("n_convs"),
    )
    total = agg.agg(F.sum("n_calls").alias("_total"))
    return agg.crossJoin(F.broadcast(total)).select(
        "tool",
        "n_calls",
        "n_convs",
        F.round(F.col("n_calls").cast("double") / F.col("_total"), 6).alias(
            "share"
        ),
    )


def role_profile(
    df: DataFrame,
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Per-role turn profile: turn count, mean turn length in chars
    (round 6), and the role's share of all turns (round 6) — the
    user/assistant balance check run before SFT packing. One groupBy.
    """
    agg = df.groupBy(F.col(role_col).alias("role")).agg(
        F.count("*").alias("n_turns"),
        F.round(F.avg(F.length(F.col(text_col))), 6).alias("avg_chars"),
    )
    total = agg.agg(F.sum("n_turns").alias("_total"))
    return agg.crossJoin(F.broadcast(total)).select(
        "role",
        "n_turns",
        "avg_chars",
        F.round(F.col("n_turns").cast("double") / F.col("_total"), 6).alias(
            "share"
        ),
    )


def flagged_turn_triage(
    turns: DataFrame,
    terms: list[str],
    *,
    role: str = "assistant",
    text_col: str = "text",
    analyzer=None,
) -> DataFrame:
    """Policy-term triage over one role's turns — the SFT-filtering pass
    that screens assistant messages against a flagged-phrase list
    (refusal boilerplate, safety phrases, leaked system-prompt markers):
    per conversation, how many ``role`` turns contain >= 1 flagged term,
    the flag rate, and the earliest flagged turn. ``terms`` are matched
    token-level under the analyzer contract (multiword phrases belong in
    ops/dictmatch's FST-shape matcher).

    Output (conv_id, n_role_turns, n_flagged, flag_rate,
    first_flag_turn) — first_flag_turn null when nothing flagged.

    Plan: one filtered scan (arrays_overlap against the literal term
    array, pure JVM) + one groupBy(conv_id) — the chatqc single-shuffle
    contract; no per-conv turn lists."""
    from nlp4l_spark.analysis import STANDARD_ANALYZER

    az = analyzer or STANDARD_ANALYZER
    flagged = F.arrays_overlap(
        az.tokens_expr(text_col), F.array(*[F.lit(t) for t in terms])
    )
    base = turns.filter(F.col("role") == role).select(
        "conv_id", "turn_idx", flagged.alias("_f")
    )
    return (
        base.groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_role_turns"),
            F.sum(F.col("_f").cast("long")).cast("long").alias("n_flagged"),
            F.round(
                F.sum(F.col("_f").cast("long")).cast("double") / F.count("*"),
                6,
            ).alias("flag_rate"),
            F.min(F.when(F.col("_f"), F.col("turn_idx")))
            .cast("int")
            .alias("first_flag_turn"),
        )
        .orderBy("conv_id")
    )


def truncate_context(
    turns: DataFrame,
    budget: int,
    text_col: str = "text",
) -> DataFrame:
    """Context-window truncation at TURN granularity — the serving-time
    pass that keeps the longest SUFFIX of each conversation fitting a
    token budget (chat history always truncates from the front, never
    mid-turn). A turn is kept iff the total tokens from it to the
    conversation's end is <= ``budget``; a single over-budget final
    turn yields an empty kept set (kept_turns = 0), matching the
    "drop history, then the message itself is too big" serving contract.

    Output per conversation: (conv_id, n_turns, total_tokens,
    kept_turns, kept_tokens, first_kept_turn; first_kept_turn null when
    nothing fits).

    Plan: one reverse cumulative-sum window + one groupBy on the SAME
    conv_id key — the window's hash partitioning is reused by the
    aggregation, a single shuffle end-to-end. Token counts use the
    BPE-ish proxy of ops/textqc.token_count_col."""
    from nlp4l_spark.ops.textqc import token_count_col

    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.desc("turn_idx"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    base = turns.select(
        "conv_id",
        "turn_idx",
        token_count_col(text_col).cast("long").alias("n_tokens"),
    ).withColumn("_suffix", F.sum("n_tokens").over(w))
    keep = F.col("_suffix") <= budget
    return (
        base.groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum(keep.cast("long")).cast("long").alias("kept_turns"),
            F.coalesce(
                F.sum(F.when(keep, F.col("n_tokens"))), F.lit(0)
            )
            .cast("long")
            .alias("kept_tokens"),
            F.min(F.when(keep, F.col("turn_idx")))
            .cast("int")
            .alias("first_kept_turn"),
        )
        .orderBy("conv_id")
    )


def pack_with_loss_mask(
    turns: DataFrame,
    seq_len: int = 256,
    n_shards: int = 8,
    text_col: str = "text",
    loss_role: str = "assistant",
    salt: str = "sft",
) -> DataFrame:
    """SFT sequence packing with loss masks: conversations are
    concatenated into per-shard token streams (the pack_sequences
    layout, conv-atomic so a dialogue never splits across shards) and
    every TURN is placed at its global token offset with
    ``loss_mask`` = 1 only for ``loss_role`` turns — the standard
    "train on assistant tokens only" SFT recipe, emitted as the
    placement table a batch loader consumes.

    Output per turn: (conv_id, turn_idx, shard, tok_start, n_tokens,
    loss_mask, seq_first, seq_last).

    Plan: turn token counts -> conv-internal prefix sum (window on
    conv_id) -> conv totals (groupBy conv_id, same key, same exchange)
    -> conv placement prefix sum per shard (window over the CONV-level
    table, shard-keyed — conv-count-sized, not turn-count-sized) ->
    broadcast-eligible join of conv offsets back to turns. Two keyed
    shuffles of the turns table total; the shard window never sees
    individual turns."""
    from nlp4l_spark.ops.textqc import token_count_col

    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col("conv_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % n_shards
    )
    wt = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    base = turns.select(
        "conv_id",
        "turn_idx",
        "role",
        token_count_col(text_col).cast("long").alias("n_tokens"),
    ).withColumn(
        "turn_off", F.sum("n_tokens").over(wt) - F.col("n_tokens")
    )
    conv = base.groupBy("conv_id").agg(
        F.sum("n_tokens").alias("conv_tokens")
    )
    wc = (
        Window.partitionBy("shard")
        .orderBy("conv_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    placed = conv.withColumn("shard", shard).withColumn(
        "conv_start", F.sum("conv_tokens").over(wc) - F.col("conv_tokens")
    )
    out = base.join(
        placed.select("conv_id", "shard", "conv_start"), "conv_id"
    ).select(
        "conv_id",
        "turn_idx",
        "shard",
        (F.col("conv_start") + F.col("turn_off")).alias("tok_start"),
        "n_tokens",
        (F.col("role") == loss_role).cast("int").alias("loss_mask"),
    )
    return out.select(
        "conv_id",
        "turn_idx",
        "shard",
        "tok_start",
        "n_tokens",
        "loss_mask",
        F.floor(F.col("tok_start") / seq_len).cast("long").alias("seq_first"),
        F.floor(
            F.greatest(
                F.col("tok_start") + F.col("n_tokens") - 1, F.col("tok_start")
            )
            / seq_len
        )
        .cast("long")
        .alias("seq_last"),
    )


def middle_out_truncate(
    turns: DataFrame,
    budget: int,
    text_col: str = "text",
) -> DataFrame:
    """Middle-out context truncation — the 'lost in the middle'
    mitigation (Liu et al. 2023): the conversation's FIRST turn (the
    system/task anchor) is always kept when it fits, and the remaining
    budget keeps the longest suffix of the LATER turns; the middle
    drops first. Contract details: if the first turn alone exceeds the
    budget nothing is kept (the serving error case); a suffix turn is
    kept iff first-turn tokens + tokens from it to the end fit; when
    the whole conversation fits, kept == all turns (head and suffix
    meet).

    Output per conversation: (conv_id, n_turns, total_tokens,
    kept_turns, kept_tokens, dropped_middle = n_turns - kept_turns).

    Plan: same single-shuffle shape as truncate_context — one
    conv-keyed window pass (reverse cumulative sum + first-turn token
    broadcast within the partition via a max-over) and one groupBy on
    the same key."""
    from nlp4l_spark.ops.textqc import token_count_col

    wfull = Window.partitionBy("conv_id")
    wsfx = (
        Window.partitionBy("conv_id")
        .orderBy(F.desc("turn_idx"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    base = turns.select(
        "conv_id",
        "turn_idx",
        token_count_col(text_col).cast("long").alias("n_tokens"),
    )
    first_idx = F.min("turn_idx").over(wfull)
    first_tok = F.max(
        F.when(F.col("turn_idx") == first_idx, F.col("n_tokens"))
    ).over(wfull)
    base = (
        base.withColumn("_suffix", F.sum("n_tokens").over(wsfx))
        .withColumn("_first_idx", first_idx)
        .withColumn("_first_tok", first_tok)
    )
    head_fits = F.col("_first_tok") <= budget
    is_first = F.col("turn_idx") == F.col("_first_idx")
    keep = head_fits & (
        is_first
        | (F.col("_first_tok") + F.col("_suffix") <= budget)
    )
    return (
        base.groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum(keep.cast("long")).cast("long").alias("kept_turns"),
            F.coalesce(F.sum(F.when(keep, F.col("n_tokens"))), F.lit(0))
            .cast("long")
            .alias("kept_tokens"),
            (F.count("*") - F.sum(keep.cast("long")))
            .cast("long")
            .alias("dropped_middle"),
        )
        .orderBy("conv_id")
    )
