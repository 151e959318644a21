"""SFT / preference-data preparation operators — the post-pretraining
half of a training-data pipeline: turn-structured conversations rendered
into a chat template with LOSS-MASK spans (train only on assistant
tokens), and chosen/rejected preference pairs for reward-model /
DPO-style training.

Both are pure built-in-function plans (no UDF): the template is literal
string arithmetic, the span offsets fall out of a cumulative-length
window, and the pair selection is two deterministic window ranks — all
SQL-replicable, so both operators are fully DuckDB-oracled (q120/q121).

Scale shapes:

* `assemble_conversations`: ONE exchange — hashpartitioning(conv_id)
  feeds the turn-offset window AND the final per-conversation aggregate
  (partitioning reuse, the bin_manifest pattern). Per-group state is one
  conversation's rendered text: bounded by conversation length, not
  corpus size.
* `preference_pairs`: ONE exchange — both ranking windows and the final
  aggregate share hashpartitioning(group); Spark stacks the two sort
  orders as in-partition re-sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def assemble_conversations(
    turns: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    loss_roles: tuple[str, ...] = ("assistant",),
) -> DataFrame:
    """Render turn-structured data into one chat-templated document per
    conversation, with the character spans a loader needs to build the
    SFT loss mask.

    Input: one row per turn ``(conv_id, turn_idx, role, text)``; turns
    render in ``turn_idx`` order as ``<|{role}|>\\n{text}\\n``. Null text
    AND null role render as empty strings (the turn marker still
    appears — ``<||>`` for a null role — so turn structure survives and
    ``n_chars == length(chat_text)`` holds unconditionally; a
    null-propagating concat would instead silently DROP the turn's text
    from chat_text while n_turns still counted it). A null role is
    never a loss role. ``turn_idx`` must be unique within a
    conversation — the rendering order is the contract, and a duplicate
    index would make it ambiguous.

    Output: ``(conv_id, chat_text, n_turns, n_chars, loss_spans)`` where
    ``loss_spans`` is an array of ``(turn_idx, span_start, span_end)``
    structs — the [start, end) offsets of each ``loss_roles`` turn's
    text PAYLOAD inside ``chat_text`` (markers excluded): exactly the
    region SFT computes loss on. Spans of an all-``loss_roles``-free
    conversation are an empty array, not null.

    Everything is exact string arithmetic: a turn's rendered length is
    ``len(role) + 6 + len(text)`` (``<|`` + ``|>`` + two newlines = 6
    marker chars), offsets are the exclusive running sum of rendered
    lengths, and the payload span starts ``len(role) + 5`` past the
    turn start (past ``<|role|>\\n``).
    """
    for c in (conv_col, turn_col, role_col, text_col):
        if c not in turns.columns:
            raise ValueError(
                f"assemble_conversations: column {c!r} is not in the input "
                f"frame (has {turns.columns})"
            )
    txt = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    role = F.coalesce(F.col(role_col).cast("string"), F.lit(""))
    rendered = F.concat(F.lit("<|"), role, F.lit("|>\n"), txt, F.lit("\n"))
    rlen = (F.length(role) + 6 + F.length(txt)).cast("bigint")
    w = Window.partitionBy(conv_col).orderBy(
        F.asc_nulls_last(turn_col), F.asc_nulls_last(role_col)
    )
    turn_start = F.coalesce(
        F.sum("__rlen").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    base = turns.select(
        F.col(conv_col),
        F.col(turn_col),
        role.alias(role_col),
        rendered.alias("__rendered"),
        rlen.alias("__rlen"),
        F.length(txt).cast("bigint").alias("__tlen"),
    ).select(
        conv_col,
        turn_col,
        role_col,
        "__rendered",
        "__rlen",
        "__tlen",
        turn_start.alias("__start"),
        F.row_number().over(w).alias("__rn"),
    )
    span_start = (
        F.col("__start") + F.length(F.col(role_col)) + 5
    ).cast("bigint")
    rows = base.select(
        conv_col,
        "__rn",
        "__rendered",
        "__rlen",
        F.when(
            F.col(role_col).isin(*loss_roles),
            F.struct(
                F.col(turn_col).alias("turn_idx"),
                span_start.alias("span_start"),
                (span_start + F.col("__tlen")).alias("span_end"),
            ),
        ).alias("__span"),
    )

    def _ordered(col: str) -> F.Column:
        # the q58/q105 sorted-array idiom: bare collect_list order is
        # partition-dependent, so collect (rn, v) structs and array_sort
        return F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("__rn").alias("rn"), F.col(col).alias("v"))
                )
            ),
            lambda x: x["v"],
        )

    return rows.groupBy(conv_col).agg(
        F.array_join(_ordered("__rendered"), "").alias("chat_text"),
        F.count("*").cast("bigint").alias("n_turns"),
        F.sum("__rlen").cast("bigint").alias("n_chars"),
        F.filter(_ordered("__span"), lambda s: s.isNotNull()).alias(
            "loss_spans"
        ),
    )


def preference_pairs(
    df: DataFrame,
    group_col: str = "prompt_id",
    id_col: str = "doc_id",
    score_col: str = "score",
    round_dp: int = 6,
) -> DataFrame:
    """Chosen/rejected pair construction for reward-model / DPO data:
    within each prompt group, the highest-scoring response is ``chosen``
    and the lowest-scoring is ``rejected`` — deterministic ties (chosen:
    score desc then id asc; rejected: score asc then id DESC, so a
    two-way score tie yields the two distinct rows, not the same row
    twice). Groups that cannot produce two distinct rows (singletons)
    are dropped; a zero margin (all scores equal) is kept — margin
    filtering is the caller's policy, pair CONSTRUCTION isn't.

    Output: ``(group, chosen_id, rejected_id, chosen_score,
    rejected_score, margin)`` with scores and margin rounded to
    ``round_dp`` (the cross-engine float firewall). Null-score rows are
    EXCLUDED before ranking (an unscored response can be neither chosen
    nor rejected), so a group of only null scores is dropped.

    ONE exchange: both ranking windows and the final aggregate share
    hashpartitioning(group); per-group state is two rows.
    """
    for c in (group_col, id_col, score_col):
        if c not in df.columns:
            raise ValueError(
                f"preference_pairs: column {c!r} is not in the input frame "
                f"(has {df.columns})"
            )
    wc = Window.partitionBy(group_col).orderBy(
        F.desc_nulls_last(score_col), F.asc_nulls_last(id_col)
    )
    wr = Window.partitionBy(group_col).orderBy(
        F.asc_nulls_last(score_col), F.desc_nulls_last(id_col)
    )
    ranked = df.where(F.col(score_col).isNotNull()).select(
        F.col(group_col),
        F.col(id_col),
        F.round(F.col(score_col).cast("double"), round_dp).alias("__s"),
        F.row_number().over(wc).alias("__rc"),
        F.row_number().over(wr).alias("__rr"),
    )
    pairs = (
        ranked.where((F.col("__rc") == 1) | (F.col("__rr") == 1))
        .groupBy(group_col)
        .agg(
            F.max(F.when(F.col("__rc") == 1, F.col(id_col))).alias("chosen_id"),
            F.max(F.when(F.col("__rr") == 1, F.col(id_col))).alias(
                "rejected_id"
            ),
            F.max(F.when(F.col("__rc") == 1, F.col("__s"))).alias(
                "chosen_score"
            ),
            F.max(F.when(F.col("__rr") == 1, F.col("__s"))).alias(
                "rejected_score"
            ),
        )
    )
    return pairs.where(
        F.col("chosen_id") != F.col("rejected_id")
    ).select(
        group_col,
        "chosen_id",
        "rejected_id",
        "chosen_score",
        "rejected_score",
        F.round(
            F.col("chosen_score") - F.col("rejected_score"), round_dp
        ).alias("margin"),
    )
