"""Training-example assembly from multi-turn transcripts: render each
conversation as ``role: text`` lines and cut it into examples of at
most ``max_tokens`` whitespace tokens, breaking ONLY at turn
boundaries (greedy first-fit in turn order — the standard SFT
dataloader transform between a transcript store and a tokenizer).

Relation to :mod:`packing`: ``pack_sequences`` concatenates a document
corpus and cuts mid-document at exact ``seq_len``; this operator
respects conversation and turn boundaries, so examples are ragged
(≤ max_tokens) but never split a turn or mix conversations.

Scale shape: ONE shuffle — the groupBy on ``conv_id`` that collects
each conversation's turns into an array (bounded: conversations are
hundreds of turns, not millions — the same per-conversation-array
contract as aggregator_context ordering). Everything after is per-row
array expressions: a greedy fold assigns a chunk id per turn, a
``transform``/``filter`` pair materializes one struct per example, and
a single ``explode`` emits them — no second shuffle, no Python. The
fold is an interpreted HOF by design-rule #8's short-array exception
(README): it runs once per conversation over ~10²-element arrays, off
the per-token hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["conversation_examples"]


def conversation_examples(
    tx: DataFrame,
    *,
    max_tokens: int = 256,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """One row per training example:
    ``(conv_col, example_idx, n_turns, n_tokens, example_text)``.

    Token accounting: whitespace tokens of the turn text + 1 for the
    role tag. A turn longer than *max_tokens* still becomes its own
    example (greedy always makes progress). Turn order inside an
    example and example order inside a conversation follow *idx_col*.
    NULL turn text is treated as empty (1 token for the role tag) — a
    NULL must not poison the greedy fold's running sum.
    """
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")

    txt = F.coalesce(F.col(text_col), F.lit(""))
    n_tok = (
        F.when(F.length(F.trim(txt)) == 0, 0)
        .otherwise(F.size(F.split(F.trim(txt), r"\s+")))
        + 1
    ).cast("long")
    line = F.concat(F.col(role_col), F.lit(": "), txt)
    turns = tx.select(
        F.col(conv_col),
        F.struct(
            F.col(idx_col).alias("turn_idx"),
            line.alias("line"),
            n_tok.alias("n_tok"),
        ).alias("__t"),
    )
    grouped = turns.groupBy(conv_col).agg(
        F.array_sort(F.collect_list("__t")).alias("__ts")
    )

    # greedy fold: chunk id per turn (run = tokens since last cut)
    init = F.struct(
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("int").alias("cur"),
        F.array().cast("array<int>").alias("chunks"),
    )

    def step(acc, t):
        over = (acc["run"] + t["n_tok"] > max_tokens) & (acc["run"] > 0)
        nxt = F.when(over, acc["cur"] + 1).otherwise(acc["cur"]).cast("int")
        return F.struct(
            F.when(over, t["n_tok"])
            .otherwise(acc["run"] + t["n_tok"])
            .alias("run"),
            nxt.alias("cur"),
            F.array_append(acc["chunks"], nxt).alias("chunks"),
        )

    folded = grouped.withColumn(
        "__chunks", F.aggregate("__ts", init, step)["chunks"]
    )
    zipped = F.arrays_zip(F.col("__ts").alias("t"), F.col("__chunks").alias("c"))
    n_examples = F.element_at("__chunks", -1) + 1
    examples = F.transform(
        F.sequence(F.lit(0), (n_examples - 1).cast("int")),
        lambda c: F.struct(
            c.cast("int").alias("example_idx"),
            F.filter(zipped, lambda p: p["c"] == c).alias("sel"),
        ),
    )
    ex = folded.select(
        F.col(conv_col), F.explode(examples).alias("__e")
    ).select(
        conv_col,
        F.col("__e.example_idx").alias("example_idx"),
        F.size("__e.sel").cast("int").alias("n_turns"),
        F.aggregate(
            "__e.sel", F.lit(0).cast("long"), lambda a, p: a + p["t"]["n_tok"]
        ).alias("n_tokens"),
        F.concat_ws(
            "\n", F.transform("__e.sel", lambda p: p["t"]["line"])
        ).alias("example_text"),
    )
    return ex
