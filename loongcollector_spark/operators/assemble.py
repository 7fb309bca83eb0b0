"""Training-example assembly from multi-turn transcripts: render each
conversation as ``role: text`` lines and cut it into examples of at
most ``max_tokens`` whitespace tokens, breaking ONLY at turn
boundaries (greedy first-fit in turn order — the standard SFT
dataloader transform between a transcript store and a tokenizer).

Relation to :mod:`packing`: ``pack_sequences`` concatenates a document
corpus and cuts mid-document at exact ``seq_len``; this operator
respects conversation and turn boundaries, so examples are ragged
(≤ max_tokens) but never split a turn or mix conversations.

Scale shape — hot-conversation-safe by construction:

* The greedy cut is inherently sequential per conversation, and a
  Zipf-hot conversation (the 24M-turn generated table carries a 1M-turn
  conversation) can neither be ``collect_list``-ed into one row (arrays
  don't spill → measured executor OOM) nor folded with
  ``F.aggregate``+``array_append`` (the accumulator rebuild is
  quadratic → measured 305 s for 24M turns). So conversations are
  pre-split into *blocks* of ~``block_tokens`` via a windowed running
  sum (window sorts SPILL — the hot key costs disk, not heap), and the
  greedy cut runs per (conversation, block) group in an Arrow-batched
  ``applyInPandas`` — the design-rule-#4 case of Python where the
  semantics demand imperative state, O(block) per group.
* Two full-payload shuffles: the window (hash on the conversation
  key) and the applyInPandas grouping (hash on (conversation, block) —
  a DIFFERENT distribution, so the exchange is not reused), plus one
  window over EXAMPLE rows (max_tokens-bounded) for the dense
  per-conversation example index.

Block-boundary semantics: greedy restarts at each block edge, so one
example per ~``block_tokens`` tokens may end short — identical output
to an unblocked fold for every conversation smaller than one block
(the common case; default 65 536 tokens), deviation bounded and
documented for the hot tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = [
    "conversation_examples",
    "render_chat",
    "best_of_n",
    "conv_windows",
    "rm_pairs",
    "pair_overlap",
    "length_bias",
]


def conversation_examples(
    tx: DataFrame,
    *,
    max_tokens: int = 256,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    block_tokens: int = 65_536,
) -> DataFrame:
    """One row per training example:
    ``(conv_col, example_idx, n_turns, n_tokens, example_text)``.

    Token accounting: whitespace tokens of the turn text + 1 for the
    role tag. A turn longer than *max_tokens* still becomes its own
    example (greedy always makes progress). Turn order inside an
    example and example order inside a conversation follow *idx_col*.
    NULL turn text is treated as empty (1 token for the role tag),
    and a NULL role renders as an empty tag — neither may poison the
    cut or kill a task. Ties on *idx_col* (and NULL idx values) order
    deterministically by the rendered line (stable sort both in the
    window and in the cut), so output is rerun/parallelism-invariant
    even on dirty data.

    *block_tokens* bounds per-group state for hot conversations (see
    module docstring); it must be ≥ *max_tokens*.
    """
    import pandas as pd

    conv_type = tx.schema[conv_col].dataType

    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if block_tokens < max_tokens:
        raise ValueError("block_tokens must be >= max_tokens")

    txt = F.coalesce(F.col(text_col), F.lit(""))
    from .text import _ws_token_count

    n_tok = (_ws_token_count(txt) + 1).cast("long")
    line = F.concat(F.coalesce(F.col(role_col), F.lit("")), F.lit(": "), txt)

    w = W.partitionBy("__conv").orderBy(
        F.col("__idx").asc_nulls_first(), F.col("__line").asc_nulls_first()
    )
    cum_before = F.coalesce(
        F.sum("__n").over(w.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
    )
    turns = tx.select(
        # cast: the applyInPandas schema pins the key as string
        F.col(conv_col).cast("string").alias("__conv"),
        F.col(idx_col).alias("__idx"),
        line.alias("__line"),
        n_tok.alias("__n"),
    ).withColumn("__blk", (cum_before / F.lit(block_tokens)).cast("long"))

    def cut(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["__idx", "__line"], kind="mergesort", na_position="first"
        )
        lines = pdf["__line"].tolist()
        toks = pdf["__n"].tolist()
        conv = pdf["__conv"].iloc[0]
        blk = int(pdf["__blk"].iloc[0])
        out, cur_lines, run, chunk = [], [], 0, 0
        for ln, n in zip(lines, toks):
            if run > 0 and run + n > max_tokens:
                out.append((conv, blk, chunk, len(cur_lines), run, "\n".join(cur_lines)))
                chunk += 1
                cur_lines, run = [], 0
            cur_lines.append(ln)
            run += int(n)
        if cur_lines:
            out.append((conv, blk, chunk, len(cur_lines), run, "\n".join(cur_lines)))
        return pd.DataFrame(
            out,
            columns=["__conv", "__blk", "__blk_chunk", "n_turns", "n_tokens", "example_text"],
        )

    ex = turns.groupBy("__conv", "__blk").applyInPandas(
        cut,
        schema=(
            "__conv string, __blk long, __blk_chunk int, "
            "n_turns int, n_tokens long, example_text string"
        ),
    )
    # dense conversation-wide example index across blocks (example rows
    # are max_tokens-bounded — this window sorts example rows, not turns)
    we = W.partitionBy("__conv").orderBy("__blk", "__blk_chunk")
    return (
        ex.withColumn("example_idx", (F.row_number().over(we) - 1).cast("int"))
        .select(
            F.col("__conv").cast(conv_type).alias(conv_col),
            "example_idx",
            "n_turns",
            "n_tokens",
            "example_text",
        )
    )


def render_chat(
    tx: DataFrame,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    max_turns: int = 4096,
    turn_start: str = "<|im_start|>",
    turn_end: str = "<|im_end|>",
) -> DataFrame:
    """Render each conversation into ONE ChatML-style training string
    — ``<|im_start|>role\\ntext<|im_end|>`` per turn, newline-joined
    in stable turn order — the serialization step between the
    transcript store and a tokenizer (the public ChatML framing;
    :func:`conversation_examples` cuts by token budget, this renders
    whole — capped — conversations for pipelines that tokenize with
    their own truncation).

    Returns ``(conv_col, n_turns, chat_text)`` where ``n_turns`` is
    the rendered turn count (≤ *max_turns*).

    Scale contract: the output VALUE is conversation-sized, so a
    Zipf-hot 1M-turn conversation would otherwise materialize an
    unbounded string in one row (the measured collect_list OOM of
    the assemble campaign, SCALE.md). The cap keeps only the LAST
    *max_turns* turns (the truncate_context recency discipline) via
    a row_number over (conv, idx DESC) BEFORE any aggregation, so the
    collect_list upper bound is max_turns structs per group. One
    shuffle on *conv_col* shared by the window and the groupBy (same
    key, Catalyst reuses the exchange); the per-turn formatting is a
    ``transform`` lambda referencing only its lambda variable (no
    outer-expression re-eval — the dsir lesson).

    NULL text renders as empty; NULL role as ``unknown``.
    """
    if max_turns < 1:
        raise ValueError("render_chat: max_turns must be >= 1")
    w = W.partitionBy(conv_col).orderBy(F.col(idx_col).desc())
    capped = (
        tx.select(
            F.col(conv_col),
            F.col(idx_col),
            F.coalesce(F.col(role_col), F.lit("unknown")).alias("__role"),
            F.coalesce(F.col(text_col), F.lit("")).alias("__text"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_turns)
    )
    agg = capped.groupBy(conv_col).agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sort_array(
            F.collect_list(F.struct(F.col(idx_col), "__role", "__text"))
        ).alias("__turns"),
    )
    render = F.transform(
        "__turns",
        lambda t: F.concat(
            F.lit(turn_start),
            t["__role"],
            F.lit("\n"),
            t["__text"],
            F.lit(turn_end),
        ),
    )
    return agg.select(
        conv_col,
        "n_turns",
        F.array_join(render, "\n").alias("chat_text"),
    )


def preference_pairs(
    tx: DataFrame,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    prompt_role: str = "user",
    response_role: str = "assistant",
    min_distinct: int = 2,
) -> DataFrame:
    """Preference-pair (DPO/RLHF) assembly from transcripts: for every
    normalized prompt text that received ≥ *min_distinct* DISTINCT
    assistant responses ACROSS conversations, emit one (chosen,
    rejected) pair — chosen = the highest-scoring response, rejected =
    the lowest. The baseline score is the whitespace token count of
    the response (the classic verbosity prior used when no reward
    model is available); ties are broken by response text so the pair
    is a pure function of the corpus (struct-max ≡ ORDER BY score
    DESC, text DESC; struct-min ≡ ASC, ASC).

    A prompt is a *prompt_role* turn immediately followed (by
    ``turn_idx``) by a *response_role* turn in the same conversation;
    prompts are grouped by the shared fuzzy-dedup normalization so
    formatting variants of the same question pool their responses.

    Returns ``(prompt, n_responses, n_distinct, chosen, chosen_score,
    rejected, rejected_score)``.

    Scale shape: one window shuffle on *conv_col* (the shared
    transcript partitioning), then ONE groupBy on the normalized
    prompt over skinny (prompt, response, score) rows — max/min of a
    (score, text) struct are map-side combinable, so a viral prompt
    asked in 10^6 conversations reduces per-task before the exchange.
    No Python, no collect; both aggregates are codegen.
    """
    if min_distinct < 2:
        raise ValueError("preference_pairs: min_distinct must be >= 2")
    from .dedup import _norm_text

    w = W.partitionBy(conv_col).orderBy(idx_col)
    nxt_role = F.lead(role_col).over(w)
    nxt_text = F.lead(text_col).over(w)
    pairs = (
        tx.select(
            F.col(role_col).alias("__role"),
            F.col(text_col).alias("__ptxt"),
            nxt_role.alias("__nrole"),
            F.coalesce(nxt_text, F.lit("")).alias("response"),
        )
        .filter(
            (F.col("__role") == prompt_role)
            & (F.col("__nrole") == response_role)
        )
        .select(
            _norm_text(F.coalesce(F.col("__ptxt"), F.lit(""))).alias("prompt"),
            "response",
        )
        .filter(F.col("prompt") != "")
    )
    from .text import _ws_token_count

    score = _ws_token_count(F.col("response")).cast("long")
    scored = pairs.select("prompt", "response", score.alias("__score"))
    agg = scored.groupBy("prompt").agg(
        F.count("*").cast("long").alias("n_responses"),
        F.countDistinct("response").cast("long").alias("n_distinct"),
        F.max(F.struct(F.col("__score").alias("s"), F.col("response").alias("t"))).alias("__hi"),
        F.min(F.struct(F.col("__score").alias("s"), F.col("response").alias("t"))).alias("__lo"),
    )
    return agg.filter(F.col("n_distinct") >= min_distinct).select(
        "prompt",
        "n_responses",
        "n_distinct",
        F.col("__hi.t").alias("chosen"),
        F.col("__hi.s").alias("chosen_score"),
        F.col("__lo.t").alias("rejected"),
        F.col("__lo.s").alias("rejected_score"),
    )


def best_of_n(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    *,
    min_candidates: int = 2,
) -> DataFrame:
    """Best-of-n (rejection-sampling) selection: per candidate group,
    pick the highest-scoring row and report the margin over the
    RUNNER-UP — the standard select step when n sampled completions
    per prompt are scored by a reward model and only the winner (and
    its confidence margin) feeds the next training round. Complements
    :func:`preference_pairs`, which pairs best against WORST; the
    best-vs-second margin is the rejection-sampling confidence signal
    (margin 0 ⇒ the "winner" is a coin flip; margin NULL ⇒ a
    singleton group with no runner-up at all).

    Ties break on ascending *id_col*, so the output is a pure function
    of the input set (struct-ordering, no nondeterministic ``max_by``).

    Returns ``(group_col, n_candidates, winner_id, best_score,
    second_score, margin)`` for groups with ≥ *min_candidates* rows.

    Scale shape: a rank-limit window (``row_number ≤ 2``) that Spark
    rewrites to WindowGroupLimit — each map task keeps its local top-2
    per group BEFORE the exchange, so a viral prompt with 10^6
    candidates ships ~2 rows per upstream task, not 10^6 — plus a
    skinny map-side-combinable count aggregate on the same key; the
    two branches join on *group_col* with both sides already hashed on
    it. No Python, no collect_list (an unbounded per-group array is
    exactly the hot-key OOM assemble.py's header documents).
    """
    if min_candidates < 1:
        raise ValueError("best_of_n: min_candidates must be >= 1")
    ranked = (
        df.select(
            F.col(group_col),
            F.col(score_col).alias("__s"),
            F.col(id_col).alias("__id"),
        )
        .withColumn(
            "__rn",
            F.row_number().over(
                W.partitionBy(group_col).orderBy(
                    F.col("__s").desc(), F.col("__id").asc()
                )
            ),
        )
        .filter(F.col("__rn") <= 2)
    )
    top2 = ranked.groupBy(group_col).agg(
        F.max(F.when(F.col("__rn") == 1, F.col("__id"))).alias("winner_id"),
        F.max(F.when(F.col("__rn") == 1, F.col("__s"))).alias("best_score"),
        F.max(F.when(F.col("__rn") == 2, F.col("__s"))).alias("second_score"),
    )
    counts = df.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_candidates")
    )
    out = counts.join(top2, group_col).filter(
        F.col("n_candidates") >= min_candidates
    )
    # margin is NULL for a singleton group (no runner-up existed) —
    # distinct from margin 0, a genuine best-vs-second tie
    return out.select(
        group_col,
        "n_candidates",
        "winner_id",
        "best_score",
        "second_score",
        (F.col("best_score") - F.col("second_score")).alias("margin"),
    )


def conv_windows(
    tx: DataFrame,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    k: int = 4,
    stride: int = 2,
) -> DataFrame:
    """Sliding k-turn windows over each conversation — the chunking
    step a conversation-RAG index runs (the dialogue counterpart of
    :func:`..chunking.chunk_documents`, which windows TOKENS of flat
    documents; here the unit is the turn, so windows never cut a turn
    and every window is a coherent dialogue fragment). Windows start
    every *stride* turns (dense positions, not raw ``turn_idx``
    values, so gap-y conversations window identically to dense ones)
    and contain up to *k* consecutive turns rendered as ``role: text``
    lines; the tail windows shorter than *k* are kept (the final
    context matters most for retrieval).

    Returns ``(conv_col, window_idx, start_idx, n_turns, n_tokens,
    window_text)`` — ``window_idx`` dense per conversation,
    ``start_idx`` the first turn's *idx_col*.

    Scale shape: ONE exchange — the dense position, the k ``lead``
    columns and nothing else run over the shared conv window; the
    stride filter is a per-row predicate on the dense position. A
    Zipf-hot conversation is one spilling sort, then O(turns·k/stride)
    sequential work. No collect_list, no per-group arrays.
    """
    if k < 1:
        raise ValueError("conv_windows: k must be >= 1")
    if stride < 1:
        raise ValueError("conv_windows: stride must be >= 1")
    line = F.concat(
        F.coalesce(F.col(role_col), F.lit("")),
        F.lit(": "),
        F.coalesce(F.col(text_col), F.lit("")),
    )
    w = W.partitionBy(conv_col).orderBy("__idx")
    base = tx.select(
        F.col(conv_col),
        F.col(idx_col).alias("__idx"),
        line.alias("__line"),
    ).select(
        F.col(conv_col),
        F.col("__idx"),
        (F.row_number().over(w) - 1).alias("__pos"),
        F.col("__line"),
        *[
            F.lead("__line", i).over(w).alias(f"__l{i}")
            for i in range(1, k)
        ],
    )
    parts = [F.col("__line")] + [F.col(f"__l{i}") for i in range(1, k)]
    # concat_ws skips NULL leads, so tail windows shorten naturally
    window_text = F.concat_ws("\n", *parts)
    n_turns = sum(
        (F.when(c.isNotNull(), 1).otherwise(0) for c in parts[1:]),
        F.lit(1),
    )
    wins = base.filter(F.col("__pos") % stride == 0).select(
        F.col(conv_col),
        (F.col("__pos") / stride).cast("int").alias("window_idx"),
        F.col("__idx").alias("start_idx"),
        n_turns.cast("int").alias("n_turns"),
        window_text.alias("window_text"),
    )
    from .text import _ws_token_count

    n_tokens = _ws_token_count(F.col("window_text"))
    return wins.select(
        conv_col,
        "window_idx",
        "start_idx",
        "n_turns",
        n_tokens.cast("long").alias("n_tokens"),
        "window_text",
    )


def rm_pairs(
    tx: DataFrame,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    response_role: str = "assistant",
    k: int = 3,
) -> DataFrame:
    """(context, response) pair extraction for reward-model / critic
    training: every *response_role* turn becomes one example whose
    context is the previous *k* turns rendered as ``role: text``
    lines — the dataset shape RM training consumes (complements
    :func:`preference_pairs`, which needs MULTIPLE responses per
    prompt; this emits every response with its real multi-turn
    context).

    Returns ``(conv_col, idx_col, n_context_turns, context_text,
    response_text)``; responses with no prior turns are kept with an
    empty context (a conversation-opening assistant turn is still a
    trainable example).

    Scale shape: ONE exchange — k ``lag`` columns over the shared conv
    window, then a per-row filter on the role. No self-joins, no
    arrays, no Python.
    """
    if k < 1:
        raise ValueError("rm_pairs: k must be >= 1")
    line = F.concat(
        F.coalesce(F.col(role_col), F.lit("")),
        F.lit(": "),
        F.coalesce(F.col(text_col), F.lit("")),
    )
    w = W.partitionBy(conv_col).orderBy(idx_col)
    base = tx.select(
        F.col(conv_col),
        F.col(idx_col),
        F.col(role_col).alias("__role"),
        F.coalesce(F.col(text_col), F.lit("")).alias("__text"),
        line.alias("__line"),
    ).select(
        F.col(conv_col),
        F.col(idx_col),
        F.col("__role"),
        F.col("__text"),
        *[
            F.lag("__line", i).over(w).alias(f"__c{i}")
            for i in range(k, 0, -1)
        ],
    )
    ctx_parts = [F.col(f"__c{i}") for i in range(k, 0, -1)]
    n_ctx = sum(
        (F.when(c.isNotNull(), 1).otherwise(0) for c in ctx_parts),
        F.lit(0),
    )
    return base.filter(F.col("__role") == response_role).select(
        conv_col,
        idx_col,
        n_ctx.cast("int").alias("n_context_turns"),
        F.concat_ws("\n", *ctx_parts).alias("context_text"),
        F.col("__text").alias("response_text"),
    )


def pair_overlap(
    pairs: DataFrame,
    *,
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
    near_dup_threshold: float = 0.8,
) -> DataFrame:
    """Preference-pair hygiene: lexical overlap between the chosen and
    rejected response of every pair. Near-identical pairs carry almost
    no preference signal (the reward gradient is the DIFFERENCE), so RM
    pipelines drop or downweight high-overlap pairs before training.

    Adds per pair:
    * ``jaccard``      — distinct-token Jaccard of the two responses
      (6 dp; 0.0 when both are empty)
    * ``len_ratio``    — min/max token-count ratio (6 dp)
    * ``high_overlap`` — jaccard ≥ *near_dup_threshold* (compared on
      the ROUNDED value so both engines flag identically)

    Pure projection over array codegen (split → distinct → intersect)
    — no shuffle, no Python; the pair table is already the reduced
    output of preference_pairs, so at corpus scale this scans pairs,
    never transcripts.
    """

    from .text import distinct_tokens

    def toks(c: str):
        return distinct_tokens(F.coalesce(F.col(c), F.lit("")))

    a, b = toks(chosen_col), toks(rejected_col)
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    jac = F.when(union > 0, F.round(inter / union, 6)).otherwise(F.lit(0.0))
    ratio = F.when(
        F.greatest(F.size(a), F.size(b)) > 0,
        F.round(
            F.least(F.size(a), F.size(b))
            / F.greatest(F.size(a), F.size(b)),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return (
        pairs.withColumn("jaccard", jac)
        .withColumn("len_ratio", ratio)
        .withColumn(
            "high_overlap", F.col("jaccard") >= F.lit(near_dup_threshold)
        )
    )


def length_bias(
    pairs: DataFrame,
    *,
    chosen_score_col: str = "chosen_score",
    rejected_score_col: str = "rejected_score",
    small_max: int = 4,
    medium_max: int = 19,
) -> DataFrame:
    """Length-bias audit over assembled preference pairs — the DPO/RM
    hygiene report: when chosen responses are systematically LONGER
    than rejected ones, preference training learns verbosity instead
    of quality (the classic RLHF length-hack), so curation wants the
    margin distribution before any pair ships. Consumes the
    :func:`preference_pairs` (or :func:`rm_pairs`) output via its
    token-count score columns.

    Pairs are bucketed by the token-length margin ``chosen_score −
    rejected_score``: ``equal`` (0), ``small`` (1–*small_max*),
    ``medium`` (*small_max*+1–*medium_max*), ``large`` (>
    *medium_max*); a negative margin (possible when scores come from
    a reward model rather than the verbosity prior) lands in
    ``chosen_shorter``. Returns per bucket ``(bucket, n_pairs, share,
    mean_margin, sum_chosen_tokens, sum_rejected_tokens)``.

    Float discipline: every sum is an exact integer; ``share`` and
    ``mean_margin`` are ONE division of identical ints each (rounded
    to 6), so any engine reproduces them bit-for-bit.

    Scale shape: one map-side-combining groupBy on a 5-value key over
    skinny (bucket, two ints) projections, then the share window runs
    on the ≤5-row reduced table — O(buckets), not O(pairs).
    """
    margin = (
        F.col(chosen_score_col).cast("long")
        - F.col(rejected_score_col).cast("long")
    )
    bucket = (
        F.when(margin < 0, F.lit("chosen_shorter"))
        .when(margin == 0, F.lit("equal"))
        .when(margin <= small_max, F.lit("small"))
        .when(margin <= medium_max, F.lit("medium"))
        .otherwise(F.lit("large"))
    )
    rows = pairs.select(
        bucket.alias("bucket"),
        margin.alias("__margin"),
        F.col(chosen_score_col).cast("long").alias("__c"),
        F.col(rejected_score_col).cast("long").alias("__r"),
    )
    agg = rows.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("__margin").cast("long").alias("__sum_margin"),
        F.sum("__c").cast("long").alias("sum_chosen_tokens"),
        F.sum("__r").cast("long").alias("sum_rejected_tokens"),
    )
    total = W.partitionBy()
    return agg.select(
        "bucket",
        "n_pairs",
        F.round(F.col("n_pairs") / F.sum("n_pairs").over(total), 6).alias(
            "share"
        ),
        F.round(F.col("__sum_margin") / F.col("n_pairs"), 6).alias(
            "mean_margin"
        ),
        "sum_chosen_tokens",
        "sum_rejected_tokens",
    )
