"""Training-example assembly (operators/assemble.py)."""

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.operators.assemble import conversation_examples


def _tx(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def test_greedy_turn_boundary_cuts(spark):
    tx = _tx(
        spark,
        [
            ("c1", 0, "user", "hello there friend"),    # 4 tokens w/ role
            ("c1", 1, "assistant", "hi how are you"),   # 5
            ("c1", 2, "user", "fine thanks"),           # 3
            ("c1", 3, "assistant", "great"),            # 2
        ],
    )
    out = conversation_examples(tx, max_tokens=8).orderBy("example_idx").collect()
    assert [(r.example_idx, r.n_turns, r.n_tokens) for r in out] == [
        (0, 1, 4),
        (1, 2, 8),  # 5 + 3 fits exactly
        (2, 1, 2),
    ]
    assert out[1].example_text == "assistant: hi how are you\nuser: fine thanks"


def test_oversized_turn_gets_own_example(spark):
    tx = _tx(spark, [("c", 0, "user", " ".join(["w"] * 50)), ("c", 1, "user", "ok")])
    out = conversation_examples(tx, max_tokens=10).orderBy("example_idx").collect()
    assert len(out) == 2
    assert out[0].n_tokens == 51 and out[0].n_turns == 1
    assert out[1].n_tokens == 2  # "ok" + role tag


def test_conversations_never_mix(spark):
    tx = _tx(
        spark,
        [("a", 0, "user", "x"), ("b", 0, "user", "y"), ("a", 1, "tool", "z")],
    )
    out = conversation_examples(tx, max_tokens=1000).collect()
    by_conv = {r.conv_id: r for r in out}
    assert by_conv["a"].n_turns == 2 and by_conv["b"].n_turns == 1
    assert by_conv["a"].example_text == "user: x\ntool: z"


def test_turn_order_follows_idx_not_input_order(spark):
    tx = _tx(spark, [("c", 2, "user", "third"), ("c", 0, "user", "first"), ("c", 1, "user", "second")])
    out = conversation_examples(tx.repartition(8), max_tokens=1000).collect()[0]
    assert out.example_text == "user: first\nuser: second\nuser: third"


def test_token_conservation_and_bound(spark, sf_dir):
    from loongcollector_spark.sources.transcripts import load_transcripts

    tx = load_transcripts(spark, sf_dir)
    out = conversation_examples(tx, max_tokens=120)
    # every turn lands in exactly one example
    per_turn = tx.select(
        (
            F.when(F.length(F.trim("text")) == 0, 0)
            .otherwise(F.size(F.split(F.trim("text"), r"\s+")))
            + 1
        ).alias("n")
    ).agg(F.sum("n")).first()[0]
    assert out.agg(F.sum("n_tokens")).first()[0] == per_turn
    # bound respected except single-oversized-turn examples
    viol = out.filter((F.col("n_tokens") > 120) & (F.col("n_turns") > 1)).count()
    assert viol == 0


def test_max_tokens_guard(spark):
    tx = _tx(spark, [("c", 0, "user", "x")])
    with pytest.raises(ValueError, match="max_tokens"):
        conversation_examples(tx, max_tokens=0)


def test_block_split_bounds_hot_conversations(spark):
    """Hot-conversation guard: with a small block_tokens the fold runs
    per block (bounded arrays) — bound and token conservation hold,
    and greedy restarts at block edges (documented deviation)."""
    tx = _tx(spark, [("c", i, "u", "a b c") for i in range(5)])  # 4 tok each
    out = (
        conversation_examples(tx, max_tokens=8, block_tokens=10)
        .orderBy("example_idx")
        .collect()
    )
    # blocks: cum_before 0,4,8,12,16 -> blk 0,0,0,1,1
    # blk0 greedy(8): [t0,t1]=8, [t2]=4 ; blk1: [t3,t4]=8
    assert [(r.example_idx, r.n_turns, r.n_tokens) for r in out] == [
        (0, 2, 8),
        (1, 1, 4),
        (2, 2, 8),
    ]
    # conservation + bound regardless of blocking
    assert sum(r.n_tokens for r in out) == 20
    assert all(r.n_tokens <= 8 for r in out)
    # example_idx is dense and ordered across blocks
    assert [r.example_idx for r in out] == [0, 1, 2]


def test_block_default_matches_unblocked(spark, sf_dir):
    """At the default block size every test conversation fits one
    block — results identical to an effectively-unblocked run."""
    from loongcollector_spark.sources.transcripts import load_transcripts

    tx = load_transcripts(spark, sf_dir)
    a = sorted(map(tuple, conversation_examples(tx, max_tokens=120).collect()))
    b = sorted(
        map(
            tuple,
            conversation_examples(
                tx, max_tokens=120, block_tokens=10_000_000
            ).collect(),
        )
    )
    assert a == b


def test_block_guard(spark):
    tx = _tx(spark, [("c", 0, "u", "x")])
    with pytest.raises(ValueError, match="block_tokens"):
        conversation_examples(tx, max_tokens=100, block_tokens=50)


def test_null_role_and_bigint_conv_id(spark):
    """Dirty-data hardening: NULL role renders an empty tag (no task
    death), and a non-string conv_id keeps its dtype on output."""
    tx = spark.createDataFrame(
        [(7, 0, None, "hello there"), (7, 1, "user", None)],
        "conv_id long, turn_idx int, role string, text string",
    )
    out = conversation_examples(tx, max_tokens=100).collect()
    assert len(out) == 1
    assert out[0].example_text == ": hello there\nuser: "
    assert out[0].n_tokens == 3 + 1
    assert dict(conversation_examples(tx, max_tokens=100).dtypes)["conv_id"] == "bigint"


def test_duplicate_turn_idx_is_deterministic(spark):
    """Tied turn_idx values order by rendered line — output identical
    across partitionings (the rerun-invariance contract on dirty data)."""
    rows = [("c", 1, "user", t) for t in ("bbb", "aaa", "ccc")] + [
        ("c", 0, "user", "zzz")
    ]
    tx = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    a = conversation_examples(tx, max_tokens=1000).collect()[0].example_text
    b = (
        conversation_examples(tx.repartition(8), max_tokens=1000)
        .collect()[0]
        .example_text
    )
    assert a == b == "user: zzz\nuser: aaa\nuser: bbb\nuser: ccc"
