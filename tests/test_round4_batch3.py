"""Round-4 session-3 additions: role_conformance, truncate_context,
pmi_collocations, token_drift — hand-checked edge cases beyond the
DuckDB oracle match (NULLs, budget boundaries, smoothing limits)."""

import math

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.operators.aggregate import role_conformance
from loongcollector_spark.operators.chunking import truncate_context
from loongcollector_spark.operators.delta import token_drift
from loongcollector_spark.operators.text import pmi_collocations


# ------------------------------------------------------- role_conformance


def test_role_conformance_flags(spark):
    rows = [
        # good: system open, strict alternation
        ("c1", 0, "system"), ("c1", 1, "user"), ("c1", 2, "assistant"),
        # repeat: user twice back-to-back
        ("c2", 0, "user"), ("c2", 1, "user"), ("c2", 2, "assistant"),
        # unknown role + assistant opening
        ("c3", 0, "assistant"), ("c3", 1, "alien"),
    ]
    tx = spark.createDataFrame(rows, "conv_id string, turn_idx long, role string")
    out = {r["conv_id"]: r.asDict() for r in role_conformance(tx).collect()}
    assert out["c1"]["conformant"] and out["c1"]["n_repeat_role"] == 0
    assert out["c2"]["n_repeat_role"] == 1 and not out["c2"]["conformant"]
    assert out["c3"]["n_unknown_role"] == 1
    assert out["c3"]["first_role"] == "assistant" and not out["c3"]["conformant"]


def test_role_conformance_order_not_row_order(spark):
    # turn_idx defines adjacency even when rows arrive shuffled
    rows = [("c", 2, "user"), ("c", 0, "user"), ("c", 1, "assistant")]
    tx = spark.createDataFrame(rows, "conv_id string, turn_idx long, role string")
    r = role_conformance(tx).collect()[0]
    assert r["n_repeat_role"] == 0 and r["first_role"] == "user"
    assert r["conformant"]


# ------------------------------------------------------- truncate_context


def test_truncate_keeps_maximal_suffix(spark):
    rows = [
        ("c", 0, "a b c d"),   # 4 tokens — dropped (4+3+2 > 6)
        ("c", 1, "a b c"),     # 3 tokens
        ("c", 2, "a b"),       # 2 tokens
    ]
    tx = spark.createDataFrame(rows, "conv_id string, turn_idx long, text string")
    kept = sorted(
        (r["turn_idx"], r["tokens_from_end"])
        for r in truncate_context(tx, 6).collect()
    )
    assert kept == [(1, 5), (2, 2)]


def test_truncate_always_keeps_final_turn(spark):
    rows = [("c", 0, "x y"), ("c", 1, " ".join(["w"] * 50))]
    tx = spark.createDataFrame(rows, "conv_id string, turn_idx long, text string")
    kept = truncate_context(tx, 10).collect()
    assert [(r["turn_idx"], r["n_tokens"]) for r in kept] == [(1, 50)]


def test_truncate_null_and_blank_are_zero_tokens(spark):
    rows = [("c", 0, "a b"), ("c", 1, None), ("c", 2, "   "), ("c", 3, "z")]
    tx = spark.createDataFrame(rows, "conv_id string, turn_idx long, text string")
    kept = {r["turn_idx"]: r["n_tokens"] for r in truncate_context(tx, 3).collect()}
    # zero-token turns cost nothing: everything fits in budget 3
    assert kept == {0: 2, 1: 0, 2: 0, 3: 1}


def test_truncate_rejects_bad_budget(spark):
    tx = spark.createDataFrame(
        [("c", 0, "a")], "conv_id string, turn_idx long, text string"
    )
    with pytest.raises(ValueError):
        truncate_context(tx, 0)


# ------------------------------------------------------ pmi_collocations


def test_pmi_hand_computed(spark):
    # corpus: "a b" ×3 and "c d" ×1 → N_tok=8, N_pairs=4
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, "c d")],
        "doc_id long, text string",
    )
    out = pmi_collocations(docs, k=5, min_count=1).collect()
    got = {(r["w1"], r["w2"]): (r["pair_count"], r["pmi"]) for r in out}
    # pmi(a,b) = ln((3/4) / ((3/8)(3/8))) = ln(16/3)
    assert got[("a", "b")][0] == 3
    assert got[("a", "b")][1] == pytest.approx(math.log(16 / 3), abs=1e-12)
    # pmi(c,d) = ln((1/4) / ((1/8)(1/8))) = ln(16)
    assert got[("c", "d")][1] == pytest.approx(math.log(16.0), abs=1e-12)
    # rank 1 is the higher-PMI pair (c,d)
    assert [r["rank"] for r in out] == [1, 2]
    assert (out[0]["w1"], out[0]["w2"]) == ("c", "d")


def test_pmi_min_count_filters(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "c d")], "doc_id long, text string"
    )
    pairs = {(r["w1"], r["w2"]) for r in pmi_collocations(docs, min_count=2).collect()}
    assert pairs == {("a", "b")}


def test_pmi_single_token_docs_contribute_unigrams_only(spark):
    # "solo" appears only in 1-token docs: no pair, but its count
    # still dilutes N_tok
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "solo"), (3, None)], "doc_id long, text string"
    )
    out = pmi_collocations(docs, min_count=1).collect()
    assert {(r["w1"], r["w2"]) for r in out} == {("a", "b")}
    # N_tok=3, N_pairs=1: pmi = ln((1/1) / ((1/3)(1/3))) = ln 9
    assert out[0]["pmi"] == pytest.approx(math.log(9.0), abs=1e-12)


# ------------------------------------------------------------ token_drift


def test_token_drift_hand_computed(spark):
    old = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    new = spark.createDataFrame([(2, "b b c")], "doc_id long, text string")
    out = {r["term"]: r for r in token_drift(old, new, k=10).collect()}
    # union vocab V=3, N_old=3, N_new=3, alpha=1 → denom 6 each side
    assert out["a"]["log_ratio"] == pytest.approx(math.log(1 / 3), abs=1e-12)
    assert out["c"]["log_ratio"] == pytest.approx(math.log(2 / 1), abs=1e-12)
    assert out["b"]["log_ratio"] == pytest.approx(math.log(3 / 2), abs=1e-12)
    assert (out["a"]["count_old"], out["a"]["count_new"]) == (2, 0)
    # rank by |log_ratio| desc: a (1.0986) > c (0.693) > b (0.405)
    assert [r["term"] for r in sorted(out.values(), key=lambda r: r["rank"])] == [
        "a", "c", "b"
    ]


def test_token_drift_identical_corpora_is_zero(spark):
    docs = spark.createDataFrame(
        [(1, "x y z"), (2, "x x")], "doc_id long, text string"
    )
    out = token_drift(docs, docs, k=10).collect()
    assert out and all(r["log_ratio"] == pytest.approx(0.0, abs=1e-12) for r in out)


def test_token_drift_rejects_bad_params(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        token_drift(docs, docs, k=0)
    with pytest.raises(ValueError):
        token_drift(docs, docs, alpha=0.0)
