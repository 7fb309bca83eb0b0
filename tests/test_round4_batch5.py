"""Round-4 session-4 additions: preference_pairs (DPO assembly),
json_validity_report, truncation_artifacts, fim_split — hand-checked
semantics beyond the DuckDB oracle match, plus exchange-shape pins."""

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.operators.aggregate import truncation_artifacts
from loongcollector_spark.operators.assemble import preference_pairs
from loongcollector_spark.operators.chunking import fim_split
from loongcollector_spark.operators.parse import json_validity_report

TX_SCHEMA = (
    "conv_id string, turn_idx long, role string, text string, tool string"
)


# -------------------------------------------------------- preference_pairs


@pytest.fixture(scope="module")
def pref_tx(spark):
    # "What is X?" asked in three conversations with three different
    # assistant answers of token counts 1 / 3 / 3 (a tie at the top).
    rows = [
        ("c1", 0, "user", "What is X?", None),
        ("c1", 1, "assistant", "short", None),
        ("c2", 0, "user", "what is x", None),
        ("c2", 1, "assistant", "a b zz", None),
        ("c3", 0, "user", "  What   is X!! ", None),
        ("c3", 1, "assistant", "a b aa", None),
        # a prompt answered identically everywhere -> no pair
        ("c4", 0, "user", "same", None),
        ("c4", 1, "assistant", "dup", None),
        ("c5", 0, "user", "same", None),
        ("c5", 1, "assistant", "dup", None),
        # user turn NOT followed by assistant -> not a prompt
        ("c6", 0, "user", "orphan", None),
        ("c6", 1, "system", "sys", None),
    ]
    return spark.createDataFrame(rows, TX_SCHEMA)


def test_preference_pairs_hand_checked(spark, pref_tx):
    out = preference_pairs(pref_tx).collect()
    assert len(out) == 1  # "same" filtered (n_distinct=1), "orphan" no pair
    r = out[0]
    assert r["prompt"] == "what is x"  # normalization pooled 3 variants
    assert r["n_responses"] == 3 and r["n_distinct"] == 3
    # tie at score 3 between "a b zz" and "a b aa" -> text DESC wins
    assert r["chosen"] == "a b zz" and r["chosen_score"] == 3
    assert r["rejected"] == "short" and r["rejected_score"] == 1


def test_preference_pairs_rejected_tie_is_text_asc(spark):
    rows = [
        ("c1", 0, "user", "q", None),
        ("c1", 1, "assistant", "bb", None),
        ("c2", 0, "user", "q", None),
        ("c2", 1, "assistant", "aa", None),
        ("c3", 0, "user", "q", None),
        ("c3", 1, "assistant", "x y", None),
    ]
    r = preference_pairs(spark.createDataFrame(rows, TX_SCHEMA)).collect()[0]
    # scores 1/1/2: rejected is the score-1 tie broken by text ASC
    assert r["rejected"] == "aa" and r["chosen"] == "x y"


def test_preference_pairs_min_distinct_and_validation(spark, pref_tx):
    assert preference_pairs(pref_tx, min_distinct=4).count() == 0
    with pytest.raises(ValueError):
        preference_pairs(pref_tx, min_distinct=1)


def test_preference_pairs_null_and_blank_prompts_dropped(spark):
    rows = [
        ("c1", 0, "user", None, None),
        ("c1", 1, "assistant", "a", None),
        ("c2", 0, "user", "!!!", None),  # normalizes to ''
        ("c2", 1, "assistant", "b", None),
    ]
    assert preference_pairs(spark.createDataFrame(rows, TX_SCHEMA)).count() == 0


# ---------------------------------------------------- json_validity_report


def test_json_validity_hand_checked(spark):
    rows = [
        ("c", 0, "tool", '{"a": 1}', "search"),
        ("c", 1, "tool", "not json", "search"),
        ("c", 2, "tool", "[1, 2]", "code"),
        ("c", 3, "tool", '{"bad": }', "code"),
        ("c", 4, "tool", "123", "code"),  # scalars are valid JSON
        ("c", 5, "tool", None, None),  # NULL text invalid, NULL tool bucket
        ("c", 6, "tool", '"str"', "  "),  # blank tool -> <none>
    ]
    out = {
        r["tool"]: (r["n_rows"], r["n_valid"], r["valid_ratio"])
        for r in json_validity_report(
            spark.createDataFrame(rows, TX_SCHEMA)
        ).collect()
    }
    assert out["search"] == (2, 1, 0.5)
    assert out["code"] == (3, 2, 2 / 3)
    assert out["<none>"] == (2, 1, 0.5)
    assert len(out) == 3


def test_json_validity_role_filter(spark):
    rows = [
        ("c", 0, "tool", '{"a":1}', "t1"),
        ("c", 1, "assistant", '{"a":1}', "t1"),
    ]
    out = json_validity_report(
        spark.createDataFrame(rows, TX_SCHEMA), role="tool"
    ).collect()
    assert len(out) == 1 and out[0]["n_rows"] == 1


# --------------------------------------------------- truncation_artifacts


def test_truncation_artifacts_each_flag(spark):
    rows = [
        ("c1", 0, "assistant", 'he said "yes', None),  # odd quote + no term
        ("c1", 1, "assistant", "f(x) = {a: [1, 2}", None),  # brace+bracket
        ("c1", 2, "assistant", "```python\nprint(1)", None),  # open fence
        ("c1", 3, "assistant", "cut off mid sent", None),  # no terminal
        ("c1", 4, "assistant", "All done.", None),  # clean
        ("c1", 5, "assistant", "   ", None),  # blank: not checked
        ("c1", 6, "assistant", None, None),  # NULL: not checked
        ("c1", 7, "user", "ignored?!", None),  # role-filtered out
    ]
    out = truncation_artifacts(
        spark.createDataFrame(rows, TX_SCHEMA), role="assistant"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_checked"] == 5
    assert r["n_odd_quote"] == 1
    assert r["n_unbalanced_brace"] == 1
    assert r["n_unterminated_fence"] == 1
    # "yes (no terminal: 's'), {a: [1,2} ends '}' -> terminal ok,
    # open fence ends ')' wait: "```python\nprint(1)" ends ')' terminal.
    # flagged no-terminal: row0 ('s') and row3 ('t') = 2
    assert r["n_no_terminal"] == 2
    assert r["n_artifact"] == 4  # rows 0-3 each carry >=1 flag
    assert r["artifact_ratio"] == 4 / 5


def test_truncation_artifacts_balanced_fence_not_flagged(spark):
    rows = [("c1", 0, "assistant", "```py\nx=1\n``` ok fine.", None)]
    r = truncation_artifacts(spark.createDataFrame(rows, TX_SCHEMA)).collect()[0]
    assert r["n_unterminated_fence"] == 0 and r["n_artifact"] == 0


def test_truncation_artifacts_all_roles_when_none(spark):
    rows = [
        ("c1", 0, "user", "no terminator here", None),
        ("c1", 1, "assistant", "fine.", None),
    ]
    r = truncation_artifacts(spark.createDataFrame(rows, TX_SCHEMA)).collect()[0]
    assert r["n_checked"] == 2 and r["n_no_terminal"] == 1


# --------------------------------------------------------------- fim_split


@pytest.fixture(scope="module")
def fim_docs(spark):
    rows = [
        (1, "abcdefghij"),
        (2, "xy"),  # too short: excluded
        (3, "abc"),  # minimal: 1/1/1 forced
        (4, None),  # NULL: excluded (length 0)
        (5, "a" * 500),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("hash_mode", ["xxhash64", "md5"])
def test_fim_split_reassembles_and_bounds(spark, fim_docs, hash_mode):
    out = fim_split(fim_docs, hash_mode=hash_mode).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 3, 5]
    texts = {1: "abcdefghij", 3: "abc", 5: "a" * 500}
    for r in out:
        t = texts[r["doc_id"]]
        p, m = r["prefix_chars"], r["middle_chars"]
        s = r["n_chars"] - p - m
        assert p >= 1 and m >= 1 and s >= 1
        assert r["n_chars"] == len(t)
        expected = (
            "<|fim_prefix|>" + t[:p]
            + "<|fim_suffix|>" + t[p + m:]
            + "<|fim_middle|>" + t[p:p + m]
        )
        assert r["fim_text"] == expected


def test_fim_split_minimal_doc_is_1_1_1(spark, fim_docs):
    r = {x["doc_id"]: x for x in fim_split(fim_docs).collect()}[3]
    assert (r["prefix_chars"], r["middle_chars"]) == (1, 1)


def test_fim_split_spm_order_and_validation(spark, fim_docs):
    r = {x["doc_id"]: x for x in fim_split(fim_docs, mode="spm").collect()}[1]
    assert r["fim_text"].startswith("<|fim_suffix|>")
    assert "<|fim_prefix|>" in r["fim_text"]
    with pytest.raises(ValueError):
        fim_split(fim_docs, mode="nope")


def test_fim_split_deterministic(spark, fim_docs):
    a = sorted(map(tuple, fim_split(fim_docs).collect()))
    b = sorted(map(tuple, fim_split(fim_docs).collect()))
    assert a == b


# ------------------------------------------------------------- plan pins


def test_round4_batch5_plan_pins(spark):
    """preference_pairs spends 3 hash exchanges (conv window; then the
    countDistinct two-phase over the REDUCED (prompt, response) table —
    Spark's count-distinct rewrite, same accepted shape as
    self_repetition); the two report aggregates one each; fim_split is
    a pure narrow codegen projection. No single-partition moves, no
    Python anywhere."""
    tx = spark.createDataFrame([("c", 0, "user", "t", "x")], TX_SCHEMA)
    docs = spark.createDataFrame([(1, "abcdef")], "doc_id long, text string")
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        def shape(df):
            p = df._jdf.queryExecution().executedPlan().toString()
            assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
            return (
                p.count("Exchange hashpartitioning"),
                p.count("Exchange SinglePartition"),
            )

        assert shape(preference_pairs(tx)) == (3, 0)
        assert shape(json_validity_report(tx)) == (1, 0)
        assert shape(truncation_artifacts(tx)) == (1, 0)
        assert shape(fim_split(docs)) == (0, 0)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
