"""speech_acts + pair_overlap: precedence, rollup, thresholds, and the
single-exchange plan pin."""

from pyspark.sql import functions as F

from loongcollector_spark.operators.assemble import pair_overlap
from loongcollector_spark.operators.trajectory import speech_acts


def _tx(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, role string, text string"
    )


def test_act_precedence_and_rollup(spark):
    rows = [
        ("c1", "user", "what is this?"),          # question (both rules)
        ("c1", "user", "Can you help"),            # question (lead word)
        ("c1", "user", "please run the job"),      # command
        ("c1", "user", "```code``` or not?"),      # code BEATS question
        ("c1", "assistant", "the result is 4."),   # statement
        ("c2", "user", "Fix the bug"),             # command (lead)
    ]
    got = {
        (r.conv_id, r.role): (r.n_code, r.n_question, r.n_command, r.n_statement)
        for r in speech_acts(_tx(spark, rows)).collect()
    }
    assert got[("c1", "user")] == (1, 2, 1, 0)
    assert got[("c1", "assistant")] == (0, 0, 0, 1)
    assert got[("c2", "user")] == (0, 0, 1, 0)


def test_act_lead_words_are_word_bounded(spark):
    # 'cannot' must NOT match the 'can' lead; 'pleased' not 'please'
    rows = [("c", "u", "cannot do that"), ("c2", "u", "pleased to meet")]
    got = {r.conv_id: r.n_statement for r in
           speech_acts(_tx(spark, rows)).collect()}
    assert got == {"c": 1, "c2": 1}


def test_speech_acts_single_exchange(spark, sf_dir):
    from loongcollector_spark.sources.transcripts import load_transcripts

    tx = load_transcripts(spark, sf_dir).select("conv_id", "role", "text")
    plan = speech_acts(tx)._jdf.queryExecution().executedPlan().toString()
    import re

    parts = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    acts = [p for p in parts if "conv_id" in p and "role" in p]
    assert len(acts) == 1  # ONE rollup shuffle; classification is map-side


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "prompt string, chosen string, rejected string")


def test_overlap_values(spark):
    df = pair_overlap(
        _pairs(
            spark,
            [
                ("p1", "a b c", "b c d"),       # inter 2 / union 4
                ("p2", "same text", "same text"),
                ("p3", "x y", "u v w"),
                ("p4", "", "w z"),
            ],
        )
    )
    got = {r.prompt: (r.jaccard, r.len_ratio, r.high_overlap) for r in df.collect()}
    assert got["p1"] == (0.5, 1.0, False)
    assert got["p2"] == (1.0, 1.0, True)
    assert got["p3"] == (0.0, round(2 / 3, 6), False)
    assert got["p4"] == (0.0, 0.0, False)


def test_overlap_threshold_boundary(spark):
    # inter 4 / union 5 = exactly 0.8 -> flagged (>= on rounded value)
    df = pair_overlap(_pairs(spark, [("p", "a b c d", "a b c d e")]))
    r = df.first()
    assert r.jaccard == 0.8 and r.high_overlap


def test_overlap_dedups_tokens_and_case(spark):
    # repeated/case-variant tokens collapse before the set math
    df = pair_overlap(_pairs(spark, [("p", "A a A b", "a B")]))
    r = df.first()
    assert r.jaccard == 1.0 and r.len_ratio == 1.0


def test_overlap_never_shuffles(spark):
    df = pair_overlap(
        _pairs(spark, [("p", "a", "b")] * 10).repartition(4)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
