"""Round-5 session-4 batch: dialogue_balance, echo_rate, tool_entropy,
luhn_scan, length_bias, embedding_outliers — semantics + plan pins."""

import math
import re

from pyspark.sql import functions as F

from loongcollector_spark.operators.aggregate import tool_entropy
from loongcollector_spark.operators.assemble import length_bias
from loongcollector_spark.operators.clustering import embedding_outliers
from loongcollector_spark.operators.text import luhn_scan
from loongcollector_spark.operators.trajectory import dialogue_balance, echo_rate


def _tx(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )


# ------------------------------------------------------- dialogue_balance


def test_dialogue_balance_verdicts(spark):
    rows = [
        # well-formed: user → assistant → user → assistant
        ("c1", 0, "user", "hi", None),
        ("c1", 1, "assistant", "hello", None),
        ("c1", 2, "user", "thanks", None),
        ("c1", 3, "assistant", "bye", None),
        # same-role adjacency + wrong closer
        ("c2", 0, "user", "a", None),
        ("c2", 1, "user", "b", None),
        ("c2", 2, "assistant", "c", None),
        ("c2", 3, "tool", "d", None),
        # wrong opener
        ("c3", 0, "system", "sys", None),
        ("c3", 1, "assistant", "x", None),
    ]
    got = {r.conv_id: r for r in dialogue_balance(_tx(spark, rows)).collect()}
    c1 = got["c1"]
    assert (c1.n_turns, c1.n_roles, c1.n_same_adj) == (4, 2, 0)
    assert (c1.first_role, c1.last_role, c1.well_formed) == ("user", "assistant", True)
    c2 = got["c2"]
    assert c2.n_same_adj == 1 and c2.last_role == "tool" and not c2.well_formed
    assert got["c3"].first_role == "system" and not got["c3"].well_formed


def test_dialogue_balance_single_exchange(spark, sf_dir):
    from loongcollector_spark.sources.transcripts import load_transcripts

    tx = load_transcripts(spark, sf_dir)
    plan = dialogue_balance(tx)._jdf.queryExecution().executedPlan().toString()
    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    conv_ex = [e for e in exchanges if "conv_id" in e]
    # the lag window and the rollup share the conv partitioning
    assert len(conv_ex) == 1, plan


# ------------------------------------------------------------- echo_rate


def test_echo_rate_exact_integers(spark):
    rows = [
        ("c1", 0, "user", "alpha beta gamma delta", None),
        # echoes 3 of its 4 distinct tokens from the predecessor
        ("c1", 1, "assistant", "alpha beta gamma echo", None),
        ("c1", 2, "user", "totally new words", None),
        # echoes nothing
        ("c1", 3, "assistant", "different reply here", None),
        # first turn of c2 has no predecessor → not measured
        ("c2", 0, "assistant", "opener", None),
    ]
    got = {r.conv_id: r for r in echo_rate(_tx(spark, rows)).collect()}
    c1 = got["c1"]
    assert (c1.n_measured, c1.sum_inter, c1.sum_tokens) == (2, 3, 7)
    assert c1.echo_rate == round(3 / 7, 6)
    assert c1.n_high == 0
    assert "c2" not in got  # no measurable turn


def test_echo_rate_single_added_exchange(spark, sf_dir):
    from loongcollector_spark.sources.transcripts import load_transcripts

    tx = load_transcripts(spark, sf_dir)
    plan = echo_rate(tx)._jdf.queryExecution().executedPlan().toString()
    src = tx._jdf.queryExecution().executedPlan().toString()
    # the lag window and the rollup share ONE conv_id exchange
    assert plan.count("Exchange") == src.count("Exchange") + 1, plan


def test_echo_rate_high_threshold_boundary(spark):
    rows = [
        ("c", 0, "user", "a b c d e", None),
        # 4 of 5 distinct tokens echoed → exactly 0.8 → counts as high
        ("c", 1, "assistant", "a b c d x", None),
    ]
    r = echo_rate(_tx(spark, rows)).collect()[0]
    assert (r.sum_inter, r.sum_tokens, r.n_high) == (4, 5, 1)


# ---------------------------------------------------------- tool_entropy


def test_tool_entropy_from_counts(spark):
    rows = [
        # from 'search': 2× to code, 1× to none → H over (2,1)
        ("c1", 0, "u", "", "search"),
        ("c1", 1, "u", "", "code"),
        ("c1", 2, "u", "", "search"),
        ("c1", 3, "u", "", "code"),
        ("c2", 0, "u", "", "search"),
        ("c2", 1, "u", "", ""),
        # from 'code': deterministic → entropy 0
        ("c1", 4, "u", "", "search"),
    ]
    got = {r.from_tool: r for r in tool_entropy(_tx(spark, rows)).collect()}
    s = got["search"]
    n, counts = 3, [2, 1]
    expect = round(math.log(n) - sum(c * math.log(c) for c in counts) / n, 6)
    assert (s.n_steps, s.n_next) == (3, 2)
    assert s.entropy == expect
    c = got["code"]
    assert (c.n_next, c.entropy) == (1, 0.0)
    # blank tool became the <none> successor state (no from-state here)
    assert set(got) == {"search", "code"}


# ------------------------------------------------------------- luhn_scan


def test_luhn_scan_validation_and_boundaries(spark):
    rows = [
        ("c1", 0, "u", "pay 4111111111111111 now", None),          # valid
        ("c1", 1, "u", "bad 4111111111111112 ok 5500005555555559", None),
        ("c2", 0, "u", "ref=12345678901234567890 too long", None),  # 20 digits
        ("c2", 1, "u", "short 123456789012", None),                 # 12 digits
        ("c2", 2, "u", None, None),
        ("c3", 0, "u", "amex 378282246310005", None),               # 15, valid
        # separator-formatted PANs (the common card spellings)
        ("c4", 0, "u", "card 4111-1111-1111-1111 thanks", None),
        ("c4", 1, "u", "card 4111 1111 1111 1111", None),
        # a date must NOT merge into a candidate (8 digits stripped)
        ("c4", 2, "u", "on 2024-01-01 nothing", None),
        # separated 20-digit run stays non-candidate (maximality)
        ("c4", 3, "u", "ref 12345-678901234567890", None),
    ]
    out = {
        (r.conv_id, r.turn_idx): (r.n_candidates, r.n_valid, r.has_pan)
        for r in luhn_scan(_tx(spark, rows)).collect()
    }
    assert out == {
        ("c1", 0): (1, 1, True),
        ("c1", 1): (2, 1, True),
        ("c3", 0): (1, 1, True),
        ("c4", 0): (1, 1, True),
        ("c4", 1): (1, 1, True),
    }


def test_luhn_scan_is_shuffle_free(spark, sf_dir):
    from loongcollector_spark.sources.transcripts import load_transcripts

    tx = load_transcripts(spark, sf_dir)
    plan = luhn_scan(tx)._jdf.queryExecution().executedPlan().toString()
    # pure projection+filter over the (windowed) transcript source: the
    # scan itself must add NO exchange beyond the transcript derivation
    src_plan = tx._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == src_plan.count("Exchange"), plan


# ----------------------------------------------------------- length_bias


def test_length_bias_buckets_and_shares(spark):
    pairs = spark.createDataFrame(
        [
            ("p1", 10, 10),   # equal
            ("p2", 12, 10),   # small (2)
            ("p3", 30, 10),   # medium (20 → no: 20 > 19 → large)
            ("p4", 15, 10),   # medium (5)
            ("p5", 8, 10),    # chosen_shorter (-2)
        ],
        "prompt string, chosen_score long, rejected_score long",
    )
    got = {r.bucket: r for r in length_bias(pairs).collect()}
    assert got["equal"].n_pairs == 1
    assert got["small"].n_pairs == 1
    assert got["medium"].n_pairs == 1 and got["medium"].mean_margin == 5.0
    assert got["large"].n_pairs == 1 and got["large"].mean_margin == 20.0
    assert got["chosen_shorter"].mean_margin == -2.0
    assert sum(r.share for r in got.values()) == 1.0
    assert got["large"].sum_chosen_tokens == 30


# ----------------------------------------------------- embedding_outliers


def test_embedding_outliers_finds_the_far_vector(spark):
    rows = [(i, 0, [0.0, 0.0]) for i in range(9)] + [(9, 1, [9.0, 12.0])]
    emb = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )
    out = embedding_outliers(emb, top_n=3).collect()
    assert out[0].vec_id == 9 and out[0].label == 1
    # centroid = (0.9, 1.2); far vector dist = 8.1^2 + 10.8^2 = 182.25
    assert out[0].dist == round(8.1**2 + 10.8**2, 6)
    # remaining rows tie at (0.9^2 + 1.2^2) → tie-break on vec_id ASC
    assert [r.vec_id for r in out[1:]] == [0, 1]


def test_embedding_outliers_plans_take_ordered(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", "embedding"
    )
    plan = (
        embedding_outliers(emb, top_n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_luhn_redact_masks_only_valid(spark):
    from loongcollector_spark.operators.text import luhn_redact

    rows = [
        ("c1", 0, "u", "pay 4111111111111111 order 4111111111111112 ok", None),
        ("c2", 0, "u", "ref=12345678901234567890 stays", None),
        ("c2", 1, "u", None, None),
        ("c3", 0, "u", "amex 378282246310005 and visa 4111111111111111", None),
        ("c4", 0, "u", "card 4111-1111-1111-1111 on 2024-01-01", None),
    ]
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in luhn_redact(_tx(spark, rows)).collect()
    }
    assert got[("c1", 0)] == "pay <PAN> order 4111111111111112 ok"
    assert got[("c2", 0)] == "ref=12345678901234567890 stays"  # 20 digits: kept
    assert got[("c2", 1)] is None  # NULL stays NULL
    assert got[("c3", 0)] == "amex <PAN> and visa <PAN>"
    # separated spelling masks as written; the date run is untouched
    assert got[("c4", 0)] == "card <PAN> on 2024-01-01"


def test_luhn_redact_is_shuffle_free(spark, sf_dir):
    from loongcollector_spark.operators.text import luhn_redact
    from loongcollector_spark.sources.transcripts import load_transcripts

    tx = load_transcripts(spark, sf_dir)
    plan = luhn_redact(tx)._jdf.queryExecution().executedPlan().toString()
    src = tx._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == src.count("Exchange"), plan
