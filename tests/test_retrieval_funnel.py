"""BM25 retrieval, BPE pair statistics, and event-funnel operators:
semantics on hand-built fixtures + physical-plan shape contracts.
(The full-corpus DuckDB value checks live in test_queries_oracle.py.)
"""

import math
import re
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.operators.aggregate import event_funnel
from loongcollector_spark.operators.retrieval import (
    bm25_score,
    bm25_topk,
    index_stats,
)
from loongcollector_spark.operators.text import bpe_pair_stats

from test_plans import plan_of


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (1, "spark shuffle join"),
        (2, "spark spark spark window"),
        (3, "hash table scan"),
        (4, "nothing relevant here"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


# ------------------------------------------------------------------ BM25


def test_bm25_score_hand_computed(spark, tiny_docs):
    out = {
        r["doc_id"]: r
        for r in bm25_score(tiny_docs, ["spark", "hash"]).collect()
    }
    # docs 1, 2 match 'spark'; doc 3 matches 'hash'; doc 4 matches none
    assert set(out) == {1, 2, 3}
    assert out[1]["n_terms_matched"] == 1
    assert out[3]["n_terms_matched"] == 1
    # hand-compute doc 2 ('spark' tf=3, dl=4): N=4, df(spark)=2,
    # avgdl = (3+4+3+3)/4 = 3.25
    idf = math.log(1.0 + (4 - 2 + 0.5) / (2 + 0.5))
    tfpart = 3 * 2.2 / (3 + 1.2 * (1 - 0.75 + 0.75 * 4 / 3.25))
    assert out[2]["score"] == pytest.approx(idf * tfpart, rel=1e-12)


def test_bm25_query_normalization_and_empty(spark, tiny_docs):
    # 'Spark-SHUFFLE!' normalizes to two terms; scores = plain query
    a = bm25_score(tiny_docs, ["Spark-SHUFFLE!"]).collect()
    b = bm25_score(tiny_docs, ["spark", "shuffle"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    with pytest.raises(ValueError):
        bm25_score(tiny_docs, ["!!!"])


def test_bm25_topk_rank_and_cut(spark, tiny_docs):
    top = bm25_topk(tiny_docs, ["spark", "hash"], k=2).collect()
    assert [r["rank"] for r in top] == [1, 2]
    # ranks follow score desc, doc_id asc
    scores = {r["doc_id"]: r["score"] for r in top}
    full = {
        r["doc_id"]: r["score"]
        for r in bm25_score(tiny_docs, ["spark", "hash"]).collect()
    }
    expect = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(r["doc_id"], r["score"]) for r in top] == expect
    assert scores == dict(expect)


def test_index_stats(spark, tiny_docs):
    term_stats, corpus_stats = index_stats(tiny_docs)
    ts = {r["term"]: (r["df"], r["cf"]) for r in term_stats.collect()}
    assert ts["spark"] == (2, 4)  # docs 1,2; occurrences 1+3
    assert ts["hash"] == (1, 1)
    cs = corpus_stats.collect()[0]
    assert cs["n_docs"] == 4 and cs["avgdl"] == pytest.approx(3.25)


def test_bm25_plan_shape(spark, tiny_docs):
    plan = plan_of(bm25_score(tiny_docs, ["spark", "hash"]))
    # stats + df sides broadcast; no Python in the plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "EvalPython" not in plan and "Arrow" not in plan


# ------------------------------------------------------------- BPE pairs


def test_bpe_pair_stats_exact(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")], ["doc_id", "text"]
    )
    out = {
        (r["left"], r["right"]): r["pair_count"]
        for r in bpe_pair_stats(docs, min_count=1).collect()
    }
    # doc1: (a,b) (b,a) (a,b); doc2: (a,b) (b,c); doc3: none
    assert out == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    filtered = bpe_pair_stats(docs, min_count=2).collect()
    assert [(r["left"], r["right"], r["pair_count"]) for r in filtered] == [
        ("a", "b", 3)
    ]


def test_bpe_plan_no_window(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = plan_of(bpe_pair_stats(docs))
    # per-row pair construction: no Window/Sort before the aggregate,
    # exactly one exchange (the pair-count shuffle) with a map-side
    # partial aggregate under it
    assert "Window" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "EvalPython" not in plan


# ----------------------------------------------------------------- funnel


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def funnel_events(spark):
    rows = [
        # u1 completes view→click→purchase in order
        (1, _ts("2024-01-01T00:00:00"), "view"),
        (1, _ts("2024-01-01T00:01:00"), "click"),
        (1, _ts("2024-01-01T00:02:00"), "purchase"),
        # u2: click BEFORE any view — click must not count
        (2, _ts("2024-01-01T00:00:00"), "click"),
        (2, _ts("2024-01-01T00:01:00"), "view"),
        # u3: view then purchase (skips click) — purchase must not count
        (3, _ts("2024-01-01T00:00:00"), "view"),
        (3, _ts("2024-01-01T00:01:00"), "purchase"),
        # u4: no funnel events at all
        (4, _ts("2024-01-01T00:00:00"), "error"),
    ]
    return spark.createDataFrame(rows, ["user_id", "ts", "event_type"])


def test_event_funnel_strict_order(spark, funnel_events):
    out = {
        r["step"]: r
        for r in event_funnel(
            funnel_events, ["view", "click", "purchase"]
        ).collect()
    }
    assert out["view"]["n_users"] == 3  # u1, u2, u3
    assert out["click"]["n_users"] == 1  # only u1 clicked after a view
    assert out["purchase"]["n_users"] == 1  # u3's purchase skipped click
    assert out["view"]["conv_rate"] == 1.0
    assert out["click"]["conv_rate"] == pytest.approx(1 / 3)
    assert out["purchase"]["conv_rate"] == pytest.approx(1.0)
    assert [out[s]["step_idx"] for s in ("view", "click", "purchase")] == [
        0, 1, 2,
    ]


def test_event_funnel_empty_steps_raises(spark, funnel_events):
    with pytest.raises(ValueError):
        event_funnel(funnel_events, [])


def test_event_funnel_single_exchange_for_windows(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = event_funnel(ev, ["view", "click", "purchase"])
    plan = plan_of(df)
    # the chained per-step windows AND the per-user groupBy all reuse
    # ONE hash exchange on user_id; the only other exchange is the
    # SinglePartition one feeding the final one-row aggregate
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2
    assert len(re.findall(r"\(\d+\) Window", plan)) == 3
    assert "EvalPython" not in plan


# ------------------------------------------------------------- tf-idf


def test_tfidf_topk_terms_hand_computed(spark):
    from loongcollector_spark.operators.retrieval import tfidf_topk_terms

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry date"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r.doc_id, r.rank): r for r in tfidf_topk_terms(docs, k=2).collect()
    }
    # doc1: apple (2/3)ln(3) beats banana (1/3)ln(1.5)
    assert rows[(1, 1)].term == "apple"
    assert rows[(1, 1)].tfidf == pytest.approx((2 / 3) * math.log(3))
    assert rows[(1, 2)].term == "banana"
    # doc2: banana and cherry tie exactly → term-ascending break
    assert rows[(2, 1)].term == "banana" and rows[(2, 2)].term == "cherry"
    assert rows[(2, 1)].tfidf == pytest.approx(rows[(2, 2)].tfidf)
    # doc3: rare 'date' (1/3)ln(3) outranks frequent 'cherry' (2/3)ln(1.5)
    assert rows[(3, 1)].term == "date"
    assert rows[(3, 2)].term == "cherry"


def test_tfidf_topk_terms_k_and_nulls(spark):
    from loongcollector_spark.operators.retrieval import tfidf_topk_terms

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, None), (3, "   ")],
        "doc_id long, text string",
    )
    rows = tfidf_topk_terms(docs, k=5).collect()
    # NULL/blank docs contribute nothing — not even to N
    assert {r.doc_id for r in rows} == {1}
    with pytest.raises(ValueError):
        tfidf_topk_terms(docs, k=0)


def test_tfidf_topk_plan_windowgrouplimit(spark, sf_dir):
    from loongcollector_spark.operators.retrieval import tfidf_topk_terms

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = plan_of(tfidf_topk_terms(docs, k=3))
    # per-doc top-k is pruned map-side before the window's exchange
    assert "WindowGroupLimit" in plan
    assert "EvalPython" not in plan
