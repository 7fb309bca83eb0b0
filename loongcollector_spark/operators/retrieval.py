"""Lexical retrieval over the document corpus: BM25 scoring / top-k
search and corpus index statistics.

A training-data pipeline at 100 TB needs targeted *retrieval* as much
as filtering — "find the documents about X" (for curriculum mixing,
contamination forensics, or eval-set construction) without shipping the
corpus through an external search engine.  BM25 (Robertson et al.,
Okapi; the exact idf variant below is the Lucene/standard one,
``ln(1 + (N - df + 0.5)/(df + 0.5))``) over the same normalized token
stream the dedup family uses keeps the whole thing inside one Catalyst
plan.

Scale design (the part that matters at 10^12 rows):

* The corpus token stream is filtered to the query's terms BEFORE any
  shuffle — the per-(doc, term) term-frequency aggregate only ever sees
  rows whose token is in the (tiny, literal) query set, so the one real
  shuffle carries ``O(matching docs × query terms)`` rows, never the
  corpus.
* Document length is a pure per-row expression (``size(split(...))``)
  carried alongside the exploded tokens — no full-corpus join against a
  separate doc-length table.
* Corpus statistics (N, avgdl) are a one-row aggregate cross-joined
  back with an explicit broadcast; per-term document frequency is a
  ``≤ |query|``-row aggregate, also broadcast.  Nothing driver-side.
* In a deployed index these statistics (and optionally the postings)
  are precomputed once by :func:`index_stats` and reused across
  queries; the search path here recomputes them inline so each call is
  self-contained.

Reference parity note: the reference (LoongCollector) is a collection
agent and has no retrieval operator — this module is part of the
LLM-training-data extension surface, like operators/dedup.py and
operators/text.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..cache import persisted
from .dedup import _norm_text

__all__ = ["bm25_score", "bm25_topk", "index_stats", "tfidf_topk_terms"]


def _norm_terms(query_terms: Sequence[str]) -> list[str]:
    """Apply the corpus normalization to the query terms and drop
    empties/dupes (a query term with internal whitespace would never
    match a single token)."""
    out: list[str] = []
    for t in query_terms:
        t = t.lower()
        t = "".join(c if c.isalnum() else " " for c in t)
        for piece in t.split():
            if piece and piece not in out:
                out.append(piece)
    return out


def index_stats(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Corpus index statistics: ``(term_stats, corpus_stats)``.

    ``term_stats``: one row per distinct normalized token —
    ``(term, df, cf)`` (document frequency / collection frequency).
    ``corpus_stats``: ONE row — ``(n_docs, avgdl)``.

    Both are plain aggregates (map-side partial agg on the token
    shuffle); persist them as tables to amortize across queries.
    """
    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(_norm_text(F.col(text_col)), " ")).alias("term"),
    )
    doc_tok = toks.groupBy("__id", "term").agg(F.count("*").alias("__tf"))
    term_stats = doc_tok.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("__tf").alias("cf")
    )
    corpus_stats = docs.select(
        F.size(F.split(_norm_text(F.col(text_col)), " ")).alias("__dl")
    ).agg(F.count("*").alias("n_docs"), F.avg("__dl").alias("avgdl"))
    return term_stats, corpus_stats


def bm25_score(
    docs: DataFrame,
    query_terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25-score every document matching ≥1 query term.

    Returns ``(id_col, n_terms_matched, score)`` — one row per document
    that contains at least one (normalized) query term.  ``score`` is
    the standard BM25 sum with the Lucene idf
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` (always positive, so a term
    in >50% of docs still contributes).

    The plan: one corpus scan producing (doc, dl, matching-token) rows
    with the term filter applied pre-shuffle; groupBy (doc, term) for
    tf; a broadcast ≤|query|-row df table; a broadcast one-row
    (N, avgdl) table; codegen arithmetic; final groupBy doc.  No
    full-corpus shuffle, no driver collect.
    """
    terms = _norm_terms(query_terms)
    if not terms:
        raise ValueError("bm25_score: empty query after normalization")

    tok_arr = F.split(_norm_text(F.col(text_col)), " ")
    toks = docs.select(
        F.col(id_col),
        F.size(tok_arr).alias("__dl"),
        F.explode(tok_arr).alias("__term"),
    ).filter(F.col("__term").isin(terms))

    matched = toks.groupBy(id_col, "__term").agg(
        F.count("*").alias("__tf"), F.max("__dl").alias("__dl")
    )
    term_df = matched.groupBy("__term").agg(F.count("*").alias("__df"))

    stats = docs.select(
        F.size(F.split(_norm_text(F.col(text_col)), " ")).alias("__dl")
    ).agg(F.count("*").alias("__n_docs"), F.avg("__dl").alias("__avgdl"))

    scored = matched.join(F.broadcast(term_df), "__term").crossJoin(
        F.broadcast(stats)
    )
    idf: Column = F.log(
        F.lit(1.0)
        + (F.col("__n_docs") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    tf = F.col("__tf").cast("double")
    contrib = idf * (
        tf
        * (k1 + 1.0)
        / (tf + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl")))
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_terms_matched"),
        F.sum(contrib).alias("score"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-*k* BM25 retrieval: :func:`bm25_score` + a deterministic
    global rank (score desc, id asc — ties stable).

    Scale shape (plan-pinned in tests/test_plans.py): the ordered
    window has no partition key, but Catalyst's
    ``LimitPushDownThroughWindow`` rewrites ``row_number() <= k`` into
    a ``TakeOrderedAndProject(limit=k)`` BELOW the window — each
    partition of the per-matching-doc score table keeps a local top-k
    and the driver merges k rows per partition, so no single-partition
    sort of the match set ever runs; the window then numbers only the
    k survivors.  The match set itself is already the reduced
    per-document score table (one row per doc containing ≥1 query
    term), never the corpus.
    """
    scored = bm25_score(
        docs, query_terms, id_col=id_col, text_col=text_col, k1=k1, b=b
    )
    w = W.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "n_terms_matched", "score")
    )


def tfidf_topk_terms(
    docs: DataFrame,
    k: int = 5,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-*k* keywords by TF-IDF — the summarization /
    topic-labeling companion to :func:`bm25_score` (which scores docs
    for a GIVEN query; this extracts what each doc is about with no
    query). ``tfidf = (tf / dl) · ln(N / df)`` over the shared
    normalized token stream; ties broken by term ascending.

    Returns ``(id_col, rank, term, tfidf)``, ``rank ∈ [1, k]``.

    Scale shape — unlike BM25 there is no query-term pre-filter, so
    the costs are inherent and placed where they collapse:

    * tf: one (doc, term) groupBy with map-side partial agg — the
      exploded stream never shuffles raw, repetition collapses first.
    * df: a re-agg of that table keyed by term (vocab-sized, NOT
      broadcast — vocabulary grows with corpus); the tf⋈df join
      shuffles the (doc, term) DISTINCT table on term. Stop-word-like
      hot terms skew this key; AQE skew-join splits them (same
      contract as bigram_perplexity's model join).
    * N: a one-row aggregate, broadcast via crossJoin.
    * top-k: row_number over (doc) windows → Spark's WindowGroupLimit
      keeps k rows per doc map-side before the final exchange.
    """
    if k < 1:
        raise ValueError("tfidf_topk_terms: k must be >= 1")
    norm = _norm_text(F.coalesce(F.col(text_col), F.lit("")))
    tok_arr = F.split(norm, " ")
    toks = (
        docs.filter(F.length(norm) > 0)
        .select(
            F.col(id_col),
            F.size(tok_arr).alias("__dl"),
            F.explode(tok_arr).alias("term"),
        )
    )
    # persist: df, N and the join all reuse the tf table — without it
    # Catalyst re-derives the whole explode+groupBy subtree once per
    # consumer (measured 3× the work at sf0.1). The cached table is the
    # REDUCED (doc, term) distinct pairs, 24 B/row-ish; long-lived
    # sessions clear it between corpora (the minhash persist note).
    tf = persisted(
        toks.groupBy(id_col, "term").agg(
            F.count("*").alias("__tf"), F.max("__dl").alias("__dl")
        )
    )
    dfr = tf.groupBy("term").agg(F.count("*").alias("__df"))
    # N from the same persisted table: every surviving doc has >= 1
    # term row, so distinct ids == docs with non-empty normalized text
    n = tf.agg(F.countDistinct(id_col).alias("__n_docs"))
    scored = tf.join(dfr, "term").crossJoin(F.broadcast(n))
    tfidf = (
        F.col("__tf").cast("double") / F.col("__dl")
    ) * F.log(F.col("__n_docs").cast("double") / F.col("__df"))
    w = W.partitionBy(id_col).orderBy(
        tfidf.desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("tfidf", tfidf)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tfidf")
    )
