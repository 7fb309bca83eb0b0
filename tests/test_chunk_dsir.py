"""Round-4 session-2 curation additions: chunk_documents, DSIR
importance resampling, temperature_mixture, ngram_novelty."""

import math

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.operators.chunking import chunk_documents
from loongcollector_spark.operators.dedup import edit_distance_pairs
from loongcollector_spark.operators.dsir import dsir_sample, dsir_weights
from loongcollector_spark.operators.text import (
    gopher_rules,
    ngram_novelty,
    temperature_mixture,
)


@pytest.fixture(scope="module")
def small_docs(spark):
    rows = [
        (1, " ".join(f"w{i}" for i in range(70)), "en"),
        (2, "alpha beta gamma", "en"),
        (3, None, "fr"),
        (4, "", "fr"),
        (5, "!!! ???", "fr"),  # normalizes to empty
        (6, " ".join(f"w{i}" for i in range(24)), "de"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# ---------------------------------------------------------------- chunking


def test_chunk_windows_and_tail(spark, small_docs):
    out = chunk_documents(
        small_docs, chunk_size=32, stride=24
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 70 tokens → starts 0, 24, 48 → sizes 32, 32, 22
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [r.chunk_idx for r in c1] == [0, 1, 2]
    assert [r.n_chunk_tokens for r in c1] == [32, 32, 22]
    assert c1[0].chunk_text.startswith("w0 w1 ")
    assert c1[2].chunk_text.split()[0] == "w48"
    # overlap: chunk 1 starts at token 24, inside chunk 0's [0, 32)
    assert c1[1].chunk_text.split()[0] == "w24"
    # doc 2: shorter than chunk_size → single whole-doc chunk
    assert [(r.chunk_idx, r.n_chunk_tokens, r.chunk_text) for r in by_doc[2]] == [
        (0, 3, "alpha beta gamma")
    ]
    # doc 6: exactly stride boundary (24 tokens → starts 0 only)
    assert [r.chunk_idx for r in by_doc[6]] == [0]
    # NULL / empty / punctuation-only docs emit no chunks
    assert 3 not in by_doc and 4 not in by_doc and 5 not in by_doc


def test_chunk_reconstructs_every_token(spark, small_docs):
    # with stride <= size every token of the doc appears in >= 1 chunk
    out = chunk_documents(small_docs, chunk_size=32, stride=24)
    toks = (
        out.filter(F.col("doc_id") == 1)
        .select(F.explode(F.split("chunk_text", " ")).alias("t"))
        .distinct()
        .count()
    )
    assert toks == 70


def test_chunk_validates_params(small_docs):
    with pytest.raises(ValueError):
        chunk_documents(small_docs, chunk_size=0)
    with pytest.raises(ValueError):
        chunk_documents(small_docs, stride=-1)


def test_chunk_plan_has_no_shuffle(spark, small_docs):
    plan = chunk_documents(small_docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------- DSIR


@pytest.fixture(scope="module")
def dsir_docs(spark):
    # target vocabulary: science-y; off-target: cooking
    rows = [
        (10, "quantum field theory lattice gauge", True),
        (11, "quantum entanglement field state", True),
        (12, "gauge theory lattice simulation", True),
        (20, "quantum field lattice gauge theory", False),  # target-like
        (21, "stir fry garlic onion pepper", False),  # off-target
        (22, "bake flour sugar butter oven", False),  # off-target
        (23, None, False),  # empty → excluded
        (24, "boil rice simmer broth", None),  # NULL predicate → raw
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_sci boolean")
    return df


def test_dsir_orders_target_like_first(spark, dsir_docs):
    w = dsir_weights(
        dsir_docs, F.col("is_sci"), n_buckets=256, hash_mode="md5"
    )
    rows = {r.doc_id: r for r in w.collect()}
    # only raw (non-target), non-empty docs scored; NULL predicate
    # counts as raw (doc 24), not silently dropped
    assert set(rows) == {20, 21, 22, 24}
    assert rows[20].log_weight > rows[21].log_weight
    assert rows[20].log_weight > rows[22].log_weight
    assert rows[20].log_weight > 0  # shares target vocabulary
    # n_grams = unigrams + bigrams = tokens + (tokens - 1); doc 20 has 5
    assert rows[20].n_grams == 5 + 4


def test_dsir_sample_top_k_deterministic(spark, dsir_docs):
    top1 = dsir_sample(
        dsir_docs, F.col("is_sci"), 1, n_buckets=256, hash_mode="md5"
    ).collect()
    assert [r.doc_id for r in top1] == [20]
    again = dsir_sample(
        dsir_docs, F.col("is_sci"), 1, n_buckets=256, hash_mode="md5"
    ).collect()
    assert [tuple(r) for r in top1] == [tuple(r) for r in again]
    with pytest.raises(ValueError):
        dsir_sample(dsir_docs, F.col("is_sci"), 0)


def test_dsir_model_join_is_broadcast(spark, dsir_docs):
    plan = (
        dsir_weights(dsir_docs, F.col("is_sci"), n_buckets=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_dsir_xxhash_production_mode_agrees_on_ranking(spark, dsir_docs):
    # different hash → different buckets, but the separation between the
    # target-like doc and the cooking docs must survive the kernel swap
    w = dsir_weights(dsir_docs, F.col("is_sci"), n_buckets=256)
    rows = {r.doc_id: r.log_weight for r in w.collect()}
    assert rows[20] > rows[21] and rows[20] > rows[22]


# ------------------------------------------------- temperature mixture


def test_temperature_mixture_boosts_low_resource(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = temperature_mixture(
        docs, strata_col="lang", alpha=0.5, target_fraction=0.5,
        hash_mode="md5",
    )
    rows = {r.lang: r for r in out.collect()}
    biggest = max(rows.values(), key=lambda r: r.n_docs)
    smallest = min(rows.values(), key=lambda r: r.n_docs)
    # temperature flattens: small strata keep a larger fraction
    assert smallest.sample_rate > biggest.sample_rate
    # temp_share still sums to 1, rates in (0, 1]
    assert math.isclose(sum(r.temp_share for r in rows.values()), 1.0)
    for r in rows.values():
        assert 0 < r.sample_rate <= 1.0
        assert 0 <= r.n_kept <= r.n_docs


def test_temperature_alpha_one_is_plain_fraction(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = temperature_mixture(
        docs, strata_col="lang", alpha=1.0, target_fraction=0.25,
        hash_mode="md5",
    )
    for r in out.collect():
        # alpha=1 → q_i == p_i → every stratum keeps the target fraction
        assert math.isclose(r.sample_rate, 0.25, rel_tol=1e-12)


def test_temperature_alpha_zero_uniform_shares(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = temperature_mixture(
        docs, strata_col="lang", alpha=0.0, target_fraction=1.0,
        hash_mode="md5",
    )
    rows = out.collect()
    for r in rows:
        assert math.isclose(r.temp_share, 1.0 / len(rows), rel_tol=1e-12)


# ---------------------------------------------------------- n-gram novelty


def test_temperature_null_stratum_is_first_class(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else None) for i in range(100)],
        "doc_id long, lang string",
    )
    rows = {r.lang: r for r in temperature_mixture(
        df, strata_col="lang", alpha=0.5, target_fraction=1.0,
        hash_mode="md5",
    ).collect()}
    assert set(rows) == {"en", None}
    # the NULL stratum's docs participate in the keep decision (both
    # strata are 50/50 → rate 1.0 → everything kept)
    assert rows[None].n_kept == 50 and rows["en"].n_kept == 50


def test_ngram_novelty_rejects_bad_k(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError):
        ngram_novelty(docs, k=0)


def test_ngram_novelty_duplicate_doc_scores_zero(spark):
    text = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "an entirely different sentence here now")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in ngram_novelty(df, k=3).collect()}
    assert rows[1].novelty == 1.0  # first occurrence wins
    assert rows[2].novelty == 0.0  # exact duplicate: nothing new
    assert rows[3].novelty == 1.0
    assert rows[1].n_grams == 7  # 9 tokens → 7 trigrams


def test_ngram_novelty_counts_conserved(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = ngram_novelty(docs, k=3)
    agg = out.agg(F.sum("n_novel").alias("s")).first()
    # every distinct corpus gram is novel in exactly one doc
    from loongcollector_spark.operators.dedup import _norm_text

    tk = F.split(_norm_text(F.coalesce(F.col("text"), F.lit(""))), " ")
    grams = docs.filter(F.size(tk) >= 3).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - 2),
                lambda i: F.concat_ws(
                    " ", F.slice(tk, i, F.lit(3))
                ),
            )
        ).alias("g")
    )
    n_distinct = grams.distinct().count()
    assert agg.s == n_distinct


def test_ngram_novelty_short_docs_excluded(spark):
    df = spark.createDataFrame(
        [(1, "one two"), (2, "a b c")], "doc_id long, text string"
    )
    rows = ngram_novelty(df, k=3).collect()
    assert [r.doc_id for r in rows] == [2]


# -------------------------------------------------------- Gopher rules


def test_gopher_rules_each_rule_fires(spark):
    good = " ".join(
        ["the quick brown fox jumps over with lazy dogs near"] * 6
    )  # 60 words, mean len ~4.3, 2 stopwords (the, with)
    rows = {
        r.doc_id: r
        for r in gopher_rules(
            spark.createDataFrame(
                [
                    (1, good),
                    (2, "too short to pass the word count rule with these"),
                    (3, " ".join(["a"] * 60)),  # mean word len 1 → fail
                    (4, good + " " + "# " * 20),  # symbol ratio > 0.1
                    (5, "\n".join(["- bullet line"] * 10) + "\n" + good),
                    (6, "\n".join(["trailing line..."] * 10) + "\n" + good),
                    (7, " ".join(["1234"] * 60)),  # no alphabetic words
                    (8, " ".join(["word"] * 60)),  # zero stopwords
                    (9, None),
                ],
                "doc_id long, text string",
            )
        ).collect()
    }
    assert rows[1].keep
    assert not rows[2].pass_words and not rows[2].keep
    assert not rows[3].pass_word_len
    assert not rows[4].pass_symbol
    assert not rows[5].pass_bullet
    assert not rows[6].pass_ellipsis
    assert not rows[7].pass_alpha and not rows[7].pass_stopwords
    assert not rows[8].pass_stopwords
    # NULL text: zero words → fails word count, nothing crashes
    assert rows[9].n_words == 0 and not rows[9].keep


def test_gopher_rules_plan_has_no_shuffle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = gopher_rules(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ------------------------------------------------------ edit distance


def test_edit_distance_pairs_exact_values(spark):
    df = spark.createDataFrame(
        [
            (1, "kitten sat"),
            (2, "sitting sat"),
            (3, "kitten sat"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "a long, b long")
    rows = {(r.a, r.b): r for r in edit_distance_pairs(df, pairs).collect()}
    # kitten→sitting is the textbook distance-3 pair
    assert rows[(1, 2)].edit_distance == 3
    assert rows[(1, 2)].edit_similarity == pytest.approx(1 - 3 / 11)
    # identical docs: distance 0, similarity 1
    assert rows[(1, 3)].edit_distance == 0
    assert rows[(1, 3)].edit_similarity == 1.0


def test_edit_distance_pairs_empty_and_cap(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "!!!"), (3, "x" * 5000), (4, "x" * 5000 + "tail")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "a long, b long")
    rows = {(r.a, r.b): r for r in edit_distance_pairs(df, pairs).collect()}
    # both normalize to empty: distance 0 over the max(len, 1) floor
    assert rows[(1, 2)].edit_distance == 0
    assert rows[(1, 2)].edit_similarity == 1.0
    # cap: both truncate to the same 2000-char prefix → identical
    assert rows[(3, 4)].edit_distance == 0
