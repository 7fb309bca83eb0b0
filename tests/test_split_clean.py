"""split_assign / score_sample (sketch.py) and clean_lines /
dedup_lines (text.py) — determinism, rule-by-rule behavior, plan pins."""

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.operators.sketch import score_sample, split_assign
from loongcollector_spark.operators.text import clean_lines, dedup_lines


# --------------------------------------------------------- split_assign


def _ids(spark, n):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_split_assign_proportions_and_total(spark):
    out = split_assign(
        _ids(spark, 20000), {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    counts = {r.split: r.c for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert sum(counts.values()) == 20000
    assert counts["train"] == pytest.approx(16000, rel=0.05)
    assert counts["val"] == pytest.approx(2000, rel=0.15)
    assert counts["test"] == pytest.approx(2000, rel=0.15)


def test_split_assign_growth_never_moves_existing_rows(spark):
    """The property randomSplit cannot give: assignment is a pure
    function of the id, so adding more data later leaves every
    existing document in its original split."""
    small = {
        r.doc_id: r.split
        for r in split_assign(_ids(spark, 500), {"train": 0.9, "val": 0.1}).collect()
    }
    big = {
        r.doc_id: r.split
        for r in split_assign(_ids(spark, 5000), {"train": 0.9, "val": 0.1}).collect()
    }
    assert all(big[k] == v for k, v in small.items())


def test_split_assign_salt_draws_independent_partition(spark):
    a = {r.doc_id: r.split for r in split_assign(_ids(spark, 2000), {"x": 0.5, "y": 0.5}).collect()}
    b = {
        r.doc_id: r.split
        for r in split_assign(_ids(spark, 2000), {"x": 0.5, "y": 0.5}, salt="s2").collect()
    }
    moved = sum(1 for k in a if a[k] != b[k])
    assert 500 < moved < 1500  # ~half move under an independent draw


def test_split_assign_validation(spark):
    df = _ids(spark, 10)
    with pytest.raises(ValueError):
        split_assign(df, {})
    with pytest.raises(ValueError):
        split_assign(df, {"a": 0.9, "b": 0.2})
    with pytest.raises(ValueError):
        split_assign(df, {"a": -0.1, "b": 0.5})


def test_split_assign_remainder_falls_into_last_sorted_split(spark):
    # fractions sum to 0.2; the 80% remainder lands in 'z' (last sorted)
    out = split_assign(_ids(spark, 2000), {"a": 0.1, "z": 0.1})
    counts = {r.split: r.c for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert counts["z"] > counts["a"] * 5


# --------------------------------------------------------- score_sample


def test_score_sample_extremes_and_null(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, None), (4, 2.5), (5, -3.0)],
        "doc_id long, score double",
    )
    kept = {r.doc_id for r in score_sample(df, "score").collect()}
    assert 1 in kept  # score 1 → always kept
    assert 4 in kept  # clamped to 1
    assert 2 not in kept and 5 not in kept  # score ≤ 0 → dropped
    assert 3 not in kept  # NULL → 0 → dropped


def test_score_sample_power_sharpens(spark):
    df = spark.range(5000).withColumnRenamed("id", "doc_id").withColumn(
        "score", F.lit(0.5)
    )
    k1 = {r.doc_id for r in score_sample(df, "score", power=1.0).collect()}
    k2 = {r.doc_id for r in score_sample(df, "score", power=2.0).collect()}
    assert k2 <= k1  # p² ≤ p on [0,1]: same hash, tighter threshold
    assert len(k1) == pytest.approx(2500, rel=0.1)
    assert len(k2) == pytest.approx(1250, rel=0.15)
    with pytest.raises(ValueError):
        score_sample(df, "score", power=0)


# ---------------------------------------------------------- clean_lines


def test_clean_lines_each_rule(spark):
    page = "\n".join(
        [
            "this line is properly terminated.",
            "this line is properly terminated.",  # dup survives cleaning
            'a quoted ending works too."',
            "no terminal punctuation on this line",
            "short.",
            "contains lorem ipsum filler text.",
            "enable JavaScript to view this.",
            "some { code } block here.",
            "   ",
        ]
    )
    r = clean_lines(
        spark.createDataFrame([(1, page), (2, None)], "doc_id long, text string")
    ).collect()
    rows = {x.doc_id: x for x in r}
    kept = rows[1].clean_text.split("\n")
    assert kept == [
        "this line is properly terminated.",
        "this line is properly terminated.",
        'a quoted ending works too."',
    ]
    assert rows[1].n_lines == 9 and rows[1].n_kept == 3
    # NULL text → one empty line, nothing kept
    assert rows[2].n_lines == 1 and rows[2].n_kept == 0
    assert rows[2].clean_text == ""


def test_clean_lines_options(spark):
    df = spark.createDataFrame(
        [(1, "one two { three }\nfour five six")], "doc_id long, text string"
    )
    out = clean_lines(
        df,
        min_line_words=2,
        require_terminal_punct=False,
        banned_substrings=(),
        drop_curly=False,
    ).collect()[0]
    assert out.n_kept == 2


# ---------------------------------------------------------- dedup_lines


def test_dedup_lines_first_occurrence_order(spark):
    page = "b\na\nb\nc\na\nb"
    out = dedup_lines(
        spark.createDataFrame([(1, page)], "doc_id long, text string")
    ).collect()[0]
    assert out.dedup_text == "b\na\nc"
    assert out.n_lines == 6 and out.n_unique == 3


def test_dedup_lines_idempotent_and_null(spark):
    df = spark.createDataFrame(
        [(1, "x\ny\nx"), (2, None)], "doc_id long, text string"
    )
    once = dedup_lines(df)
    again = dedup_lines(
        once.select("doc_id", F.col("dedup_text").alias("text"))
    )
    assert {
        (r.doc_id, r.dedup_text) for r in once.collect()
    } == {(r.doc_id, r.dedup_text) for r in again.collect()}
    null_row = [r for r in once.collect() if r.doc_id == 2][0]
    assert null_row.n_lines == 1 and null_row.dedup_text == ""


# ------------------------------------------------------------ plan pins


def test_new_ops_plans_have_no_shuffle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for df in (
        split_assign(docs, {"train": 0.9, "val": 0.1}),
        score_sample(docs.withColumn("score", F.lit(0.5)), "score"),
        clean_lines(docs),
        dedup_lines(docs),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
