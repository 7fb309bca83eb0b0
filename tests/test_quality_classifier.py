"""Model-based quality filtering: MLlib training emits plain floats,
the JVM-expression scorer reproduces MLlib's own probabilities."""

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.operators.text import (
    QUALITY_FEATURES,
    quality_classifier_score,
    quality_features,
    train_quality_classifier,
)


def _labeled_corpus(spark):
    good = [
        "the quick brown fox jumps over the lazy dog and it is a fine day",
        "this is a well formed english sentence with the usual words in it",
        "an essay on the nature of things that are found in the world",
        "we went to the market and bought apples that were fresh and ripe",
        "it is known that the river flows to the sea as it always has",
    ]
    bad = [
        "!!!! ???? #### $$$$ %%%% 1234 5678 !!!! ???? ####",
        "00 11 22 33 44 55 66 77 88 99 00 11 22 33",
        "@@@@ &&&& **** (((( )))) 9999 8888 @@@@ &&&&",
        "--- +++ === ~~~ ``` 0101 0101 --- +++ ===",
        "#1 #2 #3 #4 #5 #6 #7 #8 #9 #10 #11 #12",
    ]
    rows = [(i, t, 1) for i, t in enumerate(good * 8)] + [
        (1000 + i, t, 0) for i, t in enumerate(bad * 8)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_train_then_score_separates(spark):
    df = _labeled_corpus(spark)
    weights, bias = train_quality_classifier(df, "label")
    assert len(weights) == len(QUALITY_FEATURES)
    scored = quality_classifier_score(df, weights, bias)
    acc = (
        scored.select(
            (F.col("quality_keep").cast("int") == F.col("label"))
            .cast("int")
            .alias("ok")
        )
        .agg(F.avg("ok"))
        .first()[0]
    )
    assert acc >= 0.95, f"classifier failed to separate: acc={acc}"


def test_scorer_matches_mllib_probabilities(spark, tmp_path):
    """The codegen scorer must reproduce THE model MLlib fit: take one
    fitted model's own coefficients and compare sigmoid(w·x+b) against
    that same model's probability column. (One fit only — two separate
    LBFGS fits can drift past any tight tolerance.)"""
    from pyspark.ml.classification import (
        LogisticRegression,
        LogisticRegressionModel,
    )
    from pyspark.ml.functions import array_to_vector, vector_to_array

    df = _labeled_corpus(spark)
    feat = quality_features(df).withColumn(
        "__features",
        array_to_vector(F.array(*[F.col(c) for c in QUALITY_FEATURES])),
    )
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol="label",
        maxIter=64,
        regParam=0.001,
        standardization=True,
    )
    model = lr.fit(feat.withColumn("label", F.col("label").cast("double")))
    # drop the training summary before transform: it pins the live
    # SparkSession (ObservationManager, non-serializable in Spark 4.1),
    # and once any prior test has used Observation the closure cleaner
    # refuses to ship the model. Save/load persists a summary-free copy.
    mpath = str(tmp_path / "lrm")
    model.write().save(mpath)
    model = LogisticRegressionModel.load(mpath)
    weights, bias = [float(c) for c in model.coefficients], float(model.intercept)
    mllib_p = {
        r.doc_id: float(r.p[1])
        for r in model.transform(feat)
        .withColumn("p", vector_to_array("probability"))
        .select("doc_id", "p")
        .collect()
    }
    ours = {
        r.doc_id: r.quality_score
        for r in quality_classifier_score(df, weights, bias).collect()
    }
    for k in mllib_p:
        assert ours[k] == pytest.approx(mllib_p[k], abs=1e-9)


def test_weight_count_guard(spark):
    df = _labeled_corpus(spark)
    with pytest.raises(ValueError, match="expected 6 weights"):
        quality_classifier_score(df, [1.0, 2.0], 0.0)


# ---------------------------------------------------------------------------
# bigram LM (order-2 sibling of lm_perplexity — lives here with the
# other model-based quality signals)


def test_bigram_ppl_flags_word_salad(spark):
    from loongcollector_spark.operators.text import bigram_lm_perplexity

    fluent = "the cat sat on the mat and the dog sat on the rug"
    salad = "mat the on dog sat rug the and cat the on sat the"
    rows = [(i, fluent) for i in range(20)] + [(100, salad)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.ppl for r in bigram_lm_perplexity(df).collect()}
    assert out[100] > out[0]  # scrambled word order scores worse
    assert all(v > 0 for v in out.values())


def test_bigram_ppl_alpha_guard_and_empty_text(spark):
    import pytest as _pt

    from loongcollector_spark.operators.text import bigram_lm_perplexity

    df = spark.createDataFrame([(1, ""), (2, "a b")], "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_lm_perplexity(df).collect()}
    assert out[1].n_bigrams == 1  # <s> -> '' sentinel bigram
    assert out[2].n_bigrams == 2
    with _pt.raises(ValueError, match="alpha"):
        bigram_lm_perplexity(df, alpha=0.0)
