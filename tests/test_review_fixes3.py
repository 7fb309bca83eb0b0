"""Regression tests for the fourth review batch (checkpoint job-id
contamination, NaN cosine, LSH dim inference, sessionize_counts
default)."""

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.operators import similarity
from loongcollector_spark.pipeline import Pipeline
from loongcollector_spark.plans.checkpoint import run_with_checkpoint


def test_checkpoint_jobid_prefix_no_contamination(spark, tmp_path):
    df = spark.createDataFrame(
        [(f"c{i}", i, "x") for i in range(8)], ["conv_id", "turn_idx", "v"]
    )
    lin = str(tmp_path / "lineage")
    # job 'run_2' commits its units first
    run_with_checkpoint(
        spark, df, lambda d: d,
        out_dir=str(tmp_path / "o2"), lineage_dir=lin, job_id="run_2", n_units=2,
    )
    # job 'run' must NOT see run_2's units as its own
    out = run_with_checkpoint(
        spark, df, lambda d: d,
        out_dir=str(tmp_path / "o1"), lineage_dir=lin, job_id="run", n_units=2,
    )
    assert out.count() == 8  # all units processed, none skipped


def test_zero_vector_never_tops_ranking(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 0.0, 0.0]),  # zero vector
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = spark.createDataFrame([(1, [1.0, 0.0, 0.0])], ["query_id", "embedding"])
    for impl in ("numpy", "sql"):
        top = similarity.brute_force_topk(emb, q, k=2, impl=impl).collect()
        ranked = sorted(top, key=lambda r: r.rank)
        assert ranked[0].neighbor_id == 2, impl
        assert ranked[1].neighbor_id == 3 and ranked[1].cos_sim == 0.0, impl


def test_lsh_dim_inferred_from_data(spark):
    # 8-dim embeddings, no dim argument: buckets must differentiate
    import random

    rng = random.Random(1)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = similarity.embedding_near_dups(emb, threshold=0.99)
    assert out.count() == 0  # random vectors: no near-dups, no blowup
    # duplicated vector is still found
    dup = emb.limit(1).withColumn("vec_id", F.lit(999))
    out2 = similarity.embedding_near_dups(emb.unionByName(dup), threshold=0.999)
    assert {(r.a, r.b) for r in out2.collect()} == {(0, 999)}


def test_sessionize_counts_default_keys(spark, sf_dir):
    from loongcollector_spark.sources.transcripts import load_transcripts

    tx = load_transcripts(spark, sf_dir)
    pipe = Pipeline({
        "processors": [],
        "aggregates": [{"type": "sessionize_counts", "gap_seconds": 3600}],
    })
    aggs = pipe.aggregates(tx)
    assert aggs["sessionize_counts"].count() > 0
