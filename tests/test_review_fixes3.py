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


def test_resize_upscale_no_black_cells():
    import numpy as np

    from loongcollector_spark.functions import codecs

    img = np.full((2, 2, 1), 200, dtype=np.uint8)
    up = codecs.resize_block_mean(img, 4, 4)
    assert (up == 200).all()  # binning-only impl left zero-filled cells
    # mixed: shrink rows, grow cols
    img2 = np.full((4, 2, 1), 100, dtype=np.uint8)
    mixed = codecs.resize_block_mean(img2, 2, 4)
    assert mixed.shape == (2, 4, 1) and (mixed == 100).all()


def test_resize_images_corrupt_png_yields_null(spark):
    from loongcollector_spark.operators import multimodal

    corrupt = b"\x89PNG\r\n\x1a\n" + b"\x00" * 40  # magic but garbage chunks
    df = spark.createDataFrame([(1, bytearray(corrupt))], "id long, media binary")
    out = multimodal.resize_images(df).first()
    assert out.resized is None  # zlib/struct errors must not kill the job


def test_encrypt_gcm_default_iv_works(spark):
    from loongcollector_spark.operators.enrich import decrypt_fields, encrypt_fields

    key = "00112233445566778899aabbccddeeff"
    df = spark.createDataFrame([("v1",)], ["v"])
    enc = encrypt_fields(df, ["v"], key, mode="GCM")  # default IV path
    dec = decrypt_fields(enc, ["v"], key, mode="GCM")
    assert dec.first().v == "v1"


def test_gotime_epoch_dest_is_location_independent(spark):
    from loongcollector_spark.operators.parse import parse_gotime

    df = spark.createDataFrame([("2024-01-01 00:00:00",)], ["t"])
    outs = [
        parse_gotime(
            df, "t", "2006-01-02 15:04:05", "o", "seconds",
            source_location=0, dest_location=loc,
        ).first().o
        for loc in (0, 8, -5)
    ]
    assert outs == ["1704067200"] * 3  # Go t.In(loc).Unix() ignores loc


def test_gotime_optional_fraction_parses_both(spark):
    from loongcollector_spark.operators.parse import parse_gotime

    df = spark.createDataFrame(
        [("2024-03-05 10:30:00",), ("2024-03-05 10:30:00.250",)], ["t"]
    )
    out = parse_gotime(
        df, "t", "2006-01-02 15:04:05.999", "o", "seconds", source_location=0
    )
    assert [r.o for r in out.collect()] == ["1709634600", "1709634600"]


def test_simhash_null_text_keeps_doc(spark):
    from loongcollector_spark.operators import dedup

    df = spark.createDataFrame(
        [(1, "hello world"), (2, None)], "doc_id long, text string"
    )
    out = {r.doc_id: r.simhash for r in dedup.simhash(df).collect()}
    assert set(out) == {1, 2}
    assert out[2] == 0  # matches the per-row HOF expression's NULL result


def test_checkpoint_empty_input(spark, tmp_path):
    from loongcollector_spark.plans.checkpoint import run_with_checkpoint

    df = spark.createDataFrame([], "conv_id string, turn_idx long")
    out = run_with_checkpoint(
        spark, df, lambda d: d,
        out_dir=str(tmp_path / "o"), lineage_dir=str(tmp_path / "lin"),
        job_id="empty", n_units=2,
    )
    assert out.count() == 0
    assert set(out.columns) == {"conv_id", "turn_idx"}
