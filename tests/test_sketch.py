"""HyperLogLog sketch + deterministic uniform sample: accuracy,
determinism across parallelism, and plan shape.  Cross-engine value
checks live in test_queries_oracle.py (hll_distinct / uniform_sample).
"""

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.operators.sketch import hll_distinct, uniform_sample

from test_plans import plan_of


def test_hll_accuracy_raw_branch(spark):
    # 10k distinct ids, p=12 → standard error ~1.04/sqrt(4096) ≈ 1.6%;
    # assert within 5 sigma
    df = spark.range(10_000).select(F.col("id"))
    est = hll_distinct(df, "id", p=12).collect()[0]["n_est"]
    assert abs(est - 10_000) / 10_000 < 0.08


def test_hll_linear_counting_branch(spark):
    # 30 distinct « 2.5*m → linear counting; near-exact for tiny V/m
    df = spark.range(30)
    row = hll_distinct(df, "id", p=12).collect()[0]
    assert row["n_registers_used"] <= 30
    assert abs(row["n_est"] - 30) < 1.5


def test_hll_duplicates_do_not_move_estimate(spark):
    # the sketch sees values, not rows: 100 distinct values repeated
    # 50x give the same registers as each value once
    once = spark.range(100)
    many = once.crossJoin(spark.range(50).select(F.col("id").alias("r"))).select("id")
    a = hll_distinct(once, "id", p=8).collect()[0]
    b = hll_distinct(many, "id", p=8).collect()[0]
    assert a == b


def test_hll_p_validation(spark):
    with pytest.raises(ValueError):
        hll_distinct(spark.range(5), "id", p=3)


def test_hll_plan_partial_agg_no_python(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = plan_of(hll_distinct(ev, "event_id"))
    assert "EvalPython" not in plan
    # register build is a hash aggregate (partial+final around one
    # exchange) — mergeable map-side
    assert "HashAggregate" in plan


def test_uniform_sample_deterministic_across_parallelism(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(r["doc_id"] for r in uniform_sample(docs, 15).collect())
    b = sorted(
        r["doc_id"]
        for r in uniform_sample(docs.repartition(13), 15).collect()
    )
    assert a == b and len(a) == 15
    # a different salt draws a different sample
    c = sorted(
        r["doc_id"] for r in uniform_sample(docs, 15, salt="other").collect()
    )
    assert a != c


def test_uniform_sample_n_larger_than_input(spark):
    df = spark.range(7).select(F.col("id").alias("doc_id"))
    assert uniform_sample(df, 100).count() == 7
    with pytest.raises(ValueError):
        uniform_sample(df, 0)


def test_uniform_sample_plan_take_ordered(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = plan_of(uniform_sample(docs, 10))
    # global sort+limit must plan as TakeOrderedAndProject (per-
    # partition local top-n), NOT a full Sort + Exchange
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# Count-Min sketch


def test_cms_estimate_upper_bounds_exact(spark, sf_dir):
    from loongcollector_spark.operators.sketch import cms_build, cms_estimate
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sk = cms_build(ev, "user_id", width=64, depth=4, hash_mode="xxhash64")
    assert sk.count() <= 64 * 4
    probes = ev.select(F.col("user_id")).distinct().limit(50)
    n_probes = probes.count()
    est = cms_estimate(sk, probes, "user_id", width=64, depth=4, hash_mode="xxhash64")
    exact = ev.groupBy(F.col("user_id").cast("string").alias("item")).count()
    joined = est.join(exact, "item").select("est", "count").collect()
    assert len(joined) == n_probes > 0
    assert all(r.est >= r["count"] for r in joined)  # CMS never undercounts


def test_cms_merge_equals_single_build(spark, sf_dir):
    """Two half-corpus sketches summed cell-wise == the full-corpus
    sketch (the mergeability contract)."""
    from loongcollector_spark.operators.sketch import cms_build
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    full = cms_build(ev, "event_type", width=32, depth=3)
    a = cms_build(ev.filter("event_id % 2 = 0"), "event_type", width=32, depth=3)
    b = cms_build(ev.filter("event_id % 2 = 1"), "event_type", width=32, depth=3)
    merged = (
        a.unionAll(b)
        .groupBy("depth", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_cms_guards(spark, sf_dir):
    import pytest as _pt

    from loongcollector_spark.operators.sketch import cms_build

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    with _pt.raises(ValueError, match="width"):
        cms_build(ev, "event_type", width=1)
