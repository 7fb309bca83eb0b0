"""Skew handling: salted shard repartition must spread hot
conversations over multiple partitions while keeping cold
conversations on a single partition (SURVEY.md §4 — the explicit
100 TB addition the reference lacks)."""

from pyspark.sql import functions as F

from loongcollector_spark.operators.aggregate import (
    find_hot_keys,
    salted_shard_repartition,
    shard_repartition,
)
from loongcollector_spark.sources.transcripts import generate_transcripts


def _partition_spread(df, conv):
    return (
        df.filter(F.col("conv_id") == conv)
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )


def test_salted_repartition_spreads_hot_keys(spark):
    df = generate_transcripts(spark, 40000)  # ~30% of rows in 7 hot convs
    hot = find_hot_keys(df, ["conv_id"], threshold=1000)
    hot_convs = [r.conv_id for r in hot.collect()]
    assert len(hot_convs) >= 3

    plain = shard_repartition(df, ["conv_id"], shard_count=16)
    salted = salted_shard_repartition(
        df, ["conv_id"], shard_count=16, hot_keys=hot, salt_mod=8
    )
    # without salt: every conversation lives on exactly one partition
    assert _partition_spread(plain, hot_convs[0]) == 1
    # with salt: a hot conversation spreads over >1 (up to salt_mod)
    assert _partition_spread(salted, hot_convs[0]) > 1
    # cold conversations stay on one partition even when salted
    cold = (
        df.groupBy("conv_id").count().filter(F.col("count") < 500).first().conv_id
    )
    assert _partition_spread(salted, cold) == 1
    # row multiset unchanged by the shuffle
    assert salted.count() == df.count()


def test_salted_repartition_balances_load(spark):
    df = generate_transcripts(spark, 40000)
    hot = find_hot_keys(df, ["conv_id"], threshold=1000)
    plain_sizes = [
        r["cnt"]
        for r in shard_repartition(df, ["conv_id"], 16)
        .groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    ]
    salted_sizes = [
        r["cnt"]
        for r in salted_shard_repartition(df, ["conv_id"], 16, hot_keys=hot, salt_mod=8)
        .groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    ]
    # salting must reduce the max-partition to mean ratio (skew factor)
    skew_plain = max(plain_sizes) / (sum(plain_sizes) / len(plain_sizes))
    skew_salted = max(salted_sizes) / (sum(salted_sizes) / len(salted_sizes))
    assert skew_salted < skew_plain
