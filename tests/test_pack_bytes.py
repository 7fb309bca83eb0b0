"""Byte-cap pack rotation (aggregator_base MaxLogGroupSize analog)."""

from pyspark.sql import functions as F

from loongcollector_spark.operators.aggregate import pack_groups


def test_pack_groups_byte_cap(spark):
    # 10 rows of 40 bytes each, cap 100 bytes -> packs of ~2-3 rows
    rows = [("g", i, "x" * 40) for i in range(10)]
    df = spark.createDataFrame(rows, ["g", "i", "payload"])
    out = pack_groups(
        df, ["g"], "i", max_log_count=1000, max_bytes=100, bytes_col="payload"
    )
    packs = (
        out.groupBy("__pack_id__")
        .agg(F.count("*").alias("n"), F.min("i").alias("first"))
        .orderBy("first")
        .collect()
    )
    # prefix-bytes boundaries: rows 0-2 (0,40,80) pack0; 3-4 (120,160)
    # pack1; 5-7 pack2 (200,240,280); 7? 280//100=2, row7 280->2; row8
    # 320->3 ...
    sizes = [p.n for p in packs]
    assert sum(sizes) == 10
    assert max(sizes) <= 3  # cap may overshoot by at most one row
    assert len(sizes) >= 4


def test_pack_groups_both_caps(spark):
    rows = [("g", i, "x" * 10) for i in range(10)]
    df = spark.createDataFrame(rows, ["g", "i", "payload"])
    out = pack_groups(
        df, ["g"], "i", max_log_count=2, max_bytes=10_000, bytes_col="payload"
    )
    sizes = [
        r.n
        for r in out.groupBy("__pack_id__").agg(F.count("*").alias("n")).collect()
    ]
    assert sorted(sizes) == [2, 2, 2, 2, 2]  # count cap dominates
