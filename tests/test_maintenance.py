"""Gate tests for sink-table maintenance (small-file compaction).

Covers the fallback path the module documents: a fan-out sink directory
of many tiny parquet files is rewritten into ~target-size files via
stage -> validate -> swap, preserving every row.  Mirrors the contract
of Iceberg's rewrite_data_files for the plain-parquet sink layout
(reference flusher_file writes one file per flush the same way:
plugins/flusher/file/flusher_file.go).
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from loongcollector_spark.sources import maintenance as mt


def _make_fragmented_sink(spark, path, n_files=24, rows_per_file=50):
    df = spark.range(n_files * rows_per_file).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("svc"),
        F.sha1(F.col("id").cast("string")).alias("payload"),
    )
    # one task per file -> n_files tiny parquet files, like per-trigger flushes
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    return df


def test_sink_file_stats_counts_data_files(spark, tmp_path):
    path = os.path.join(str(tmp_path), "sink_stats")
    _make_fragmented_sink(spark, path, n_files=8, rows_per_file=10)
    stats = mt.sink_file_stats(spark, path)
    assert stats["n_files"] == 8
    assert stats["total_bytes"] > 0
    assert stats["min_bytes"] <= stats["max_bytes"]


def test_plan_target_files():
    mb = 1024 * 1024
    assert mt.plan_target_files(0) == 1
    assert mt.plan_target_files(1, target_mb=128) == 1
    assert mt.plan_target_files(128 * mb, target_mb=128) == 1
    assert mt.plan_target_files(128 * mb + 1, target_mb=128) == 2
    assert mt.plan_target_files(10 * 128 * mb, target_mb=128) == 10


def test_compact_preserves_rows_and_reduces_files(spark, tmp_path):
    path = os.path.join(str(tmp_path), "sink_compact")
    _make_fragmented_sink(spark, path, n_files=24, rows_per_file=50)
    before_rows = spark.read.parquet(path).count()

    report = mt.compact_parquet(spark, path, target_mb=128)

    assert report["n_rows"] == before_rows == 24 * 50
    assert report["before"]["n_files"] == 24
    assert report["after"]["n_files"] < report["before"]["n_files"]
    # swap left no staging/backup residue
    base = os.path.dirname(path)
    leftovers = [d for d in os.listdir(base) if d.endswith(("__staged", "__old"))]
    assert leftovers == []
    # full row-set equality after the swap
    after = spark.read.parquet(path)
    assert after.count() == before_rows
    assert after.select(F.sum("event_id")).first()[0] == sum(range(24 * 50))


def test_compact_sorted_layout_prunes(spark, tmp_path):
    path = os.path.join(str(tmp_path), "sink_sorted")
    _make_fragmented_sink(spark, path, n_files=16, rows_per_file=100)
    mt.compact_parquet(spark, path, target_mb=128, sort_col="event_id")
    df = spark.read.parquet(path)
    assert df.count() == 1600
    # within each output file rows are sorted on the layout key, so
    # row-group min/max stats are tight (the point of the rewrite)
    part_ok = (
        df.withColumn("f", F.input_file_name())
        .withColumn(
            "mono",
            F.col("event_id")
            >= F.lag("event_id", 1, -1).over(
                Window.partitionBy("f").orderBy(F.monotonically_increasing_id())
            ),
        )
        .agg(F.min("mono"))
        .first()[0]
    )
    assert part_ok is True


def test_compact_hive_partitioned_keeps_layout(spark, tmp_path):
    path = os.path.join(str(tmp_path), "sink_hive")
    df = spark.range(600).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 3).cast("string").alias("sink"),
    )
    df.repartition(12).write.mode("overwrite").partitionBy("sink").parquet(path)

    report = mt.compact_parquet(spark, path, target_mb=128, partition_col="sink")
    assert report["n_rows"] == 600
    # hive dirs survive the rewrite
    dirs = sorted(d for d in os.listdir(path) if d.startswith("sink="))
    assert dirs == ["sink=0", "sink=1", "sink=2"]
    back = spark.read.parquet(path)
    assert back.groupBy("sink").count().count() == 3
    assert back.count() == 600


def test_compact_validation_failure_leaves_original(spark, tmp_path, monkeypatch):
    path = os.path.join(str(tmp_path), "sink_guard")
    _make_fragmented_sink(spark, path, n_files=4, rows_per_file=25)

    # simulate a bad staged rewrite: force the validation count to mismatch
    real_read = spark.read.parquet

    def fake_layout(df, **kw):
        return df.limit(10)  # drops rows -> staged count != original

    monkeypatch.setattr(mt, "optimize_layout", fake_layout)
    with pytest.raises(RuntimeError, match="staged rewrite had"):
        mt.compact_parquet(spark, path, target_mb=128)
    # original untouched and fully readable; staging residue removed
    assert real_read(path).count() == 100
    assert not os.path.exists(path + "__staged")
