"""stream_dialogue_monitor: parity with the batch dialogue_balance twin,
cross-batch adjacency carry, and out-of-order detection."""

import os

from pyspark.sql import functions as F

from loongcollector_spark.sources.transcripts import load_transcripts

SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string"


def _write_batch(spark, rows, path, ts, mode="overwrite"):
    spark.createDataFrame(rows, SCHEMA).withColumn(
        "ts", F.to_timestamp(F.lit(ts))
    ).coalesce(1).write.mode(mode).parquet(path)


def test_stream_dialogue_parity_with_batch_twin(spark, sf_dir, tmp_path):
    from loongcollector_spark.operators.trajectory import dialogue_balance
    from loongcollector_spark.streaming.stream import (
        read_transcript_stream,
        stream_dialogue_monitor,
    )

    src = str(tmp_path / "ordered")
    tx = load_transcripts(spark, sf_dir)
    tx.orderBy("conv_id", "turn_idx").coalesce(1).write.parquet(src)
    q = (
        stream_dialogue_monitor(
            read_transcript_stream(spark, src, max_files_per_trigger=64)
        )
        .writeStream.format("memory")
        .queryName("dlg_mon")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.conv_id: (r.n_turns, r.n_same_adj, r.first_role, r.last_role, r.well_formed)
        for r in spark.sql(
            "select conv_id, max(n_turns) as n_turns, max(n_same_adj) as "
            "n_same_adj, max_by(first_role, n_turns) as first_role, "
            "max_by(last_role, n_turns) as last_role, "
            "max_by(well_formed, n_turns) as well_formed "
            "from dlg_mon group by conv_id"
        ).collect()
    }
    want = {
        r.conv_id: (r.n_turns, r.n_same_adj, r.first_role, r.last_role, r.well_formed)
        for r in dialogue_balance(tx).collect()
    }
    assert got == want


def test_stream_dialogue_null_roles_match_batch(spark, tmp_path):
    """NULL roles: no adjacency counted (batch lag comparison is NULL),
    NULL boundary roles surface as NULL, and well_formed follows the
    batch three-valued AND (False beats NULL; NULL boundary → NULL)."""
    from loongcollector_spark.operators.trajectory import dialogue_balance
    from loongcollector_spark.streaming.stream import (
        read_transcript_stream,
        stream_dialogue_monitor,
    )

    rows = [
        # two consecutive NULL roles must NOT count as same-role adj;
        # opens user / closes assistant / no adj → well_formed NULL? no:
        # all non-boundary NULLs, boundary roles present → True
        ("cA", 0, "user", "t", ""),
        ("cA", 1, None, "t", ""),
        ("cA", 2, None, "t", ""),
        ("cA", 3, "assistant", "t", ""),
        # NULL closing role → well_formed is NULL (batch semantics)
        ("cB", 0, "user", "t", ""),
        ("cB", 1, None, "t", ""),
        # NULL opening but a real same-role adjacency → False wins
        ("cC", 0, None, "t", ""),
        ("cC", 1, "user", "t", ""),
        ("cC", 2, "user", "t", ""),
    ]
    src = str(tmp_path / "nulls")
    _write_batch(spark, rows, src, "2024-01-01 00:00:00")
    q = (
        stream_dialogue_monitor(read_transcript_stream(spark, src))
        .writeStream.format("memory")
        .queryName("dlg_nulls")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_nulls"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.conv_id: (r.n_turns, r.n_same_adj, r.first_role, r.last_role, r.well_formed)
        for r in spark.sql(
            "select conv_id, max(n_turns) as n_turns, max(n_same_adj) as "
            "n_same_adj, max_by(first_role, n_turns) as first_role, "
            "max_by(last_role, n_turns) as last_role, "
            "max_by(well_formed, n_turns) as well_formed "
            "from dlg_nulls group by conv_id"
        ).collect()
    }
    want = {
        r.conv_id: (r.n_turns, r.n_same_adj, r.first_role, r.last_role, r.well_formed)
        for r in dialogue_balance(
            spark.createDataFrame(rows, SCHEMA)
        ).collect()
    }
    assert got == want
    assert got["cA"] == (4, 0, "user", "assistant", True)
    assert got["cB"] == (2, 0, "user", None, None)
    assert got["cC"] == (3, 1, None, "user", False)


def test_stream_dialogue_cross_batch_adjacency(spark, tmp_path):
    """A same-role adjacency SPLIT across two micro-batches still
    counts: the prev-role string carries across triggers."""
    from loongcollector_spark.streaming.stream import (
        read_transcript_stream,
        stream_dialogue_monitor,
    )

    src = str(tmp_path / "split")
    _write_batch(
        spark,
        [("c", 0, "user", "a", "t"), ("c", 1, "assistant", "b", "t")],
        src,
        "2024-01-01 00:00:00",
    )
    first = {f for f in os.listdir(src) if f.endswith(".parquet")}
    _write_batch(
        spark,
        [("c", 2, "assistant", "c", "t"), ("c", 3, "assistant", "d", "t")],
        src,
        "2024-01-01 00:00:01",
        mode="append",
    )
    second = {f for f in os.listdir(src) if f.endswith(".parquet")} - first
    for i, f in enumerate(sorted(first) + sorted(second)):
        os.utime(os.path.join(src, f), (1700000000 + i, 1700000000 + i))
    q = (
        stream_dialogue_monitor(
            read_transcript_stream(spark, src, max_files_per_trigger=1)
        )
        .writeStream.format("memory")
        .queryName("dlg_split")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    row = spark.sql(
        "select max(n_same_adj) as s, max(ooo_regressions) as o, "
        "max_by(first_role, n_turns) as fr, max_by(last_role, n_turns) as lr "
        "from dlg_split"
    ).collect()[0]
    # adjacencies: (1,2) spans the batch boundary, (2,3) is in-batch
    assert row.s == 2
    assert row.o == 0
    assert (row.fr, row.lr) == ("user", "assistant")


def test_stream_dialogue_out_of_order_detection(spark, tmp_path):
    """A lower turn_idx arriving in a LATER batch is flagged, and the
    index-keyed first_role is still corrected exactly."""
    from loongcollector_spark.streaming.stream import (
        read_transcript_stream,
        stream_dialogue_monitor,
    )

    src = str(tmp_path / "ooo")
    _write_batch(
        spark,
        [("c", 2, "assistant", "late-start", "t"), ("c", 3, "assistant", "x", "t")],
        src,
        "2024-01-01 00:00:00",
    )
    first = {f for f in os.listdir(src) if f.endswith(".parquet")}
    _write_batch(
        spark,
        [("c", 0, "user", "opener", "t"), ("c", 1, "assistant", "y", "t")],
        src,
        "2024-01-01 00:00:01",
        mode="append",
    )
    second = {f for f in os.listdir(src) if f.endswith(".parquet")} - first
    for i, f in enumerate(sorted(first) + sorted(second)):
        os.utime(os.path.join(src, f), (1700000000 + i, 1700000000 + i))
    q = (
        stream_dialogue_monitor(
            read_transcript_stream(spark, src, max_files_per_trigger=1)
        )
        .writeStream.format("memory")
        .queryName("dlg_ooo")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    row = spark.sql(
        "select max(ooo_regressions) as o, max_by(first_role, n_turns) as fr, "
        "max_by(last_role, n_turns) as lr from dlg_ooo"
    ).collect()[0]
    assert row.o == 2  # turns 0 and 1 both arrived after turn 3 was folded
    assert row.fr == "user"  # index-keyed boundary roles self-correct
    assert row.lr == "assistant"
