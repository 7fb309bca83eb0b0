"""Job-level streaming tests: jobs/run_stream.py end-to-end, including
the --loop-alert monitor and its state surviving a JOB restart (not
just a micro-batch boundary — the operator-level carry is pinned in
test_streaming; this drives the spark-submit entry point itself)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from jobs.run_stream import main as run_stream_main


SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string"


def _write_chunk(spark, path, rows):
    """One parquet file = one appended log chunk (the input_file model)."""
    spark.createDataFrame(rows, SCHEMA).withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    ).coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def spec_path(tmp_path):
    p = tmp_path / "spec.json"
    p.write_text(
        json.dumps(
            {
                "processors": [],
                "router": {
                    "source_key": "role",
                    "rules": [{"regex": "assistant", "sink": "sink_assistant"}],
                    "default_sink": "sink_default",
                },
            }
        )
    )
    return str(p)


def test_run_stream_loop_alert_survives_job_restart(spark, tmp_path, spec_path):
    """Run the job, stop it, append a chunk continuing an open run,
    run the job AGAIN with the same checkpoint: the monitor's state
    store restores the open run (2+2 counts as 4, looped flips), and
    the sink pipeline processes each chunk exactly once across the
    restart."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    alerts = str(tmp_path / "alerts")

    _write_chunk(
        spark,
        src,
        [("cx", 0, "assistant", "retry 1", "t"), ("cx", 1, "assistant", "retry 2", "t")],
    )
    args = [
        "--input", src, "--output", out, "--spec", spec_path,
        "--checkpoint", ck, "--loop-alert", alerts, "--loop-threshold", "3",
        "--max-files-per-trigger", "1",
    ]
    run_stream_main(args)

    first = {
        r.conv_id: (r.max_run, bool(r.looped))
        for r in spark.read.parquet(alerts)
        .groupBy("conv_id")
        .agg(F.max("max_run").alias("max_run"), F.max("looped").alias("looped"))
        .collect()
    }
    assert first == {"cx": (2, False)}  # open run, below threshold

    # job stopped; a new chunk CONTINUES the same run, then restart
    _write_chunk(
        spark,
        src,
        [("cx", 2, "assistant", "retry 3", "t"), ("cx", 3, "assistant", "retry 4", "t")],
    )
    run_stream_main(args)

    after = {
        r.conv_id: (r.max_run, bool(r.looped))
        for r in spark.read.parquet(alerts)
        .groupBy("conv_id")
        .agg(F.max("max_run").alias("max_run"), F.max("looped").alias("looped"))
        .collect()
    }
    # state restored across the restart: 2 (before) + 2 (after) = one
    # run of 4, above the threshold -> looped
    assert after == {"cx": (4, True)}

    # exactly-once on the sink side across the restart: 4 input rows,
    # 4 routed rows, no replays
    routed = spark.read.parquet(out)
    assert routed.count() == 4
    assert routed.filter(F.col("sink") == "sink_assistant").count() == 4


def test_run_stream_loop_alert_flag_optional(spark, tmp_path, spec_path):
    """Without --loop-alert the job runs exactly as before (no second
    query, no alerts dir)."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    _write_chunk(spark, src, [("cy", 0, "user", "hello", "")])
    run_stream_main(
        ["--input", src, "--output", out, "--spec", spec_path,
         "--checkpoint", str(tmp_path / "ck")]
    )
    assert spark.read.parquet(out).count() == 1
    assert not os.path.exists(str(tmp_path / "alerts"))


def test_run_stream_dialogue_monitor_restart_carry(spark, tmp_path, spec_path):
    """--dialogue-monitor: run, stop, append a chunk whose first row
    continues a same-role adjacency across the JOB restart; the
    monitor's prev-role state restores and counts it."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    mon = str(tmp_path / "mon")

    _write_chunk(
        spark,
        src,
        [("cd", 0, "user", "hi", "t"), ("cd", 1, "assistant", "a", "t")],
    )
    args = [
        "--input", src, "--output", out, "--spec", spec_path,
        "--checkpoint", ck, "--available-now",
        "--dialogue-monitor", mon,
    ]
    run_stream_main(args)
    _write_chunk(
        spark,
        src,
        [("cd", 2, "assistant", "b", "t"), ("cd", 3, "assistant", "c", "t")],
    )
    run_stream_main(args)

    rows = spark.read.parquet(mon)
    last = rows.orderBy(F.desc("n_turns")).limit(1).collect()[0]
    # adjacency (1,2) spans the restart; (2,3) is in-chunk
    assert last.n_turns == 4
    assert last.n_same_adj == 2
    assert (last.first_role, last.last_role) == ("user", "assistant")
    assert not last.well_formed
