"""End-to-end pipeline tests: config-driven assembly, fan-out writes,
metrics, and checkpoint/resume idempotency (mirrors the reference's
e2e oracle families count/field/order, test/engine/verify/)."""

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.pipeline import Pipeline
from loongcollector_spark.plans.checkpoint import run_with_checkpoint
from loongcollector_spark.plans.metrics import MetricsCollector
from loongcollector_spark.operators.route import read_sink
from loongcollector_spark.queries import (
    NGINX_KEYS,
    NGINX_REGEX,
    ROLE_DIM,
)
from loongcollector_spark.sources.transcripts import load_transcripts

SPEC = {
    "processors": [
        {
            "type": "parse_regex",
            "source_key": "text",
            "regex": NGINX_REGEX,
            "keys": NGINX_KEYS,
        },
        {
            "type": "dict_map",
            "dim": "role_dim",
            "source_key": "role",
            "dest_key": "role_class",
            "handle_missing": True,
            "missing": "Unknown",
        },
        {"type": "add_tags", "tags": {"pipeline": "e2e-test"}},
    ],
    "router": {
        "source_key": "role",
        "rules": [
            {"regex": "assistant", "sink": "sink_assistant"},
            {"regex": "tool", "sink": "sink_tool"},
            {"regex": "user|system", "sink": "sink_human"},
        ],
        "default_sink": "sink_default",
    },
}


@pytest.fixture()
def pipe(spark):
    dims = {
        "role_dim": spark.createDataFrame(ROLE_DIM, ["role", "role_class", "priority"])
    }
    return Pipeline(SPEC, dims)


def test_config_pipeline_counts_and_fields(spark, sf_dir, tmp_path, pipe):
    tx = load_transcripts(spark, sf_dir)
    metrics = MetricsCollector("job-1")
    out_dir = str(tmp_path / "sinks")
    met_dir = str(tmp_path / "metrics")
    routed = pipe.run_and_write(
        tx, out_dir, metrics=metrics, spark=spark, metrics_path=met_dir
    )
    # count oracle (verify/count.go analog)
    counts = {r.sink: r["cnt"] for r in
              routed.groupBy("sink").agg(F.count("*").alias("cnt")).collect()}
    n_alien = tx.filter(F.col("role") == "alien").count()
    assert counts["sink_default"] == n_alien
    assert sum(counts.values()) == tx.count()
    # field oracle (verify/log_field.go analog)
    back = read_sink(spark, out_dir, "sink_assistant")
    assert {"role_class", "pipeline", "status", "ip"} <= set(back.columns)
    assert back.filter(F.col("role_class") != "model").count() == 0
    # order oracle (verify/log_order.go analog): per-turn text equality
    orig = {
        (r.conv_id, r.turn_idx): r.text
        for r in tx.filter(F.col("role") == "assistant").collect()
    }
    got = {(r.conv_id, r.turn_idx): r.text for r in back.collect()}
    assert got == orig
    # metrics table written
    m = spark.read.parquet(met_dir)
    rec = m.collect()[0]
    assert rec.rows_in == tx.count() and rec.rows_out == tx.count()


def test_checkpoint_resume_idempotent(spark, sf_dir, tmp_path, pipe):
    """Kill-and-rerun equals clean single run (RangeCheckpoint /
    checkpoint_manager semantics)."""
    tx = load_transcripts(spark, sf_dir)
    transform = pipe.run

    clean_dir = str(tmp_path / "clean")
    run_with_checkpoint(
        spark, tx, transform,
        out_dir=clean_dir, lineage_dir=str(tmp_path / "lin_clean"),
        job_id="clean", n_units=4,
    )

    crash_dir = str(tmp_path / "crash")
    lin = str(tmp_path / "lin_crash")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_with_checkpoint(
            spark, tx, transform,
            out_dir=crash_dir, lineage_dir=lin,
            job_id="crash", n_units=4, fail_after_units=2,
        )
    # resume
    final = run_with_checkpoint(
        spark, tx, transform,
        out_dir=crash_dir, lineage_dir=lin, job_id="crash", n_units=4,
    )
    a = sorted(
        (r.conv_id, r.turn_idx, r.sink, r.text)
        for r in spark.read.parquet(clean_dir).collect()
    )
    b = sorted((r.conv_id, r.turn_idx, r.sink, r.text) for r in final.collect())
    assert a == b
    assert len(b) == tx.count()
    # second rerun is a no-op (no duplicates)
    again = run_with_checkpoint(
        spark, tx, transform,
        out_dir=crash_dir, lineage_dir=lin, job_id="crash", n_units=4,
    )
    assert again.count() == tx.count()


def test_tag_copy_and_unconditional_sinks(spark, sf_dir):
    spec = {
        "processors": [],
        "router": {
            "source_key": "role",
            "rules": [{"regex": "assistant", "sink": "sink_a"}],
            "default_sink": "sink_other",
            "unconditional_sinks": ["sink_audit"],
            "tag_copy_sinks": [["tool", "code", "sink_code_copy"]],
        },
    }
    tx = load_transcripts(spark, sf_dir)
    routed = Pipeline(spec).run(tx)
    counts = {r.sink: r["cnt"] for r in
              routed.groupBy("sink").agg(F.count("*").alias("cnt")).collect()}
    n = tx.count()
    assert counts["sink_audit"] == n
    assert counts["sink_code_copy"] == tx.filter(F.col("tool") == "code").count()
    assert counts["sink_a"] + counts["sink_other"] == n


def test_run_pipeline_wire_flushers_roundtrip(spark, sf_dir, tmp_path):
    """jobs/run_pipeline.py --flusher sls/loki/es/clickhouse: the
    deployment entry point lands decodable wire payloads whose row
    totals equal the routed input."""
    import json as _json

    from jobs.run_pipeline import main as run_pipeline_main
    from loongcollector_spark.sources.clickhouse_rb import (
        decode_clickhouse_rowbinary,
    )
    from loongcollector_spark.sources.es_bulk import decode_es_bulk
    from loongcollector_spark.sources.sls_pb import decode_loggroup

    spec = tmp_path / "spec.json"
    spec.write_text(
        _json.dumps(
            {
                "processors": [],
                "router": {
                    "source_key": "role",
                    "rules": [
                        {"regex": "assistant", "sink": "sink_assistant"},
                        {"regex": "tool", "sink": "sink_tool"},
                    ],
                    "default_sink": "sink_default",
                },
            }
        )
    )
    src = str(tmp_path / "tx")
    from loongcollector_spark.sources.transcripts import load_transcripts

    load_transcripts(spark, sf_dir).write.parquet(src)

    def run(flusher):
        out = str(tmp_path / f"out_{flusher}")
        run_pipeline_main(
            ["--input", src, "--output", out, "--spec", str(spec),
             "--flusher", flusher, "--job-id", "t"]
        )
        return spark.read.parquet(out)

    # clickhouse: decode every payload, total rows == 1000
    ch = run("clickhouse")
    rows = [
        t
        for r in ch.collect()
        for t in decode_clickhouse_rowbinary(bytes(r.value))
    ]
    assert len(rows) == 1000
    sinks = {_json.loads(doc)["sink"] for _, doc in rows}
    assert sinks == {"sink_assistant", "sink_tool", "sink_default"}

    # es: bulk bodies decode, index carries the sink
    es = run("es")
    pairs = [p for r in es.collect() for p in decode_es_bulk(r.value)]
    assert len(pairs) == 1000
    assert {idx for idx, _ in pairs} == {
        "lc-sink_assistant", "lc-sink_tool", "lc-sink_default"
    }

    # sls: topic column is the sink; log totals match
    sls = run("sls")
    srows = sls.collect()
    assert sum(r.n_logs for r in srows) == 1000
    assert {r.topic for r in srows} == {
        "sink_assistant", "sink_tool", "sink_default"
    }
    decoded = decode_loggroup(bytes(srows[0].value))
    assert decoded["logs"]

    # loki: stream labels carry sink + static job label
    lk = run("loki")
    total = 0
    seen = set()
    for r in lk.collect():
        body = _json.loads(r.value)
        for stream in body["streams"]:
            assert stream["stream"]["job"] == "t"
            seen.add(stream["stream"]["sink"])
            total += len(stream["values"])
    assert total == 1000
    assert seen == {"sink_assistant", "sink_tool", "sink_default"}


def test_run_pipeline_clickhouse_without_ts_keeps_all_columns(
    spark, sf_dir, tmp_path
):
    """--flusher clickhouse on a pipeline whose output has no ts
    column: every real column must survive into the _log JSON (the
    old fallback sacrificed routed.columns[0] to the _timestamp slot)
    and _timestamp folds to 0."""
    import json as _json

    from jobs.run_pipeline import main as run_pipeline_main
    from loongcollector_spark.sources.clickhouse_rb import (
        decode_clickhouse_rowbinary,
    )
    from loongcollector_spark.sources.transcripts import load_transcripts

    spec = tmp_path / "spec_nots.json"
    spec.write_text(
        _json.dumps(
            {
                "processors": [{"type": "drop", "keys": ["ts"]}],
                "router": {
                    "source_key": "role",
                    "rules": [{"regex": "assistant", "sink": "sink_assistant"}],
                    "default_sink": "sink_default",
                },
            }
        )
    )
    src = str(tmp_path / "tx_nots")
    load_transcripts(spark, sf_dir).write.parquet(src)
    out = str(tmp_path / "out_ch_nots")
    run_pipeline_main(
        ["--input", src, "--output", out, "--spec", str(spec),
         "--flusher", "clickhouse", "--job-id", "t"]
    )
    rows = [
        t
        for r in spark.read.parquet(out).collect()
        for t in decode_clickhouse_rowbinary(bytes(r.value))
    ]
    assert len(rows) == 1000
    assert all(ts == 0 for ts, _ in rows)
    doc = _json.loads(rows[0][1])
    # conv_id (the first routed column) must NOT have been consumed
    # as the timestamp source
    assert {"conv_id", "turn_idx", "role", "sink"} <= set(doc)


def test_payload_replay_sources_close_the_loop(spark, sf_dir, tmp_path):
    """write with --flusher X, read back with the replay source: the
    decoded row set equals the routed input (the full collector →
    wire → re-ingest loop inside Spark)."""
    import json as _json

    from jobs.run_pipeline import main as run_pipeline_main
    from loongcollector_spark.sources.payload_replay import (
        read_clickhouse_payloads,
        read_es_payloads,
        read_loki_payloads,
        read_sls_payloads,
    )
    from loongcollector_spark.sources.transcripts import load_transcripts

    spec = tmp_path / "spec.json"
    spec.write_text(
        _json.dumps(
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
    src = str(tmp_path / "tx")
    load_transcripts(spark, sf_dir).write.parquet(src)

    def run(flusher):
        out = str(tmp_path / f"o_{flusher}")
        run_pipeline_main(
            ["--input", src, "--output", out, "--spec", str(spec),
             "--flusher", flusher, "--job-id", "t"]
        )
        return out

    sls = read_sls_payloads(spark, run("sls"))
    assert sls.count() == 1000
    assert set(r.topic for r in sls.select("topic").distinct().collect()) == {
        "sink_assistant", "sink_default"
    }
    # contents carry the original text column verbatim
    one = sls.filter("topic = 'sink_assistant'").limit(1).collect()[0]
    assert "text" in one.contents and "conv_id" in one.contents

    loki = read_loki_payloads(spark, run("loki"))
    assert loki.count() == 1000
    assert loki.filter("labels['sink'] = 'sink_assistant'").count() == 247

    es = read_es_payloads(spark, run("es"))
    assert es.count() == 1000
    assert es.filter("index = 'lc-sink_assistant'").count() == 247

    ch = read_clickhouse_payloads(spark, run("clickhouse"))
    assert ch.count() == 1000
    docs = ch.limit(1).collect()[0]
    assert _json.loads(docs.log)["sink"] in {"sink_assistant", "sink_default"}
