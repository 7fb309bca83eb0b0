#!/usr/bin/env python
"""spark-submit entry point for the transcript pipeline.

Cluster usage (the production shape the north rule names)::

    zip -r lc.zip loongcollector_spark
    spark-submit --py-files lc.zip jobs/run_pipeline.py \
        --input  <transcript table path / iceberg name> \
        --output <sink base path> \
        --spec   pipeline_spec.json \
        [--metrics <metrics table path>] \
        [--lineage <lineage dir> --job-id <id> --units 64]  # resumable
        [--shards 256]                                       # shard-hash

Local smoke (this sandbox)::

    spark-submit --master 'local[8]' --py-files lc.zip \
        jobs/run_pipeline.py --input ... --output ...

With ``--lineage`` the run is checkpointed per work unit (hash buckets
of conv_id) and reruns resume idempotently; without it, one fan-out
write. Per-stage row counts land in the metrics table either way.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# direct `python jobs/...py` runs (no --py-files zip): make the repo
# root importable
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", help="sink base path (not needed for --flusher blackhole)")
    ap.add_argument("--spec", required=True, help="pipeline spec JSON file")
    ap.add_argument("--dims", help="JSON file {dim_name: parquet_path}")
    ap.add_argument("--metrics")
    ap.add_argument("--lineage")
    ap.add_argument("--job-id", default="job")
    ap.add_argument("--units", type=int, default=16)
    ap.add_argument("--shards", type=int, default=0)
    ap.add_argument(
        "--flusher",
        choices=["parquet", "blackhole", "sls", "loki", "es", "clickhouse"],
        default="parquet",
        help="blackhole = full execution, no output (flusher_blackhole; "
        "the benchmark shape the reference's own harness uses). "
        "sls/loki/es/clickhouse serialize the routed rows into that "
        "flusher's wire payloads (per-sink topic/label/index/doc) and "
        "write the payload table under --output — the bytes a network "
        "flusher would POST, minus the transport",
    )
    ap.add_argument(
        "--warm", type=int, default=0,
        help="blackhole only: unmeasured warm-up executions before "
        "timing (JIT/codegen steady state)",
    )
    ap.add_argument(
        "--rounds", type=int, default=1,
        help="blackhole only: measured executions; wall_sec is the "
        "best (least co-tenant interference on this host)",
    )
    args = ap.parse_args(argv)
    if args.flusher != "blackhole" and not args.output:
        ap.error("--output is required unless --flusher blackhole")
    if args.flusher == "blackhole" and args.lineage:
        ap.error(
            "--lineage is incompatible with --flusher blackhole: the "
            "benchmark loop writes no output, so there is nothing to "
            "checkpoint or resume"
        )
    if args.flusher in ("sls", "loki", "es", "clickhouse") and args.lineage:
        ap.error(
            f"--lineage is not supported with --flusher {args.flusher}: "
            "checkpointed reruns cover the parquet sink path; wire "
            "payload jobs rerun whole (overwrite)"
        )

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("lc-pipeline").getOrCreate()

    from loongcollector_spark.config import load_dims, load_spec
    from loongcollector_spark.operators.aggregate import shard_repartition
    from loongcollector_spark.operators.route import fanout_write
    from loongcollector_spark.pipeline import Pipeline
    from loongcollector_spark.plans.checkpoint import run_with_checkpoint
    from loongcollector_spark.plans.metrics import MetricsCollector
    from loongcollector_spark.sources.sinks import read_table
    from loongcollector_spark.session import apply_runtime_confs

    # the cluster hands us its session; pin the SQL confs the
    # operators require (UTC, LAST_WIN map dedup, AQE, Arrow)
    apply_runtime_confs(spark)
    pipe = Pipeline(load_spec(args.spec), load_dims(spark, args.dims))
    df = read_table(spark, args.input)
    if args.shards:
        df = shard_repartition(df, ["conv_id"], args.shards)

    t0 = time.monotonic()
    metrics = MetricsCollector(args.job_id)
    if args.flusher == "blackhole":
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        from loongcollector_spark.sources.sinks import write_blackhole

        for _ in range(args.warm):
            write_blackhole(pipe.run(df))
        best = None
        n = 0
        for _ in range(max(args.rounds, 1)):
            obs = Observation()
            out = pipe.run(df).observe(obs, F.count(F.lit(1)).alias("n"))
            r0 = time.monotonic()
            write_blackhole(out)
            dt = time.monotonic() - r0
            n = obs.get["n"]
            best = dt if best is None else min(best, dt)
        wall = best  # the best measured round (steady-state throughput)
        metrics.add("pipeline", -1, n, round(best, 3))
        if args.metrics:
            metrics.write(spark, args.metrics)
    elif args.flusher in ("sls", "loki", "es", "clickhouse"):
        # wire-payload flushers: route, then serialize each flusher's
        # exact sink format (the encode half of the round-trip queries)
        # and land the payload table under --output. The sink column
        # rides as SLS topic / Loki label / ES index / ClickHouse doc
        # field, so a transport layer can fan payloads out per sink.
        from pyspark.sql import functions as F

        out = pipe.run(df)
        if "sink" not in out.columns:
            ap.error(f"--flusher {args.flusher} needs a router stage "
                     "(no 'sink' column in the pipeline output)")
        par = spark.sparkContext.defaultParallelism
        routed = out.repartition(par, "sink")
        ts_key = "ts" if "ts" in routed.columns else None
        if args.flusher == "sls":
            from loongcollector_spark.sources.sls_pb import (
                serialize_sls_loggroups,
            )

            payloads = serialize_sls_loggroups(
                routed, time_key=ts_key, topic_key="sink"
            )
        elif args.flusher == "loki":
            from loongcollector_spark.sources.loki_push import (
                serialize_loki_push,
            )

            doc_cols = [c for c in routed.columns if c not in ("sink", "ts")]
            ns = (
                (F.unix_micros(F.col(ts_key).cast("timestamp")) * 1000)
                if ts_key
                else F.lit(0)
            )
            # NB: pandas itertuples renames leading-underscore columns
            # positionally, so the staging column names must be plain
            lined = routed.select(
                F.col("sink"),
                ns.cast("long").alias("lc_ns"),
                F.to_json(F.struct(*[F.col(c) for c in doc_cols])).alias(
                    "lc_line"
                ),
            )
            payloads = serialize_loki_push(
                lined,
                line_key="lc_line",
                time_ns_key="lc_ns",
                label_keys=["sink"],
                static_labels={"job": args.job_id},
            )
        elif args.flusher == "es":
            from loongcollector_spark.sources.es_bulk import serialize_es_bulk

            payloads = serialize_es_bulk(routed, index_format="lc-%{sink}")
        else:  # clickhouse
            from loongcollector_spark.sources.clickhouse_rb import (
                serialize_clickhouse_rowbinary,
            )

            if ts_key:
                payloads = serialize_clickhouse_rowbinary(routed, ts_col=ts_key)
            else:
                # no ts column: synthesize epoch-0 (the loki branch's
                # lit(0) convention) instead of sacrificing a real
                # column to the _timestamp slot
                payloads = serialize_clickhouse_rowbinary(
                    routed.withColumn(
                        "lc_zero_ts", F.lit(0).cast("timestamp")
                    ),
                    ts_col="lc_zero_ts",
                )
        from pyspark.sql import Observation

        obs = Observation()
        observed = payloads.observe(obs, F.count(F.lit(1)).alias("n"))
        observed.write.mode("overwrite").parquet(args.output)
        n = obs.get["n"]
        wall = time.monotonic() - t0
        metrics.add(f"flusher_{args.flusher}", -1, n, round(wall, 3))
        if args.metrics:
            metrics.write(spark, args.metrics)
    elif args.lineage:
        from loongcollector_spark.plans.checkpoint import CheckpointedRun

        run_with_checkpoint(
            spark,
            df,
            pipe.run,
            out_dir=args.output,
            lineage_dir=args.lineage,
            job_id=args.job_id,
            n_units=args.units,
        )
        # rows_out from the lineage commits (counted during the write
        # job via Observation) — no output re-read; rows_in would cost
        # a full extra input scan, so it is recorded as -1 (unknown)
        # unless a caller needs it badly enough to count explicitly
        n = CheckpointedRun(spark, args.lineage, args.job_id).total_rows_committed()
        wall = time.monotonic() - t0
        metrics.add("pipeline", -1, n, round(wall, 3))
        if args.metrics:
            metrics.write(spark, args.metrics)
    else:
        # overwrite: a rerun of the same job replaces its output
        # (append-without-lineage would silently duplicate data);
        # incremental appends go through --lineage.
        # run_and_write piggybacks rows_in/rows_out on the write job
        # via Observation — no extra count() scans of input or output.
        pipe.run_and_write(
            df,
            args.output,
            metrics=metrics,
            spark=spark,
            metrics_path=args.metrics,
            mode="overwrite",
        )
        n = metrics.records[-1].rows_out
        wall = time.monotonic() - t0
    print(json.dumps({"job_id": args.job_id, "rows_out": n,
                      "wall_sec": round(wall, 3)}))


if __name__ == "__main__":
    main()
