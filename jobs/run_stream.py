#!/usr/bin/env python
"""spark-submit entry point for the STREAMING pipeline.

Same spec as jobs/run_pipeline.py, executed over a file-source stream
(production: Kafka / Iceberg incremental read) with exactly-once
restart via the checkpoint location::

    spark-submit --py-files lc.zip jobs/run_stream.py \
        --input <transcript dir> --output <sink base> \
        --spec spec.json --checkpoint <ckpt dir> \
        [--continuous]   # default: availableNow (drain & stop)
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--spec", required=True)
    ap.add_argument("--dims", help="JSON file {dim_name: parquet_path}")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--continuous", action="store_true")
    ap.add_argument("--max-files-per-trigger", type=int, default=16)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("lc-stream").getOrCreate()

    from loongcollector_spark.config import load_dims, load_spec
    from loongcollector_spark.pipeline import Pipeline
    from loongcollector_spark.session import apply_runtime_confs
    from loongcollector_spark.streaming.stream import (
        read_transcript_stream,
        stream_pipeline_to_sinks,
    )

    apply_runtime_confs(spark)
    pipe = Pipeline(load_spec(args.spec), load_dims(spark, args.dims))
    stream = read_transcript_stream(
        spark, args.input, max_files_per_trigger=args.max_files_per_trigger
    )
    q = stream_pipeline_to_sinks(
        stream,
        pipe,
        args.output,
        args.checkpoint,
        available_now=not args.continuous,
    )
    q.awaitTermination()
    print(json.dumps({"batches": len(q.recentProgress)}))


if __name__ == "__main__":
    main()
