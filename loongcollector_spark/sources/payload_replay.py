"""Replay sources for the wire-payload sink tables — the re-ingest
half of the flusher story: a payload table written by
``jobs/run_pipeline.py --flusher sls|loki|es|clickhouse`` reads back
into a row-per-log DataFrame through the SAME decoders the round-trip
queries verify, so a downstream pipeline (or an audit job) can consume
exactly what a network flusher would have POSTed.

Reference parity: the observability loop the reference participates in
(collector → wire → store → re-read) — here both endpoints live in
Spark. Each reader is one ``mapInPandas`` pass over the payload rows:
the pure-Python decode spreads across whatever partitioning the
payload table carries (repartition upstream for small tables), and the
decoded logs explode to one output row per wire log.

Output schemas (strings stay strings — the reference's all-contents-
are-strings event model, SURVEY §1.1):

* sls        → ``topic string, time long, contents map<string,string>``
* loki       → ``labels map<string,string>, ts_ns long, line string``
* es         → ``index string, doc string``
* clickhouse → ``ts long, log string``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "read_clickhouse_payloads",
    "read_es_payloads",
    "read_loki_payloads",
    "read_sls_payloads",
]


def _payloads(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_sls_payloads(spark: SparkSession, path: str) -> DataFrame:
    """LogGroup wire blobs → one row per log."""
    from .sls_pb import decode_loggroup

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            topics, times, contents = [], [], []
            for val in pdf["value"]:
                g = decode_loggroup(bytes(val))
                for log in g["logs"]:
                    topics.append(g.get("topic", ""))
                    times.append(int(log["time"]))
                    contents.append(dict(log["contents"]))
            if topics:
                yield pd.DataFrame(
                    {"topic": topics, "time": times, "contents": contents}
                )

    return (
        _payloads(spark, path)
        .select("value")
        .mapInPandas(
            decode, schema="topic string, time long, contents map<string,string>"
        )
    )


def read_loki_payloads(spark: SparkSession, path: str) -> DataFrame:
    """Push-API JSON payloads → one row per entry."""
    from .loki_push import decode_loki_push

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            labels, ts, lines = [], [], []
            for val in pdf["value"]:
                for lbl, t, line in decode_loki_push(str(val)):
                    labels.append(dict(lbl))
                    ts.append(int(t))
                    lines.append(line)
            if lines:
                yield pd.DataFrame(
                    {"labels": labels, "ts_ns": ts, "line": lines}
                )

    return (
        _payloads(spark, path)
        .select("value")
        .mapInPandas(
            decode, schema="labels map<string,string>, ts_ns long, line string"
        )
    )


def read_es_payloads(spark: SparkSession, path: str) -> DataFrame:
    """``_bulk`` NDJSON bodies → one row per document."""
    import json

    from .es_bulk import decode_es_bulk

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            idx, docs = [], []
            for val in pdf["value"]:
                for i, doc in decode_es_bulk(str(val)):
                    idx.append(i)
                    docs.append(json.dumps(doc, sort_keys=True))
            if idx:
                yield pd.DataFrame({"index": idx, "doc": docs})

    return (
        _payloads(spark, path)
        .select("value")
        .mapInPandas(decode, schema="index string, doc string")
    )


def read_clickhouse_payloads(spark: SparkSession, path: str) -> DataFrame:
    """RowBinary payloads → one row per ``(_timestamp, _log)`` pair."""
    from .clickhouse_rb import decode_clickhouse_rowbinary

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            ts, logs = [], []
            for val in pdf["value"]:
                for t, log in decode_clickhouse_rowbinary(bytes(val)):
                    ts.append(int(t))
                    logs.append(log)
            if ts:
                yield pd.DataFrame({"ts": ts, "log": logs})

    return (
        _payloads(spark, path)
        .select("value")
        .mapInPandas(decode, schema="ts long, log string")
    )
