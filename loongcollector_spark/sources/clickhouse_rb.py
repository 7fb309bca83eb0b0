"""ClickHouse RowBinary serializer for the flusher_clickhouse sink
shape (plugins/flusher/clickhouse/flusher_clickhouse.go).

The reference writes every log as ``(_timestamp Int64, _log String)``
into a Null-engine staging table fronted by a Buffer table
(flusher_clickhouse.go:270-292: ``ilogtail_<table>`` / ``ilogtail_
<table>_buffer``), serializing the log itself through the JSON
converter (:180-203 builds ``INSERT ... VALUES (ts, '<json>')`` per
row). The at-scale equivalent of that INSERT stream is ClickHouse's
native bulk form, ``INSERT ... FORMAT RowBinary``: per row each
column in wire order — Int64 as 8-byte little-endian, String as a
ULEB128 varint byte-length followed by UTF-8 bytes (the public
RowBinary spec). This module produces those payloads batch-rotated,
plus a FULL decoder for round-trip verification, and renders the
reference's exact staging DDL pair.

Plan shape: the JSON document and timestamp are built JVM-side
(``to_json`` + codegen); only the byte packing runs in Python, over
Arrow batches (the es_bulk/loki_push convention). One payload row per
``max_rows`` input rows — no driver collect, no shuffle.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import protowire as _w

__all__ = [
    "buffer_table_ddl",
    "decode_clickhouse_rowbinary",
    "serialize_clickhouse_rowbinary",
]


def _write_varint(n: int, out: bytearray) -> None:
    """ULEB128 (the RowBinary / protobuf varint) — delegates to the
    shared protowire codec. RowBinary lengths are sizes, never
    negative, so the two's-complement path is a hard error here."""
    if n < 0:
        raise ValueError("varint must be non-negative")
    out += _w.write_varint(n)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    return _w.read_varint(buf, pos)


def serialize_clickhouse_rowbinary(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    doc_keys: list[str] | None = None,
    max_rows: int = 1000,
) -> DataFrame:
    """Rows → RowBinary payloads (``value binary``, one per INSERT).

    Each input row becomes the reference's ``(_timestamp Int64,
    _log String)`` pair: the epoch-seconds of *ts_col* and the JSON
    document of *doc_keys* (default: every column except *ts_col*),
    serialized JVM-side. Payloads rotate every *max_rows* rows.
    """
    cols = doc_keys or [c for c in df.columns if c != ts_col]
    prepared = df.select(
        # null ts → 0, JVM-side (the loki_push/prom_wire convention);
        # a NaN reaching int() would otherwise kill the executor task.
        F.coalesce(
            F.unix_timestamp(F.col(ts_col).cast("timestamp")).cast("long"),
            F.lit(0).cast("long"),
        ).alias("__ts"),
        F.to_json(F.struct(*[F.col(c) for c in cols])).alias("__log"),
    )

    def to_payloads(batches):
        import pandas as pd

        for pdf in batches:
            payloads: list[bytes] = []
            buf = bytearray()
            n = 0
            for ts, log in zip(pdf["__ts"], pdf["__log"]):
                buf += struct.pack("<q", int(ts))
                raw = str(log).encode("utf-8")
                _write_varint(len(raw), buf)
                buf += raw
                n += 1
                if n >= max_rows:
                    payloads.append(bytes(buf))
                    buf, n = bytearray(), 0
            if buf:
                payloads.append(bytes(buf))
            if payloads:
                yield pd.DataFrame({"value": payloads})

    return prepared.mapInPandas(to_payloads, schema="value binary")


def decode_clickhouse_rowbinary(payload: bytes) -> list[tuple[int, str]]:
    """Full RowBinary decoder for the ``(Int64, String)`` row shape —
    the round-trip verification path. Raises on any trailing or
    truncated bytes (a payload is exact, never padded)."""
    rows: list[tuple[int, str]] = []
    pos = 0
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated Int64")
        (ts,) = struct.unpack_from("<q", payload, pos)
        pos += 8
        ln, pos = _read_varint(payload, pos)
        if pos + ln > len(payload):
            raise ValueError("truncated String")
        rows.append((ts, payload[pos : pos + ln].decode("utf-8")))
        pos += ln
    return rows


def buffer_table_ddl(
    database: str,
    table: str,
    *,
    cluster: str = "",
    num_layers: int = 4,
    min_time: int = 10,
    max_time: int = 100,
    min_rows: int = 10000,
    max_rows: int = 1000000,
    min_bytes: int = 10000000,
    max_bytes: int = 100000000,
) -> tuple[str, str]:
    """The reference's staging DDL pair, byte-for-byte
    (flusher_clickhouse.go:270-292): a Null-engine landing table and
    the Buffer table in front of it. Defaults mirror the flusher's
    config defaults."""
    null_name = f"`{database}`.`ilogtail_{table}`"
    buf_name = f"`{database}`.`ilogtail_{table}_buffer`"
    if cluster:
        null_name = f"{null_name} on cluster '{cluster}'"
        buf_name = f"{buf_name} on cluster '{cluster}'"
    sql_null = (
        f"CREATE TABLE IF NOT EXISTS {null_name} "
        "(`_timestamp` Int64,`_log` String) ENGINE = Null"
    )
    sql_buffer = (
        f"CREATE TABLE IF NOT EXISTS {buf_name} AS "
        f"`{database}`.`ilogtail_{table}` ENGINE = Buffer("
        f"{database}, ilogtail_{table}, {num_layers}, {min_time}, "
        f"{max_time}, {min_rows}, {max_rows}, {min_bytes}, {max_bytes})"
    )
    return sql_null, sql_buffer
