"""Elasticsearch ``_bulk`` NDJSON serializer (flusher_elasticsearch's
sink format, plugins/flusher/elasticsearch/flusher_elasticsearch.go:
188-218: one ``{"index": {"_index": "<idx>"}}`` action line per log
followed by the serialized document, newline-joined with a trailing
newline; dynamic index names render ``%{field}`` placeholders via
pkg/fmtstr.FormatIndex — the same convention as kafka-v2 topics).

:func:`serialize_es_bulk` renders the index expression JVM-side
(concat of literals and columns — codegen, no Python) and builds the
NDJSON bodies in an Arrow-batched pass, rotating every ``max_docs``
documents. :func:`decode_es_bulk` parses a body back to
``(index, doc)`` pairs for round-trip verification.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["decode_es_bulk", "serialize_es_bulk"]


def _index_col(index_format: str):
    """``%{col}`` format string → codegen concat Column (shared
    renderer: sinks.format_string_col)."""
    from .sinks import format_string_col

    return format_string_col(index_format)


def serialize_es_bulk(
    df: DataFrame,
    *,
    index_format: str,
    doc_keys: list[str] | None = None,
    max_docs: int = 1000,
) -> DataFrame:
    """Rows → ``_bulk`` bodies (``value string``, one per request).

    The document is the row's *doc_keys* (default: every column) as a
    JSON object, serialized JVM-side via ``to_json``; only the body
    assembly (action-line interleave + rotation) runs in Python, over
    Arrow batches.
    """
    cols = doc_keys or [c for c in df.columns]
    prepared = df.select(
        _index_col(index_format).alias("__idx"),
        F.to_json(F.struct(*[F.col(c) for c in cols])).alias("__doc"),
    )

    def to_bodies(batches):
        import pandas as pd

        for pdf in batches:
            bodies: list[str] = []
            lines: list[str] = []
            n = 0
            for idx, doc in zip(pdf["__idx"], pdf["__doc"]):
                lines.append(
                    json.dumps({"index": {"_index": idx}}, separators=(",", ":"))
                )
                lines.append(doc)
                n += 1
                if n >= max_docs:
                    bodies.append("\n".join(lines) + "\n")
                    lines, n = [], 0
            if lines:
                bodies.append("\n".join(lines) + "\n")
            if bodies:
                yield pd.DataFrame({"value": bodies})

    return prepared.mapInPandas(to_bodies, schema="value string")


def decode_es_bulk(body: str) -> list[tuple[str, dict]]:
    """_bulk NDJSON body → [(index, doc)]."""
    out: list[tuple[str, dict]] = []
    lines = [ln for ln in body.split("\n") if ln]
    if len(lines) % 2:
        raise ValueError("es bulk: odd line count (action without doc)")
    for i in range(0, len(lines), 2):
        action = json.loads(lines[i])
        if "index" not in action:
            raise ValueError(f"es bulk: unexpected action {action}")
        out.append((action["index"]["_index"], json.loads(lines[i + 1])))
    return out
