"""Loki push-API serializer (flusher_loki's sink format,
plugins/flusher/loki/flusher_loki.go:53-164: per-log labelset from
StaticLabels + DynamicLabels, one ``(timestamp, line)`` entry per log).

The public Loki push payload (`POST /loki/api/v1/push`) is::

    {"streams": [
        {"stream": {"label": "value", ...},
         "values": [["<unix epoch ns as string>", "<line>"], ...]},
        ...
    ]}

:func:`serialize_loki_push` groups the rows of each Arrow batch by
labelset (the flusher's buildLokiLabels path, :219-226) and emits one
JSON payload per ≤``max_entries`` entries; :func:`decode_loki_push`
parses a payload back to (labels, ts_ns, line) rows for round-trip
verification. Values are ns-precision strings per the API contract.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

__all__ = ["encode_loki_push", "decode_loki_push", "serialize_loki_push"]


def encode_loki_push(
    streams: list[tuple[dict[str, str], list[tuple[int, str]]]]
) -> str:
    """[(labels, [(ts_ns, line)])] → push-API JSON (sorted label keys,
    entries sorted by timestamp as the API requires per stream)."""
    payload = {
        "streams": [
            {
                "stream": dict(sorted(labels.items())),
                "values": [[str(int(ts)), line] for ts, line in sorted(values)],
            }
            for labels, values in streams
        ]
    }
    return json.dumps(payload, sort_keys=True, separators=(",", ":"))


def decode_loki_push(payload: str) -> list[tuple[dict[str, str], int, str]]:
    doc = json.loads(payload)
    out: list[tuple[dict[str, str], int, str]] = []
    for stream in doc["streams"]:
        labels = dict(stream["stream"])
        for ts_str, line in stream["values"]:
            out.append((labels, int(ts_str), line))
    return out


def serialize_loki_push(
    df: DataFrame,
    *,
    line_key: str,
    time_ns_key: str,
    label_keys: list[str],
    static_labels: dict[str, str] | None = None,
    max_entries: int = 4096,
) -> DataFrame:
    """Rows → Loki push JSON payloads (``value string``, one per request).

    Labels = *static_labels* ∪ ``{k: row[k]}`` for *label_keys*
    (StaticLabels + DynamicLabels, flusher_loki.go:53-55). Entries
    group by labelset within the Arrow batch; payloads rotate at
    *max_entries* total entries. Pure-Python codec — repartition
    upstream to spread across cores.
    """
    static = dict(static_labels or {})

    def to_payloads(batches):
        import pandas as pd

        for pdf in batches:
            payloads: list[str] = []
            acc: dict[tuple, list[tuple[int, str]]] = {}
            count = 0

            def flush():
                nonlocal acc, count
                if acc:
                    payloads.append(
                        encode_loki_push(
                            [(dict(k), v) for k, v in sorted(acc.items())]
                        )
                    )
                acc = {}
                count = 0

            # column-wise iteration (the prom_wire convention):
            # itertuples()._asdict() positionally renames any column
            # that is not a valid Python identifier (dotted Loki label
            # keys like "host.name"), breaking the name lookup
            for vals in zip(
                pdf[line_key],
                pdf[time_ns_key],
                *(pdf[k] for k in label_keys),
            ):
                line_v, ts_v, *label_vals = vals
                labels = dict(static)
                for k, v in zip(label_keys, label_vals):
                    labels[k] = "" if v is None or pd.isna(v) else str(v)
                key = tuple(sorted(labels.items()))
                ts = 0 if ts_v is None or pd.isna(ts_v) else int(ts_v)
                line = "" if line_v is None or pd.isna(line_v) else str(line_v)
                acc.setdefault(key, []).append((ts, line))
                count += 1
                if count >= max_entries:
                    flush()
            flush()
            if payloads:
                yield pd.DataFrame({"value": payloads})

    return df.mapInPandas(to_payloads, schema="value string")
