"""OTel trace parsing (processor_otel_trace, JSON format).

Re-expresses the reference's OTLP-payload → one-row-per-span expansion
(plugins/processor/otel/processor_otel_trace.go:55-101 +
pkg/protocol/decoder/opentelemetry/otlp_trace_parser.go:140-244) as a
single Catalyst plan: ``from_json`` with an explicit OTLP-JSON schema,
three nested explodes (resourceSpans → scopeSpans → spans), and a
projection emitting the reference's exact output key set:

``host, service, resource, otlp.name, otlp.version, traceID, spanID,
parentSpanID, kind, name, links, logs, traceState, start, end,
duration, attribute, statusCode, statusMessage``

with the reference's renderings — kind/statusCode short strings
(otlp_trace_parser.go:218-244), microsecond start/end/duration
(:185-196, end==0 → now), links/events in the reference's own
[{attribute, spanID, traceID}] / [{attribute, name, time}] shapes,
attribute JSON with sorted keys and the promoted host/service keys
removed from the resource object. Deviation (documented): attribute
values render as JSON strings regardless of OTLP value type (a Spark
map is homogeneous; the reference's json.Marshal keeps native
types). All three reference formats are supported: ``json`` /
``protojson`` parse directly (protojson IS the camelCase OTLP/JSON
encoding), and ``protobuf`` decodes the public wire format with the
pure-Python walker in functions/otlp_wire.py before entering the same
JSON plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_otel_trace", "parse_otel_metric", "parse_otel_log",
           "OTEL_SPAN_COLUMNS", "OTEL_LOG_COLUMNS"]

_ATTRS = (
    "array<struct<key:string,value:struct<stringValue:string,"
    "intValue:string,doubleValue:double,boolValue:boolean>>>"
)

# OTLP/JSON trace schema (public OTLP protojson encoding, camelCase;
# enum fields typed string so both numeric and name encodings parse)
OTLP_TRACE_SCHEMA = f"""
resourceSpans array<struct<
  resource: struct<attributes: {_ATTRS}>,
  scopeSpans: array<struct<
    scope: struct<name:string, version:string>,
    spans: array<struct<
      traceId:string, spanId:string, parentSpanId:string,
      name:string, kind:string, traceState:string,
      startTimeUnixNano:string, endTimeUnixNano:string,
      attributes: {_ATTRS},
      status: struct<code:string, message:string>,
      events: array<struct<timeUnixNano:string, name:string,
                           attributes: {_ATTRS}>>,
      links: array<struct<traceId:string, spanId:string,
                          traceState:string, attributes: {_ATTRS}>>
    >>
  >>
>>
"""

OTEL_SPAN_COLUMNS = [
    "host", "service", "resource", "otlp.name", "otlp.version",
    "traceID", "spanID", "parentSpanID", "kind", "name", "links",
    "logs", "traceState", "start", "end", "duration", "attribute",
    "statusCode", "statusMessage",
]

# SpanKind enum (opentelemetry-proto trace.proto) → reference short
# strings (otlp_trace_parser.go:218-233); both numeric and name forms
_KINDS = {
    "1": "internal", "SPAN_KIND_INTERNAL": "internal",
    "2": "server", "SPAN_KIND_SERVER": "server",
    "3": "client", "SPAN_KIND_CLIENT": "client",
    "4": "producer", "SPAN_KIND_PRODUCER": "producer",
    "5": "consumer", "SPAN_KIND_CONSUMER": "consumer",
}
_STATUS = {
    "1": "OK", "STATUS_CODE_OK": "OK",
    "2": "ERROR", "STATUS_CODE_ERROR": "ERROR",
}


def _fmt_double(v: Column) -> Column:
    """Double → string in Go strconv FormatFloat 'g' style for the
    common cases: whole-number doubles print without a decimal point
    ('2', not '2.0'). Residual deviation (documented): very small /
    large fractional values render in Spark's scientific form
    ('1.0E-4' vs Go's '0.0001')."""
    as_long = v.cast("long")
    return F.when(
        as_long.cast("double") == v, as_long.cast("string")
    ).otherwise(v.cast("string"))


def _enum_chain(col: Column, table: dict[str, str], default: str) -> Column:
    out = None
    for raw, short in table.items():
        cond = col == raw
        out = F.when(cond, short) if out is None else out.when(cond, short)
    return out.otherwise(F.lit(default))


def _attr_entries(attrs: Column, exclude: tuple[str, ...] = ()) -> Column:
    """OTLP attribute list → sorted (key, value-as-string) entries.
    Entries with a missing key are dropped (a malformed attribute must
    not NULL_MAP_KEY-crash the job — the reference drops only the bad
    log); keys sort ascending to match Go json.Marshal's sorted map
    rendering."""
    def keep(a):
        cond = a["key"].isNotNull()
        for k in exclude:
            cond = cond & (a["key"] != k)
        return cond

    # absent attribute lists parse as NULL arrays; NULL would poison
    # every downstream concat/sort into NULL (→ empty labels)
    ok = F.filter(F.coalesce(attrs, F.array().cast(_ATTRS)), keep)
    entries = F.transform(
        ok,
        lambda a: F.struct(
            a["key"].alias("key"),
            F.coalesce(
                a["value"]["stringValue"],
                a["value"]["intValue"],
                # Go pcommon AsString renders whole-number doubles
                # without the decimal point ('2', not '2.0')
                _fmt_double(a["value"]["doubleValue"]),
                a["value"]["boolValue"].cast("string"),
                # non-scalar values (arrayValue/kvlistValue — outside
                # the scalar schema) must not go NULL: concat_ws would
                # silently drop the NULL and emit a bare key that
                # breaks the k#$#v label contract
                F.lit(""),
            ).alias("value"),
        ),
    )
    return F.array_sort(entries)  # struct sort: by first field (key)


def _attrs_map(attrs: Column, exclude: tuple[str, ...] = ()) -> Column:
    """Entries → map with in-expression key dedup (keep the LAST of
    equal keys in sorted order — same entry the session-level LAST_WIN
    policy kept). map_from_entries would DUPLICATE_MAP_KEY-crash on a
    vanilla session for payloads with repeated attribute keys; the
    reference's pcommon.Map tolerates them, so dedup must not depend
    on spark.sql.mapKeyDedupPolicy being configured."""
    entries = _attr_entries(attrs, exclude)
    deduped = F.filter(
        entries,
        lambda e, i: (i == F.size(entries) - 1)
        | (F.get(entries, i + 1)["key"] != e["key"]),
    )
    return F.map_from_entries(deduped)


def _attrs_json(attrs: Column, exclude: tuple[str, ...] = ()) -> Column:
    """OTLP attribute list → JSON object (values as strings, keys
    sorted like Go json.Marshal)."""
    return F.when(
        attrs.isNotNull(), F.to_json(_attrs_map(attrs, exclude))
    ).otherwise(F.lit("{}"))


def _attr_value(attrs: Column, key: str) -> Column:
    hits = F.filter(attrs, lambda a: a["key"] == key)
    return F.when(
        F.size(hits) > 0, F.get(hits, 0)["value"]["stringValue"]
    ).otherwise(F.lit(""))


def parse_otel_trace(
    df: DataFrame,
    source_key: str,
    *,
    format: str = "json",
    drop_source: bool = True,
) -> DataFrame:
    """One output row per span in each row's OTLP payload (other input
    columns are carried through, duplicated per span — the reference
    replaces the log with the span logs). Unparseable payloads produce
    zero spans (the reference drops the log with an alarm).

    ``format``: 'json'/'protojson' (OTLP/JSON text — protojson IS the
    camelCase JSON encoding this schema parses; JVM-native hot path)
    or 'protobuf' (serialized ``TracesData`` in a binary column —
    decoded by the pure-Python wire walker functions/otlp_wire.py in
    an Arrow-batched UDF, then fed through the same JSON plan, so both
    formats produce identical rows)."""
    fmt = format.lower()
    if fmt == "protobuf":
        from ..functions.otlp_wire import decode_udf

        tmp = "__otlp_trace_json"
        decoded = df.withColumn(tmp, decode_udf("traces")(F.col(source_key)))
        out = parse_otel_trace(decoded, tmp, format="json", drop_source=True)
        return out.drop(source_key) if drop_source else out
    if fmt not in ("json", "protojson"):
        raise ValueError(f"unknown otel trace format {format!r}")
    parsed = F.from_json(F.col(source_key), OTLP_TRACE_SCHEMA)
    out = (
        df.withColumn("__rs", F.explode(parsed["resourceSpans"]))
        .withColumn("__ss", F.explode(F.col("__rs")["scopeSpans"]))
        .withColumn("__sp", F.explode(F.col("__ss")["spans"]))
    )
    res_attrs = F.col("__rs")["resource"]["attributes"]
    sp = F.col("__sp")
    start_us = (sp["startTimeUnixNano"].cast("decimal(38,0)") / 1000).cast("long")
    # end==0/missing → now (spanToLogServiceData substitutes
    # time.Now() for a zero end timestamp; current_timestamp is
    # query-constant, so all spans of one run agree)
    end_raw = (sp["endTimeUnixNano"].cast("decimal(38,0)") / 1000).cast("long")
    end_us = F.when(
        end_raw.isNull() | (end_raw == 0),
        F.unix_micros(F.current_timestamp()),
    ).otherwise(end_raw)
    # links/logs render in the reference's own shape
    # (spanLinksToString/eventsToString, otlp_trace_parser.go:257-284):
    # links → [{attribute:{..}, spanID, traceID}], events →
    # [{attribute:{..}, name, time}] — struct field order matches Go's
    # sorted-key marshal
    links_json = F.to_json(
        F.transform(
            sp["links"],
            lambda ln: F.struct(
                _attrs_map(ln["attributes"]).alias("attribute"),
                F.coalesce(ln["spanId"], F.lit("")).alias("spanID"),
                F.coalesce(ln["traceId"], F.lit("")).alias("traceID"),
            ),
        )
    )
    logs_json = F.to_json(
        F.transform(
            sp["events"],
            lambda ev: F.struct(
                _attrs_map(ev["attributes"]).alias("attribute"),
                F.coalesce(ev["name"], F.lit("")).alias("name"),
                F.coalesce(
                    ev["timeUnixNano"].cast("decimal(38,0)").cast("long"), F.lit(0)
                ).alias("time"),
            ),
        )
    )
    cols = {
        "host": _attr_value(res_attrs, "host.name"),
        "service": _attr_value(res_attrs, "service.name"),
        # reference removes the promoted host/service keys from the
        # resource JSON (resourceToLogContents attrs.Remove)
        "resource": _attrs_json(res_attrs, exclude=("host.name", "service.name")),
        "otlp.name": F.coalesce(F.col("__ss")["scope"]["name"], F.lit("")),
        "otlp.version": F.coalesce(F.col("__ss")["scope"]["version"], F.lit("")),
        "traceID": F.coalesce(sp["traceId"], F.lit("")),
        "spanID": F.coalesce(sp["spanId"], F.lit("")),
        "parentSpanID": F.coalesce(sp["parentSpanId"], F.lit("")),
        "kind": _enum_chain(sp["kind"], _KINDS, ""),
        "name": F.coalesce(sp["name"], F.lit("")),
        "links": F.coalesce(links_json, F.lit("[]")),
        "logs": F.coalesce(logs_json, F.lit("[]")),
        "traceState": F.coalesce(sp["traceState"], F.lit("")),
        "start": start_us.cast("string"),
        "end": end_us.cast("string"),
        "duration": (end_us - start_us).cast("string"),
        "attribute": _attrs_json(sp["attributes"]),
        "statusCode": _enum_chain(sp["status"]["code"], _STATUS, "UNSET"),
        "statusMessage": F.coalesce(sp["status"]["message"], F.lit("")),
    }
    out = out.withColumns(cols).drop("__rs", "__ss", "__sp")
    if drop_source:
        out = out.drop(source_key)
    return out


# ---------------------------------------------------------------- metrics

_EXEMPLARS = (
    "array<struct<timeUnixNano:string,asDouble:double,asInt:string,"
    "spanId:string,traceId:string,filteredAttributes:" + _ATTRS + ">>"
)

_NUMDP = (
    "array<struct<attributes:" + _ATTRS + ",timeUnixNano:string,"
    "asDouble:double,asInt:string,exemplars:" + _EXEMPLARS + ">>"
)

# OTLP/JSON metrics schema (gauge/sum/summary/histogram; exponential
# histogram and exemplars are out of scope — documented below)
OTLP_METRIC_SCHEMA = f"""
resourceMetrics array<struct<
  resource: struct<attributes: {_ATTRS}>,
  scopeMetrics: array<struct<
    scope: struct<name:string, version:string>,
    metrics: array<struct<
      name: string,
      gauge: struct<dataPoints: {_NUMDP}>,
      sum: struct<dataPoints: {_NUMDP},
                  aggregationTemporality: string, isMonotonic: boolean>,
      summary: struct<dataPoints: array<struct<
          attributes: {_ATTRS}, timeUnixNano: string,
          sum: double, count: string,
          quantileValues: array<struct<quantile:double, value:double>>>>>,
      histogram: struct<dataPoints: array<struct<
          attributes: {_ATTRS}, timeUnixNano: string,
          sum: double, min: double, max: double, count: string,
          explicitBounds: array<double>, bucketCounts: array<string>,
          exemplars: {_EXEMPLARS}>>,
          aggregationTemporality: string>,
      exponentialHistogram: struct<dataPoints: array<struct<
          attributes: {_ATTRS}, timeUnixNano: string,
          sum: double, min: double, max: double, count: string,
          scale: int, zeroCount: string,
          positive: struct<offset:int, bucketCounts: array<string>>,
          negative: struct<offset:int, bucketCounts: array<string>>,
          exemplars: {_EXEMPLARS}>>,
          aggregationTemporality: string>
    >>
  >>
>>
"""

_TEMPORALITY = {
    "1": "Delta", "AGGREGATION_TEMPORALITY_DELTA": "Delta",
    "2": "Cumulative", "AGGREGATION_TEMPORALITY_CUMULATIVE": "Cumulative",
}


def _label_entries(*entry_arrays: Column) -> Column:
    """Concat (key, value) entry arrays → sorted ``k#$#v|...`` label
    string (helper.MetricLabels rendering — same format as
    enrich.log_to_metric)."""
    merged = F.concat(*entry_arrays) if len(entry_arrays) > 1 else entry_arrays[0]
    return F.concat_ws(
        "|",
        F.transform(
            F.array_sort(merged),
            lambda e: F.concat_ws("#$#", e["key"], e["value"]),
        ),
    )


def _kv(key: str, value: Column) -> Column:
    return F.array(F.struct(F.lit(key).alias("key"), value.alias("value")))


def _num_value(dp) -> Column:
    """NumberDataPoint value (GaugeToLogs: DoubleValue unless IntValue
    is non-zero)."""
    as_int = dp["asInt"].cast("double")
    return F.when(
        as_int.isNotNull() & (as_int != 0), as_int
    ).otherwise(F.coalesce(dp["asDouble"], F.lit(0.0)))


def _metric_row(name: Column, labels: Column, t: Column, value: Column) -> Column:
    return F.struct(
        name.alias("__name__"),
        labels.alias("__labels__"),
        F.coalesce(t.cast("decimal(38,0)").cast("long"), F.lit(0)).alias(
            "__time_nano__"
        ),
        value.alias("__value__"),
    )


def parse_otel_metric(
    df: DataFrame,
    source_key: str,
    *,
    format: str = "json",
    drop_source: bool = True,
) -> DataFrame:
    """processor_otel_metric (JSON format): OTLP metric payloads → SLS
    metric rows ``(__name__, __labels__, __time_nano__, __value__)``
    (otlpDataToSLSProto.go:120-244 semantics):

    * gauge/sum → one row per data point (sum adds the
      ``otlp.metric.ismonotonic`` / ``.aggregation.temporality``
      labels);
    * summary → ``_sum``/``_count`` rows + one row per quantile with a
      ``quantile`` label;
    * histogram → ``_sum``/``_min``/``_max`` (when present) +
      ``_count`` + CUMULATIVE ``_bucket`` rows with ``le`` labels
      (bounds + ``+Inf``);
    * metric names sanitized to ``[a-zA-Z0-9_:]`` (formatMetricName);
      labels sorted ``k#$#v|...`` from resource + data-point
      attributes.

    * exponential histogram → same _sum/_min/_max/_count rows plus
      RAW-count ``_bucket`` rows at the base^(offset+i) boundaries
      (le="(lower,upper]" / "[-upper,-lower)") and the
      positive.offset / negative.offset / zero.count bookkeeping rows
      (genExponentialHistogramValues parity).

    * exemplars (all metric types) → ``<name>_exemplars`` rows with
      traceId/spanId/filtered-attribute labels
      (newExemplarMetricLogFromRaw parity, including its quirks:
      DoubleValue() so int exemplars render 0, and SECONDS in the
      exemplar row's ``__time_nano__``).

    ``asInt`` values above 2^53 lose precision through the double
    ``__value__`` column (the reference carries float64 there too once
    rendered, but preserves int64 exactly up to formatting).
    ``format='protobuf'`` accepts serialized ``MetricsData`` binary
    payloads via the same wire-decode-to-JSON path as
    :func:`parse_otel_trace`."""
    fmt = format.lower()
    if fmt == "protobuf":
        from ..functions.otlp_wire import decode_udf

        tmp = "__otlp_metric_json"
        decoded = df.withColumn(tmp, decode_udf("metrics")(F.col(source_key)))
        out = parse_otel_metric(decoded, tmp, format="json", drop_source=True)
        return out.drop(source_key) if drop_source else out
    if fmt not in ("json", "protojson"):
        raise ValueError(f"unknown otel metric format {format!r}")
    parsed = F.from_json(F.col(source_key), OTLP_METRIC_SCHEMA)
    out = (
        df.withColumn("__rm", F.explode(parsed["resourceMetrics"]))
        .withColumn("__sm", F.explode(F.col("__rm")["scopeMetrics"]))
        .withColumn("__mt", F.explode(F.col("__sm")["metrics"]))
    )
    res_entries = _attr_entries(F.col("__rm")["resource"]["attributes"])
    m = F.col("__mt")
    name = F.regexp_replace(F.coalesce(m["name"], F.lit("")), "[^a-zA-Z0-9_:]", "_")

    def dp_labels(dp, *extra: Column) -> Column:
        return _label_entries(
            res_entries, _attr_entries(dp["attributes"]), *extra
        )

    empty = F.array().cast(
        "array<struct<__name__:string,__labels__:string,"
        "__time_nano__:bigint,__value__:double>>"
    )
    empty_entries = F.array().cast("array<struct<key:string,value:string>>")

    def exemplar_rows(dp, *extra: Column) -> Column:
        """``<name>_exemplars`` rows (newExemplarMetricLogFromRaw):
        labels gain traceId/spanId (when present) + filtered
        attributes; value is the exemplar's DOUBLE value (an int-typed
        exemplar renders 0 — the reference calls DoubleValue()
        unconditionally); the reference's quirk of writing SECONDS
        into __time_nano__ for exemplar rows is reproduced."""
        def one(ex):
            ex_entries = F.concat(
                F.when(
                    F.length(F.coalesce(ex["traceId"], F.lit(""))) > 0,
                    _kv("traceId", ex["traceId"]),
                ).otherwise(empty_entries),
                F.when(
                    F.length(F.coalesce(ex["spanId"], F.lit(""))) > 0,
                    _kv("spanId", ex["spanId"]),
                ).otherwise(empty_entries),
                _attr_entries(ex["filteredAttributes"]),
            )
            secs = (ex["timeUnixNano"].cast("decimal(38,0)") / 1000000000).cast(
                "long"
            )
            return _metric_row(
                F.concat(name, F.lit("_exemplars")),
                dp_labels(dp, *extra, ex_entries),
                secs.cast("string"),
                F.coalesce(ex["asDouble"], F.lit(0.0)),
            )

        return F.transform(
            F.coalesce(dp["exemplars"], F.array().cast(_EXEMPLARS)), one
        )

    # exemplar rows precede the metric row (GaugeToLogs/SumToLogs
    # append exemplar logs first, otlpDataToSLSProto.go:127-135)
    gauge_rows = F.flatten(F.transform(
        m["gauge"]["dataPoints"],
        lambda dp: F.concat(
            exemplar_rows(dp),
            F.array(_metric_row(
                name, dp_labels(dp), dp["timeUnixNano"], _num_value(dp)
            )),
        ),
    ))
    sum_extra_entries = F.concat(
        _kv("otlp.metric.ismonotonic",
            F.coalesce(m["sum"]["isMonotonic"].cast("string"), F.lit("false"))),
        _kv("otlp.metric.aggregation.temporality",
            _enum_chain(m["sum"]["aggregationTemporality"], _TEMPORALITY,
                        "Unspecified")),
    )
    sum_rows = F.flatten(F.transform(
        m["sum"]["dataPoints"],
        lambda dp: F.concat(
            exemplar_rows(dp, sum_extra_entries),
            F.array(_metric_row(
                name, dp_labels(dp, sum_extra_entries), dp["timeUnixNano"],
                _num_value(dp),
            )),
        ),
    ))
    summary_rows = F.flatten(
        F.transform(
            m["summary"]["dataPoints"],
            lambda dp: F.concat(
                F.array(
                    _metric_row(
                        F.concat(name, F.lit("_sum")), dp_labels(dp),
                        dp["timeUnixNano"], F.coalesce(dp["sum"], F.lit(0.0)),
                    ),
                    _metric_row(
                        F.concat(name, F.lit("_count")), dp_labels(dp),
                        dp["timeUnixNano"],
                        F.coalesce(dp["count"].cast("double"), F.lit(0.0)),
                    ),
                ),
                F.coalesce(
                    F.transform(
                        dp["quantileValues"],
                        lambda q: _metric_row(
                            name,
                            # strconv 'g': whole-number quantiles
                            # render '0'/'1', not '0.0'/'1.0'
                            dp_labels(dp, _kv("quantile", _fmt_double(q["quantile"]))),
                            dp["timeUnixNano"],
                            F.coalesce(q["value"], F.lit(0.0)),
                        ),
                    ),
                    empty,
                ),
            ),
        )
    )
    hist_extra = F.concat(
        _kv("otlp.metric.aggregation.temporality",
            _enum_chain(m["histogram"]["aggregationTemporality"], _TEMPORALITY,
                        "Unspecified")),
        _kv("otlp.metric.histogram.type", F.lit("Histogram")),
    )

    def hist_point_rows(dp) -> Column:
        base = dp_labels(dp, hist_extra)
        t = dp["timeUnixNano"]
        fixed = F.filter(
            F.array(
                F.when(dp["sum"].isNotNull(), _metric_row(
                    F.concat(name, F.lit("_sum")), base, t, dp["sum"])),
                F.when(dp["min"].isNotNull(), _metric_row(
                    F.concat(name, F.lit("_min")), base, t, dp["min"])),
                F.when(dp["max"].isNotNull(), _metric_row(
                    F.concat(name, F.lit("_max")), base, t, dp["max"])),
                _metric_row(F.concat(name, F.lit("_count")), base, t,
                            F.coalesce(dp["count"].cast("double"), F.lit(0.0))),
            ),
            lambda r: r.isNotNull(),
        )
        # bounds + '+Inf'; bucket j value = CUMULATIVE count ≤ bound j;
        # bound rendering via the shared strconv-'g' formatter
        bounds = F.concat(
            F.transform(
                F.coalesce(dp["explicitBounds"], F.array().cast("array<double>")),
                _fmt_double,
            ),
            F.array(F.lit("+Inf")),
        )
        counts = F.coalesce(dp["bucketCounts"], F.array().cast("array<string>"))
        # single-pass running sum (the per-bucket slice+fold would be
        # O(B^2) additions)
        cum = F.aggregate(
            counts,
            F.array().cast("array<double>"),
            lambda acc, c: F.concat(
                acc,
                F.array(
                    F.coalesce(F.get(acc, F.size(acc) - 1), F.lit(0.0))
                    + F.coalesce(c.cast("double"), F.lit(0.0))
                ),
            ),
        )
        n_buck = F.least(F.size(bounds), F.size(counts))
        idx = F.sequence(F.lit(1), n_buck)
        buckets = F.when(n_buck >= 1, F.transform(
            idx,
            lambda j: _metric_row(
                F.concat(name, F.lit("_bucket")),
                dp_labels(dp, hist_extra, _kv("le", F.get(bounds, j - 1))),
                t,
                F.get(cum, j - 1),
            ),
        )).otherwise(empty)
        return F.concat(fixed, exemplar_rows(dp, hist_extra), buckets)

    hist_rows = F.flatten(
        F.transform(m["histogram"]["dataPoints"], hist_point_rows)
    )

    # exponential histogram (otlpDataToSLSProto.go:232-273 +
    # genExponentialHistogramValues): base = 2^(2^-scale); positive
    # bucket i covers (base^(offset+i), base^(offset+i+1)] and its
    # RAW count becomes a _bucket row labeled le="(lower,upper]"
    # (negative: "[-upper,-lower)"); plus le=positive.offset /
    # negative.offset / zero.count bookkeeping rows
    exp_extra = F.concat(
        _kv("otlp.metric.aggregation.temporality",
            _enum_chain(m["exponentialHistogram"]["aggregationTemporality"],
                        _TEMPORALITY, "Unspecified")),
        _kv("otlp.metric.histogram.type", F.lit("ExponentialHistogram")),
    )

    def exp_point_rows(dp) -> Column:
        base_lbls = dp_labels(dp, exp_extra)
        t = dp["timeUnixNano"]
        fixed = F.filter(
            F.array(
                F.when(dp["sum"].isNotNull(), _metric_row(
                    F.concat(name, F.lit("_sum")), base_lbls, t, dp["sum"])),
                F.when(dp["min"].isNotNull(), _metric_row(
                    F.concat(name, F.lit("_min")), base_lbls, t, dp["min"])),
                F.when(dp["max"].isNotNull(), _metric_row(
                    F.concat(name, F.lit("_max")), base_lbls, t, dp["max"])),
                _metric_row(F.concat(name, F.lit("_count")), base_lbls, t,
                            F.coalesce(dp["count"].cast("double"), F.lit(0.0))),
            ),
            lambda r: r.isNotNull(),
        )
        base = F.pow(F.lit(2.0), F.pow(
            F.lit(2.0), -F.coalesce(dp["scale"], F.lit(0)).cast("double")))

        def side_rows(side, positive: bool) -> Column:
            counts = F.coalesce(side["bucketCounts"],
                                F.array().cast("array<string>"))
            off = F.coalesce(side["offset"], F.lit(0)).cast("double")
            idx = F.when(F.size(counts) >= 1,
                         F.sequence(F.lit(0), F.size(counts) - 1)).otherwise(
                F.array().cast("array<int>"))

            def one(i):
                lower = F.pow(base, off + i.cast("double"))
                upper = lower * base
                if positive:
                    le = F.concat(F.lit("("), _fmt_double(lower), F.lit(","),
                                  _fmt_double(upper), F.lit("]"))
                else:
                    le = F.concat(F.lit("["), _fmt_double(-upper), F.lit(","),
                                  _fmt_double(-lower), F.lit(")"))
                return _metric_row(
                    F.concat(name, F.lit("_bucket")),
                    dp_labels(dp, exp_extra, _kv("le", le)),
                    t,
                    F.coalesce(F.get(counts, i).cast("double"), F.lit(0.0)),
                )

            offset_key = "positive.offset" if positive else "negative.offset"
            return F.concat(
                F.transform(idx, one),
                F.array(_metric_row(
                    F.concat(name, F.lit("_bucket")),
                    dp_labels(dp, exp_extra, _kv("le", F.lit(offset_key))),
                    t, off)),
            )

        zero_row = F.array(_metric_row(
            F.concat(name, F.lit("_bucket")),
            dp_labels(dp, exp_extra, _kv("le", F.lit("zero.count"))),
            t, F.coalesce(dp["zeroCount"].cast("double"), F.lit(0.0))))
        return F.concat(
            fixed,
            exemplar_rows(dp, exp_extra),
            side_rows(dp["positive"], True),
            zero_row,
            side_rows(dp["negative"], False),
        )

    exp_rows = F.flatten(
        F.transform(m["exponentialHistogram"]["dataPoints"], exp_point_rows)
    )
    all_rows = F.concat(
        F.coalesce(gauge_rows, empty),
        F.coalesce(sum_rows, empty),
        F.coalesce(summary_rows, empty),
        F.coalesce(hist_rows, empty),
        F.coalesce(exp_rows, empty),
    )
    out = (
        out.withColumn("__row", F.explode(all_rows))
        .withColumn("__name__", F.col("__row")["__name__"])
        .withColumn("__labels__", F.col("__row")["__labels__"])
        .withColumn("__time_nano__", F.col("__row")["__time_nano__"])
        .withColumn("__value__", F.col("__row")["__value__"])
        .drop("__rm", "__sm", "__mt", "__row")
    )
    if drop_source:
        out = out.drop(source_key)
    return out


# OTLP/JSON logs schema (public logs/v1/logs.proto protojson shape;
# enum fields typed string so numeric and name encodings both parse)
OTLP_LOG_SCHEMA = f"""
resourceLogs array<struct<
  resource: struct<attributes: {_ATTRS}>,
  scopeLogs: array<struct<
    scope: struct<name:string, version:string>,
    logRecords: array<struct<
      timeUnixNano:string, observedTimeUnixNano:string,
      severityNumber:string, severityText:string,
      body: struct<stringValue:string, intValue:string,
                   doubleValue:double, boolValue:boolean>,
      attributes: {_ATTRS},
      droppedAttributesCount:int, flags:int,
      traceId:string, spanId:string, eventName:string
    >>
  >>
>>
"""

OTEL_LOG_COLUMNS = [
    "service", "otlp.name", "otlp.version", "time_us", "observed_us",
    "severityNumber", "severityText", "body", "attribute",
    "traceID", "spanID", "eventName", "flags",
]


def parse_otel_log(
    df: DataFrame,
    source_key: str,
    *,
    format: str = "json",
    drop_source: bool = True,
) -> DataFrame:
    """One output row per LogRecord in each row's OTLP ``LogsData``
    payload — the logs member of the OTLP triple beside
    :func:`parse_otel_trace` and :func:`parse_otel_metric` (the
    reference ships trace/metric processors; an OTLP-logs receiver
    feeds the same LogEvent model, so the Spark surface completes the
    signal set). Unparseable payloads yield zero rows.

    Columns (beyond the carried-through inputs): ``service`` (resource
    ``service.name``), scope name/version, exact integer microsecond
    ``time_us``/``observed_us``, severity number + text, the body
    scalar rendered as a string (non-scalar bodies render ''), sorted
    JSON ``attribute``, hex trace/span ids, ``eventName``, ``flags``.

    ``format``: 'json'/'protojson' (JVM-native from_json hot path) or
    'protobuf' (functions/otlp_wire.py LOGS_DATA wire walk in an
    Arrow-batched UDF, then the same JSON plan — identical rows).
    """
    fmt = format.lower()
    if fmt == "protobuf":
        from ..functions.otlp_wire import decode_udf

        tmp = "__otlp_log_json"
        decoded = df.withColumn(tmp, decode_udf("logs")(F.col(source_key)))
        out = parse_otel_log(decoded, tmp, format="json", drop_source=True)
        return out.drop(source_key) if drop_source else out
    if fmt not in ("json", "protojson"):
        raise ValueError(f"unknown otel log format {format!r}")
    parsed = F.from_json(F.col(source_key), OTLP_LOG_SCHEMA)
    out = (
        df.withColumn("__rl", F.explode(parsed["resourceLogs"]))
        .withColumn("__sl", F.explode(F.col("__rl")["scopeLogs"]))
        .withColumn("__lr", F.explode(F.col("__sl")["logRecords"]))
    )
    res_attrs = F.col("__rl")["resource"]["attributes"]
    lr = F.col("__lr")
    time_us = (lr["timeUnixNano"].cast("decimal(38,0)") / 1000).cast("long")
    obs_us = (
        lr["observedTimeUnixNano"].cast("decimal(38,0)") / 1000
    ).cast("long")
    body = F.coalesce(
        lr["body"]["stringValue"],
        lr["body"]["intValue"],
        _fmt_double(lr["body"]["doubleValue"]),
        lr["body"]["boolValue"].cast("string"),
        F.lit(""),
    )
    out = (
        out.withColumn("service", _attr_value(res_attrs, "service.name"))
        .withColumn("otlp.name", F.coalesce(F.col("__sl")["scope"]["name"], F.lit("")))
        .withColumn("otlp.version", F.coalesce(F.col("__sl")["scope"]["version"], F.lit("")))
        .withColumn("time_us", time_us)
        .withColumn("observed_us", obs_us)
        .withColumn("severityNumber", F.coalesce(lr["severityNumber"], F.lit("0")))
        .withColumn("severityText", F.coalesce(lr["severityText"], F.lit("")))
        .withColumn("body", body)
        .withColumn("attribute", _attrs_json(lr["attributes"]))
        .withColumn("traceID", F.coalesce(lr["traceId"], F.lit("")))
        .withColumn("spanID", F.coalesce(lr["spanId"], F.lit("")))
        .withColumn("eventName", F.coalesce(lr["eventName"], F.lit("")))
        .withColumn("flags", F.coalesce(lr["flags"], F.lit(0)))
        .drop("__rl", "__sl", "__lr")
    )
    if drop_source:
        out = out.drop(source_key)
    return out
