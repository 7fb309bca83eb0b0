"""processor_otel_trace parity: OTLP/JSON payload → one row per span
with the reference's exact key set and renderings
(otlp_trace_parser.go:140-244)."""

import json

import pytest

from loongcollector_spark.operators.otel import OTEL_SPAN_COLUMNS, parse_otel_trace

PAYLOAD = {
    "resourceSpans": [
        {
            "resource": {
                "attributes": [
                    {"key": "host.name", "value": {"stringValue": "h1"}},
                    {"key": "service.name", "value": {"stringValue": "svc-a"}},
                ]
            },
            "scopeSpans": [
                {
                    "scope": {"name": "lib", "version": "1.2"},
                    "spans": [
                        {
                            "traceId": "0102030405060708090a0b0c0d0e0f10",
                            "spanId": "0102030405060708",
                            "parentSpanId": "",
                            "name": "GET /x",
                            "kind": 2,
                            "startTimeUnixNano": "1704067200000000000",
                            "endTimeUnixNano": "1704067200500000000",
                            "attributes": [
                                {"key": "http.status", "value": {"intValue": "200"}}
                            ],
                            "status": {"code": 1, "message": ""},
                            "events": [],
                            "links": [],
                        },
                        {
                            "traceId": "0102030405060708090a0b0c0d0e0f10",
                            "spanId": "1112131415161718",
                            "parentSpanId": "0102030405060708",
                            "name": "db.query",
                            "kind": "SPAN_KIND_CLIENT",
                            "startTimeUnixNano": "1704067200100000000",
                            "endTimeUnixNano": "1704067200200000000",
                            "status": {"code": 2, "message": "boom"},
                        },
                    ],
                }
            ],
        }
    ]
}


def test_otel_trace_span_expansion(spark):
    df = spark.createDataFrame([(7, json.dumps(PAYLOAD))], ["id", "payload"])
    out = parse_otel_trace(df, "payload")
    assert set(OTEL_SPAN_COLUMNS) <= set(out.columns)
    rows = {r["spanID"]: r for r in out.collect()}
    assert set(rows) == {"0102030405060708", "1112131415161718"}
    a = rows["0102030405060708"]
    assert (a["host"], a["service"]) == ("h1", "svc-a")
    assert (a["otlp.name"], a["otlp.version"]) == ("lib", "1.2")
    assert a["kind"] == "server" and a["statusCode"] == "OK"
    assert a["start"] == "1704067200000000" and a["duration"] == "500000"
    assert json.loads(a["attribute"]) == {"http.status": "200"}
    assert a["id"] == 7  # carried-through input column
    b = rows["1112131415161718"]
    assert b["kind"] == "client"  # string enum form
    assert b["statusCode"] == "ERROR" and b["statusMessage"] == "boom"
    assert b["parentSpanID"] == "0102030405060708"
    assert b["logs"] == "[]" and b["links"] == "[]"


def test_otel_trace_unparseable_drops(spark):
    df = spark.createDataFrame([(1, "not-otlp-json"), (2, "{}")], ["id", "payload"])
    assert parse_otel_trace(df, "payload").count() == 0


def test_otel_protobuf_raises(spark):
    df = spark.createDataFrame([(1, "x")], ["id", "payload"])
    with pytest.raises(NotImplementedError):
        parse_otel_trace(df, "payload", format="protobuf")


def test_otel_links_events_reference_shape(spark):
    payload = {
        "resourceSpans": [{
            "resource": {"attributes": [
                {"key": "service.name", "value": {"stringValue": "s"}},
                {"key": "env", "value": {"stringValue": "prod"}},
            ]},
            "scopeSpans": [{"scope": {"name": "l", "version": "1"}, "spans": [{
                "traceId": "t1", "spanId": "s1", "name": "op", "kind": 1,
                "startTimeUnixNano": "1000000",
                "links": [{"traceId": "aa", "spanId": "cc",
                           "attributes": [{"key": "k", "value": {"stringValue": "v"}}]}],
                "events": [{"timeUnixNano": "2000000", "name": "ev",
                            "attributes": [{"key": "zeta", "value": {"stringValue": "z"}},
                                            {"key": "alpha", "value": {"stringValue": "a"}},
                                            {"value": {"stringValue": "orphan"}}]}],
                "status": {},
            }]}],
        }]
    }
    df = spark.createDataFrame([(json.dumps(payload),)], ["payload"])
    r = parse_otel_trace(df, "payload").first()
    # links/events use the reference's field names and shapes
    assert json.loads(r["links"]) == [
        {"attribute": {"k": "v"}, "spanID": "cc", "traceID": "aa"}
    ]
    ev = json.loads(r["logs"])[0]
    assert ev["name"] == "ev" and ev["time"] == 2000000
    # sorted keys; attribute entries without a key are dropped, not fatal
    assert list(ev["attribute"]) == ["alpha", "zeta"]
    # promoted service key removed from resource JSON
    assert json.loads(r["resource"]) == {"env": "prod"}
    assert r["service"] == "s"
    # end==0 substituted with 'now': duration is a positive number
    assert int(r["duration"]) > 0 and r["end"] is not None
