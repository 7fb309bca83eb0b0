"""Round-5 session-5 core-module review fixes: parse fast-path policy,
gotime sub-second epochs, split/merge NULL-and-column preservation,
anchor whole-line extraction, quoted-CSV malformed detection,
desensitize Java-dialect safety, parameterized conversation stats, and
funnel step-name escaping."""

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.operators import aggregate as agg
from loongcollector_spark.operators import parse


def test_parse_regex_fast_path_honors_policy_and_types(spark):
    df = spark.createDataFrame([("42",), (None,)], "line string")
    out = parse.parse_regex(
        df, "line", "(.*)", ["msg"], keep_source=False,
        keep_source_if_parse_error=False, types={"msg": "long"},
    )
    assert out.columns == ["msg"]  # source dropped, like the slow path
    assert dict(out.dtypes)["msg"] == "bigint"  # cast applied
    vals = sorted((r.msg for r in out.collect()), key=lambda v: (v is None, v))
    assert vals == [42, None]
    # discard_unmatched drops the NULL-source row (the one unmatched case)
    out2 = parse.parse_regex(
        df, "line", "(.*)", ["msg"], discard_unmatched=True
    )
    assert out2.count() == 1


def test_parse_gotime_epoch_keeps_subseconds(spark):
    df = spark.createDataFrame([("2024-01-02 15:04:05.123",)], "t string")
    out = parse.parse_gotime(
        df, "t", "2006-01-02 15:04:05.000", "ms", "milliseconds",
        source_location=0,
    ).collect()[0]
    assert out.ms == "1704207845123"  # not ...000
    out2 = parse.parse_gotime(
        df, "t", "2006-01-02 15:04:05.000", "s", "seconds",
        source_location=0,
    ).collect()[0]
    assert out2.s == "1704207845"
    out3 = parse.parse_gotime(
        df, "t", "2006-01-02 15:04:05.000", "us", "microseconds",
        source_location=0,
    ).collect()[0]
    assert out3.us == "1704207845123000"


def test_split_log_string_keeps_null_rows(spark):
    df = spark.createDataFrame(
        [("h1", "a\nb"), ("h2", None)], "host string, body string"
    )
    out = parse.split_log_string(df, "body").collect()
    assert len(out) == 3  # 2 parts + the NULL pass-through row
    assert sorted((r.host, r.body) for r in out) == [
        ("h1", "a"), ("h1", "b"), ("h2", None),
    ]


def test_merge_multiline_carries_other_columns(spark):
    rows = [
        ("f1", "web", "ERROR boom", 0),
        ("f1", "web", "  at line 1", 1),
        ("f1", "web", "ERROR again", 2),
    ]
    df = spark.createDataFrame(
        rows, "file string, svc string, line string, turn_idx int"
    )
    out = parse.merge_multiline(
        df, "line", start_pattern=r"^ERROR", group_cols=["file"]
    )
    assert set(out.columns) == {"file", "line", "turn_idx", "svc"}
    got = sorted((r.turn_idx, r.line, r.svc) for r in out.collect())
    assert got == [
        (0, "ERROR boom\n  at line 1", "web"),
        (2, "ERROR again", "web"),
    ]


def test_parse_anchor_both_anchors_empty_takes_whole_line(spark):
    df = spark.createDataFrame([("hello world",)], "line string")
    out = parse.parse_anchor(
        df, "line", [{"start": "", "stop": "", "field": "x"}]
    ).collect()[0]
    assert out.x == "hello world"


def test_parse_delimiter_quoted_detects_malformed(spark):
    df = spark.createDataFrame(
        [('a,"b,c",d',), ('x,"unbalanced,y',), ("p,q",)], "line string"
    )
    out = parse.parse_delimiter(
        df, "line", ",", ["a", "b", "c"], quote='"', discard_unmatched=True
    )
    rows = out.collect()
    assert len(rows) == 1  # unbalanced quote AND short row discarded
    assert (rows[0].a, rows[0].b, rows[0].c) == ("a", "b,c", "d")


def test_desensitize_java_only_pattern_does_not_crash(spark):
    from loongcollector_spark.operators.enrich import desensitize

    df = spark.createDataFrame([("pin 1234 end",)], "msg string")
    # \p{Digit} is Java-dialect: Python re rejects it; the native path
    # must still run (runtime guard covers the zero-width risk)
    out = desensitize(
        df, "msg", r"\p{Digit}{4}", method="md5"
    ).collect()[0]
    import hashlib

    assert out.msg == "pin " + hashlib.md5(b"1234").hexdigest() + " end"


def test_per_conversation_stats_ts_col_parameterized(spark):
    df = spark.createDataFrame(
        [("c1", 0, 5.0), ("c1", 1, 7.0)], "conv_id string, turn_idx int, w double"
    )
    out = agg.per_conversation_stats(df, ts_col=None).collect()[0]
    assert out.n_turns == 2 and out.max_turn_idx == 1
    assert "first_ts" not in agg.per_conversation_stats(df, ts_col=None).columns
    out2 = agg.per_conversation_stats(df, ts_col="w").collect()[0]
    assert out2.first_ts == 5.0 and out2.last_ts == 7.0


def test_event_funnel_step_names_with_quotes(spark):
    df = spark.createDataFrame(
        [(1, "view", 1.0), (1, "add'to'cart", 2.0)],
        "user_id long, event_type string, ts double",
    )
    out = {
        r.step: r.n_users
        for r in agg.event_funnel(
            df, steps=["view", "add'to'cart"]
        ).collect()
    }
    assert out == {"view": 1, "add'to'cart": 1}
