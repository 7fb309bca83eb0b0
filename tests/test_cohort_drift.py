"""cohort_retention + template_drift: crafted-fixture semantics,
negative-zero normalization, and plan pins (no distinct expansion; raw
lines never hash-shuffle on anything but the template)."""

import datetime
import math

from pyspark.sql import functions as F

from loongcollector_spark.operators.loganalytics import (
    cohort_retention,
    template_drift,
)


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


def test_cohort_cells(spark):
    rows = [
        (1, _ts(1)), (1, _ts(1, 5)), (1, _ts(3)),  # u1: cohort d1, active d1+d3
        (2, _ts(2)),                                # u2: cohort d2
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_day.isoformat(), r.offset_days): (r.n_users, r.n_events)
        for r in cohort_retention(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): (1, 2),
        ("2024-01-01", 2): (1, 1),
        ("2024-01-02", 0): (1, 1),
    }


def test_cohort_plan_has_no_distinct_expand(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = cohort_retention(ev)._jdf.queryExecution().executedPlan().toString()
    # structural uniqueness replaces countDistinct: no Expand operator,
    # and the join consumes pre-reduced aggregates (HashAggregate below
    # the join on both sides — the raw scan is never join input)
    assert "Expand" not in plan
    assert plan.count("HashAggregate") >= 4  # partial+final per input agg


def test_template_drift_split_and_shares(spark):
    rows = [(f"err {i}", _ts(1, i)) for i in range(5)] + [
        (f"ok {i}", _ts(1, 5 + i)) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "text string, ts timestamp")
    got = {r.template: (r.n_early, r.n_late, r.drift) for r in
           template_drift(df, min_count=1).collect()}
    assert got == {
        "err <NUM>": (5, 0, -1.0),
        "ok <NUM>": (0, 5, 1.0),
    }


def test_template_drift_zero_is_positive_zero(spark):
    # equal early/late shares -> drift rounds to zero; the +0.0
    # normalization must yield +0.0 (repr-sorted cross-engine compares
    # split on the IEEE zero sign otherwise)
    rows = [("a 1", _ts(1, 0)), ("a 2", _ts(1, 9)),
            ("b 1", _ts(1, 1)), ("b 2", _ts(1, 8))]
    df = spark.createDataFrame(rows, "text string, ts timestamp")
    for r in template_drift(df, min_count=1).collect():
        assert r.drift == 0.0
        assert math.copysign(1.0, r.drift) > 0


def test_template_drift_shuffles_only_templates(spark, sf_dir):
    # over a plain scan (no transcript-view window machinery) the ONLY
    # hash exchanges are the template rollups — raw lines never shuffle
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "text", F.timestamp_seconds(F.col("doc_id") * 60).alias("ts")
    )
    plan = (
        template_drift(docs, min_count=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    parts = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert parts, "expected at least the template rollup exchange"
    assert all("template" in p for p in parts), parts


def test_template_drift_min_count_prunes(spark):
    rows = [("x 1", _ts(1, 0)), ("x 2", _ts(1, 9))] + [
        (f"solo{i} never repeats {i}", _ts(1, i)) for i in range(2, 6)
    ]
    df = spark.createDataFrame(rows, "text string, ts timestamp")
    out = template_drift(df, min_count=2).collect()
    assert [r.template for r in out] == ["x <NUM>"]
    # totals still count the pruned lines: halves are h0-h4 (4 lines)
    # vs h5-h9 (2 lines), so x's shares are 1/4 early vs 1/2 late
    (row,) = out
    assert (row.n_early, row.n_late) == (1, 1)
    assert row.drift == round(1 / 2 - 1 / 4, 6)


def test_cohort_event_conservation(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cells = cohort_retention(ev).agg(F.sum("n_events").alias("s")).first().s
    assert cells == ev.count()
