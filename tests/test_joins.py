"""Tests for temporal joins (operators/joins.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.operators.joins import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            ("u1", _ts(5), "e1"),
            ("u1", _ts(10), "e2"),
            ("u1", _ts(20), "e3"),
            ("u2", _ts(1), "e4"),  # no prior right row
        ],
        "user_id string, ts timestamp, ev string",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(4), "r1"),
            ("u1", _ts(10), "r2"),  # equal-ts: must match e2 (inclusive)
            ("u1", _ts(15), "r3"),
            ("u2", _ts(9), "r4"),  # after u2's only left row
        ],
        "user_id string, ts timestamp, tag string",
    )
    return left, right


def test_asof_backward_inclusive(spark, sides):
    left, right = sides
    out = {
        r["ev"]: r
        for r in asof_join(left, right, on="ts", by=["user_id"]).collect()
    }
    assert len(out) == 4  # left join: every left row survives
    assert out["e1"]["tag_right"] == "r1"  # most recent prior
    assert out["e2"]["tag_right"] == "r2"  # equal ts matches (inclusive)
    assert out["e3"]["tag_right"] == "r3"  # skips past r1/r2
    assert out["e4"]["tag_right"] is None  # nothing at-or-before
    assert out["e4"]["ts_right"] is None


def test_asof_tolerance(spark, sides):
    left, right = sides
    out = {
        r["ev"]: r
        for r in asof_join(
            left, right, on="ts", by=["user_id"], tolerance_us=2_000_000
        ).collect()
    }
    assert out["e1"]["tag_right"] == "r1"  # 1 s old: within tolerance
    assert out["e2"]["tag_right"] == "r2"  # 0 s old
    assert out["e3"]["tag_right"] is None  # r3 is 5 s old: voided


def test_asof_plan_is_single_window_no_join(spark, sides):
    # the scale contract: union + one running window, shuffled once on
    # the by-key — no join operator (a range join would be quadratic
    # on hot keys), no Python in the plan
    left, right = sides
    plan = (
        asof_join(left, right, on="ts", by=["user_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "NestedLoop", "Python"):
        assert bad not in plan
    assert plan.count("Exchange") == 1


def test_asof_missing_on_column_raises(spark, sides):
    left, right = sides
    with pytest.raises(ValueError):
        asof_join(left.drop("ts"), right, on="ts", by=["user_id"])


# ---------------------------------------------------------------------------
# interval overlap join (grid-bucketed)


def test_interval_join_semantics_and_grid_invariance(spark):
    from loongcollector_spark.operators.joins import interval_join

    L = spark.createDataFrame(
        [("u", 1, 0, 10), ("u", 2, 20, 30), ("v", 3, 0, 5)],
        "user_id string, lid long, start_us long, end_us long",
    )
    R = spark.createDataFrame(
        [("u", 10, 5, 8), ("u", 11, 9, 21), ("u", 12, 40, 50), ("v", 13, 6, 9)],
        "user_id string, rid long, start_us long, end_us long",
    )
    expect = [(1, 10), (1, 11), (2, 11)]  # closed-interval overlaps, same key
    for g in (1, 3, 7, 1_000_000):
        rows = sorted(
            (r.lid, r.rid_right)
            for r in interval_join(L, R, grid_us=g).collect()
        )
        assert rows == expect, (g, rows)


def test_interval_join_touching_endpoints_and_nulls(spark):
    from loongcollector_spark.operators.joins import interval_join

    L = spark.createDataFrame(
        [("u", 1, 0, 10), ("u", 2, None, 5), ("u", 3, 9, 4)],  # NULL + inverted
        "user_id string, lid long, start_us long, end_us long",
    )
    R = spark.createDataFrame(
        [("u", 10, 10, 20)],  # touches lid=1 exactly at 10 (closed: overlap)
        "user_id string, rid long, start_us long, end_us long",
    )
    rows = [(r.lid, r.rid_right) for r in interval_join(L, R).collect()]
    assert rows == [(1, 10)]  # NULL-bound and inverted intervals dropped


def test_interval_join_duplicate_inputs_preserve_multiplicity(spark):
    # Inner-join semantics: two identical left rows matching one right
    # row must come back twice. The old output-wide dropDuplicates()
    # collapsed them (ADVICE r3 medium); the first-shared-cell predicate
    # dedups only the grid artifact.
    from loongcollector_spark.operators.joins import interval_join

    L = spark.createDataFrame(
        [("u", 1, 0, 10), ("u", 1, 0, 10)],
        "user_id string, lid long, start_us long, end_us long",
    )
    R = spark.createDataFrame(
        [("u", 10, 5, 8)],
        "user_id string, rid long, start_us long, end_us long",
    )
    for g in (1, 3, 1_000_000):  # multi-cell and single-cell regimes
        rows = [(r.lid, r.rid_right) for r in interval_join(L, R, grid_us=g).collect()]
        assert rows == [(1, 10), (1, 10)], (g, rows)


def test_interval_join_plan_has_no_postjoin_dedup(spark):
    # Scale pin: double-match removal is a per-row filter, so the plan
    # must contain NO aggregate (the old dropDuplicates compiled to a
    # full-width HashAggregate + Exchange over the joined output).
    from loongcollector_spark.operators.joins import interval_join

    L = spark.createDataFrame(
        [("u", 1, 0, 10)],
        "user_id string, lid long, start_us long, end_us long",
    )
    R = spark.createDataFrame(
        [("u", 10, 5, 8)],
        "user_id string, rid long, start_us long, end_us long",
    )
    plan = (
        interval_join(L, R, grid_us=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("HashAggregate", "SortAggregate", "ObjectHashAggregate"):
        assert bad not in plan, plan
