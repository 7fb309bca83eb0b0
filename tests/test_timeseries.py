"""trailing_zscore / rolling_count / log_templates semantics + plans."""

import re
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.operators.loganalytics import log_templates, mask_log_line
from loongcollector_spark.operators.timeseries import rolling_count, trailing_zscore

from test_plans import plan_of


def _series(spark, values, typ="m"):
    base = datetime(2024, 1, 1)
    rows = [
        (i, base + timedelta(seconds=i), typ, float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "event_id: long, ts: timestamp, event_type: string, value: double"
    )


def test_zscore_flags_spike_and_excludes_self(spark):
    # 30 flat values then one spike: the spike must score against the
    # flat history (frame excludes current row → std stays ~0.5-ish)
    vals = [10.0, 11.0] * 15 + [50.0]
    df = _series(spark, vals)
    out = trailing_zscore(
        df, lookback_rows=100, min_history=10
    ).orderBy("event_id").collect()
    spike = out[-1]
    assert spike["zscore"] is not None and spike["zscore"] > 3
    # early rows have < min_history predecessors → NULL
    assert all(r["zscore"] is None for r in out[:10])
    # flat rows are unremarkable
    assert all(
        r["zscore"] is None or abs(r["zscore"]) < 2 for r in out[:-1]
    )


def test_zscore_zero_std_guard(spark):
    df = _series(spark, [5.0] * 40)
    out = trailing_zscore(df, min_history=10).collect()
    assert all(r["zscore"] is None for r in out)  # std == 0 everywhere


def test_zscore_partitions_by_key(spark):
    a = _series(spark, [1.0] * 25, "a")
    b = _series(spark, [100.0] * 25, "b")
    out = trailing_zscore(a.unionAll(b), min_history=10).collect()
    # keys score independently: neither side sees the other's level
    assert all(r["zscore"] is None for r in out)


def test_rolling_count_range_semantics(spark):
    base = datetime(2024, 1, 1)
    rows = [
        (1, base, 7),
        (2, base + timedelta(seconds=30), 7),
        (3, base + timedelta(seconds=30), 7),  # tie: peer of row 2
        (4, base + timedelta(seconds=100), 7),  # rows 1-3 expired (60s)
        (5, base, 8),  # other key independent
    ]
    df = spark.createDataFrame(rows, "event_id: long, ts: timestamp, user_id: long")
    out = {
        r["event_id"]: r["rolling_n"]
        for r in rolling_count(df, window_seconds=60).collect()
    }
    assert out[1] == 1
    # RANGE: tied timestamps are peers — both see both
    assert out[2] == 3 and out[3] == 3
    assert out[4] == 1
    assert out[5] == 1


def test_mask_log_line(spark):
    df = spark.createDataFrame(
        [
            ("GET /api/v2/users/12345 from 10.0.42.7 took 3.5ms id=deadbeef99",),
            ("GET /api/v2/users/999 from 192.168.0.1 took 0.2ms id=cafebabe01",),
        ],
        ["text"],
    )
    masked = df.select(mask_log_line(F.col("text")).alias("m")).collect()
    # 'v2' survives (no boundary inside a word → a version string is a
    # template constant); '3.5ms' fully masks
    assert (
        masked[0]["m"]
        == "GET /api/v2/users/<NUM> from <IP> took <NUM>ms id=<HEX>"
    )
    assert masked[0]["m"] == masked[1]["m"]
    t = log_templates(df).collect()
    assert len(t) == 1 and t[0]["n_logs"] == 2
    # deterministic example: lexicographically smallest raw line
    assert t[0]["example"].startswith("GET /api/v2/users/12345")


def test_timeseries_plans_single_exchange_no_python(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    for df in (
        trailing_zscore(ev),
        rolling_count(ev),
    ):
        plan = plan_of(df)
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
        assert "EvalPython" not in plan
    tplan = plan_of(log_templates(ev.withColumnRenamed("props", "text"),
                                  text_col="text"))
    assert len(re.findall(r"\(\d+\) Exchange", tplan)) == 1
    assert "Window" not in tplan


# ----------------------------------------------------- block engines (r5)


def test_rolling_count_block_engine_exact_parity(spark, sf_dir):
    """The bucket-decomposed engine is EXACTLY the window engine
    (integer counts), including tied timestamps and bucket edges."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = {
        r["event_id"]: r["rolling_n"]
        for r in rolling_count(ev, window_seconds=3600).collect()
    }
    b = {
        r["event_id"]: r["rolling_n"]
        for r in rolling_count(ev, window_seconds=3600, engine="block").collect()
    }
    assert a == b and len(a) > 0


def test_rolling_count_block_engine_bucket_edges(spark):
    """Hand case across a bucket boundary: W=60, events at 0/59/61/121.
    61 sees 59+61 (59 is in the previous bucket -> via the copy; 0 is
    outside [1, 61]); 121 sees 61+121 (61 is exactly W before ->
    inclusive, and it crosses the bucket edge via the copy)."""
    base = datetime(2024, 1, 1)
    rows = [
        (1, base, 7),
        (2, base + timedelta(seconds=59), 7),
        (3, base + timedelta(seconds=61), 7),
        (4, base + timedelta(seconds=121), 7),
    ]
    df = spark.createDataFrame(rows, "event_id: long, ts: timestamp, user_id: long")
    out = {
        r["event_id"]: r["rolling_n"]
        for r in rolling_count(df, window_seconds=60, engine="block").collect()
    }
    assert out == {1: 1, 2: 2, 3: 2, 4: 2}
    # and the window engine agrees on the same input
    w = {
        r["event_id"]: r["rolling_n"]
        for r in rolling_count(df, window_seconds=60).collect()
    }
    assert w == out


def test_trailing_zscore_block_engine_parity(spark, sf_dir):
    """Block (prefix-sum + shifted self-join) engine matches the window
    engine: identical NULL pattern, values equal to float tolerance."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cols = ["event_id", "trail_mean", "trail_std", "zscore"]
    a = {r["event_id"]: r for r in trailing_zscore(ev).select(cols).collect()}
    b = {
        r["event_id"]: r
        for r in trailing_zscore(ev, engine="block").select(cols).collect()
    }
    assert set(a) == set(b) and len(a) > 0
    for k in a:
        for c in ("trail_mean", "trail_std", "zscore"):
            va, vb = a[k][c], b[k][c]
            assert (va is None) == (vb is None), (k, c, va, vb)
            if va is not None:
                assert vb == pytest.approx(va, rel=1e-9, abs=1e-9), (k, c)


def test_block_engines_null_parity_with_window(spark):
    """NULL keys, NULL values, and NULL timestamps follow the window
    twin exactly: NULL keys are a real partition (not dropped by the
    joins), cnt counts non-NULL VALUES (not frame rows), and NULL-ts
    rows count their peer group once (no double-count via the
    next-bucket copy)."""
    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    # key "a": first 10 values NULL, then 20 real — with
    # min_history=15 the window cnt=count(value) gate must stay shut
    # until 15 NON-NULL predecessors exist
    for i in range(30):
        rows.append(
            ("a", base + timedelta(seconds=i), None if i < 10 else float(i), eid)
        )
        eid += 1
    # NULL key: 12 scored rows of its own
    for i in range(12):
        rows.append((None, base + timedelta(seconds=i), float(i * i % 7), eid))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double, event_id long"
    )
    cols = ["trail_mean", "trail_std", "zscore"]
    kw = dict(lookback_rows=8, min_history=15)
    a = {
        r["event_id"]: r
        for r in trailing_zscore(df, **kw).select("event_id", *cols).collect()
    }
    b = {
        r["event_id"]: r
        for r in trailing_zscore(df, engine="block", **kw)
        .select("event_id", *cols)
        .collect()
    }
    assert set(a) == set(b) and len(a) == 42  # NULL-key rows present
    for k in a:
        for c in cols:
            va, vb = a[k][c], b[k][c]
            assert (va is None) == (vb is None), (k, c, va, vb)
            if va is not None:
                assert vb == pytest.approx(va, rel=1e-9, abs=1e-9), (k, c)

    # rolling_count: NULL ts rows + NULL key rows
    rows2 = [
        (1, base, 7),
        (2, base + timedelta(seconds=30), 7),
        (3, None, 7),
        (4, None, 7),
        (5, base, None),
        (6, None, None),
    ]
    df2 = spark.createDataFrame(
        rows2, "event_id: long, ts: timestamp, user_id: long"
    )
    w = {
        r["event_id"]: r["rolling_n"]
        for r in rolling_count(df2, window_seconds=60).collect()
    }
    blk = {
        r["event_id"]: r["rolling_n"]
        for r in rolling_count(df2, window_seconds=60, engine="block").collect()
    }
    assert blk == w and len(blk) == 6


def test_block_engine_plans_decompose_the_key(spark, sf_dir):
    """Plan pins (VERDICT r4 item 2): the block engines never exchange
    on the bare key — every data exchange carries the block/bucket/row
    dimension, so ONE hot key spreads across tasks."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    rplan = plan_of(rolling_count(ev, engine="block"))
    assert re.search(r"hashpartitioning\(user_id#\d+L?, _grp#\d+", rplan)
    # the only bare-key exchange shape the window engine would have
    assert not re.search(r"hashpartitioning\(user_id#\d+L?, \d+\)", rplan)

    zplan = plan_of(trailing_zscore(ev, engine="block"))
    # block id is literal-cut codegen: no physical-partition-id (and so
    # no cross-subtree inconsistency) and no range exchange anywhere
    assert "SPARK_PARTITION_ID" not in zplan
    assert "rangepartitioning" not in zplan
    assert re.search(r"hashpartitioning\(_blk#\d+", zplan)  # per-block window
    # uniform self-join key: the null-safe key equality compiles to
    # coalesce(key, ...) in the exchange, so allow nested parens
    # before the _rn/_prn column
    assert re.search(r"hashpartitioning\([^\n]*_rn#\d+", zplan) or re.search(
        r"hashpartitioning\([^\n]*_prn#\d+", zplan
    )  # uniform self-join key
    # bare-key exchanges allowed ONLY for the tiny kmean/totals aggs —
    # the data-plane window never partitions by event_type alone
    assert "Window" in zplan


def test_engine_validation(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    with pytest.raises(ValueError):
        trailing_zscore(ev, engine="nope").collect()
    with pytest.raises(ValueError):
        rolling_count(ev, engine="nope").collect()
