"""profile_table semantics + plan; hll_distinct production-kernel mode."""

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.operators.profile import profile_table
from loongcollector_spark.operators.sketch import hll_distinct

from test_plans import plan_of


@pytest.fixture(scope="module")
def messy(spark):
    rows = [
        (1, "a", 1.5),
        (2, None, None),
        (2, "b", 2.5),
        (None, "b", -3.0),
    ]
    return spark.createDataFrame(rows, "id: bigint, s: string, v: double")


def test_profile_exact(spark, messy):
    out = {r["column_name"]: r for r in profile_table(messy).collect()}
    assert set(out) == {"id", "s", "v"}
    r = out["id"]
    assert (r["n_rows"], r["n_nulls"], r["n_distinct"]) == (4, 1, 2)
    assert r["null_frac"] == 0.25
    assert (r["min_num"], r["max_num"]) == (1.0, 2.0)
    assert (r["min_str"], r["max_str"]) == ("", "")
    s = out["s"]
    assert (s["min_str"], s["max_str"]) == ("a", "b")
    assert (s["min_num"], s["max_num"]) == (0.0, 0.0)
    v = out["v"]
    assert (v["min_num"], v["max_num"]) == (-3.0, 2.5)
    assert v["n_distinct"] == 3


def test_profile_column_subset_and_validation(spark, messy):
    out = profile_table(messy, ["v"]).collect()
    assert [r["column_name"] for r in out] == ["v"]
    with pytest.raises(ValueError):
        profile_table(messy, ["nope"])
    with pytest.raises(ValueError):
        profile_table(messy, distinct_mode="banana")


def test_profile_approx_mode_no_expand(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact_plan = plan_of(profile_table(ev))
    approx_plan = plan_of(profile_table(ev, distinct_mode="approx"))
    # exact multi-distinct needs Expand; approx (HLL++) must not
    assert "Expand" in exact_plan
    assert "Expand" not in approx_plan
    # approx estimates land near exact on this table
    exact = {
        r["column_name"]: r["n_distinct"]
        for r in profile_table(ev).collect()
    }
    approx = {
        r["column_name"]: r["n_distinct"]
        for r in profile_table(ev, distinct_mode="approx").collect()
    }
    for c, n in exact.items():
        assert abs(approx[c] - n) <= max(3, 0.1 * n)


def test_profile_timestamp_as_epoch_micros(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    r = {x["column_name"]: x for x in profile_table(ev, ["ts"]).collect()}["ts"]
    lo, hi = ev.agg(
        F.unix_micros(F.min("ts").cast("timestamp")),
        F.unix_micros(F.max("ts").cast("timestamp")),
    ).first()
    assert (r["min_num"], r["max_num"]) == (float(lo), float(hi))
    assert r["dtype"] == "timestamp_ntz"


def test_hll_xxhash64_mode(spark):
    df = spark.range(20_000)
    est = hll_distinct(df, "id", p=12, hash_mode="xxhash64").collect()[0]
    assert abs(est["n_est"] - 20_000) / 20_000 < 0.08
    # small side exercises linear counting under the 64-bit kernel too
    small = hll_distinct(spark.range(40), "id", p=12, hash_mode="xxhash64")
    assert abs(small.collect()[0]["n_est"] - 40) < 2
