"""Winnowing fingerprint tests (operators/dedup.py:winnowing_*):
the MOSS local fingerprinting guarantees from Schleimer, Wilkerson &
Aiken (SIGMOD 2003)."""

from pyspark.sql import functions as F

from loongcollector_spark.operators.dedup import (
    winnowing_fingerprints,
    winnowing_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_match_guarantee(spark):
    # any shared run of >= w + k - 1 tokens must share a fingerprint
    k, w = 3, 4
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w + k - 1
    df = _docs(
        spark,
        [(1, f"one two {shared} three four"),
         (2, f"nine eight seven {shared} six")],
    )
    fps = winnowing_fingerprints(df, k=k, w=w)
    a = {r.fp_hash for r in fps.filter("doc_id = 1").collect()}
    b = {r.fp_hash for r in fps.filter("doc_id = 2").collect()}
    assert a & b, "guaranteed shared fingerprint missing"


def test_density_and_coverage(spark):
    # every window of w grams contributes a selection; expected density
    # ~ 2/(w+1), never more than one fingerprint per window start
    words = " ".join(f"w{i * 7919 % 1000}" for i in range(200))
    df = _docs(spark, [(1, words)])
    k, w = 5, 4
    n_grams = 200 - k + 1
    fps = winnowing_fingerprints(df, k=k, w=w).collect()
    n_windows = n_grams - w + 1
    assert 0 < len(fps) <= n_windows
    # all fingerprint positions are valid gram positions
    assert all(1 <= r.fp_pos <= n_grams for r in fps)


def test_selection_is_windowed_min_rightmost(spark):
    # hand-checkable doc: repeated token makes every gram identical, so
    # all hashes tie → rightmost-of-first-window then dedup leaves ONE
    # fingerprint per window, all selecting the window's last position
    df = _docs(spark, [(1, " ".join(["same"] * 10))])
    fps = winnowing_fingerprints(df, k=3, w=4).collect()
    # grams: 8 identical; windows start at 1..5; window q selects pos q+3
    assert sorted(r.fp_pos for r in fps) == [4, 5, 6, 7, 8]
    assert len({r.fp_hash for r in fps}) == 1


def test_short_docs_still_fingerprint(spark):
    df = _docs(spark, [(1, "only two"), (2, ""), (3, "a b c d")])
    fps = winnowing_fingerprints(df, k=5, w=4).collect()
    by = {}
    for r in fps:
        by.setdefault(r.doc_id, []).append(r)
    # shorter than k: single whole-text gram, one fingerprint
    assert len(by[1]) == 1 and len(by[3]) == 1
    assert len(by[2]) == 1  # empty text → '' gram; harmless, determinate


def test_pairs_containment_and_bucket_cap(spark):
    base = " ".join(f"t{i}" for i in range(60))
    df = _docs(
        spark,
        [(1, base), (2, base + " extra tail tokens here"),
         (3, "completely different words " + " ".join(f"z{i}" for i in range(40)))],
    )
    pairs = winnowing_pairs(winnowing_fingerprints(df, k=5, w=4)).collect()
    by = {(r.doc_a, r.doc_b): r for r in pairs}
    assert (1, 2) in by
    r = by[(1, 2)]
    assert r.containment > 0.8  # near-dup of the smaller doc
    assert (1, 3) not in by and (2, 3) not in by
    # bucket cap drops saturated hashes deterministically
    many = _docs(spark, [(i, base) for i in range(10)])
    fps = winnowing_fingerprints(many, k=5, w=4)
    assert winnowing_pairs(fps, max_bucket=5).count() == 0
    assert winnowing_pairs(fps, max_bucket=10).count() == 45  # 10 choose 2


def test_plan_shape(spark):
    df = _docs(spark, [(1, "a b c d e f g")])
    fps = winnowing_fingerprints(df, k=3, w=2)
    plan = fps._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # JVM end to end
    assert "CartesianProduct" not in plan
    pairs = winnowing_pairs(fps)
    plan2 = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan2  # bucket join, never all-pairs


def test_parallelism_invariance(spark):
    words = [" ".join(f"d{d}w{i * 31 % 97}" for i in range(50)) for d in range(6)]
    rows = [(d, words[d] + " " + words[(d + 1) % 6]) for d in range(6)]
    a = winnowing_fingerprints(
        _docs(spark, rows).repartition(1), k=4, w=3
    ).collect()
    b = winnowing_fingerprints(
        _docs(spark, rows).repartition(16), k=4, w=3
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
