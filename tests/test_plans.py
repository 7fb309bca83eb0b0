"""Physical-plan shape assertions — the 100 TB design contract.

These tests pin the properties that make the pipeline scale:
* filters/column pruning reach the parquet scan (PushedFilters/ReadSchema)
* dictionary enrich is a BroadcastHashJoin (fact table never shuffles)
* routing + parsing is shuffle-free (narrow, whole-stage codegen)
* shard_repartition produces exactly one exchange, hash-partitioned
"""

import re

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.operators import aggregate as agg, enrich, parse, route as rt
from loongcollector_spark.queries import (
    NGINX_KEYS,
    NGINX_REGEX,
    ROLE_DIM,
    ROUTER_RULES,
    DEFAULT_SINK,
)


def plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def raw(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "error")
        .select("event_id", "ts")
    )
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,error)]" in plan
    # column pruning: scan must read only the needed columns
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(m.group(1).split(",")) <= {
        "event_id:bigint",
        "ts:timestamp_ntz",
        "event_type:string",
    }


def test_dict_map_is_broadcast_join(spark, raw):
    df = raw.withColumnRenamed("event_type", "role")
    dim = spark.createDataFrame(ROLE_DIM, ["role", "role_class", "priority"])
    out = enrich.dict_map(df, dim, "role", "role_class")
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_parse_route_is_narrow(spark, sf_dir):
    """Scan → parse → route must be a single narrow stage: no Exchange
    (shuffle) anywhere — the property that lets 1000 executors chew
    100 TB without any cross-node traffic until the final aggregate."""

    tx = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "cast(event_id as string) as conv_id",
        "cast(event_id as int) as turn_idx",
        "event_type as role",
        "props as text",
        "'none' as tool",
        "ts",
    )
    parsed = parse.parse_regex(tx, "text", NGINX_REGEX, NGINX_KEYS)
    routed = rt.route(
        parsed, rt.RouterConfig("role", ROUTER_RULES, DEFAULT_SINK)
    )
    plan = plan_of(routed)
    assert "Exchange" not in plan
    assert "codegen id" in plan  # whole-stage codegen covers the chain


def test_route_counts_single_shuffle(spark, sf_dir):
    """groupBy(sink).count over parse+route: exactly ONE exchange (the
    aggregate's), with partial aggregation before it."""
    tx = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "event_type as role", "props as text"
    )
    routed = rt.route(tx, rt.RouterConfig("role", ROUTER_RULES, DEFAULT_SINK))
    counts = routed.groupBy("sink").count()
    plan = plan_of(counts)
    assert plan.count("Exchange") - plan.count("AQEShuffleRead") <= 2  # fmt lists op + detail
    assert "HashAggregate" in plan
    # partial agg appears before the exchange (two HashAggregate nodes)
    assert plan.count("HashAggregate") >= 2


def test_shard_repartition_hash_partitioning(spark, raw):
    df = raw.selectExpr("cast(event_id as string) as conv_id", "ts")
    out = agg.shard_repartition(df, ["conv_id"], shard_count=16)
    plan = plan_of(out)
    assert "hashpartitioning(xxhash64" in plan and "Exchange" in plan


def test_pandas_parse_is_arrow_batched(spark, raw):
    df = raw.selectExpr("props as text")
    out = parse.parse_regex(
        df, "text", r'\{"k": (\d+)\}', ["k"], engine="pandas"
    )
    plan = plan_of(out)
    assert "ArrowEvalPython" in plan


def test_route_simple_config_has_no_explode(spark, sf_dir):
    """Without copy sinks the router is a pure when-chain projection —
    no Generate/explode node, no per-row array allocation."""
    from loongcollector_spark.operators import route as rt
    from loongcollector_spark.queries import DEFAULT_SINK, ROUTER_RULES

    tx = spark.read.parquet(f"{sf_dir}/events.parquet")
    cfg = rt.RouterConfig("event_type", list(ROUTER_RULES), DEFAULT_SINK)
    plan = rt.route(tx, cfg)._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan

    cfg2 = rt.RouterConfig(
        "event_type", list(ROUTER_RULES), DEFAULT_SINK,
        unconditional_sinks=["sink_audit"],
    )
    plan2 = rt.route(tx, cfg2)._jdf.queryExecution().executedPlan().toString()
    assert "Generate" in plan2  # copy semantics still use the explode


def test_desensitize_md5_native_stays_jvm_side(spark, raw):
    """The default md5-desensitize engine must contain NO Python eval
    node (it replaced the package's one per-row-Python path); the
    pandas twin keeps its ArrowEvalPython."""
    from loongcollector_spark.operators.enrich import desensitize

    nat = desensitize(raw, "props", r"\d+", method="md5")
    plan = nat._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    twin = desensitize(raw, "props", r"\d+", method="md5", engine="pandas")
    plan2 = twin._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan2


def test_geoip_query_plan_is_broadcast(spark, sf_dir):
    """The geoip oracle query's range join must broadcast the geo dim
    (never shuffle the fact side at 100 TB)."""
    from loongcollector_spark.queries import QUERIES

    plan = (
        QUERIES["geoip"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bucketed_tables_join_without_exchange(spark, tmp_path, sf_dir):
    """Co-located join evidence: two tables bucketed on the same key
    join with NO Exchange on either side (each task reads matching
    bucket files) — the layout the 100 TB transcript⨝signature joins
    would use. The sort-merge join reads the bucketed layout directly;
    broadcast is disabled for the assertion so the shuffle-free claim
    is about bucketing, not broadcast."""
    from loongcollector_spark.sources.sinks import write_bucketed_table

    prev_wh = spark.conf.get("spark.sql.warehouse.dir", None)
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed_table(
            docs.select("doc_id", "lang"), "b_lhs", ["doc_id"], 4,
            sort_cols=["doc_id"],
        )
        write_bucketed_table(
            docs.select("doc_id", "n_chars"), "b_rhs", ["doc_id"], 4,
            sort_cols=["doc_id"],
        )
        joined = spark.table("b_lhs").join(spark.table("b_rhs"), "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert joined.count() == docs.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lhs")
        spark.sql("DROP TABLE IF EXISTS b_rhs")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)


def test_session3_query_plan_pins(spark, sf_dir_med):
    """Scale pins for the session-3 additions: per-doc/per-conv ops
    never move data to one partition; the one-row report queries own
    exactly the single final-aggregate SinglePartition (tiny input —
    vocab table / one-row broadcast), nothing else."""
    from loongcollector_spark.queries import QUERIES

    def plan(name):
        return (
            QUERIES[name](spark, sf_dir_med)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    assert plan("conversation_latency").count("Exchange SinglePartition") == 0
    assert plan("exact_substring_dedup").count("Exchange SinglePartition") == 0
    assert plan("bigram_perplexity").count("Exchange SinglePartition") == 1
    assert plan("vocab_report").count("Exchange SinglePartition") == 1


def test_bm25_topk_plan_preprunes_before_global_window(spark, sf_dir):
    """bm25_topk's partition-less rank window must NOT sort the whole
    match set on one partition: LimitPushDownThroughWindow rewrites
    ``row_number() <= k`` into TakeOrderedAndProject(limit=k) BELOW the
    window (per-partition local top-k, k-row driver merge), so the
    window numbers only the k survivors (VERDICT r3 item 6)."""
    from loongcollector_spark.operators.retrieval import bm25_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        bm25_topk(docs, ["spark", "window", "hash"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject(limit=5" in plan, plan
    # printed tree: parent first — the TakeOrdered must sit BELOW
    # (after) the Window, i.e. it feeds the window its pruned input
    assert plan.index("Window") < plan.index("TakeOrderedAndProject"), plan


def test_round4_batch34_plan_pins(spark):
    """Exchange-count pins for the round-4 session-3 transcript ops —
    the per-conversation window/agg family must share its conv_id
    exchange (one hash exchange total), self_repetition may spend two
    (the second re-shuffles the REDUCED (conv, fp) table — Spark's
    count-distinct rewrite plans the identical shape), and
    tool_transitions three (lag on conv, pair groupBy, normalizing
    window on the reduced matrix). No single-partition moves of row
    data anywhere."""
    from loongcollector_spark.operators.aggregate import (
        role_conformance,
        self_repetition,
        tool_transitions,
    )
    from loongcollector_spark.operators.assemble import render_chat
    from loongcollector_spark.operators.chunking import truncate_context

    tx = spark.createDataFrame(
        [("c", 0, "assistant", "t", "x")],
        "conv_id string, turn_idx long, role string, text string, tool string",
    )
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        def shape(df):
            p = df._jdf.queryExecution().executedPlan().toString()
            return (
                p.count("Exchange hashpartitioning"),
                p.count("Exchange SinglePartition"),
            )

        assert shape(role_conformance(tx)) == (1, 0)
        assert shape(truncate_context(tx, 10)) == (1, 0)
        assert shape(render_chat(tx)) == (1, 0)  # window+groupBy share
        assert shape(self_repetition(tx)) == (2, 0)
        assert shape(tool_transitions(tx)) == (3, 0)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
