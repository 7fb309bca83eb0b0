"""Config-driven pipeline assembly (the reference's YAML pipeline).

A pipeline spec is a dict — the analog of the reference's declarative
YAML config (example_config/data_pipelines/nginx-regex.yaml:25-50),
which is its logical plan::

    {
      "processors": [
        {"type": "parse_regex", "source_key": "text", "regex": ..., "keys": [...]},
        {"type": "dict_map", "dim": <name>, "source_key": "role", ...},
        {"type": "filter_regex", "include": {...}},
        ...
      ],
      "router": {"source_key": "role",
                 "rules": [{"regex": "assistant", "sink": "sink_a"}, ...],
                 "default_sink": "sink_default", "drop_dismatch": false},
      "aggregates": [{"type": "group_count", "keys": ["sink"]}],
    }

A registry maps processor type names to DataFrame transforms —
mirroring the reference's global plugin factory maps
(plugins/processor/regex/regex.go:131-139, C++ PluginRegistry). The
assembled object is ONE Catalyst logical plan: Spark fuses the whole
processor chain into as few stages as the shuffles require, which is
the performance story the reference builds by hand with thread pools
and queues (SURVEY.md §3).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import aggregate as agg_ops
from .operators import enrich, filter as flt, geo, otel, parse, route as rt
from .spl import compile_spl as _spl_compile

ProcessorFn = Callable[..., DataFrame]

# name → callable(df, **params). Mirrors pipeline.Processors registry.
PROCESSORS: dict[str, ProcessorFn] = {
    # processor_default: the identity pass-through; ignores any config
    # params like the reference
    # (plugins/processor/defaultone/processor_default.go:15-20)
    "default": lambda df, **_: df,
    # processor_spl (core/plugin/processor/ProcessorSPL.h:26-48): run an
    # SPL script against the in-flight event group. `script` (the
    # reference's `Script` param) goes through the real SPL compiler
    # (spl.py: pipe commands + Presto-dialect expressions → one Catalyst
    # plan); `query` keeps the original raw-Spark-SQL escape hatch.
    "spl": lambda df, script=None, query=None, view_name="spl_input", **kw: (
        _spl_compile(df, script, **kw)
        if script is not None
        else (df.createOrReplaceTempView(view_name) or df.sparkSession.sql(query))
    ),
    "parse_regex": parse.parse_regex,
    "parse_grok": parse.parse_grok,
    "parse_json": parse.parse_json,
    "parse_delimiter": parse.parse_delimiter,
    "parse_keyvalue": parse.parse_keyvalue,
    "split_log_string": parse.split_log_string,
    "split_log_regex": parse.split_log_regex,
    "merge_multiline": parse.merge_multiline,
    "parse_timestamp": parse.parse_timestamp,
    "parse_gotime": parse.parse_gotime,
    "parse_otel_trace": otel.parse_otel_trace,
    "parse_otel_metric": otel.parse_otel_metric,
    "parse_otel_log": otel.parse_otel_log,
    "parse_anchor": parse.parse_anchor,
    "parse_apsara": parse.parse_apsara,
    "parse_json_typed": parse.parse_json_typed,
    "add_fields": enrich.add_fields,
    "add_tags": enrich.add_tags,
    "rename": enrich.rename,
    "string_replace": enrich.string_replace,
    "desensitize": enrich.desensitize,
    "md5": enrich.md5_field,
    "base64_encode": enrich.base64_encode,
    "base64_decode": enrich.base64_decode,
    "pack_json": enrich.pack_json,
    "appender": enrich.appender,
    "drop": enrich.drop_keys,
    "drop_last_key": enrich.drop_last_key,
    "pick": enrich.pick_keys,
    "encrypt": enrich.encrypt_fields,
    "decrypt": enrich.decrypt_fields,
    "log_to_metric": enrich.log_to_metric,
    "cloud_meta": geo.cloud_meta_tags,
    "filter_regex": flt.filter_regex,
    "filter_key_regex": flt.filter_key_regex,
    "filter_expression": flt.filter_expression,
    "fields_with_condition": flt.fields_with_condition,
    "rate_limit": flt.rate_limit,
    "stable_order": agg_ops.stable_order,
    "pack_groups": agg_ops.pack_groups,
    "shard_repartition": agg_ops.shard_repartition,
}

# curation-stage processors (SURVEY §2.11 additions): the text-quality
# ops whose signatures are (df, **params) compose into specs the same
# way the log processors do — a config-driven pipeline can score,
# redact, and tag documents inline with parsing/routing.
def _register_curation() -> None:
    from .operators import text as _text

    PROCESSORS.update(
        {
            "token_stats": _text.token_stats,
            "quality_signals": _text.quality_signals,
            "quality_score": _text.quality_classifier_score,
            "language_id": _text.language_id,
            "fingerprint": _text.fingerprint,
            "pii_redact": _text.pii_redact,
        }
    )


_register_curation()


def register_processor(name: str, fn: ProcessorFn) -> None:
    """Extension point (the reference's plugin registration)."""
    PROCESSORS[name] = fn


class Pipeline:
    """Assembled pipeline: config → one DataFrame DAG."""

    def __init__(
        self,
        spec: dict[str, Any],
        dims: dict[str, DataFrame] | None = None,
    ):
        self.spec = spec
        self.dims = dims or {}

    def apply_processors(self, df: DataFrame) -> DataFrame:
        for p in self.spec.get("processors", []):
            p = dict(p)
            typ = p.pop("type")
            if typ == "dict_map":
                dim = self.dims[p.pop("dim")]
                df = enrich.dict_map(df, dim, **p)
            elif typ == "geoip":
                # dim-requiring like dict_map: the geo range table is a
                # named dim (processor_geoip's mmdb analog, geo.py)
                dim = self.dims[p.pop("dim")]
                df = geo.geoip_enrich(df, p.pop("source_key"), dim, **p)
            else:
                df = PROCESSORS[typ](df, **p)
        return df

    def route(self, df: DataFrame) -> DataFrame:
        r = self.spec.get("router")
        if not r:
            return df
        cfg = rt.RouterConfig(
            source_key=r["source_key"],
            rules=[rt.RouterRule(x["regex"], x["sink"]) for x in r.get("rules", [])],
            default_sink=r.get("default_sink", "sink_default"),
            drop_dismatch=r.get("drop_dismatch", False),
            unconditional_sinks=r.get("unconditional_sinks", []),
            tag_copy_sinks=[tuple(t) for t in r.get("tag_copy_sinks", [])],
        )
        return rt.route(df, cfg)

    def run(self, df: DataFrame) -> DataFrame:
        """processors → router; returns the routed DataFrame (one
        logical plan, no actions)."""
        return self.route(self.apply_processors(df))

    def aggregates(self, routed: DataFrame) -> dict[str, DataFrame]:
        """Build the spec's ``aggregates`` section over the routed
        output: ``[{"name": ..., "type": "group_count"|"per_conversation_stats"|
        "sessionize_counts", ...params}]`` → named aggregate DataFrames
        (the derived verification aggregates of SURVEY.md §2.6)."""
        out: dict[str, DataFrame] = {}
        for spec in self.spec.get("aggregates", []):
            spec = dict(spec)
            typ = spec.pop("type")
            name = spec.pop("name", typ)
            if name in out:
                # two unnamed entries of one type would silently
                # overwrite each other (name defaults to the type)
                raise ValueError(
                    f"duplicate aggregate name {name!r}; give each "
                    "same-type entry an explicit 'name'"
                )
            if typ == "group_count":
                out[name] = agg_ops.group_count(routed, **spec)
            elif typ == "per_conversation_stats":
                out[name] = agg_ops.per_conversation_stats(routed, **spec)
            elif typ == "sessionize_counts":
                from pyspark.sql import functions as _F

                keys = spec.pop("key_cols", ["conv_id"])
                s = agg_ops.sessionize(routed, keys, **spec)
                out[name] = s.groupBy(*keys, "session_id").agg(
                    _F.count("*").alias("n_events")
                )
            else:
                raise KeyError(f"unknown aggregate type {typ!r}")
        return out

    def run_and_write(
        self,
        df: DataFrame,
        base_path: str,
        metrics=None,
        spark: SparkSession | None = None,
        metrics_path: str | None = None,
        mode: str = "append",
    ) -> DataFrame:
        """Run + fan-out write with metrics collected via the
        ``Observation`` API — rows-in/rows-out are computed DURING the
        single write job (observe() piggybacks aggregates on the
        action), not by extra count() jobs that would re-execute the
        whole pipeline (3× total compute at scale)."""
        import time as _time

        from pyspark.sql import Observation

        routed_probe = self.spec.get("router")
        if routed_probe is None:
            raise ValueError(
                "run_and_write needs a 'router' section in the spec "
                "(fanout_write partitions by the 'sink' column the "
                "router adds); use run() + your own writer for "
                "unrouted pipelines"
            )
        if metrics is not None:
            obs_in = Observation()
            obs_out = Observation()
            df = df.observe(obs_in, F.count(F.lit(1)).alias("n"))
            routed = self.run(df).observe(obs_out, F.count(F.lit(1)).alias("n"))
            t0 = _time.monotonic()
            rt.fanout_write(routed, base_path, mode=mode)
            metrics.add(
                "pipeline",
                obs_in.get["n"],
                obs_out.get["n"],
                round(_time.monotonic() - t0, 3),
            )
            if metrics_path and spark is not None:
                metrics.write(spark, metrics_path)
            return routed
        routed = self.run(df)
        rt.fanout_write(routed, base_path, mode=mode)
        return routed
