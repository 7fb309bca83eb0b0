"""Log template mining: collapse raw log lines into their constant
"templates" by masking variable fields — the log-clustering step every
log platform runs after collection (Drain / Spell literature; the
reference collects the lines, this operator organizes them).

The masking here is the deterministic rule-based core shared by those
systems' preprocessing stage: variable tokens (IPv4s, long hex ids,
numbers) become placeholders, and lines with equal masked forms are one
template.  A full Drain parse tree adds prefix-token clustering on top;
for machine-generated logs (the overwhelming bulk at collector scale)
the masked form alone already collapses millions of lines to hundreds
of templates.

Scale design: masking is a fixed chain of JVM ``regexp_replace`` —
pure per-row codegen, no Python; the template table is ONE count
aggregate with map-side partial aggregation (hot templates collapse
per map task, the shuffle carries distinct templates).  Example lines
ride the same aggregate as ``min`` — no second scan, no window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "mask_log_line",
    "log_templates",
    "template_drift",
    "cohort_retention",
]

# ordered masking rules: most specific first (an IPv4 is digits+dots —
# masking numbers first would shred it)
_RULES: list[tuple[str, str]] = [
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b[0-9a-fA-F]{8,}\b", "<HEX>"),
    # no trailing \b: "3.5ms" → "<NUM>ms"; the leading \b still keeps
    # embedded digits ("v2", "sha1") intact as template constants
    (r"\b\d+(?:\.\d+)?", "<NUM>"),
]


def mask_log_line(col: Column) -> Column:
    """Mask variable fields of a log line: IPv4 → ``<IP>``, ≥8-char hex
    runs → ``<HEX>``, numbers (int/decimal) → ``<NUM>``; whitespace
    collapsed.  Order matters and is part of the contract."""
    out = col
    for pat, repl in _RULES:
        out = F.regexp_replace(out, pat, repl)
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def log_templates(
    df: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Template table of a log corpus: one row per distinct masked
    form — ``(template, n_logs, example)`` where ``example`` is the
    lexicographically-smallest raw line of the template (deterministic
    representative).  Filter with *min_count* to drop the long tail of
    near-unique lines (at collector scale those are usually stack
    traces and junk, mined separately)."""
    return (
        df.select(
            mask_log_line(F.col(text_col)).alias("template"),
            F.col(text_col).alias("__raw"),
        )
        .groupBy("template")
        .agg(
            F.count("*").alias("n_logs"),
            F.min("__raw").alias("example"),
        )
        .filter(F.col("n_logs") >= min_count)
    )


def template_drift(
    df: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    min_count: int = 5,
) -> DataFrame:
    """Template-frequency drift between the early and late half of the
    corpus time range — the anomaly signal log platforms alarm on (a
    template that explodes or vanishes mid-window means a deploy or an
    incident, not organic traffic).

    The corpus is split at the midpoint of ``[min(ts), max(ts)]``
    (integer µs midpoint, ``2·t ≤ min+max`` so no division is ever
    evaluated — both engines compare exact integers). Per template:
    early/late counts and ``drift = late_share − early_share`` at 6 dp,
    where the shares normalize by the half's total line count.

    Scale shape: the masking chain is per-row codegen; the time bounds
    are ONE one-row aggregate broadcast back over the scan (the
    one-row-totals pattern); the template rollup is a single groupBy
    with map-side partials carrying one cell per (template, half) per
    task. Nothing shuffles raw lines.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    masked = df.select(
        mask_log_line(F.col(text_col)).alias("template"),
        us.alias("__us"),
    )
    bounds = masked.agg(
        F.min("__us").alias("__mn"), F.max("__us").alias("__mx")
    )
    halved = masked.join(F.broadcast(bounds)).select(
        "template",
        (F.col("__us") * F.lit(2) <= F.col("__mn") + F.col("__mx")).alias(
            "__early"
        ),
    )
    per = halved.groupBy("template").agg(
        F.sum(F.when(F.col("__early"), 1).otherwise(0)).alias("n_early"),
        F.sum(F.when(F.col("__early"), 0).otherwise(1)).alias("n_late"),
    )
    tot = per.agg(
        F.sum("n_early").alias("__te"), F.sum("n_late").alias("__tl")
    )
    return (
        per.join(F.broadcast(tot))
        .filter(F.col("n_early") + F.col("n_late") >= min_count)
        .select(
            "template",
            "n_early",
            "n_late",
            # + 0.0 folds IEEE -0.0 into 0.0 so cross-engine repr/hash
            # comparisons can't split on the zero sign
            (
                F.round(
                    F.col("n_late") / F.greatest(F.col("__tl"), F.lit(1))
                    - F.col("n_early") / F.greatest(F.col("__te"), F.lit(1)),
                    6,
                )
                + F.lit(0.0)
            ).alias("drift"),
        )
    )


def cohort_retention(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention over an event stream: cohort = the calendar day
    a user was first seen; per (cohort_day, offset_days) cell, how many
    cohort users were active that many days later and how many events
    they produced — the classic activation/retention triangle.

    Scale shape: both inputs to the join are PRE-REDUCED aggregates
    with map-side partials (one row per user; one per user-day), never
    raw events — at small scale the user table broadcasts, at scale AQE
    falls back to a user-co-partitioned merge join of the two reduced
    tables. The rollup needs NO distinct expansion: a user's day maps
    to exactly one (cohort_day, offset) cell and act is unique per
    (user, day), so ``count(*)`` IS the distinct user count —
    structural uniqueness replaces countDistinct's extra exchange.
    The final aggregate reduces to at most |days|² cells.
    """
    first = df.groupBy(user_col).agg(
        F.to_date(F.min(ts_col)).alias("cohort_day")
    )
    act = (
        df.select(F.col(user_col), F.to_date(F.col(ts_col)).alias("__day"))
        .groupBy(user_col, "__day")
        .agg(F.count("*").alias("__n"))
    )
    return (
        act.join(first, user_col)
        .groupBy(
            "cohort_day",
            F.datediff("__day", "cohort_day").cast("bigint").alias("offset_days"),
        )
        .agg(
            F.count("*").alias("n_users"),
            F.sum("__n").alias("n_events"),
        )
    )
