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

__all__ = ["mask_log_line", "log_templates"]

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
