"""Corpus snapshot diff: classify every document as added / removed /
changed / unchanged between two corpus versions.

The incremental-ingestion primitive: a training-data pipeline re-runs
over a corpus that mostly didn't change, and the delta drives what to
re-process (re-dedup, re-score, re-pack) — at 100 TB you re-run the
pipeline over ``added + changed`` only, not the corpus.

Content equality is by fingerprint (xxhash64 or the engine-portable
md5 kernel), so the full-outer join shuffles ``(id, 8-byte hash)``
rows, never document text. One shuffle per side, hash-joined on id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _md5_long

__all__ = ["corpus_delta", "delta_summary"]


def _fp(text_col, hash_mode: str):
    c = F.coalesce(F.col(text_col), F.lit(""))
    return _md5_long(c) if hash_mode == "md5" else F.xxhash64(c)


def corpus_delta(
    old: DataFrame,
    new: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """One row per id present in either snapshot:
    ``(id_col, status)`` with status ∈ {'added','removed','changed',
    'unchanged'}. NULL text hashes as empty string (a doc whose text
    became NULL reads as changed, not as a join miss). *id_col* must
    be unique within each snapshot (the full-outer join multiplies
    duplicate keys)."""
    o = old.select(F.col(id_col), _fp(text_col, hash_mode).alias("__old_fp"))
    n = new.select(F.col(id_col), _fp(text_col, hash_mode).alias("__new_fp"))
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("__old_fp").isNull(), "added")
        .when(F.col("__new_fp").isNull(), "removed")
        .when(F.col("__old_fp") == F.col("__new_fp"), "unchanged")
        .otherwise("changed")
    )
    return j.select(F.col(id_col), status.alias("status"))


def delta_summary(
    old: DataFrame,
    new: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Per-status counts of :func:`corpus_delta` — the four-row report
    an incremental pipeline logs per run."""
    return (
        corpus_delta(
            old, new, id_col=id_col, text_col=text_col, hash_mode=hash_mode
        )
        .groupBy("status")
        .agg(F.count("*").alias("n_docs"))
    )
