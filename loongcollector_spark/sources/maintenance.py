"""Sink-table maintenance: small-file compaction and range layout
rewrite.

A streaming fan-out writer (route.fanout_write / streaming micro-
batches) commits a few files per sink per trigger; after a day that is
tens of thousands of kilobyte-sized parquet files per sink, and every
downstream scan pays one open + footer read per file — at 100 TB the
NameNode/object-store listing alone dominates.  The fix is periodic
compaction: rewrite each sink partition into ~target-sized files, and
while rewriting, lay rows out by the hot filter column so parquet
min/max row-group stats prune scans.

On an Iceberg runtime this job is ``rewrite_data_files`` (snapshot-
atomic); this module is the parquet-directory equivalent for the
fallback layout sinks.py writes, with the same contract surfaced:
stage → validate → swap.  Each RENAME is atomic on HDFS/POSIX but the
two-rename swap as a whole is not: a crash between them leaves *path*
absent with the data intact at ``<path>__old`` (recover by renaming it
back) — data is never destroyed before the swap completes.  Object
stores lack atomic rename entirely; production on S3 uses the Iceberg
path.  The gate test in tests/ proves the fallback preserves rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["sink_file_stats", "compact_parquet", "optimize_layout"]


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def sink_file_stats(spark: SparkSession, path: str) -> dict:
    """Data-file census of a sink directory (recursive, via the Hadoop
    FileSystem API so it works on HDFS/S3A, not just local):
    ``{n_files, total_bytes, max_bytes, min_bytes}`` over non-hidden
    data files."""
    fs, hpath, _ = _fs_and_path(spark, path)
    it = fs.listFiles(hpath, True)
    n = total = 0
    mx, mn = 0, None
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        size = st.getLen()
        n += 1
        total += size
        mx = max(mx, size)
        mn = size if mn is None else min(mn, size)
    return {
        "n_files": n,
        "total_bytes": total,
        "max_bytes": mx,
        "min_bytes": mn or 0,
    }


def plan_target_files(total_bytes: int, target_mb: int = 128) -> int:
    """Files needed to hold *total_bytes* at ~*target_mb* each (≥1)."""
    return max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))


def compact_parquet(
    spark: SparkSession,
    path: str,
    *,
    target_mb: int = 128,
    partition_col: str | None = None,
    sort_col: str | None = None,
) -> dict:
    """Rewrite the parquet directory at *path* into ~*target_mb* files.

    Stage → validate → swap: the rewrite lands in ``<path>__staged``,
    row counts are compared (the ONLY safe moment to destroy the
    original), then the directories are renamed.  With *partition_col*
    the hive layout (``col=value`` dirs) is preserved and each
    partition is compacted independently (one ``repartition`` on the
    partition column — files never mix partitions).  With *sort_col*
    rows are range-laid-out and sorted within files so min/max stats
    prune later scans (see :func:`optimize_layout`).

    Returns ``{before: stats, after: stats, n_rows}``.
    """
    fs, hpath, jvm = _fs_and_path(spark, path)
    backup = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__old")
    # crash recovery: a previous run may have died inside the swap.
    # path present + backup present → the swap completed and only the
    # backup delete was lost: clear the stale backup (it would make
    # every later stage-out rename fail, or nest dirs on HDFS).
    # path ABSENT + backup present → died between the two renames:
    # restore the backup first (the docstring's documented recovery).
    if fs.exists(backup):
        if fs.exists(hpath):
            fs.delete(backup, True)
        elif not fs.rename(backup, hpath):
            raise RuntimeError(
                f"compact_parquet: could not restore {path} from backup"
            )
    # hive-layout guard: reading a col=value tree without partition_col
    # would FLATTEN the layout (the partition column becomes a data
    # column, every partition path breaks) — and the row-count
    # validation cannot catch it. Refuse instead.
    if partition_col is None:
        it = fs.listStatus(hpath)
        for st in it:
            name = st.getPath().getName()
            if st.isDirectory() and "=" in name and not name.startswith("_"):
                raise ValueError(
                    f"compact_parquet: {path} is hive-partitioned "
                    f"(found {name!r}); pass partition_col="
                    f"{name.split('=')[0]!r} or the layout would be "
                    "flattened"
                )
    before = sink_file_stats(spark, path)
    n_files = plan_target_files(before["total_bytes"], target_mb)
    df = spark.read.parquet(path)

    staged = path.rstrip("/") + "__staged"
    # source row count piggybacks on the rewrite job via Observation
    # (the checkpoint.py convention) — no dedicated count() scan; the
    # staged read-back below is the independent verification read
    from pyspark.sql import Observation

    obs = Observation()
    writer_df = optimize_layout(
        df.observe(obs, F.count(F.lit(1)).alias("n")),
        sort_col=sort_col,
        n_files=n_files,
        partition_col=partition_col,
    )
    w = writer_df.write.mode("overwrite")
    if partition_col:
        w = w.partitionBy(partition_col)
    w.parquet(staged)
    n_rows = obs.get["n"]

    got = spark.read.parquet(staged).count()
    if got != n_rows:
        # drop the bad staging dir so a retry doesn't trip over it
        fs.delete(jvm.org.apache.hadoop.fs.Path(staged), True)
        raise RuntimeError(
            f"compact_parquet: staged rewrite had {got} rows, "
            f"expected {n_rows}; original left untouched at {path}, "
            "staging removed"
        )
    staged_p = jvm.org.apache.hadoop.fs.Path(staged)
    if not fs.rename(hpath, backup):
        raise RuntimeError(f"compact_parquet: could not stage-out {path}")
    if not fs.rename(staged_p, hpath):
        # roll back
        fs.rename(backup, hpath)
        raise RuntimeError(f"compact_parquet: swap failed; {path} restored")
    fs.delete(backup, True)
    after = sink_file_stats(spark, path)
    return {"before": before, "after": after, "n_rows": n_rows}


def optimize_layout(
    df: DataFrame,
    *,
    sort_col: str | None = None,
    n_files: int = 1,
    partition_col: str | None = None,
) -> DataFrame:
    """Shape *df* for writing: range-partition on *sort_col* into
    *n_files* output tasks and sort within each, so every parquet file
    covers a narrow *sort_col* range and row-group min/max stats let
    later scans skip whole files (the poor man's liquid clustering —
    one ``repartitionByRange`` + ``sortWithinPartitions``, no extra
    shuffle beyond the one any rewrite pays).  Without *sort_col*,
    a plain even ``repartition`` (optionally keyed on *partition_col*
    so hive-partitioned writes emit one file per partition value per
    task instead of |tasks|×|partitions| slivers)."""
    if sort_col:
        out = df.repartitionByRange(n_files, F.col(sort_col))
        keys = ([partition_col] if partition_col else []) + [sort_col]
        return out.sortWithinPartitions(*keys)
    if partition_col:
        return df.repartition(n_files, F.col(partition_col))
    return df.repartition(n_files)
