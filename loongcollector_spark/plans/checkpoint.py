"""Checkpoint / lineage for idempotent resume.

Re-expresses the reference's exactly-once machinery on batch Spark:

* range checkpoints  — core/checkpoint/RangeCheckpoint.h:27-31
  (per-queue ``index`` + feedback key)
* KV checkpoint store — pluginmanager/checkpoint_manager.go:39-80
  (``SaveCheckpoint/GetCheckpoint`` keyed ``configName^key``)
* file read offsets   — core/checkpoint/CheckPointManager.h:40-53

Batch design: the input is split into deterministic **work units**
(hash buckets of ``conv_id`` — conversations never straddle units, so
a unit is complete or absent, never partial). A lineage table records
``(job_id, unit_id, status, rows_out)``; a rerun processes only units
not yet committed and appends their outputs. Unit outputs land under
``__lc_unit=<id>`` subdirectories, so a kill-and-rerun yields
byte-identical final state to a clean single run (the reference's
at-least-once + idempotent-commit contract; Iceberg snapshot commits
play this role on a real deployment, parquet directories play it here).

Scale shape: ALL uncommitted units are processed by ONE job — a single
input scan writing ``partitionBy(__lc_unit)`` with dynamic partition
overwrite, per-unit row counts piggybacked on the write via the
``Observation`` API, then one atomic lineage commit per produced unit
directory. (An earlier design looped driver-side over units, filtering
the full input once per unit plus a count() re-read per unit — ~O(units)
read amplification at 100 TB; this shape is O(1) scans per resume
attempt regardless of how many units remain.)
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

__all__ = ["CheckpointedRun", "unit_of", "run_with_checkpoint", "UNIT_COL"]

LINEAGE_SCHEMA = "job_id string, unit_id int, status string, rows_out long"

# partition/bookkeeping column; double-underscore + prefix so it cannot
# collide with a user output column (a previous revision used 'unit'
# and silently dropped any genuine output column of that name)
UNIT_COL = "__lc_unit"


def unit_of(conv_col, n_units: int):
    """Deterministic work-unit id: pmod(xxhash64(conv_id), n_units).
    Parallelism-independent — the same conversation always maps to the
    same unit."""
    return F.pmod(F.xxhash64(conv_col), F.lit(n_units)).cast("int")


class CheckpointedRun:
    """Lineage bookkeeping over a directory-backed table.

    Production swap-in: the lineage table becomes an Iceberg table and
    the per-unit output commit becomes an Iceberg transaction; the
    control flow is unchanged.
    """

    def __init__(self, spark: SparkSession, lineage_dir: str, job_id: str):
        self.spark = spark
        self.dir = lineage_dir
        self.job_id = job_id
        os.makedirs(lineage_dir, exist_ok=True)

    def _path(self, unit_id: int) -> str:
        return os.path.join(self.dir, f"{self.job_id}_{unit_id}.json")

    def _meta_path(self) -> str:
        return os.path.join(self.dir, f"{self.job_id}__meta.json")

    def ensure_meta(self, n_units: int, conv_col: str) -> None:
        """Record the unit topology on first run; refuse a resume whose
        topology differs — re-bucketing conversations across a
        different ``n_units`` (or key column) would silently duplicate
        or drop rows against already-committed units."""
        p = self._meta_path()
        if os.path.exists(p):
            with open(p) as fh:
                meta = json.load(fh)
            if meta["n_units"] != n_units or meta["conv_col"] != conv_col:
                raise ValueError(
                    f"checkpoint topology mismatch for job {self.job_id!r}: "
                    f"lineage was written with n_units={meta['n_units']} "
                    f"conv_col={meta['conv_col']!r}, resume requested "
                    f"n_units={n_units} conv_col={conv_col!r}"
                )
            return
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"job_id": self.job_id, "n_units": n_units,
                       "conv_col": conv_col}, fh)
        os.replace(tmp, p)

    def _records(self):
        """All of THIS job's lineage records (matched on the stored
        job_id field, not the filename prefix: job 'run' must not see
        'run_2's units), in stable filename order."""
        for f in sorted(os.listdir(self.dir)):
            if f.endswith(".json") and not f.endswith("__meta.json"):
                with open(os.path.join(self.dir, f)) as fh:
                    rec = json.load(fh)
                if rec.get("job_id") == self.job_id:
                    yield rec

    def committed_units(self) -> set[int]:
        return {
            r["unit_id"] for r in self._records() if r.get("status") == "committed"
        }

    def commit(self, unit_id: int, rows_out: int) -> None:
        tmp = self._path(unit_id) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "job_id": self.job_id,
                    "unit_id": unit_id,
                    "status": "committed",
                    "rows_out": rows_out,
                },
                fh,
            )
        os.replace(tmp, self._path(unit_id))  # atomic commit point

    def total_rows_committed(self) -> int:
        """Sum of committed per-unit output rows — lets callers report
        rows_out without re-reading the output table."""
        return sum(
            r.get("rows_out", 0)
            for r in self._records()
            if r.get("status") == "committed"
        )

    def lineage(self) -> DataFrame:
        rows = list(self._records())
        return self.spark.createDataFrame(rows, LINEAGE_SCHEMA) if rows else (
            self.spark.createDataFrame([], LINEAGE_SCHEMA)
        )


def run_with_checkpoint(
    spark: SparkSession,
    df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    *,
    out_dir: str,
    lineage_dir: str,
    job_id: str,
    conv_col: str = "conv_id",
    n_units: int = 8,
    fail_after_units: int | None = None,
) -> DataFrame:
    """Process all work units not yet committed in ONE input scan:
    filter to the uncommitted unit set, apply *transform*, write
    ``partitionBy(__lc_unit)`` with dynamic partition overwrite (only
    the attempted unit directories are replaced — committed ones are
    untouched, partial leftovers from a crash are overwritten), then
    atomically record lineage per produced unit with row counts taken
    from the write job itself (``Observation`` — no output re-read).
    Rerun-safe: committed units are skipped (no duplicates).

    *transform* must be unit-local — it may aggregate within a
    conversation but not across conversations (the same property that
    makes per-unit checkpointing restartable at all) — and its output
    must retain *conv_col* so rows can be attributed to their unit.

    ``fail_after_units`` injects a crash for tests (simulating the
    reference's kill-and-resume e2e scenarios): only the first k
    uncommitted units are attempted, committed, then the crash raises.
    """
    ck = CheckpointedRun(spark, lineage_dir, job_id)
    ck.ensure_meta(n_units, conv_col)
    done = ck.committed_units()
    todo = [u for u in range(n_units) if u not in done]
    attempt = todo if fail_after_units is None else todo[: fail_after_units]

    if attempt:
        if UNIT_COL in df.columns:
            raise ValueError(f"input already has a {UNIT_COL!r} column")
        # clear crash leftovers for attempted units up front: dynamic
        # overwrite only replaces partitions the new write produces, so
        # a unit whose rerun output is EMPTY would otherwise keep stale
        # partial files (Iceberg's transactional replace subsumes this
        # on a real deployment)
        import shutil

        for u in attempt:
            leftover = os.path.join(out_dir, f"{UNIT_COL}={u}")
            if os.path.exists(leftover):
                shutil.rmtree(leftover)
        part = df.filter(
            unit_of(F.col(conv_col), n_units).isin(attempt)
        )
        out = transform(part)
        if conv_col not in out.columns:
            raise ValueError(
                f"transform output lost {conv_col!r}; checkpointed "
                "transforms must retain the unit key column"
            )
        tagged = out.withColumn(UNIT_COL, unit_of(F.col(conv_col), n_units))
        obs = Observation()
        counted = tagged.observe(
            obs,
            *[
                F.coalesce(
                    F.sum((F.col(UNIT_COL) == u).cast("long")), F.lit(0)
                ).alias(f"u{u}")
                for u in attempt
            ],
        )
        # routed outputs nest sink under the unit partition so a
        # lineage-mode table keeps sink partition PRUNING for
        # read_sink consumers (unit-dir cleanup above removes nested
        # sink dirs with the unit, so retry semantics are unchanged)
        part_cols = [UNIT_COL] + (["sink"] if "sink" in out.columns else [])
        (
            counted.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*part_cols)
            .parquet(out_dir)
        )
        counts = obs.get
        for u in attempt:
            ck.commit(u, counts[f"u{u}"])
        if fail_after_units is not None and len(attempt) >= fail_after_units:
            raise RuntimeError(f"injected failure after {len(attempt)} units")

    try:
        result = spark.read.parquet(out_dir)
    except Exception:
        # an all-empty write leaves no schema-bearing parquet files
        # (dynamic partition overwrite writes nothing for empty
        # partitions); the committed lineage is still correct — return
        # an empty frame with the transform's schema. This also covers
        # RESUMING a fully-committed all-empty job (attempt == [], so
        # derive the schema plan-only from a zero-row slice) — but if
        # unit directories exist on disk, the failure is real
        # corruption, not emptiness: re-raise.
        has_units = os.path.isdir(out_dir) and any(
            name.startswith(f"{UNIT_COL}=") for name in os.listdir(out_dir)
        )
        if has_units:
            raise
        schema = out.schema if attempt else transform(df.limit(0)).schema
        return spark.createDataFrame([], schema)
    # the __lc_unit=<id> directory layout surfaces as a partition
    # column; drop it so checkpointed and direct runs share one schema
    return result.drop(UNIT_COL) if UNIT_COL in result.columns else result
