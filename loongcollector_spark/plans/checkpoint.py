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
``unit=<id>`` subdirectories, so a kill-and-rerun yields byte-identical
final state to a clean single run (the reference's at-least-once +
idempotent-commit contract; Iceberg snapshot commits play this role
on a real deployment, parquet directories play it here).
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["CheckpointedRun", "unit_of", "run_with_checkpoint"]

LINEAGE_SCHEMA = "job_id string, unit_id int, status string, rows_out long"


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

    def committed_units(self) -> set[int]:
        out = set()
        for f in os.listdir(self.dir):
            if f.endswith(".json"):
                with open(os.path.join(self.dir, f)) as fh:
                    rec = json.load(fh)
                # match on the stored job_id field, not the filename
                # prefix: job 'run' must not see 'run_2's units
                if rec.get("job_id") == self.job_id and rec.get("status") == "committed":
                    out.add(rec["unit_id"])
        return out

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

    def lineage(self) -> DataFrame:
        rows = []
        for f in sorted(os.listdir(self.dir)):
            if f.endswith(".json"):
                with open(os.path.join(self.dir, f)) as fh:
                    rec = json.load(fh)
                if rec.get("job_id") == self.job_id:
                    rows.append(rec)
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
    """Process work units not yet committed; append each unit's output
    under ``unit=<id>`` then atomically record lineage. Rerun-safe:
    committed units are skipped (no duplicates), uncommitted partial
    writes are overwritten by the rerun (overwrite-per-unit-dir =
    idempotent commit).

    ``fail_after_units`` injects a crash for tests (simulating the
    reference's kill-and-resume e2e scenarios).
    """
    ck = CheckpointedRun(spark, lineage_dir, job_id)
    done = ck.committed_units()
    tagged = df.withColumn("__unit", unit_of(F.col(conv_col), n_units))
    processed = 0
    for unit in range(n_units):
        if unit in done:
            continue
        part = tagged.filter(F.col("__unit") == unit).drop("__unit")
        out = transform(part)
        path = os.path.join(out_dir, f"unit={unit}")
        out.write.mode("overwrite").parquet(path)
        rows = spark.read.parquet(path).count()
        ck.commit(unit, rows)
        processed += 1
        if fail_after_units is not None and processed >= fail_after_units:
            raise RuntimeError(f"injected failure after {processed} units")
    result = spark.read.parquet(out_dir)
    # the unit=<id> directory layout surfaces as a partition column;
    # drop it so checkpointed and direct runs share one output schema
    return result.drop("unit") if "unit" in result.columns else result
