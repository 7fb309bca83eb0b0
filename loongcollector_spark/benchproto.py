"""Shared pieces of the two-cluster-size scaling PROTOCOL.

Both harnesses — ``bench.py`` (in-process ``local-cluster`` sessions)
and ``jobs/submit_scaling.py`` (literal ``spark-submit --py-files``
children) — must measure under the *same* protocol or their E numbers
stop being comparable. The protocol constants live here, once:

* ``spark_home()`` — the executor/worker launcher scripts must come
  from THIS interpreter's pyspark, not a stray ``$SPARK_HOME``.
* ``SCALING_CONFS`` — fixed executor shape + fine scan splits (with
  the 128 MiB default a small input yields ~10 tasks and the larger
  cluster sits half idle: task starvation masquerading as poor
  scaling).
* ``pin_cpus()`` — the whole process tree is pinned to
  task-slots + 2 CPUs: the +2 grants the SAME absolute driver/worker
  headroom at both cluster sizes, so the ratio compares executor
  capacity, not driver contention.
"""

from __future__ import annotations

import os
import shutil

#: SparkSession confs every scaling measurement pins (executor shape
#: is applied separately via spark.executor.memory / the master URL).
SCALING_CONFS: dict[str, str] = {
    "spark.executor.memory": "2g",
    "spark.sql.adaptive.enabled": "true",
    "spark.ui.enabled": "false",
    "spark.sql.files.maxPartitionBytes": "4194304",
    "spark.sql.files.openCostInBytes": "1048576",
}


def spark_home() -> str:
    """This interpreter's pyspark installation (``local-cluster``
    spawns Worker/Executor JVMs via ``$SPARK_HOME``'s launcher
    scripts; an environment SPARK_HOME could point them at a
    different — or missing — Spark)."""
    return os.path.dirname(os.path.abspath(__import__("pyspark").__file__))


def pin_cpus(cmd: list[str], slots: int) -> list[str]:
    """Prefix *cmd* with a taskset pin to CPUs ``0..slots+1``
    (task-slots + 2) when taskset exists; unchanged otherwise."""
    if shutil.which("taskset"):
        return ["taskset", "-c", f"0-{slots + 1}"] + cmd
    return cmd
