"""Shared spec/dims loading for the spark-submit entry points.

The pipeline spec is the engine's logical-plan config (the analog of
the reference's YAML pipeline files); both JSON and YAML forms are
accepted.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .sources.sinks import read_table

__all__ = ["load_spec", "load_dims"]


def load_spec(path: str) -> dict[str, Any]:
    with open(path) as fh:
        if path.endswith((".yaml", ".yml")):
            import yaml

            return yaml.safe_load(fh)
        return json.load(fh)


def load_dims(spark: SparkSession, path: str | None) -> dict[str, DataFrame]:
    """``{dim_name: table path/name}`` JSON file → DataFrames."""
    if not path:
        return {}
    with open(path) as fh:
        mapping = json.load(fh)
    return {
        name: read_table(spark, p)
        for name, p in mapping.items()
        if not name.startswith("__")
    }
