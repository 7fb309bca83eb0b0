"""Single-pass table profiling: per-column row/null/distinct counts and
min/max — the data-quality summary a pipeline runs over every new batch
of training data before it is allowed into the mix (schema drift, null
explosions, truncated ranges, cardinality collapse all show up here
first).

Scale design: ONE aggregation over the table computes every statistic
for every profiled column simultaneously (no per-column scan).  In
``distinct_mode='exact'`` the multi-column ``COUNT(DISTINCT)`` plans
through Spark's Expand (input × #distinct-aggs before the shuffle) —
exact, value-checkable against DuckDB, right for the correctness gate;
``distinct_mode='approx'`` swaps in ``approx_count_distinct`` (HLL++,
single pass, no Expand) — the 100 TB default, same column contract.
The wide one-row result is unpivoted driver-free with ``stack``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["profile_table"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    distinct_mode: str = "exact",
) -> DataFrame:
    """Profile *columns* (default: all) of *df* in one aggregation.

    Returns one row per column:
    ``(column_name, dtype, n_rows, n_nulls, null_frac, n_distinct,
    min_num, max_num, min_str, max_str)`` — ``min_num``/``max_num``
    carry numeric and timestamp ranges (timestamps as epoch
    microseconds, doubles rounded 9 dp; ``0.0`` for non-numeric
    columns), ``min_str``/``max_str`` carry string ranges (``''`` for
    non-string columns).  The sentinels keep every output column
    non-null so multiset comparison never mixes NULL with values.
    """
    if distinct_mode not in ("exact", "approx"):
        raise ValueError("profile_table: distinct_mode must be exact|approx")
    fields = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = [f.name for f in df.schema.fields]
    missing = [c for c in columns if c not in fields]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        dt = fields[c]
        col = F.col(c)
        aggs.append(
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nn_{c}")
        )
        if distinct_mode == "exact":
            aggs.append(F.countDistinct(col).alias(f"__nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(col).alias(f"__nd_{c}"))
        if isinstance(dt, _NUMERIC):
            num = col.cast("double")
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            num = F.unix_micros(col.cast("timestamp")).cast("double")
        else:
            num = F.lit(None).cast("double")
        aggs.append(F.round(F.min(num), 9).alias(f"__mn_{c}"))
        aggs.append(F.round(F.max(num), 9).alias(f"__mx_{c}"))
        s = col.cast("string") if isinstance(dt, T.StringType) else F.lit(None)
        aggs.append(F.min(s).alias(f"__ms_{c}"))
        aggs.append(F.max(s).alias(f"__xs_{c}"))

    wide = df.agg(*aggs)

    cells = []
    for c in columns:
        dtype = fields[c].simpleString().replace("'", "''")
        name = c.replace("'", "''")
        cells.append(
            f"'{name}', '{dtype}', __n, __nn_{c}, "
            f"CASE WHEN __n > 0 THEN round(__nn_{c} / CAST(__n AS DOUBLE), 9) "
            f"ELSE 0.0 END, __nd_{c}, "
            f"coalesce(__mn_{c}, 0.0), coalesce(__mx_{c}, 0.0), "
            f"coalesce(__ms_{c}, ''), coalesce(__xs_{c}, '')"
        )
    stack = (
        f"stack({len(columns)}, {', '.join(cells)}) AS "
        "(column_name, dtype, n_rows, n_nulls, null_frac, n_distinct, "
        "min_num, max_num, min_str, max_str)"
    )
    return wide.select(F.expr(stack))
