"""Temporal join operators.

Training-data and telemetry pipelines constantly need "the most recent
dimension row as of this event's timestamp" (slowly-changing feature
lookups, error→last-deploy attribution, turn→latest-tool-version
joins). Spark has no native as-of join; the scale-correct composition
is the union trick below — NOT a range self-join (quadratic per key)
and NOT a Python loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["asof_join", "interval_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: list[str] | tuple[str, ...] = ("user_id",),
    suffix: str = "_right",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward as-of join: for every *left* row, attach the *right*
    row with the greatest ``on`` value ``<=`` the left's ``on``, within
    the same ``by`` key (pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
    semantics, match inclusive of equal timestamps). Left rows with no
    prior right row keep NULL right columns — left join semantics.

    Right-side columns (except ``by``) come back suffixed with
    *suffix*; the right's own ``on`` column is ``{on}{suffix}``.
    ``tolerance_us`` optionally voids matches older than that many
    microseconds (pandas ``tolerance`` analog); timestamps are compared
    as exact integer microseconds.

    Scale design: both inputs are tagged and unioned, then ONE window
    (``partitionBy(by) orderBy(on, side)``) carries the latest right
    payload forward with ``last(ignorenulls)`` — a running state pass,
    one shuffle on *by*, linear per key. The equivalent range
    self-join explodes quadratically on hot keys, and per-key
    ``collect`` doesn't distribute at all. Right rows sort BEFORE left
    rows at equal timestamps (side 0 < 1), which is exactly the
    inclusive-match rule. Ties among right rows at identical
    ``(by, on)`` are broken arbitrarily (same as DuckDB ASOF JOIN) —
    disambiguate upstream if such duplicates exist.
    """
    by = list(by)
    lcols = [c for c in left.columns if c not in by]
    rcols = [c for c in right.columns if c not in by]
    if on not in lcols or on not in rcols:
        raise ValueError(f"'on' column {on!r} must exist in both sides")
    r_struct = T.StructType([right.schema[c] for c in rcols])
    l_struct = T.StructType([left.schema[c] for c in lcols])
    l2 = left.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(r_struct).alias("__r"),
    )
    r2 = right.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_struct).alias("__l"),
        F.struct(*rcols).alias("__r"),
    )
    w = (
        W.partitionBy(*by)
        .orderBy("__t", "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    u = l2.unionByName(r2).withColumn(
        "__m", F.last("__r", ignorenulls=True).over(w)
    )
    m = F.col("__m")
    if tolerance_us is not None:
        # exact integer-microsecond age for timestamp 'on' columns
        # (NTZ casts through TIMESTAMP). A NUMERIC 'on' column must
        # NOT take that path: cast('timestamp') reads a long as epoch
        # SECONDS, inflating the age 1e6× (or overflowing) and
        # silently voiding every match — numeric columns compare in
        # their own units, with tolerance_us interpreted likewise
        # (the caller owns the unit of a numeric axis).
        on_type = left.schema[on].dataType.typeName()
        if on_type in ("long", "integer", "short", "byte", "double", "float", "decimal"):
            age = F.col("__t") - m[on]
        else:
            age = F.unix_micros(F.col("__t").cast("timestamp")) - F.unix_micros(
                m[on].cast("timestamp")
            )
        m = F.when(age <= F.lit(int(tolerance_us)), F.col("__m"))
    out = u.filter(F.col("__side") == 1).select(
        *by,
        *[F.col("__l")[c].alias(c) for c in lcols],
        *[m[c].alias(f"{c}{suffix}") for c in rcols],
    )
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: list[str] | tuple[str, ...] = ("user_id",),
    left_start: str = "start_us",
    left_end: str = "end_us",
    right_start: str = "start_us",
    right_end: str = "end_us",
    suffix: str = "_right",
    grid_us: int = 3_600_000_000,
) -> DataFrame:
    """Interval-overlap join: every (left, right) pair within the same
    *by* key whose CLOSED intervals ``[start, end]`` (integer
    microseconds) overlap — ``l.start <= r.end AND r.start <= l.end``.
    The sessions×incidents / spans×deploys primitive.

    Scale shape: a naive inequality join is a per-key cross product
    (quadratic on hot keys, and Catalyst can only nested-loop it).
    Instead both sides explode to the ``grid_us``-sized time cells
    their interval touches and equi-join on ``(by, cell)`` — the
    standard grid-bucketing used by Flink's interval join: candidates
    are pairs sharing a cell and the exact overlap predicate filters
    them. Multi-cell double-matches are removed by a PER-ROW predicate,
    not a dedup: each overlapping pair's shared cells form the
    contiguous range [max(⌊l.start/g⌋, ⌊r.start/g⌋), min(⌊l.end/g⌋,
    ⌊r.end/g⌋)], so keeping a pair only in its FIRST shared cell
    (``__cell == greatest(⌊l.start/g⌋, ⌊r.start/g⌋)``) emits it exactly
    once with no extra exchange — and, unlike an output-wide
    ``dropDuplicates``, preserves inner-join multiplicity when either
    input legitimately contains duplicate rows. Shuffle is hash on
    (key, cell) — time-sliced, so a hot key spreads over its active
    cells instead of one partition. Size *grid_us* near the typical
    interval length: too small explodes cell rows (an interval touches
    end/grid − start/grid + 1 cells), too large degrades toward per-key
    cross products within a cell.

    Right-side columns (except *by*) come back suffixed with *suffix*.
    Rows with NULL bounds never match (dropped — a NULL interval has
    no extent). Inner join semantics.
    """
    by = list(by)

    def cells(df, s, e, side):
        good = df.filter(
            F.col(s).isNotNull() & F.col(e).isNotNull() & (F.col(s) <= F.col(e))
        )
        return good.withColumn(
            side,
            F.explode(
                F.sequence(
                    (F.col(s) / grid_us).cast("long"),
                    (F.col(e) / grid_us).cast("long"),
                )
            ),
        )

    l = cells(left, left_start, left_end, "__cell")
    r = cells(right, right_start, right_end, "__cell")
    for c in r.columns:
        if c not in by and c != "__cell":
            r = r.withColumnRenamed(c, f"{c}{suffix}")
    rs, re_ = f"{right_start}{suffix}", f"{right_end}{suffix}"

    # First shared cell MUST use the same long-cast expression the
    # explode used, so the equality lands on an emitted cell value.
    first_shared = F.greatest(
        (F.col(left_start) / grid_us).cast("long"),
        (F.col(rs) / grid_us).cast("long"),
    )
    joined = l.join(r, by + ["__cell"]).filter(
        (F.col(left_start) <= F.col(re_))
        & (F.col(rs) <= F.col(left_end))
        & (F.col("__cell") == first_shared)
    )
    return joined.drop("__cell")
