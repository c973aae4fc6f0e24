"""Temporal joins Spark lacks as built-ins (BASELINE extension; the
classic examples of operators composed from existing DataFrame
primitives rather than custom physical operators).

- ``as_of_join``: for each left row, the latest right row with
  ``right.ts <= left.ts`` per key (backward as-of). Implemented with
  the union + carry-forward-window trick: tag both sides, sort by
  (key, ts, side) inside a single window partitioned by key, and
  ``last(value, ignorenulls)`` carries the most recent right value to
  each left row. ONE shuffle on the key — same exchange a sort-merge
  join would pay, no range explosion, no per-row lookups. (DuckDB's
  native ASOF JOIN is the oracle spelling.)

- ``range_join``: key equality + a timestamp-band predicate. Spark
  plans the equi part as a hash/SMJ join and applies the band as a
  post-join filter — correct at scale as long as the band is narrow
  relative to the key cardinality (each key's rows meet anyway).

Scale notes: as_of_join's window holds one partition's rows per key in
sort order — skewed keys salt poorly here (carry-forward crosses salt
boundaries), so extreme-skew timelines should pre-bucket by (key,
coarse time) with boundary duplication instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    *,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join (inclusive: a right row at exactly
    ``left_ts`` matches). Left rows with no prior right row keep
    nulls. ``value_cols`` are the right-side columns carried forward.

    Right rows must be unique per (key, right_ts) for deterministic
    results — pre-aggregate ties before calling (the oracle has the
    same requirement).
    """
    extra = [c for c in left.columns if c not in (key, left_ts)]
    lt = left.select(
        F.col(key),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in value_cols],
        *[F.col(c) for c in extra],
    )
    rt = right.select(
        F.col(key),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in extra],
    )
    # right rows sort BEFORE left rows at equal timestamps, so an
    # exactly-simultaneous right row is visible to the left row
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__t"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lt.unionByName(rt)
    for c in value_cols:
        carried = carried.withColumn(
            f"{c}{suffix}", F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w)
        )
    return carried.filter(F.col("__is_left") == 1).drop("__is_left").withColumnRenamed(
        "__t", left_ts
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    right_ts: str,
    lower: Column,
    upper: Column,
) -> DataFrame:
    """Key-equality join restricted to ``lower <= right.ts <= upper``
    (band bounds are expressions over the left side). The equi
    component keeps the plan a hash/SMJ join — never a cartesian."""
    return left.join(
        right,
        (left[key] == right[key])
        & (right[right_ts] >= lower)
        & (right[right_ts] <= upper),
    ).drop(right[key])
