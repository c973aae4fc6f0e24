"""Column profiling / statistics collection (ANALYZE-style), a
training-data-pipeline utility with no reference analog (the closest
reference behavior is the per-rule quality counts,
breweries_data_quality_gold.py:28-33).

ALL requested columns profile in ONE single-pass aggregate (count,
null count, exact distinct, min, max per column) — the same
job-fusion discipline as operators/quality.py: a 100 TB table is
scanned once no matter how many columns are profiled. Results pivot
to long format plan-side with inline(), so the scan subplan appears
exactly once.

Scale note: exact count_distinct per column holds per-column hash
sets through the aggregation; at extreme cardinality switch
``exact_distinct=False`` for HLL-based approx_count_distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    exact_distinct: bool = True,
) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value) — min/max rendered as strings so
    heterogeneous column types stack in one long-format result."""
    cols = columns or df.columns
    aggs = []
    for i, c in enumerate(cols):
        col = F.col(c)
        distinct = (
            F.count_distinct(col) if exact_distinct else F.approx_count_distinct(col)
        )
        aggs += [
            F.count(F.lit(1)).alias(f"__n{i}"),
            F.coalesce(
                F.sum(F.when(col.isNull(), F.lit(1)).otherwise(F.lit(0))), F.lit(0)
            ).cast("long").alias(f"__z{i}"),
            distinct.cast("long").alias(f"__d{i}"),
            F.min(col).cast("string").alias(f"__mn{i}"),
            F.max(col).cast("string").alias(f"__mx{i}"),
        ]
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__n{i}").alias("n_rows"),
            F.col(f"__z{i}").alias("n_nulls"),
            F.col(f"__d{i}").alias("n_distinct"),
            F.col(f"__mn{i}").alias("min_value"),
            F.col(f"__mx{i}").alias("max_value"),
        )
        for i, c in enumerate(cols)
    ]
    return wide.select(F.inline(F.array(*structs)))
