"""Aggregation operators (SURVEY.md §2.4 A1-A5, §2.5 U1).

``declarative_aggregate`` implements the reference's *declared* config
contract (configs/breweries_gold_pipeline.yml:41-51 — group_by list +
named metric exprs) which the reference's code never actually honours
(it hard-codes three groupBy-counts instead). ``union_views``
reproduces the reference's distinctive Gold output shape: heterogeneous
aggregate views stacked long-format with a discriminator column and
missing-columns-as-nulls (breweries_aggregate_gold_notebook.py:37-60).

Scale notes: groupBy compiles to partial (map-side) + final hash
aggregation — the shuffle moves only group keys × partial states, not
rows. The union is plan-level (no data movement). A rollup/cube/
grouping-sets over the same keys is usually cheaper than N separate
groupBys when the views share a scan; ``union_views`` exists for the
heterogeneous-keys case where they don't.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_count(
    df: DataFrame, keys: list[str], count_name: str = "total_count"
) -> DataFrame:
    """Group-by count (reference A1-A3,
    breweries_aggregate_gold_notebook.py:37-53)."""
    return df.groupBy(*keys).agg(F.count("*").alias(count_name))


def declarative_aggregate(
    df: DataFrame,
    group_by: list[str],
    metrics: list[dict[str, str]],
) -> DataFrame:
    """Compile a declarative aggregation spec to groupBy().agg().

    ``metrics``: ``[{name: ..., expr: "count(*)"}, ...]`` — SQL
    expressions compiled with F.expr so they run JVM-side inside the
    hash aggregate (reference A4 contract,
    configs/breweries_gold_pipeline.yml:41-51).
    """
    aggs = [F.expr(m["expr"]).alias(m["name"]) for m in metrics]
    if not aggs:
        raise ValueError("declarative aggregate requires at least one metric")
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


def union_views(
    views: dict[str, DataFrame],
    *,
    tag_column: str = "aggregation",
    stamp_column: str | None = "transformation_date",
    stamp_value: Any | None = None,
) -> DataFrame:
    """Stack heterogeneous aggregate views long-format (reference U1 +
    P2/P3): each view gets a literal ``tag_column`` naming it, views
    are combined with ``unionByName(allowMissingColumns=True)`` so
    columns absent from a view become null, and an optional literal
    stamp column is appended (injected, not ``date.today()``).
    """
    tagged = [df.withColumn(tag_column, F.lit(name)) for name, df in views.items()]
    out = tagged[0]
    for df in tagged[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    if stamp_column is not None and stamp_value is not None:
        out = out.withColumn(stamp_column, F.lit(stamp_value))
    return out


def mode_agg(df: DataFrame, keys: list[str], value_col: str, out: str = "mode") -> DataFrame:
    """Deterministic MODE (most frequent value, lexicographic
    tie-break) per key group, as a grouped-agg pandas UDF — the
    engine's custom-UDAF surface. One shuffle on the keys; each group's
    values stream to one Arrow batch.

    The same result is expressible as count + row_number (two hash
    exchanges); the UDAF form exists for aggregates that DON'T reduce
    to SQL (weighted medians, streaming sketches over ordered values)
    and for parity-testing that surface. Skew note: a grouped-agg UDF
    materializes each group in memory — bound group cardinality first
    (here: values per key), or fall back to the SQL composition."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _mode(v):
        counts = v.value_counts()  # drops NaN: an all-null group is empty
        if counts.empty:
            return None
        top = counts[counts == counts.max()]
        return sorted(top.index)[0]

    _mode.__annotations__ = {"v": pd.Series, "return": str}
    return df.groupBy(*keys).agg(pandas_udf("string")(_mode)(F.col(value_col)).alias(out))
