"""Window / ranking / event-time operators (SURVEY.md §2.6 X3/X4/X10).

- top-k per group: ``row_number()`` over a window — one shuffle on the
  partition keys. At scale this beats a global sort by orders of
  magnitude: each group ranks locally after the hash exchange.
- global top-k: ``orderBy().limit(k)`` — Spark plans TakeOrderedAndProject
  (per-partition heap + driver merge), NOT a full sort; k must be small.
- event-time windows (batch form): ``F.window`` tumbling/sliding
  buckets; the streaming form (streaming/windows.py) shares the same
  expression.

All orderings take explicit tie-break columns so results are
deterministic (FIXTURES.md determinism rules).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_by: list[str],
    order_by: list[Column | str],
    k: int,
    rank_name: str = "rn",
    salt: Column | None = None,
    salt_buckets: int = 0,
) -> DataFrame:
    """Exact top-k per group; one shuffle keyed by the group columns.

    When the group count is SMALLER than the cluster (e.g. 16 probe
    ids on 1000 executors), a plain window collapses parallelism to
    one task per group and each task sorts the group's entire slice.
    Passing ``salt`` (any deterministic column, e.g.
    ``F.xxhash64(id_col)``) and ``salt_buckets`` enables the exact
    two-phase form: phase 1 ranks within (group, salt mod buckets) —
    groups x buckets parallel tasks — and keeps each bucket's top-k
    (a superset of the global top-k, since the per-bucket prune uses
    the SAME total order); phase 2 re-ranks the <= groups x buckets
    x k survivors. Result-identical to the one-phase form for any
    deterministic total order."""
    if salt is not None and salt_buckets > 1:
        w1 = Window.partitionBy(*group_by, "__tks").orderBy(*order_by)
        df = (
            df.withColumn("__tks", F.pmod(salt, F.lit(salt_buckets)))
            .withColumn("__tkr", F.row_number().over(w1))
            .filter(F.col("__tkr") <= k)
            .drop("__tks", "__tkr")
        )
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn(rank_name, F.row_number().over(w))
        .filter(F.col(rank_name) <= k)
    )


def topk_global(df: DataFrame, order_by: list[Column | str], k: int) -> DataFrame:
    """Planned as TakeOrderedAndProject — no full shuffle sort."""
    return df.orderBy(*order_by).limit(k)


def event_time_window_agg(
    df: DataFrame,
    ts_col: str,
    window_duration: str,
    group_by: list[str],
    metrics: list[Column],
    *,
    slide_duration: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding, with ``slide_duration``) event-time window
    aggregation — batch analog of the Structured Streaming windowed agg.
    Output keeps the window struct as ``window`` (.start/.end)."""
    win = F.window(F.col(ts_col), window_duration, slide_duration or window_duration)
    return df.groupBy(win.alias("window"), *group_by).agg(*metrics)


# ----------------------------------------------------------------------
# Bucket-offset distributed ranking (the exact two-pass scheme)
#
# A window partitioned by a LOW-cardinality key (label, source, or
# nothing at all) ranks each group's entire slice in one task — at
# 100 TB that is one reducer owning a whole class. When the ordering's
# leading column admits an order-respecting bucket function (any
# monotone value bucket, or a string prefix of a hash sort key), the
# global rank decomposes exactly: rank = local rank within
# (group, bucket) + (rows in the group's earlier buckets). The
# offsets table is groups x buckets rows — broadcastable — and every
# heavy sort runs at groups x buckets parallelism.
#
# Exactness: the bucket is a function of the leading order column, so
# rows that tie on it land in the SAME bucket and the local window's
# tie-break columns resolve them; across buckets the ordering is
# already decided by bucket monotonicity. Result-identical to the
# one-task window for any deterministic total order.
# ----------------------------------------------------------------------


def _bucket_offsets(
    d: DataFrame, group_by: list[str], value_expr: Column
) -> DataFrame:
    """Per (group, __bk): exclusive prefix sum of ``value_expr`` over
    the group's buckets in bucket order, plus the group total."""
    per = d.groupBy(*group_by, "__bk").agg(value_expr.alias("__bv"))
    w_off = (
        Window.partitionBy(*group_by)
        .orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = (
        Window.partitionBy(*group_by)
        .orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return per.select(
        *group_by,
        "__bk",
        F.coalesce(F.sum("__bv").over(w_off), F.lit(0))
        .cast("long")
        .alias("__off"),
        F.sum("__bv").over(w_all).cast("long").alias("__gtot"),
    )


def bucketed_row_number(
    df: DataFrame,
    group_by: list[str],
    order_by: list[Column | str],
    bucket: Column,
    rank_name: str = "rn",
    total_name: str | None = None,
) -> DataFrame:
    """Exact ``row_number() OVER (PARTITION BY group ORDER BY ...)``
    without a per-group single-task sort: local row_number within
    (group, bucket) + broadcast exclusive bucket-count offsets.
    ``bucket`` must be a deterministic monotone function of the
    leading order column (value band, or a prefix of a hash sort
    key). Optionally emits the group row count as ``total_name`` —
    free from the offsets table, saving callers a second window."""
    d = df.withColumn("__bk", bucket)
    offs = _bucket_offsets(d, group_by, F.count(F.lit(1)))
    w_local = Window.partitionBy(*group_by, "__bk").orderBy(*order_by)
    out = (
        d.withColumn("__lrn", F.row_number().over(w_local))
        .join(F.broadcast(offs), [*group_by, "__bk"])
        .withColumn(rank_name, (F.col("__off") + F.col("__lrn")).cast("long"))
    )
    if total_name is not None:
        out = out.withColumn(total_name, F.col("__gtot"))
    return out.drop("__bk", "__lrn", "__off", "__gtot")


def bucketed_running_sum(
    df: DataFrame,
    group_by: list[str],
    order_by: list[Column | str],
    bucket: Column,
    value_col: str,
    out_name: str = "cum",
) -> DataFrame:
    """Exact inclusive running sum of ``value_col`` over the group
    ordering, decomposed as local running sum within (group, bucket)
    + broadcast exclusive bucket-sum offsets. Same bucket contract
    as bucketed_row_number."""
    d = df.withColumn("__bk", bucket)
    offs = _bucket_offsets(d, group_by, F.sum(value_col))
    w_local = (
        Window.partitionBy(*group_by, "__bk")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("__ls", F.sum(value_col).over(w_local).cast("long"))
        .join(F.broadcast(offs), [*group_by, "__bk"])
        .withColumn(out_name, (F.col("__off") + F.col("__ls")).cast("long"))
        .drop("__bk", "__ls", "__off", "__gtot")
    )


def bucketed_cume_count(
    df: DataFrame,
    group_by: list[str],
    value_col: str,
    bucket: Column,
    out_name: str = "count_le",
    total_name: str = "n",
) -> DataFrame:
    """Exact per-row "rows in group with value <= mine" (the
    cume_dist numerator, ties counted fully via a RANGE frame) plus
    the group total — both distributed: local range-frame count
    within (group, bucket) + broadcast bucket-count offsets. The
    integer pair (count_le, n) lets callers express percentile
    predicates exactly (100*count_le >= p*n) with no float
    division."""
    d = df.withColumn("__bk", bucket)
    offs = _bucket_offsets(d, group_by, F.count(F.lit(1)))
    w_local = (
        Window.partitionBy(*group_by, "__bk")
        .orderBy(value_col)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("__lc", F.count(F.lit(1)).over(w_local))
        .join(F.broadcast(offs), [*group_by, "__bk"])
        .withColumn(out_name, (F.col("__off") + F.col("__lc")).cast("long"))
        .withColumn(total_name, F.col("__gtot"))
        .drop("__bk", "__lc", "__off", "__gtot")
    )
