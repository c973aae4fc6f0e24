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
