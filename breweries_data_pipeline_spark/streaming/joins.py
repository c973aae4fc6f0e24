"""Stream-stream joins (SURVEY.md §2.6 X10 extension surface; the
reference has no streaming).

Spark's stream-stream inner join buffers BOTH sides in state until the
watermark plus the join's time bound allows eviction — so every
stream-stream join here requires (a) a watermark on each input and
(b) an event-time range condition. Without both, state grows forever;
with them, per-key state is bounded by arrival-rate x (watermark +
interval).

At scale the join shuffles both streams on the equi-key per
micro-batch — the same hash partitioning as the batch join — and the
state store holds only rows younger than watermark + interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    interval: str = "1 hour",
    watermark: str = "1 hour",
    suffix: str = "_r",
) -> DataFrame:
    """Inner join rows of ``right`` that occur within [left.ts,
    left.ts + interval] for the same key. Works identically on batch
    and streaming inputs (batch ignores the watermark), which is what
    the parity test exploits.

    Right-side columns are suffixed so callers never hit ambiguous
    attribute errors on self-derived streams.
    """
    r = right
    for c in right.columns:
        r = r.withColumnRenamed(c, f"{c}{suffix}")
    if left.isStreaming:
        left = left.withWatermark(ts_col, watermark)
    if r.isStreaming:
        r = r.withWatermark(f"{ts_col}{suffix}", watermark)
    cond = (
        (F.col(key) == F.col(f"{key}{suffix}"))
        & (F.col(f"{ts_col}{suffix}") >= F.col(ts_col))
        & (
            F.col(f"{ts_col}{suffix}")
            <= F.col(ts_col) + F.expr(f"interval {interval}")
        )
    )
    return left.join(r, cond, "inner")


def static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on,
    how: str = "inner",
) -> DataFrame:
    """Stream-static equi-join: enrich a fact stream against a batch
    dimension table (the standard feed-enrichment shape — click/
    purchase events decorated with the customer/catalog dim).

    STATELESS by construction: Spark re-plans the join for every
    micro-batch, so unlike a stream-stream join there is no state
    store, no watermark requirement, and the dim is re-read at each
    batch (picks up dim updates between restarts). ``F.broadcast``
    pins the dim to a map-side hash join, so the 100 TB/day fact
    stream never shuffles — each micro-batch is one narrow pass.
    Works identically on a batch ``stream`` input (then it is just a
    broadcast join), which the oracle-parity check exploits.
    """
    return stream.join(F.broadcast(dim), on, how)
