"""Stateful streaming operators beyond windowed aggregation
(SURVEY.md §2.6 X10 extension surface; no reference analog).

- ``streaming_dedup``: exactly-once-per-key emission bounded by a
  watermark (``dropDuplicatesWithinWatermark``) — state for a key is
  evicted once the watermark passes it, so memory is bounded by the
  key-arrival rate x watermark horizon, not the stream length. This is
  the streaming form of the engine's exact dedup operators.

- ``stateful_user_counts``: a custom stateful operator via
  ``applyInPandasWithState`` — running per-key aggregates held in
  explicit state, batches arriving as Arrow frames. The pattern to
  copy for bespoke state machines (sessionization with custom logic,
  decaying counters, CDC merge) that ``groupBy().agg()`` can't
  express.

Scale notes: both shuffle once on the key columns per micro-batch;
state lives in the state store (RocksDB on real clusters —
``spark.sql.streaming.stateStore.providerClass``), sized by distinct
keys, not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(
    sdf: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First row per key wins; duplicate suppression state is evicted
    at the watermark. Emits in append mode."""
    return sdf.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


USER_COUNT_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_value", T.DoubleType(), True),
    ]
)
_USER_COUNT_STATE = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("s", T.DoubleType(), True),
    ]
)


def _update_user_counts(key, pdfs, state: GroupState):
    import pandas as pd

    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})


def stateful_user_counts(sdf: DataFrame) -> DataFrame:
    """Running per-user (count, sum(value)) maintained in explicit
    group state; emits the updated totals each micro-batch."""
    return (
        sdf.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_counts,
            USER_COUNT_OUTPUT,
            _USER_COUNT_STATE,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
