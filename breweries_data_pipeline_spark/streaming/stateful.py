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
        T.StructField("s_micro", T.LongType(), True),
    ]
)


def _update_user_counts(key, pdfs, state: GroupState):
    import pandas as pd

    n, s_micro = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # fixed-point micro-units: integer accumulation is exact and
        # order-independent, so the emitted total is deterministic no
        # matter how rows were batched or which partition delivered
        # them first (a float += here would drift with arrival order
        # and break both replay determinism and the SQL oracle). The
        # rounding itself happens JVM-side (F.round, HALF_UP) before
        # the kernel, where its cross-engine parity is already proven.
        s_micro += int(pdf["value_micro"].sum())
    state.update((n, s_micro))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [s_micro / 1e6]}
    )


def stateful_user_counts(sdf: DataFrame) -> DataFrame:
    """Running per-user (count, sum(value)) maintained in explicit
    group state; emits the updated totals each micro-batch. The sum
    accumulates in fixed-point micro-units (see _update_user_counts),
    so totals are exact to 6 decimals and reduction-order-free."""
    from pyspark.sql import functions as F

    return (
        sdf.select(
            "user_id",
            F.round(F.col("value") * 1000000.0).cast("long").alias("value_micro"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_counts,
            USER_COUNT_OUTPUT,
            _USER_COUNT_STATE,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


CUSUM_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("cusum_micro", T.LongType(), False),
    ]
)
_CUSUM_STATE = T.StructType(
    [
        T.StructField("cum", T.LongType(), False),
        T.StructField("minc", T.LongType(), False),
    ]
)


def _update_cusum(key, pdfs, state: GroupState, k_micro: int, h_micro: int):
    import numpy as np
    import pandas as pd

    cum0, minc0 = state.get if state.exists else (0, 0)
    pdf = pd.concat(list(pdfs), ignore_index=True)
    # per-key event-time order within the micro-batch; the state keeps
    # the recursion exact across batch boundaries
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    # vectorized recursion (r13, guide §4.2 — the per-row Python loop
    # was ~66 iterations per key per batch at sf0.1): with
    # c_i = cum0 + cumsum(v - k), the running state is exactly
    # cum_i = c_i and minc_i = min(minc0, min(c_1..c_i)) — all int64,
    # so every emitted s = c_i - minc_i is bit-identical to the loop
    v = pdf["value_micro"].to_numpy(dtype=np.int64)
    c = cum0 + np.cumsum(v - np.int64(k_micro), dtype=np.int64)
    minc = np.minimum(np.minimum.accumulate(c), np.int64(minc0))
    s = c - minc
    alarm = s > h_micro
    state.update((int(c[-1]) if len(c) else cum0,
                  int(minc[-1]) if len(minc) else minc0))
    if alarm.any():
        hit = pdf[alarm]
        yield pd.DataFrame(
            {
                "user_id": key[0],
                "event_id": hit["event_id"].astype("int64").to_numpy(),
                "ts": hit["ts"].to_numpy(),
                "cusum_micro": s[alarm],
            }
        )


def streaming_cusum(
    sdf: DataFrame, k_micro: int = 120000000, h_micro: int = 400000000
) -> DataFrame:
    """Streaming CUSUM drift monitor: the one-sided cumulative-sum
    statistic s_i = max(0, s_{i-1} + (x_i - k)) maintained per user in
    explicit group state, emitting an alarm row whenever s exceeds h.
    State is TWO longs per key (running cum and its running min — the
    same cumsum-minus-running-min identity the batch q_cusum_drift
    uses), so the state store holds 16 bytes per user regardless of
    stream length. Rows are processed in (ts, event_id) order within
    each micro-batch; deviations accumulate in exact integer
    micro-units, so the streamed alarm ledger is bit-identical to the
    batch computation (the oracle) under the availableNow drain."""
    from pyspark.sql import functions as F

    def fn(key, pdfs, state):
        return _update_cusum(key, pdfs, state, k_micro, h_micro)

    return (
        sdf.select(
            "user_id",
            "event_id",
            "ts",
            F.round(F.col("value") * 1000000.0).cast("long").alias("value_micro"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            CUSUM_OUTPUT,
            _CUSUM_STATE,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


SESSION_TIMEOUT_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("first_us", T.LongType(), False),
        T.StructField("last_us", T.LongType(), False),
    ]
)
_SESSION_TIMEOUT_STATE = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("first_us", T.LongType(), False),
        T.StructField("last_us", T.LongType(), False),
    ]
)


def _update_session_timeout(key, pdfs, state: GroupState, gap_ms: int):
    """Inactivity-closed user session: merge the batch's rows into
    (n, first, last) state, then arm an EVENT-TIME timer at
    last + gap (clamped to watermark+1 — Spark rejects timers behind
    the watermark; the clamp only defers an already-due timer to the
    next batch, it never changes WHICH sessions emit). When the timer
    fires (a batch where the group has no input and the watermark has
    passed the timer) the session emits once and its state is freed —
    the bounded-state contract every long-horizon sessionizer needs.
    All state is integer microseconds; nothing floats."""
    import pandas as pd

    if state.hasTimedOut:
        n, f, l = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "first_us": [f],
                "last_us": [l],
            }
        )
        return
    n, f, l = state.get if state.exists else (0, None, None)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        # Hot path: one numpy view + two reductions per group. The
        # kernel is invoked once PER KEY per micro-batch, so per-call
        # constants dominate at scale (users ~ events/4 here); a
        # pandas astype+divide materialized an N-row µs series just
        # to take its min/max. Unit-normalize via datetime64 astype
        # (zero-copy when already ns), divide the two scalars only.
        vals = pdf["ts"].to_numpy()
        if vals.dtype.kind == "M":  # datetime64[*] -> int ns
            iv = vals.astype("datetime64[ns]").view("i8")
        elif vals.dtype.kind in "iu":  # already integer ns
            iv = vals.astype("i8", copy=False)
        else:
            # object dtype (e.g. tz-aware Timestamps arrive as an
            # object array) — normalize through pandas first; a bare
            # astype('i8') raises here rather than defending
            import pandas as pd

            iv = (
                pd.to_datetime(pdf["ts"], utc=True)
                .dt.tz_localize(None)
                .to_numpy()
                .astype("datetime64[ns]")
                .view("i8")
            )
        n += iv.size
        mn, mx = int(iv.min()) // 1000, int(iv.max()) // 1000
        f = mn if f is None else min(f, mn)
        l = mx if l is None else max(l, mx)
    state.update((n, f, l))
    wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(l // 1000 + gap_ms, wm + 1))
    return


def stateful_session_timeout(
    sdf: DataFrame, *, watermark: str = "10 minutes", gap_ms: int = 1_800_000
) -> DataFrame:
    """Per-user inactivity sessions closed by EVENT-TIME TIMEOUT
    (GroupStateTimeout.EventTimeTimeout) — the applyInPandasWithState
    surface the other stateful ops (running counts, CUSUM, CMS) never
    touch: state that frees ITSELF when the watermark passes
    last-activity + gap, emitting exactly once per closed session.
    16 bytes + two µs stamps of state per live user.

    The Arrow payload crossing into Python is pinned to exactly
    (user_id, ts): any extra input columns (staging discriminators,
    payload fields) are projected away BEFORE the shuffle + state
    pass, so the per-row exchange/IPC cost is 16 bytes regardless of
    the source width — at 100 TB the sessionizer's bill is the
    Python-state pass itself, never accidental payload carriage."""

    def fn(key, pdfs, state):
        yield from _update_session_timeout(key, pdfs, state, gap_ms)

    return (
        sdf.select("user_id", "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_TIMEOUT_OUTPUT,
            _SESSION_TIMEOUT_STATE,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
