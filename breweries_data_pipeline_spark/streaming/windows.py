"""Structured Streaming event-time windows (SURVEY.md §2.6 X10,
§7 step 7 — the reference has no streaming; this is the engine
extension surface).

The streaming aggregation uses the SAME ``F.window`` expression as the
batch operator (operators/windows.py: event_time_window_agg), so batch
and stream agree row-for-row when the stream is drained with an
``availableNow`` trigger — that parity is the correctness check
(tests/test_streaming.py), since windowed streaming state has no SQL
oracle.

Scale notes:
- ``withWatermark`` bounds state: windows older than the watermark are
  finalized and evicted; without it, state grows with the key x window
  product forever.
- file-source streams discover new files per micro-batch;
  ``maxFilesPerTrigger`` is the backpressure knob at scale.
- the shuffle per micro-batch is keyed by (window, group keys) — the
  same partitioning logic as the batch hash aggregate, sized by
  ``spark.sql.shuffle.partitions``.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


from contextlib import contextmanager


@contextmanager
def state_partitions(spark: SparkSession, n: int):
    """Scope ``spark.sql.shuffle.partitions`` around a streaming
    query START (the state-store partition count is frozen into the
    checkpoint at first run). Stateful-operator cost is dominated by
    per-partition state-store file I/O — one delta + maintenance
    write PER STORE PER PARTITION PER MICRO-BATCH, regardless of row
    volume (measured: the sf0.1 interval join emits 371 rows but
    spent 7s on 32-partition x 2-store checkpoint traffic; 2.5s at
    8). Size n to state volume: bench drains of sf-scale data use a
    handful; a production deployment sizes by keys x throughput.
    Only the streaming query started inside the scope is affected —
    its partition count persists in its checkpoint."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet, normalized to the
    same shape read_table produces (ns-long -> µs timestamp).
    Streaming reads require an explicit schema — taken from a batch
    peek at the same path (footer-only, no data scan)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # Watermarks require TIMESTAMP (with local-tz semantics); parquet
    # timestamp[us] without tz info infers as TIMESTAMP_NTZ. The session
    # timezone is pinned UTC (session.py), so reading NTZ micros as
    # TIMESTAMP is value-identical — rewrite the schema before the scan.
    schema = T.StructType(
        [
            T.StructField(f.name, T.TimestampType(), f.nullable)
            if isinstance(f.dataType, T.TimestampNTZType)
            else f
            for f in schema.fields
        ]
    )
    # two on-disk layouts exist: the driver testdata stores each table
    # as a single FILE (<sf_dir>/events.parquet), the generated soak
    # replicas as a DIRECTORY of part files (<sf_dir>/events.parquet/
    # part-*.parquet). A parent-dir stream with
    # pathGlobFilter=events.parquet matches only the file layout — on
    # the directory layout it listed ZERO files and every drain was
    # silently empty (caught r8: sf1 streaming twins ran in 0.3s
    # returning 0 rows). Stream the table path directly when it is a
    # directory; keep the glob-filtered parent for the file layout
    # (the file source requires a directory to list).
    if os.path.isdir(path):
        sdf = spark.readStream.schema(schema).parquet(path)
    else:
        sdf = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    if isinstance(sdf.schema["ts"].dataType, T.LongType):
        sdf = sdf.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return sdf


def streaming_event_window_agg(
    sdf: DataFrame,
    ts_col: str,
    window_duration: str,
    group_by: list[str],
    metrics: list[Column],
    *,
    watermark: str = "10 minutes",
    slide_duration: str | None = None,
) -> DataFrame:
    """Streaming form of event_time_window_agg: identical window
    expression plus a watermark bounding late data and state."""
    win = F.window(F.col(ts_col), window_duration, slide_duration or window_duration)
    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(win.alias("window"), *group_by)
        .agg(*metrics)
    )


def drop_scratch(path: str) -> None:
    """Best-effort removal of a drain's scratch (checkpoint/staging)
    dir once the memory sink holds the result. A stream-stream join's
    checkpoint is ~200 MB of state-store files PER DRAIN at sf0.1 —
    a long bench/soak session that never reclaims them exhausted this
    box's disk mid-sort (r8 finding). Only dirs the RETURNED
    DataFrame does not read may pass through here: memory-sink output
    lives in driver memory, so checkpoints and staged inputs qualify;
    parquet snapshot/store dirs do NOT."""
    import shutil

    shutil.rmtree(path, ignore_errors=True)


def run_available_now(
    sdf: DataFrame, query_name: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """Drain a streaming DataFrame with the availableNow trigger into
    an in-memory sink (complete mode) and return the result as a batch
    DataFrame. For tests and batch-parity checks — production sinks
    would use writeStream.format('parquet'/'kafka'/...) instead."""
    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="bdp_stream_ckpt_")
    q = (
        sdf.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if checkpoint_dir is None:  # caller-provided dirs are caller-owned
        drop_scratch(checkpoint)
    spark = sdf.sparkSession
    return spark.table(query_name)


_STAGE_SEQ = [0]  # per-process counter: unique memory-sink names


def stage_parquet_batches(stages: list[DataFrame]) -> str:
    """Write each stage DataFrame as exactly ONE parquet file in a
    fresh directory with strictly increasing mtimes, so a file-source
    stream with ``maxFilesPerTrigger=1`` under availableNow processes
    micro-batch N == stage N (oldest-mtime-first admission). Shared by
    staged_availablenow_drain (append-mode memory-sink drains) and the
    foreachBatch ingest replays (q_streaming_cdc_ingest). Caller owns
    the returned directory (drop_scratch when drained)."""
    import glob as _glob
    import shutil

    d = tempfile.mkdtemp(prefix="bdp_staged_")
    base = 1_000_000_000  # fixed epoch for mtimes: ordering, not wall time
    for i, df in enumerate(stages):
        tmp = tempfile.mkdtemp(prefix="bdp_stage_w_")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dest = os.path.join(d, f"stage{i:03d}.parquet")
        shutil.move(part, dest)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dest, (base + i * 100, base + i * 100))
    return d


def staged_availablenow_drain(
    spark: SparkSession,
    stages: list[DataFrame],
    build,
    query_name: str,
) -> DataFrame:
    """Deterministic MULTI-batch replay: write each stage DataFrame as
    exactly one parquet file with strictly increasing mtimes, then
    stream the directory with ``maxFilesPerTrigger=1`` under an
    availableNow trigger — micro-batch N processes exactly stage N (the
    file source admits oldest-mtime first). This is how watermark
    semantics (state eviction, late-data dropping) are exercised
    reproducibly: a single-batch drain never advances the watermark
    mid-stream, so nothing is ever late. ``build(sdf) -> DataFrame``
    shapes the streaming query; output is drained APPEND-mode into a
    memory sink and returned as a batch DataFrame."""
    d = stage_parquet_batches(stages)
    sdf = (
        spark.readStream.schema(stages[0].schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    _STAGE_SEQ[0] += 1
    name = f"{query_name}_{_STAGE_SEQ[0]}"
    ck = tempfile.mkdtemp(prefix="bdp_staged_ckpt_")
    q = (
        build(sdf)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drop_scratch(ck)
    drop_scratch(d)
    return spark.table(name)
