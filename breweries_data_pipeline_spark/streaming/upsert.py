"""Streaming incremental upsert: foreachBatch + CDC merge into a
versioned parquet snapshot (the streaming half of operators/merge.py).

Spark's file sinks are append-only; MERGE semantics over a stream need
``foreachBatch``, which hands each micro-batch to arbitrary batch code
exactly-once-per-batch-id (the checkpoint records the last committed
batch; on recovery a batch may be REDELIVERED, so the merge must be
idempotent — latest-record-wins merging is: re-merging the same rows
changes nothing).

Snapshot layout: ``dir/v{batch_id}`` directories, each a complete
snapshot, written to ``.tmp`` and atomically renamed (the repo's
atomic-publish convention). Readers resolve the highest complete
version — never a partial write. Old versions are retained for
time-travel until pruned.

Scale notes: each micro-batch rewrites the snapshot (read + union +
window + write) — right for moderate snapshot sizes or low cadence; at
100 TB the same foreachBatch body would target a table format with
transactional MERGE (the operator's semantics are unchanged, only the
commit mechanism). The merge itself is one shuffle on the keys.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession

from breweries_data_pipeline_spark.operators.merge import merge_upsert


def latest_snapshot_version(snapshot_dir: str) -> int | None:
    """Highest complete (published, non-.tmp) snapshot version."""
    if not os.path.isdir(snapshot_dir):
        return None
    versions = [
        int(d[1:])
        for d in os.listdir(snapshot_dir)
        if d.startswith("v") and d[1:].isdigit()
    ]
    return max(versions) if versions else None


def read_snapshot(
    spark: SparkSession, snapshot_dir: str, version: int | None = None
) -> DataFrame | None:
    """Read the latest snapshot, or time-travel to an explicit
    ``version`` — retained versions stay readable until pruned, the
    poor-man's form of table-format time travel."""
    v = version if version is not None else latest_snapshot_version(snapshot_dir)
    if v is None:
        return None
    path = os.path.join(snapshot_dir, f"v{v}")
    if not os.path.isdir(path):
        raise FileNotFoundError(f"snapshot version v{v} not found in {snapshot_dir}")
    return spark.read.parquet(path)


def streaming_upsert(
    sdf: DataFrame,
    snapshot_dir: str,
    keys: list[str],
    order_by_cols: list[str],
    *,
    checkpoint_dir: str,
    delete_predicate: Column | None = None,
):
    """Drain ``sdf`` with availableNow, merging each micro-batch into
    the snapshot (latest-record-wins on ``order_by_cols`` DESC, then
    key tie-break so replays are deterministic). Returns after the
    stream drains; read the result with read_snapshot()."""
    from pyspark.sql import functions as F

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        base = read_snapshot(spark, snapshot_dir)
        if base is None:
            base = spark.createDataFrame([], batch_df.schema)
        order = [F.col(c).desc() for c in order_by_cols] + [
            F.col(k).asc() for k in keys
        ]
        merged = merge_upsert(
            base, batch_df, keys, order, delete_predicate=delete_predicate
        )
        tmp = os.path.join(snapshot_dir, f"v{batch_id}.tmp")
        final = os.path.join(snapshot_dir, f"v{batch_id}")
        merged.write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, final)
        except OSError:
            pass  # redelivered batch already published this version

    q = (
        sdf.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def prune_snapshots(snapshot_dir: str, keep_last: int = 2) -> list[int]:
    """Delete all but the newest ``keep_last`` snapshot versions
    (bounds storage; removes time-travel reach for pruned versions).
    Returns the pruned version numbers. Never touches the latest
    version or incomplete ``.tmp`` writes."""
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    if not os.path.isdir(snapshot_dir):
        return []
    versions = sorted(
        int(d[1:])
        for d in os.listdir(snapshot_dir)
        if d.startswith("v") and d[1:].isdigit()
    )
    doomed = versions[:-keep_last]
    for v in doomed:
        shutil.rmtree(os.path.join(snapshot_dir, f"v{v}"), ignore_errors=True)
    return doomed
