"""Streaming incremental upsert: foreachBatch + CDC merge into a
versioned parquet snapshot (the streaming half of operators/merge.py).

Spark's file sinks are append-only; MERGE semantics over a stream need
``foreachBatch``, which hands each micro-batch to arbitrary batch code
exactly-once-per-batch-id (the checkpoint records the last committed
batch; on recovery a batch may be REDELIVERED, so the merge must be
idempotent — latest-record-wins merging is: re-merging the same rows
changes nothing).

Snapshot layout: ``dir/v{batch_id}`` data directories plus a
``dir/_commits`` manifest — one marker file per published version. A
version becomes visible ONLY when its marker lands, and the marker is
a single-file publish (tmp + rename locally; one PUT on an object
store) — atomic where directory rename is not (S3 et al.). Readers
resolve versions from the manifest, so a half-written data directory
is never readable; layouts assembled by hand without a manifest fall
back to directory listing (no partial-write protection — legacy
convenience only). Old versions are retained for time-travel until
pruned.

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


_COMMITS = "_commits"


def commit_snapshot_version(snapshot_dir: str, version: int) -> None:
    """Atomically publish ``version``: write its one-line manifest
    marker under ``_commits/`` via tmp-file + rename (single-FILE
    publish — the operation object stores make atomic, unlike the
    directory rename the data write would need). Idempotent: a
    redelivered batch re-commits the same version harmlessly."""
    cdir = os.path.join(snapshot_dir, _COMMITS)
    os.makedirs(cdir, exist_ok=True)
    tmp = os.path.join(cdir, f".v{version}.{os.getpid()}.tmp")
    with open(tmp, "w") as f:
        f.write(f"v{version}\n")
    os.replace(tmp, os.path.join(cdir, f"v{version}"))


def committed_versions(snapshot_dir: str) -> list[int]:
    """Published versions in ascending order, resolved from the
    ``_commits`` manifest. Layouts with no manifest (assembled by
    hand) fall back to listing data directories — a legacy path with
    no partial-write protection."""
    cdir = os.path.join(snapshot_dir, _COMMITS)
    src = cdir if os.path.isdir(cdir) else snapshot_dir
    if not os.path.isdir(src):
        return []
    return sorted(
        int(d[1:])
        for d in os.listdir(src)
        if d.startswith("v") and d[1:].isdigit()
    )


def latest_snapshot_version(snapshot_dir: str) -> int | None:
    """Highest published snapshot version (manifest-resolved)."""
    versions = committed_versions(snapshot_dir)
    return versions[-1] if versions else None


def read_snapshot(
    spark: SparkSession, snapshot_dir: str, version: int | None = None
) -> DataFrame | None:
    """Read the latest snapshot, or time-travel to an explicit
    ``version`` — retained versions stay readable until pruned, the
    poor-man's form of table-format time travel."""
    if version is not None:
        if version not in committed_versions(snapshot_dir):
            raise FileNotFoundError(
                f"snapshot version v{version} not published in {snapshot_dir}"
            )
        v = version
    else:
        v = latest_snapshot_version(snapshot_dir)
        if v is None:
            return None
    return spark.read.parquet(os.path.join(snapshot_dir, f"v{v}"))


def merge_batch_into_snapshot(
    batch_df: DataFrame,
    batch_id: int,
    snapshot_dir: str,
    keys: list[str],
    order_by_cols: list[str],
    delete_predicate: Column | None = None,
) -> None:
    """One micro-batch's merge-and-publish (the foreachBatch body of
    :func:`streaming_upsert`, module-level so redelivery semantics are
    unit-testable).

    Redelivery of an ALREADY-COMMITTED batch id is a no-op, checked
    first: foreachBatch redelivers a batch when the commit landed but
    the stream checkpoint did not, and in that state the latest
    snapshot IS ``v{batch_id}`` — re-running the merge would read and
    overwrite the same directory in one lazy job (Spark deletes the
    target's files before the scan executes: a crash, or with
    ``spark.sql.files.ignoreMissingFiles`` a silently-empty base that
    publishes ONLY the batch rows over the full snapshot). The marker
    check makes redelivery idempotent by skipping, not by re-merging.
    """
    from pyspark.sql import functions as F

    if batch_id in committed_versions(snapshot_dir):
        return
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
    # the data directory is INVISIBLE until its manifest marker lands,
    # so it can be written in place (overwrite also makes a crashed
    # HALF-written attempt's rewrite safe); the marker is the atomic
    # commit point
    merged.write.mode("overwrite").parquet(
        os.path.join(snapshot_dir, f"v{batch_id}")
    )
    commit_snapshot_version(snapshot_dir, batch_id)


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

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into_snapshot(
            batch_df, batch_id, snapshot_dir, keys, order_by_cols,
            delete_predicate,
        )

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
    doomed = committed_versions(snapshot_dir)[:-keep_last]
    for v in doomed:
        # marker first: a reader never resolves a version whose data
        # directory is mid-delete
        marker = os.path.join(snapshot_dir, _COMMITS, f"v{v}")
        if os.path.exists(marker):
            os.remove(marker)
        shutil.rmtree(os.path.join(snapshot_dir, f"v{v}"), ignore_errors=True)
    return doomed
