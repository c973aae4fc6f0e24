"""Stateful streaming parity: drained with availableNow, the streaming
dedup and the custom applyInPandasWithState aggregate must agree with
their batch equivalents."""

from __future__ import annotations

from pyspark.sql import functions as F

from breweries_data_pipeline_spark.sources import read_table
from breweries_data_pipeline_spark.streaming import read_events_stream
from breweries_data_pipeline_spark.streaming.stateful import (
    stateful_user_counts,
    streaming_dedup,
)


def _drain(sdf, name, ckpt, mode):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)


def test_streaming_dedup_matches_batch(spark, sf_dir, tmp_path):
    sdf = read_events_stream(spark, sf_dir)
    out = _drain(
        streaming_dedup(sdf, ["user_id", "event_type"]),
        "t_stream_dedup",
        str(tmp_path / "c1"),
        "append",
    )
    batch = read_table(spark, sf_dir, "events").dropDuplicates(
        ["user_id", "event_type"]
    )
    assert out.count() == batch.count()
    # same key set, one row per key
    stream_keys = {(r.user_id, r.event_type) for r in out.select("user_id", "event_type").collect()}
    batch_keys = {(r.user_id, r.event_type) for r in batch.select("user_id", "event_type").collect()}
    assert stream_keys == batch_keys


def test_stateful_user_counts_matches_batch_agg(spark, sf_dir, tmp_path):
    sdf = read_events_stream(spark, sf_dir)
    out = _drain(
        stateful_user_counts(sdf),
        "t_stream_counts",
        str(tmp_path / "c2"),
        "update",
    )
    # update mode emits one row per user per micro-batch; the LAST row
    # per user is the final running total
    final = {r.user_id: (r.n_events, r.sum_value) for r in out.collect()}
    batch = {
        r.user_id: (r.n, r.s)
        for r in read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(final) == set(batch)
    for uid, (n, s) in batch.items():
        assert final[uid][0] == n
        # per-row micro-unit quantization bounds the drift at 0.5e-6 * n
        assert abs(final[uid][1] - s) <= 5e-7 * (n + 1)


def test_stateful_counts_identical_under_rocksdb_state_store(
    spark, sf_dir, tmp_path
):
    """The 100 TB state backend: HDFSBackedStateStore keeps every key
    in executor heap, so production streaming state lives in RocksDB
    (spark.sql.streaming.stateStore.providerClass). Run the SAME
    stateful drain under both providers and pin row-for-row identity —
    the state contract (fixed-point micro-unit accumulators) is
    backend-independent, and this proves the engine actually runs on
    the backend the SCALE.md streaming story names (the provider loads,
    commits, and restores state here, not just in a docstring)."""
    sdf = read_events_stream(spark, sf_dir)
    base = _drain(
        stateful_user_counts(sdf),
        "t_state_default",
        str(tmp_path / "c_def"),
        "update",
    )
    base_rows = sorted(tuple(r) for r in base.collect())
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        rocks = _drain(
            stateful_user_counts(read_events_stream(spark, sf_dir)),
            "t_state_rocksdb",
            str(tmp_path / "c_rocks"),
            "update",
        )
        rocks_rows = sorted(tuple(r) for r in rocks.collect())
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    assert base_rows == rocks_rows
    assert len(base_rows) > 0
