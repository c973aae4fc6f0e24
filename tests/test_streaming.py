"""X10 streaming: availableNow-drained streaming windowed agg must
equal the batch q_event_window result row-for-row (same F.window
expression, same data) — the parity check that stands in for a SQL
oracle on streaming state."""

from __future__ import annotations

from pyspark.sql import functions as F

from breweries_data_pipeline_spark.queries import q_event_window
from breweries_data_pipeline_spark.streaming import (
    read_events_stream,
    run_available_now,
    streaming_event_window_agg,
)


def test_streaming_matches_batch_event_window(spark, sf_dir, tmp_path):
    sdf = read_events_stream(spark, sf_dir)
    agg = streaming_event_window_agg(
        sdf,
        "ts",
        "1 hour",
        ["event_type"],
        [
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        ],
    )
    shaped = agg.select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )
    stream_rows = sorted(
        tuple(r) for r in run_available_now(
            shaped, "stream_event_window", str(tmp_path / "ckpt")
        ).collect()
    )
    batch_rows = sorted(tuple(r) for r in q_event_window(spark, sf_dir).collect())
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0


def test_stream_stream_join_matches_batch(spark, sf_dir):
    from breweries_data_pipeline_spark.queries import q_stream_stream_join
    from breweries_data_pipeline_spark.sources import read_table
    from breweries_data_pipeline_spark.streaming import interval_join

    stream_rows = sorted(tuple(r) for r in q_stream_stream_join(spark, sf_dir).collect())

    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    batch = interval_join(clicks, buys, "user_id").select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("ts_r", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("value_r").alias("purchase_value"),
    )
    batch_rows = sorted(tuple(r) for r in batch.collect())
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0


def test_streaming_upsert_matches_batch_merge(spark, sf_dir):
    from breweries_data_pipeline_spark.queries import q_streaming_upsert
    from breweries_data_pipeline_spark.operators.merge import merge_upsert
    from breweries_data_pipeline_spark.sources import read_table

    stream_rows = sorted(tuple(r) for r in q_streaming_upsert(spark, sf_dir).collect())

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    empty = spark.createDataFrame([], ev.schema)
    batch = merge_upsert(
        empty,
        ev,
        ["user_id", "event_type"],
        [F.col("ts").desc(), F.col("event_id").desc(),
         F.col("user_id").asc(), F.col("event_type").asc()],
    ).select(
        "user_id",
        "event_type",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "value",
    )
    batch_rows = sorted(tuple(r) for r in batch.collect())
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0


def test_streaming_session_window_matches_batch(spark, sf_dir):
    from breweries_data_pipeline_spark.queries import (
        q_session_window,
        q_session_window_stream,
    )

    stream_rows = sorted(
        tuple(r) for r in q_session_window_stream(spark, sf_dir).collect()
    )
    batch_rows = sorted(tuple(r) for r in q_session_window(spark, sf_dir).collect())
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0


def test_streaming_upsert_checkpoint_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Re-running the drained stream against the SAME checkpoint must
    process nothing new: the snapshot version set and contents stay
    identical (exactly-once via checkpoint + idempotent merge)."""
    from breweries_data_pipeline_spark.streaming import (
        read_events_stream,
        read_snapshot,
        streaming_upsert,
    )
    from breweries_data_pipeline_spark.streaming.upsert import latest_snapshot_version

    snap, ckpt = str(tmp_path / "snap"), str(tmp_path / "ckpt")

    def run():
        sdf = read_events_stream(spark, sf_dir).select(
            "user_id", "event_type", "event_id", "ts", "value"
        )
        streaming_upsert(
            sdf, snap, ["user_id", "event_type"], ["ts", "event_id"],
            checkpoint_dir=ckpt,
        )

    run()
    v1 = latest_snapshot_version(snap)
    rows1 = sorted(tuple(r) for r in read_snapshot(spark, snap).collect())
    run()  # same checkpoint: no new files -> no new batch
    v2 = latest_snapshot_version(snap)
    rows2 = sorted(tuple(r) for r in read_snapshot(spark, snap).collect())
    assert v1 == v2
    assert rows1 == rows2


def test_snapshot_time_travel(spark, tmp_path):
    """Writing two snapshot versions by hand: latest read returns v1,
    version=0 time-travels, missing versions raise."""
    import pytest
    from breweries_data_pipeline_spark.streaming import read_snapshot

    snap = str(tmp_path / "snap")
    spark.range(3).write.parquet(f"{snap}/v0")
    spark.range(5).write.parquet(f"{snap}/v1")
    assert read_snapshot(spark, snap).count() == 5
    assert read_snapshot(spark, snap, version=0).count() == 3
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, snap, version=7)


def test_prune_snapshots_keeps_newest(spark, tmp_path):
    from breweries_data_pipeline_spark.streaming.upsert import (
        latest_snapshot_version,
        prune_snapshots,
    )

    snap = str(tmp_path / "snap")
    for v in range(4):
        spark.range(v + 1).write.parquet(f"{snap}/v{v}")
    pruned = prune_snapshots(snap, keep_last=2)
    assert pruned == [0, 1]
    assert latest_snapshot_version(snap) == 3
    import os

    assert sorted(os.listdir(snap)) == ["v2", "v3"]


def test_uncommitted_snapshot_version_is_invisible(spark, tmp_path):
    """Manifest commit protocol: a fully-written data directory stays
    unreadable until its _commits marker lands (the object-store-safe
    publish point); committing flips visibility atomically."""
    import pytest
    from breweries_data_pipeline_spark.streaming.upsert import (
        commit_snapshot_version,
        latest_snapshot_version,
        prune_snapshots,
        read_snapshot,
    )

    snap = str(tmp_path / "snap")
    spark.range(3).write.parquet(f"{snap}/v0")
    commit_snapshot_version(snap, 0)
    spark.range(9).write.parquet(f"{snap}/v1")  # written, never committed
    assert latest_snapshot_version(snap) == 0
    assert read_snapshot(spark, snap).count() == 3
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, snap, version=1)
    commit_snapshot_version(snap, 1)
    assert latest_snapshot_version(snap) == 1
    assert read_snapshot(spark, snap).count() == 9
    # prune consults the manifest and removes marker + data together
    assert prune_snapshots(snap, keep_last=1) == [0]
    assert latest_snapshot_version(snap) == 1


def test_streaming_corpus_ingest_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Same checkpoint, second drain: no new versions, store contents
    unchanged — the manifest guard keeps a redelivered batch from
    anti-joining against its own output and publishing empty."""
    from breweries_data_pipeline_spark.streaming import (
        read_corpus,
        read_documents_stream,
        streaming_corpus_ingest,
    )
    from breweries_data_pipeline_spark.streaming.upsert import committed_versions

    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    streaming_corpus_ingest(
        read_documents_stream(spark, sf_dir), store, checkpoint_dir=ckpt
    )
    v1 = committed_versions(store)
    rows1 = sorted(r.doc_id for r in read_corpus(spark, store).collect())
    assert len(v1) >= 1 and len(rows1) > 0
    streaming_corpus_ingest(
        read_documents_stream(spark, sf_dir), store, checkpoint_dir=ckpt
    )
    assert committed_versions(store) == v1
    rows2 = sorted(r.doc_id for r in read_corpus(spark, store).collect())
    assert rows2 == rows1


def test_streaming_corpus_ingest_second_wave_drops_known_fingerprints(
    spark, sf_dir, tmp_path
):
    """A later drain (fresh checkpoint, same documents) adds NOTHING:
    every fingerprint is already accepted, so the new version is
    empty — cross-batch incremental dedup works against the store."""
    from breweries_data_pipeline_spark.streaming import (
        read_corpus,
        read_documents_stream,
        streaming_corpus_ingest,
    )

    store = str(tmp_path / "store")
    streaming_corpus_ingest(
        read_documents_stream(spark, sf_dir), store,
        checkpoint_dir=str(tmp_path / "ckpt1"),
    )
    n1 = read_corpus(spark, store).count()
    streaming_corpus_ingest(
        read_documents_stream(spark, sf_dir), store,
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    assert read_corpus(spark, store).count() == n1


def test_streaming_cdc_ingest_drops_near_dup_refresh(spark, sf_dir, tmp_path):
    """q_streaming_cdc_ingest's operator contract: a second wave that
    re-sends the SAME documents (the full-recrawl shape) adds nothing
    — every chunk fingerprint is already in the store, so each doc's
    seen-ratio is 100% and the accept predicate rejects it; and a
    replayed drain over the same checkpoint is a manifest-guarded
    no-op."""
    import pyspark.sql.functions as F

    from breweries_data_pipeline_spark.sources import read_table
    from breweries_data_pipeline_spark.streaming import (
        read_corpus,
        streaming_cdc_ingest,
    )
    from breweries_data_pipeline_spark.streaming.upsert import (
        committed_versions,
    )
    from breweries_data_pipeline_spark.streaming.windows import (
        stage_parquet_batches,
    )

    docs = (
        read_table(spark, sf_dir, "documents")
        .where(F.length("text") >= 1)
        .select("doc_id", "text")
        .limit(60)
    )
    store = str(tmp_path / "store")
    staged = stage_parquet_batches(
        [docs.filter(F.col("doc_id") % 2 == i) for i in range(2)]
    )

    def _drain(ck, d=None):
        # a checkpoint pins its file-source path, so the ck1 replay
        # must reuse the SAME staged dir; only a fresh checkpoint may
        # stage anew
        if d is None:
            d = stage_parquet_batches(
                [docs.filter(F.col("doc_id") % 2 == i) for i in range(2)]
            )
        sdf = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(d)
        )
        streaming_cdc_ingest(sdf, store, checkpoint_dir=ck)

    _drain(str(tmp_path / "ck1"), staged)
    v1 = committed_versions(store)
    accepted1 = read_corpus(spark, store)
    n1 = accepted1.count()
    assert len(v1) == 2 and n1 > 0
    # batch-1 docs that overlapped batch-0 content were rejected OR
    # accepted with a sub-threshold seen count — every stored row obeys
    # the integer predicate
    bad = accepted1.filter(
        F.col("n_seen") * 1000000 >= 500000 * F.col("n_fps")
    )
    assert bad.count() == 0
    # replay over the SAME checkpoint: manifest guard, no new versions
    _drain(str(tmp_path / "ck1"), staged)
    assert committed_versions(store) == v1
    assert read_corpus(spark, store).count() == n1
    # full re-crawl with a FRESH checkpoint: all chunks known, nothing
    # new is accepted
    _drain(str(tmp_path / "ck2"))
    assert read_corpus(spark, store).count() == n1


def test_redelivered_committed_batch_is_a_noop(spark, tmp_path):
    """foreachBatch redelivers a batch when its commit landed but the
    stream checkpoint didn't. For an already-committed batch id the
    merge must SKIP (marker check), not re-run: re-merging would read
    and overwrite the same v{batch_id} directory in one lazy job —
    Spark deletes the target's files before the scan executes, so the
    re-run either crashes or silently publishes only the batch rows
    over the full snapshot."""
    from breweries_data_pipeline_spark.streaming.upsert import (
        committed_versions,
        merge_batch_into_snapshot,
        read_snapshot,
    )

    snap = str(tmp_path / "snap")
    b0 = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b")], "k long, ver long, payload string"
    )
    b1 = spark.createDataFrame([(2, 20, "b2")], "k long, ver long, payload string")
    merge_batch_into_snapshot(b0, 0, snap, ["k"], ["ver"])
    merge_batch_into_snapshot(b1, 1, snap, ["k"], ["ver"])
    before = sorted(tuple(r) for r in read_snapshot(spark, snap).collect())
    assert before == [(1, 10, "a"), (2, 20, "b2")]

    # redelivery of committed batch 1 — with DIFFERENT (stale) content,
    # the worst case: a re-merge would publish this instead of skipping
    stale = spark.createDataFrame([(9, 1, "stale")], "k long, ver long, payload string")
    merge_batch_into_snapshot(stale, 1, snap, ["k"], ["ver"])
    after = sorted(tuple(r) for r in read_snapshot(spark, snap).collect())
    assert after == before
    assert committed_versions(snap) == [0, 1]


def test_late_drop_actually_drops_rows(spark, sf_dir):
    """q_streaming_late_drop's semantic claim, executed: the staged
    three-batch replay must yield STRICTLY FEWER counted rows over its
    emitted windows than a batch recount of all events in those same
    windows — the difference is exactly the late batch-3 rows Spark's
    watermark dropped. A single-batch drain (or a broken staging that
    merges the files into one batch) would make the two equal and fail
    here."""
    from breweries_data_pipeline_spark.queries import REGISTRY
    from breweries_data_pipeline_spark.sources import read_table

    res = REGISTRY["q_streaming_late_drop"][0](spark, sf_dir)
    got = res.agg(F.sum("n")).collect()[0][0]

    ev = read_table(spark, sf_dir, "events").select(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
        .alias("window_start"),
        "event_type",
    )
    emitted = res.select("window_start", "event_type").distinct()
    full = ev.join(emitted, ["window_start", "event_type"]).count()
    assert got < full, (got, full)
