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
