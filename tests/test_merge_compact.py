"""CDC merge semantics + parquet compaction."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from breweries_data_pipeline_spark.operators.merge import merge_upsert
from breweries_data_pipeline_spark.sources.writers import compact_parquet


def test_merge_upsert_latest_wins_and_deletes(spark):
    base = spark.createDataFrame(
        [(1, 1, "a", False), (2, 1, "b", False)],
        ["k", "v", "payload", "deleted"],
    )
    changes = spark.createDataFrame(
        [(1, 2, "a2", False), (2, 2, "b2", True), (3, 1, "c", False)],
        ["k", "v", "payload", "deleted"],
    )
    out = {
        r.k: (r.v, r.payload)
        for r in merge_upsert(
            base,
            changes,
            ["k"],
            [F.col("v").desc()],
            delete_predicate=F.col("deleted"),
        ).collect()
    }
    assert out == {1: (2, "a2"), 3: (1, "c")}  # 2 deleted, 1 upserted, 3 inserted


def test_merge_upsert_resurrect_after_delete(spark):
    base = spark.createDataFrame([(1, 1, True)], ["k", "v", "deleted"])
    changes = spark.createDataFrame([(1, 2, False)], ["k", "v", "deleted"])
    out = merge_upsert(
        base, changes, ["k"], [F.col("v").desc()], delete_predicate=F.col("deleted")
    ).collect()
    assert [(r.k, r.v) for r in out] == [(1, 2)]


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    path = str(tmp_path / "many")
    spark.range(10_000).repartition(32).write.parquet(path)
    before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert before == 32

    n = compact_parquet(spark, path, target_file_bytes=10**9)
    after = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n == 1 and after == 1
    assert spark.read.parquet(path).count() == 10_000
