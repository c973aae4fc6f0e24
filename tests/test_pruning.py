"""Partition pruning: a filter on the partition column of a
hive-partitioned layout must prune at planning time (PartitionFilters
in the scan, only matching directories read) — the mechanism that
turns a 100 TB table into a 1 TB scan when queries filter on the
layout key."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from breweries_data_pipeline_spark.sources import read_table
from breweries_data_pipeline_spark.sources.writers import write_parquet


def test_partition_filter_prunes_directories(spark, sf_dir, tmp_path):
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    path = str(tmp_path / "orders_part")
    write_parquet(orders, path, partition_by=["o_orderstatus"])
    dirs = sorted(d for d in os.listdir(path) if d.startswith("o_orderstatus="))
    assert len(dirs) >= 2

    df = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters")[1][:200]
    # count matches the unpartitioned filter
    expected = orders.filter(F.col("o_orderstatus") == "F").count()
    assert df.count() == expected
