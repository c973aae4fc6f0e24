"""Bucketed co-located joins: writing both fact tables bucketed by the
join key must produce an exchange-free sort-merge join — the pay-the-
shuffle-once strategy for repeatedly-joined 100 TB tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from breweries_data_pipeline_spark.sources import read_table
from breweries_data_pipeline_spark.sources.writers import write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    lineitem = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    try:
        write_bucketed(orders, "t_orders_bkt", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
        write_bucketed(lineitem, "t_lineitem_bkt", ["l_orderkey"], 8, sort_cols=["l_orderkey"])

        a = spark.table("t_orders_bkt")
        b = spark.table("t_lineitem_bkt")
        # forbid broadcast so the test exercises the bucketed SMJ path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, a.o_orderkey == b.l_orderkey)
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan  # buckets align
            # and the result is right
            n = joined.count()
            expected = (
                orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey).count()
            )
            assert n == expected
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_bkt")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_bkt")


def test_bucketed_aggregation_has_no_exchange(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    try:
        write_bucketed(orders, "t_orders_agg_bkt", ["o_custkey"], 8)
        agg = (
            spark.table("t_orders_agg_bkt")
            .groupBy("o_custkey")
            .agg(F.count("*").alias("n"))
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        assert agg.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_agg_bkt")
