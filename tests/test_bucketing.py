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


def test_zorder_layout_enables_two_column_skipping(spark, sf_dir, tmp_path):
    """A Z-ordered layout must give each file a small bounding box in
    BOTH clustered columns — the property min-max data skipping needs.
    Compare against a single-column sort, where the second column's
    per-file span stays ~global."""
    import pyarrow.parquet as pq

    from breweries_data_pipeline_spark.sources import read_table, write_zordered

    df = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    zpath = str(tmp_path / "zordered")
    write_zordered(df, zpath, "o_custkey", "o_orderkey", n_files=8)

    import glob as _glob

    spans_a, spans_b = [], []
    global_a = df.agg({"o_custkey": "max"}).first()[0]
    global_b = df.agg({"o_orderkey": "max"}).first()[0]
    for f in _glob.glob(zpath + "/*.parquet"):
        md = pq.read_metadata(f)
        mins = {"o_custkey": None, "o_orderkey": None}
        maxs = {"o_custkey": None, "o_orderkey": None}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    st = col.statistics
                    mins[name] = st.min if mins[name] is None else min(mins[name], st.min)
                    maxs[name] = st.max if maxs[name] is None else max(maxs[name], st.max)
        spans_a.append((maxs["o_custkey"] - mins["o_custkey"]) / max(global_a, 1))
        spans_b.append((maxs["o_orderkey"] - mins["o_orderkey"]) / max(global_b, 1))

    # every file's bounding box must be well under the global span in
    # BOTH dimensions (single-column sort gives ~1.0 in the other dim)
    assert len(spans_a) >= 4
    assert sum(spans_a) / len(spans_a) < 0.8
    assert sum(spans_b) / len(spans_b) < 0.8
