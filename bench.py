"""Benchmark runner: times the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed with a count()-style full materialization
(collect for small results) so the timing covers scan -> shuffle ->
aggregate, not plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from breweries_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from breweries_data_pipeline_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q_pricing_summary",
    "q_join_shuffle",
    "q_join_broadcast",
    "q_topk_per_group",
    "q_rollup",
    "q_dedup_by_key",
    "q_event_window",
    "q_count_distinct",
    "q_gold_union",
    "q_scan_parquet",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/session so per-query numbers measure the query, not startup
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn, _ = REGISTRY[name]
        start = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - start, 4)
        _ = n

    total = round(sum(timings.values()), 4)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )


if __name__ == "__main__":
    main()
