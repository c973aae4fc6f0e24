"""One-query spill/wall probe: run a registry query at a given SF dir
in THIS process's fresh session and print one JSON line with the wall
and the summed per-stage memory/disk spill bytes (from the live
AppStatusStore — no event log needed). Used for the r9
fingerprint-before-exchange A/B (SCALE.md records the pairs).

Usage: python tools/measure_spill.py <query> <sf_dir>
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def _spill_bytes(spark) -> tuple[int, int, int, int]:
    """Sum (memoryBytesSpilled, diskBytesSpilled, shuffleWriteBytes,
    shuffleReadBytes) over all stages via the status REST API (the
    AppStatusStore JVM methods have Scala default args py4j can't call
    across Spark versions)."""
    import urllib.request

    # use the port the UI actually BOUND (uiWebUrl), not the
    # configured one — on a port conflict Spark binds port+1 and a
    # probe of the configured port would read a stale app's numbers
    ui = spark.sparkContext.uiWebUrl
    if ui is None:
        raise RuntimeError(
            "Spark UI disabled (spark.ui.enabled=false); the spill "
            "probe reads /api/v1 off the live UI — re-run with "
            "spark.ui.enabled=true"
        )
    base = f"{ui}/api/v1"
    with urllib.request.urlopen(f"{base}/applications") as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(f"{base}/applications/{app_id}/stages") as r:
        stages = json.load(r)
    mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    # bytes THROUGH the exchanges — the number that stays meaningful
    # when the heap absorbs the sort (spill 0 does not mean the
    # fingerprint/byte-faithful forms moved the same data)
    sw = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    sr = sum(s.get("shuffleReadBytes", 0) for s in stages)
    return mem, disk, sw, sr


def main() -> None:
    name, sf_dir = sys.argv[1], sys.argv[2]
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    from breweries_data_pipeline_spark.queries import REGISTRY
    from breweries_data_pipeline_spark.session import get_spark
    from breweries_data_pipeline_spark.sources import read_table

    spark = get_spark(
        f"spill-{name}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("documents",):
        read_table(spark, sf_dir, t).foreach(lambda r: None)
    fn, _ = REGISTRY[name]
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    wall = round(time.perf_counter() - t0, 3)
    mem, disk, sw, sr = _spill_bytes(spark)
    print(json.dumps({
        "query": name, "sf_dir": sf_dir, "wall_s": wall,
        "memory_spill_mb": round(mem / 1e6, 1),
        "disk_spill_mb": round(disk / 1e6, 1),
        "shuffle_write_mb": round(sw / 1e6, 1),
        "shuffle_read_mb": round(sr / 1e6, 1),
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()
