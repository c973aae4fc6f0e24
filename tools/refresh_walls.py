"""Quiet-host refresh of pressure-inflated SF1_WALLS entries.

The r10 driver soak ran under host-pressure waves; newest-wins merging
let contended walls overwrite r9's cleaner ones (q_kcore 61.4s vs its
~2.3x-isolated profile, q_neardup_index_fp 89.2s vs the 36.0s
density-controlled record). This tool re-measures named queries at sf1
in THIS process's fresh session, stamps each wall with the r11
calibration context ({load, probe_sec} — see bench.py PROBE_QUERY),
and merges with leg="refresh". It REFUSES to start (or to record a
given query) when the host is demonstrably contended, so a refresh can
only ever replace a wall with a better-adjudicated one.

Usage:
  python tools/refresh_walls.py q_kcore q_neardup_index_fp ...
  python tools/refresh_walls.py --flagged        # everything
      tools/update_status.py's contended_walls() flags
  python tools/refresh_walls.py --max-load 2.0 --reps 2 q_kcore
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tools"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="registry query names")
    ap.add_argument("--flagged", action="store_true",
                    help="refresh every probe-flagged contended wall")
    ap.add_argument("--max-load", type=float, default=4.0,
                    help="skip measuring while 1-min load exceeds this")
    ap.add_argument("--reps", type=int, default=2,
                    help="reps per query; the MIN wall is recorded")
    args = ap.parse_args()

    import bench  # repo-root module: reuses probe/merge/soak-dir logic
    from update_status import contended_walls

    names = list(args.queries)
    if args.flagged:
        names += [
            q for q in contended_walls(bench._load_sf1_walls())
            if q not in names
        ]
    if not names:
        raise SystemExit("nothing to refresh (no names, nothing flagged)")
    unknown = [q for q in names if q not in bench.REGISTRY]
    if unknown:
        raise SystemExit(f"not in registry: {unknown}")

    load = bench._load_avg()
    if load > args.max_load:
        raise SystemExit(
            f"host contended (load {load} > --max-load {args.max_load}) "
            "— a refresh now would just re-record pressure; try later"
        )

    sd = bench._soak_dir()
    if sd is None:
        raise SystemExit("no sf1 soak replica (and SPARK_GRAFT_SOAK=0?)")
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    from breweries_data_pipeline_spark.session import get_spark
    from breweries_data_pipeline_spark.sources import read_table

    spark = get_spark(
        "refresh-walls",
        extra_conf={"spark.cleaner.periodicGC.interval": "45s"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for t in bench.WARMUP_TABLES:
        bench._materialize(read_table(spark, sd, t))
    bench._calibration_probe(spark, sf01)  # burn codegen/first-touch

    done, skipped = {}, []
    for name in names:
        # per-query gate: the PROBE is the adjudicator — raw load is
        # self-contaminated mid-run (this tool's own 32-thread stages
        # push the 1-min average over any sane threshold; first run
        # skipped 15/16 queries on its own load while every probe sat
        # inside the clean spread). --max-load gates only the start.
        probe = bench._calibration_probe(spark, sf01)
        load = bench._load_avg()
        if probe > 3 * bench.PROBE_CLEAN_SPREAD[1]:
            skipped.append({"query": name, "load": load, "probe": probe})
            continue
        fn, _ = bench.REGISTRY[name]
        walls = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            bench._materialize(fn(spark, sd))
            walls.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        bench._merge_sf1_walls({name: min(walls)}, "refresh")
        done[name] = {"sec": min(walls), "reps": walls,
                      "probe_sec": probe, "load": load}
        bench._jvm_gc(spark)
    spark.stop()
    print(json.dumps({"refreshed": done, "skipped_contended": skipped},
                     separators=(",", ":")))


if __name__ == "__main__":
    main()
