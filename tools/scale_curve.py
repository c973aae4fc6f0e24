"""Three-point scaling curves for selected registry queries.

The per-round soak measures one decade (sf0.1 -> sf1). This tool
extends the curve another ~half decade (sf3 = 30x sf0.1, built by
gen_sf.py --copies 30) for the scale-critical operators, each query in
its OWN fresh subprocess/JVM with warmed tables and min-of-2 walls —
the isolated-measurement discipline the soak self-audit enforces
(see bench.py _recheck_outliers).

Usage:
    python tools/gen_sf.py --src /root/testdata/sf0.1 \
        --dst .localdata/sf3 --copies 30       # once
    python tools/scale_curve.py q_neardup_incremental q_minhash_lsh
    # prints one JSON object: {query: {label: wall_sec, ...}, ...}

Env: SPARK_GRAFT_CURVE_DIRS overrides the measured dirs
(comma-separated, labels from basename).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

DEFAULT_DIRS = [
    "/root/testdata/sf0.1",
    os.path.join(REPO, ".localdata", "sf1"),
    os.path.join(REPO, ".localdata", "sf3"),
]


def _measure_one(query: str, dirs: list[str]) -> dict[str, float]:
    from breweries_data_pipeline_spark.queries import REGISTRY
    from breweries_data_pipeline_spark.session import get_spark
    from breweries_data_pipeline_spark.sources import read_table

    from bench import WARMUP_TABLES, _materialize  # noqa: E402

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(
        "scale-curve", extra_conf={"spark.cleaner.periodicGC.interval": "45s"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn, _ = REGISTRY[query]
    out: dict[str, float] = {}
    for d in dirs:
        label = os.path.basename(d.rstrip("/"))
        for t in WARMUP_TABLES:
            _materialize(read_table(spark, d, t))
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            _materialize(fn(spark, d))
            walls.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        out[label] = round(min(walls), 3)
    return out


def main() -> None:
    dirs = [
        d
        for d in os.environ.get(
            "SPARK_GRAFT_CURVE_DIRS", ",".join(DEFAULT_DIRS)
        ).split(",")
        if os.path.isdir(d)
    ]
    if os.environ.get("SPARK_GRAFT_CURVE_ONE"):
        print(
            json.dumps(_measure_one(os.environ["SPARK_GRAFT_CURVE_ONE"], dirs))
        )
        return
    queries = sys.argv[1:]
    if not queries:
        raise SystemExit("usage: scale_curve.py q_name [q_name ...]")
    curves: dict[str, dict[str, float]] = {}
    for q in queries:
        env = dict(os.environ)
        env["SPARK_GRAFT_CURVE_ONE"] = q
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True,
            text=True,
            env=env,
            timeout=1800,
        )
        for ln in reversed(r.stdout.strip().splitlines()):
            if ln.startswith("{"):
                curves[q] = json.loads(ln)
                break
        else:
            curves[q] = {"error": (r.stderr or "no output")[-200:]}
        print(f"# {q}: {curves[q]}", file=sys.stderr)
    print(json.dumps(curves, indent=1))


if __name__ == "__main__":
    main()
