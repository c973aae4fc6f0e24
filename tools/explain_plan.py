"""Capture .explain("formatted") for named registry queries to files.

Usage:
  python tools/explain_plan.py --out plans/r12 --suffix before q_foo q_bar
  python tools/explain_plan.py --out plans/r12 --suffix after --sf-dir /root/testdata/sf0.1 q_foo

Writes <out>/<query>_<suffix>.txt. The optimization-round judge checks
plan claims (Exchange counts, join strategies, PushedFilters,
BatchEvalPython/ArrowEvalPython nodes) against these files.
"""

from __future__ import annotations

import argparse
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def explain_formatted(df) -> str:
    jdf = df._jdf
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--out", default="plans/r12")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from breweries_data_pipeline_spark.queries import REGISTRY
    from breweries_data_pipeline_spark.session import get_spark

    unknown = [q for q in args.queries if q not in REGISTRY]
    if unknown:
        raise SystemExit(f"not in registry: {unknown}")

    outdir = os.path.join(HERE, args.out)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("explain-plan")
    spark.sparkContext.setLogLevel("ERROR")
    for name in args.queries:
        fn, _ = REGISTRY[name]
        df = fn(spark, args.sf_dir)
        txt = explain_formatted(df)
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
