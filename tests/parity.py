"""Local replica of the driver's DuckDB-oracle correctness check:
run a registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compare row count, column names, and an
order-insensitive canonical value set (floats compared by full-repr,
i.e. bit-exact)."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT or v is pd.NA:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (int,)):
        return str(v)
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    out = [tuple(_canon(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return sorted(out)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> dict:
    """Returns {'match': bool, 'detail': str}."""
    sp = spark_df.toPandas()
    con = duckdb_connection(sf_dir)
    try:
        dk = con.sql(oracle_sql).df()
    finally:
        con.close()

    problems = []
    if sorted(sp.columns) != sorted(dk.columns):
        problems.append(f"columns differ: spark={sorted(sp.columns)} duckdb={sorted(dk.columns)}")
    elif len(sp) != len(dk):
        problems.append(f"row counts differ: spark={len(sp)} duckdb={len(dk)}")
    else:
        a, b = canonical_rows(sp), canonical_rows(dk)
        if a != b:
            sa, sb = set(a), set(b)
            only_a = sorted(sa - sb)[:3]
            only_b = sorted(sb - sa)[:3]
            problems.append(f"values differ; spark-only={only_a}; duckdb-only={only_b}")
    return {"match": not problems, "detail": "; ".join(problems)}
