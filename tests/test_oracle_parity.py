"""The engine's main correctness gate, mirroring the driver: every
registry query with an oracle must hash-match DuckDB on the same
parquet tables."""

from __future__ import annotations

import pytest

from breweries_data_pipeline_spark.queries import REGISTRY
from tests.parity import compare

ORACLE_QUERIES = sorted(name for name, (_, sql) in REGISTRY.items() if sql is not None)
ROWS_ONLY_QUERIES = sorted(name for name, (_, sql) in REGISTRY.items() if sql is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    fn, sql = REGISTRY[name]
    result = compare(fn(spark, sf_dir), sql, sf_dir)
    assert result["match"], f"{name}: {result['detail']}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, sf_dir, name):
    fn, _ = REGISTRY[name]
    df = fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
