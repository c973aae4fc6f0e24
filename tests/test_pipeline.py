"""S10 + §2.7: YAML config loading and the config-driven pipeline
runner, proven against the REFERENCE'S OWN yaml files
(/root/reference/configs — read-only) and a breweries-shaped fixture.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from breweries_data_pipeline_spark.pipeline import (
    load_metadata,
    load_pipeline_config,
    run_pipeline,
)

REF_CONFIGS = "/root/reference/configs"

# a paginated stub API: mixed-case/whitespace strings, a duplicate id,
# a null name — exercising every silver cleaning rule
PAGES = [
    [
        {"id": "b1", "name": "  Alpha Brew  ", "brewery_type": "Micro",
         "city": "Austin", "state": "TX", "country": "US",
         "updated_at": "2025-01-01T00:00:00Z"},
        {"id": "b2", "name": "BETA", "brewery_type": "nano",
         "city": " Portland ", "state": "or", "country": "US",
         "updated_at": "2025-01-01T00:00:00Z"},
    ],
    [
        {"id": "b1", "name": "Alpha Brew DUPLICATE", "brewery_type": "micro",
         "city": "Austin", "state": "TX", "country": "US",
         "updated_at": "2025-01-02T00:00:00Z"},
        {"id": "b3", "name": None, "brewery_type": "brewpub",
         "city": "Denver", "state": "CO", "country": "US",
         "updated_at": "2025-01-01T00:00:00Z"},
        {"id": "b4", "name": "Delta", "brewery_type": "regional",
         "city": "Miami", "state": "FL", "country": "US",
         "updated_at": "2025-01-01T00:00:00Z"},
    ],
]


def stub_fetch_page(page: int, per_page: int):
    return PAGES[page - 1] if page <= len(PAGES) else []


def test_load_reference_metadata_schemas():
    ing = load_metadata(f"{REF_CONFIGS}/metadata/breweries_metadata_ingestion.yml")
    assert [f.name for f in ing.schema.fields] == [
        "id", "name", "brewery_type", "city", "state", "country",
        "updated_at", "ingestion_date",
    ]
    assert isinstance(ing.schema["updated_at"].dataType, T.TimestampType)
    assert isinstance(ing.schema["ingestion_date"].dataType, T.DateType)
    assert not ing.schema["id"].nullable
    assert ing.partition_by == ["state"]

    gold = load_metadata(f"{REF_CONFIGS}/metadata/breweries_metadata_gold.yml")
    # 'integer' maps to a real integral type, not the reference's
    # silent StringType fallback
    assert isinstance(gold.schema["total_breweries"].dataType, T.IntegerType)


def test_load_reference_pipeline_configs():
    ing = load_pipeline_config(f"{REF_CONFIGS}/breweries_ingestion_pipeline.yml")
    assert [s.task_id for s in ing.stages] == ["fetch_data_bronze", "transform_silver"]
    assert [s.kind for s in ing.stages] == ["ingest", "transform"]
    assert ing.stages[1].depends_on == ["fetch_data_bronze"]

    gold = load_pipeline_config(f"{REF_CONFIGS}/breweries_gold_pipeline.yml")
    assert [s.kind for s in gold.stages] == ["aggregate", "quality"]


def test_reference_ingestion_pipeline_end_to_end(spark, tmp_path):
    cfg = load_pipeline_config(f"{REF_CONFIGS}/breweries_ingestion_pipeline.yml")
    results = run_pipeline(
        spark,
        cfg,
        variables={"ds": "2025-01-01"},
        path_rewrites={
            "/opt/airflow/data": str(tmp_path / "data"),
            "/opt/airflow/configs": REF_CONFIGS,
        },
        fetch_page=stub_fetch_page,
    )
    assert results["fetch_data_bronze"]["records"] == 5

    silver = spark.read.parquet(results["transform_silver"]["output_path"])
    rows = {r.id: r for r in silver.collect()}
    # b1 deduped to one row; b3 dropped (null name); strings normalized
    assert sorted(rows) == ["b1", "b2", "b4"]
    assert rows["b1"].name == "alpha brew"
    assert rows["b2"].state == "or" and rows["b2"].city == "portland"
    # partitioned by state per the metadata declaration
    assert results["transform_silver"]["partition_by"] == ["state"]
    part_dirs = [d for d in os.listdir(results["transform_silver"]["output_path"])
                 if d.startswith("state=")]
    assert len(part_dirs) == 3


def test_reference_gold_aggregate_stage(spark, tmp_path):
    """The reference gold config's aggregate stage over a silver-shaped
    fixture reproduces the union-of-views long format: discriminator
    column, missing-columns-null, stamp."""
    silver = spark.createDataFrame(
        [("tx", "micro"), ("tx", "nano"), ("or", "micro")],
        ["state", "brewery_type"],
    )
    silver.write.parquet(str(tmp_path / "silver"))

    cfg = load_pipeline_config(f"{REF_CONFIGS}/breweries_gold_pipeline.yml")
    agg_stage = [s for s in cfg.stages if s.kind == "aggregate"][0]
    from breweries_data_pipeline_spark.pipeline import PathResolver, run_aggregate_stage

    paths = PathResolver(
        {"ds": "2025-01-01"},
        {"/opt/airflow/data/silver/breweries/2025-01-01/": str(tmp_path / "silver"),
         "/opt/airflow/data/gold/breweries/2025-01-01/": str(tmp_path / "gold")},
    )
    run_aggregate_stage(spark, agg_stage, paths)

    gold = spark.read.parquet(str(tmp_path / "gold"))
    assert sorted(gold.columns) == [
        "aggregation", "brewery_count", "brewery_type", "state",
        "transformation_date",
    ]
    by_state = [r for r in gold.collect() if r.aggregation == "by_state"]
    by_type = [r for r in gold.collect() if r.aggregation == "by_type"]
    # missing-column-null topology: by_state rows have null brewery_type
    assert all(r.brewery_type is None for r in by_state)
    assert all(r.state is None for r in by_type)
    assert {(r.state, r.brewery_count) for r in by_state} == {("tx", 2), ("or", 1)}
    assert all(r.transformation_date == "2025-01-01" for r in gold.collect())


def test_engine_gold_pipeline_with_quality_report(spark, tmp_path):
    silver = spark.createDataFrame(
        [("tx", "micro"), ("tx", "nano"), ("or", "micro"), ("or", None)],
        ["state", "brewery_type"],
    )
    silver.write.parquet(str(tmp_path / "silver"))

    cfg = load_pipeline_config("configs/example_gold_pipeline.yml")
    results = run_pipeline(
        spark, cfg,
        variables={"ds": "2025-06-30", "base": str(tmp_path)},
    )
    report_path = results["validate_gold_quality"]["report_path"]
    with open(report_path) as f:
        report = json.load(f)
    by_rule = {r["rule_name"]: r for r in report}
    assert by_rule["Count > 0 for all views"]["passed"] is True
    assert by_rule["View discriminator present"]["invalid_count"] == 0


def test_unknown_rule_type_raises(spark, tmp_path):
    spark.createDataFrame([(1,)], ["x"]).write.parquet(str(tmp_path / "t"))
    cfg = load_pipeline_config("configs/example_gold_pipeline.yml")
    q = [s for s in cfg.stages if s.kind == "quality"][0]
    q.quality_rules = [{"rule": "typo'd", "column": "x", "type": "not_nul"}]
    from breweries_data_pipeline_spark.pipeline import PathResolver, run_quality_stage

    paths = PathResolver({"base": str(tmp_path)}, {})
    q.parameters = {"input_path": str(tmp_path / "t"),
                    "report_path": str(tmp_path / "r.json")}
    with pytest.raises(ValueError, match="unknown quality rule"):
        run_quality_stage(spark, q, paths)


def test_dependency_cycle_detected():
    from breweries_data_pipeline_spark.pipeline import Stage, _topo_sort

    a = Stage("a", "quality", {}, [{"rule": "r", "column": "c", "type": "not_null"}], ["b"])
    b = Stage("b", "quality", {}, [{"rule": "r", "column": "c", "type": "not_null"}], ["a"])
    with pytest.raises(ValueError, match="cycle"):
        _topo_sort([a, b])


def test_pipeline_emits_per_stage_metrics(spark, tmp_path, caplog):
    """Every attempted stage yields one metric record with status /
    duration / rows_written (Observation-fed — no plan re-execution),
    and a matching structured JSON event in the log (closes the
    reference observability gap, src/libs/observability.py:9-89)."""
    import logging

    cfg = load_pipeline_config(f"{REF_CONFIGS}/breweries_ingestion_pipeline.yml")
    with caplog.at_level(
        logging.INFO, logger="breweries_data_pipeline_spark.pipeline"
    ):
        results = run_pipeline(
            spark,
            cfg,
            variables={"ds": "2025-01-01"},
            path_rewrites={
                "/opt/airflow/data": str(tmp_path / "data"),
                "/opt/airflow/configs": REF_CONFIGS,
            },
            fetch_page=stub_fetch_page,
        )
    assert [m["stage"] for m in results.metrics] == [
        "fetch_data_bronze", "transform_silver",
    ]
    by_stage = {m["stage"]: m for m in results.metrics}
    assert all(m["status"] == "success" for m in results.metrics)
    assert all(m["duration_sec"] >= 0 for m in results.metrics)
    assert by_stage["fetch_data_bronze"]["rows_written"] == 5
    # silver rows_written == what the Observation saw == what's on disk
    n_silver = spark.read.parquet(
        results["transform_silver"]["output_path"]
    ).count()
    assert by_stage["transform_silver"]["rows_written"] == n_silver

    events = [json.loads(r.message) for r in caplog.records
              if r.name == "breweries_data_pipeline_spark.pipeline"]
    kinds = [(e["event"], e["stage"]) for e in events]
    assert kinds == [
        ("stage_started", "fetch_data_bronze"),
        ("stage_finished", "fetch_data_bronze"),
        ("stage_started", "transform_silver"),
        ("stage_finished", "transform_silver"),
    ]


def test_pipeline_failure_metric_and_on_failure_hook(spark, tmp_path):
    """A failing stage records a failed metric, invokes the pluggable
    on_failure hook with it (reference src/libs/alerts.py:30-87), and
    still propagates the original exception — including when the hook
    itself raises."""
    cfg = load_pipeline_config(f"{REF_CONFIGS}/breweries_ingestion_pipeline.yml")
    alerts = []

    def bad_hook(metric):
        alerts.append(metric)
        raise RuntimeError("alert transport down")

    def broken_fetch(page, per_page):
        raise ConnectionError("api unreachable")

    with pytest.raises(Exception, match="api unreachable"):
        run_pipeline(
            spark,
            cfg,
            variables={"ds": "2025-01-01"},
            path_rewrites={
                "/opt/airflow/data": str(tmp_path / "data"),
                "/opt/airflow/configs": REF_CONFIGS,
            },
            fetch_page=broken_fetch,
            on_failure=bad_hook,
        )
    assert len(alerts) == 1
    assert alerts[0]["stage"] == "fetch_data_bronze"
    assert alerts[0]["status"] == "failed"
    assert "api unreachable" in alerts[0]["error"]
