"""Paginated ingest as a native Spark 4 Python DataSource
(pyspark.sql.datasource) — the idiomatic-Spark form of the
reference's paginated REST source (S1,
src/pipelines/breweries_fetch_bronze_notebook.py:27-66): instead of a
driver-side requests loop, each PAGE is an InputPartition, so pages
are fetched and parsed by executor tasks in parallel and the data
lands directly in DataFrame form — no driver materialization, no
mapInPandas plumbing at the call site:

    spark.dataSource.register(PagedJsonDataSource)
    df = (spark.read.format("paged_json")
          .schema("id long, name string")
          .option("path", "/data/pages")      # page-<k>.json files
          .load())

The "service" behind the source is a directory of JSON-Lines page
files (page-0.json, page-1.json, ...) — the same fixture shape the
engine's HTTP-stubbed tests use; a production variant would swap the
page enumeration/fetch for HTTP calls with the retry/backoff policy
in sources/rest_api.py (the transport is the ONLY thing that
changes; partition-per-page planning, schema projection, and the
task-parallel fan-out are exactly this code).

Scale posture: one partition per page keeps the fan-out equal to the
page count (the reference fetches 50-row pages serially; here 10k
pages run as 10k tasks scheduled across the cluster), and the
per-partition row generator streams rows without buffering the whole
page list. Rows are projected to the user schema field-by-field, so
malformed/missing fields surface as nulls — the PERMISSIVE posture
the reference's Bronze layer relies on.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class PagePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class PagedJsonReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.options = options
        root = options.get("path")
        if not root:
            raise ValueError("paged_json requires .option('path', <dir>)")
        self.root = root

    def partitions(self) -> Sequence[PagePartition]:
        # one InputPartition per page file -> one task per page
        pages = sorted(
            f for f in os.listdir(self.root)
            if f.startswith("page-") and f.endswith(".json")
        )
        if not pages:
            return [PagePartition(os.path.join(self.root, "__empty__"))]
        return [PagePartition(os.path.join(self.root, f)) for f in pages]

    def read(self, partition: PagePartition) -> Iterator[tuple]:
        if partition.path.endswith("__empty__"):
            return
        fields = [f.name for f in self.schema.fields]
        with open(partition.path) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except ValueError:
                    # PERMISSIVE: a malformed LINE becomes an all-null
                    # row (raw text in _corrupt_record if the schema
                    # declares it) — one bad page line must not kill
                    # the whole ingest task, matching spark.read.json
                    yield tuple(
                        line if name == "_corrupt_record" else None
                        for name in fields
                    )
                    continue
                if not isinstance(rec, dict):
                    # a JSON scalar/array line has no fields to project
                    yield tuple(
                        line if name == "_corrupt_record" else None
                        for name in fields
                    )
                    continue
                # PERMISSIVE projection: absent fields -> null
                yield tuple(rec.get(name) for name in fields)


class PagedJsonDataSource(DataSource):
    """format name: ``paged_json``"""

    @classmethod
    def name(cls) -> str:
        return "paged_json"

    def schema(self) -> str:
        # a user schema via .schema(...) overrides this default
        return "id long, name string"

    def reader(self, schema: StructType) -> PagedJsonReader:
        return PagedJsonReader(schema, self.options)
