"""breweries_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, idiomatic-Spark engine with the query/data-processing
capabilities of the reference medallion ETL pipeline
(BrunaMartins-data/breweries-data-pipeline), re-expressed Spark-first:

- tables are DataFrames; layers are Parquet directories
- schemas are declarative (YAML/dict -> StructType), enforced at read
- cleaning (dedup / dropna / normalize / cast) are stock Column ops
- aggregation is a declarative spec compiled to groupBy().agg(F.expr)
- quality rules compile to ONE single-pass agg job (the reference runs
  one Spark job per rule)
- pipelines are YAML-declared (the reference's own config shapes) and
  run stage-by-stage in one SparkSession (pipeline.py)
- extensions: joins (broadcast/shuffle/semi/anti/salted/as-of/range),
  windows (ranking, frames, sessions, gap-fill), rollup/cube/pivot/
  grouping sets, subquery decorrelation shapes, text analysis
  (lang-ID, quality scoring, tf-idf, fingerprinting), dedup (exact +
  MinHash-LSH + SimHash + n-gram Jaccard + embedding-cosine +
  connected-components cluster collapse), embedding similarity search
  (exact broadcast top-k + hyperplane-LSH ANN + IVF), multimodal
  binary columns over Arrow-batched mapInPandas, CDC merge, and
  Structured Streaming (watermarked event windows, streaming dedup,
  stateful counts, stream-stream interval joins)

Everything is built on the public PySpark DataFrame/SQL API; no custom
Catalyst rules are needed (SURVEY.md §4).
"""

__version__ = "0.1.0"

from breweries_data_pipeline_spark.cache import (  # noqa: F401
    release_caches,
    track_persist,
)
from breweries_data_pipeline_spark.session import get_spark  # noqa: F401
