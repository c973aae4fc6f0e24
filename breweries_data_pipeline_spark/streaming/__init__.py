from breweries_data_pipeline_spark.streaming.joins import (  # noqa: F401
    interval_join,
    static_enrich,
)
from breweries_data_pipeline_spark.streaming.upsert import (  # noqa: F401
    commit_snapshot_version,
    committed_versions,
    merge_batch_into_snapshot,
    read_snapshot,
    streaming_upsert,
)
from breweries_data_pipeline_spark.streaming.stateful import (  # noqa: F401
    stateful_user_counts,
    streaming_cusum,
    streaming_dedup,
)
from breweries_data_pipeline_spark.streaming.windows import (  # noqa: F401
    read_events_stream,
    run_available_now,
    state_partitions,
    streaming_event_window_agg,
)
from breweries_data_pipeline_spark.streaming.corpus_ingest import (  # noqa: F401
    read_corpus,
    read_documents_stream,
    streaming_cdc_ingest,
    streaming_corpus_ingest,
)
