from pygdf_spark.streaming.pipelines import (  # noqa: F401
    dedup_first_per_key,
    enrich_with_dim,
    read_events_stream,
    run_available_now,
    run_available_now_deltalite,
    run_available_now_lake_merge,
    session_counts,
    sliding_counts,
    stateful_change_capture,
    stateful_user_counts,
    tumbling_counts,
    view_purchase_join,
)
