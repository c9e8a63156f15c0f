from spark_on_hbase_spark.streaming.ingest import (  # noqa: F401
    file_stream,
    guarded_increment,
    idempotent_upsert,
    increment_stream_into_table,
    merge_stream_into_table,
    sessionized_counts,
    socket_stream,
    stateful_running_stats,
    stream_enrich,
    stream_stream_interval_join,
    streaming_dedup,
    windowed_agg,
)
