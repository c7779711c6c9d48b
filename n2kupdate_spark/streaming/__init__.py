from n2kupdate_spark.streaming.jobs import (
    documents_file_stream,
    events_file_stream,
    stream_dedup_bloom,
    stream_dedup_bloom_scalable,
    stream_dedup_within_watermark,
    stream_session_window_agg,
    stream_corpus_publish,
    stream_sessions_tws,
    stream_stateful_sessions,
    stream_stream_interval_join,
    stream_tumbling_agg,
    stream_upsert_foreachbatch,
)

__all__ = [
    "events_file_stream",
    "documents_file_stream",
    "stream_corpus_publish",
    "stream_dedup_bloom",
    "stream_dedup_bloom_scalable",
    "stream_dedup_within_watermark",
    "stream_session_window_agg",
    "stream_sessions_tws",
    "stream_stateful_sessions",
    "stream_stream_interval_join",
    "stream_tumbling_agg",
    "stream_upsert_foreachbatch",
]
