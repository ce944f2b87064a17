from .incremental import (
    dedup_within_watermark, read_document_stream,
    read_embedding_stream, read_event_stream,
    windowed_counts, run_available_now, sessionize_stateful,
    stream_stream_interval_join,
    streaming_cdc_apply,
    streaming_incremental_merge, streaming_minhash_admission,
    streaming_ams_maintenance, streaming_bloom_maintenance,
    streaming_gram_maintenance,
    streaming_priority_sample_maintenance,
    streaming_rollup_maintenance, streaming_theta_maintenance,
    streaming_vector_admission,
)

__all__ = [
    "dedup_within_watermark", "read_document_stream",
    "read_embedding_stream", "read_event_stream",
    "windowed_counts",
    "run_available_now", "sessionize_stateful",
    "stream_stream_interval_join",
    "streaming_incremental_merge", "streaming_minhash_admission",
    "streaming_ams_maintenance", "streaming_bloom_maintenance",
    "streaming_gram_maintenance",
    "streaming_priority_sample_maintenance",
    "streaming_rollup_maintenance", "streaming_theta_maintenance",
    "streaming_vector_admission",
]
