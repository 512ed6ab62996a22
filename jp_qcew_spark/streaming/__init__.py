from jp_qcew_spark.streaming.pipelines import (  # noqa: F401
    read_events_stream,
    run_to_memory,
    stream_cdc_apply,
    stream_dedup_keys,
    stream_session_windows,
    stream_stateful_user_stats,
)
