from musicflow_spark.streaming.dedup import (  # noqa: F401
    minhash_candidates_stream,
)
from musicflow_spark.streaming.timejoin import (  # noqa: F401
    asof_join_stream,
    asof_join_stream_stream,
    overlap_join_stream,
    range_join_stream,
)
from musicflow_spark.streaming.events import (  # noqa: F401
    content_dedup_stream,
    dedup_stream,
    event_stream,
    foreach_batch_rollup_merge,
    foreach_batch_upsert,
    hourly_event_stats_stream,
    latest_event_per_user_stream,
    user_sessions_stream,
)
