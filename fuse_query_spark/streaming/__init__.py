from fuse_query_spark.streaming.events import (
    read_events_stream,
    sessionized_counts,
    tumbling_counts,
)

__all__ = ["read_events_stream", "tumbling_counts", "sessionized_counts"]
