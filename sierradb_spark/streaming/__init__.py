from sierradb_spark.streaming.ingest import StreamIngest
from sierradb_spark.streaming.subscribe import (
    PartitionMatcher,
    StreamMatcher,
    Subscription,
)
from sierradb_spark.streaming.windowed import dedup_stream, windowed_event_counts

__all__ = [
    "StreamIngest",
    "StreamMatcher",
    "PartitionMatcher",
    "Subscription",
    "dedup_stream",
    "windowed_event_counts",
]
