from sierradb_spark.streaming.ingest import StreamIngest
from sierradb_spark.streaming.subscribe import (
    PartitionMatcher,
    StreamMatcher,
    Subscription,
)

__all__ = ["StreamIngest", "StreamMatcher", "PartitionMatcher", "Subscription"]
