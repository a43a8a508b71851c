from sierradb_spark.streaming.alerts import anomaly_alert_stream
from sierradb_spark.streaming.corpus import StreamingCorpusDedup
from sierradb_spark.streaming.ingest import StreamIngest
from sierradb_spark.streaming.subscribe import (
    PartitionMatcher,
    StreamMatcher,
    Subscription,
    compact_subscription_sink,
    read_subscription_sink,
)
from sierradb_spark.streaming.windowed import (
    dedup_stream,
    interval_join_streams,
    session_window_counts,
    windowed_event_counts,
)

__all__ = [
    "StreamIngest",
    "anomaly_alert_stream",
    "StreamingCorpusDedup",
    "StreamMatcher",
    "PartitionMatcher",
    "Subscription",
    "compact_subscription_sink",
    "read_subscription_sink",
    "dedup_stream",
    "interval_join_streams",
    "session_window_counts",
    "windowed_event_counts",
]
