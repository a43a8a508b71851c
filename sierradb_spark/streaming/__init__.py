from sierradb_spark.streaming.alerts import anomaly_alert_stream
from sierradb_spark.streaming.corpus import StreamingCorpusDedup
from sierradb_spark.streaming.ingest import (
    StreamIngest,
    prune_dead_letters,
    read_dead_letters,
)
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
    "read_dead_letters",
    "prune_dead_letters",
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
