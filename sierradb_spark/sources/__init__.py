from sierradb_spark.sources.connectors import (
    events_from_csv,
    events_from_json,
    export_events,
    KAFKA_RECORD_SCHEMA,
    decode_kafka_records,
    kafka_available,
    rate_request_stream,
    request_stream_from_files,
    request_stream_from_kafka,
    request_stream_from_socket,
)

__all__ = [
    "events_from_json",
    "events_from_csv",
    "export_events",
    "KAFKA_RECORD_SCHEMA",
    "decode_kafka_records",
    "kafka_available",
    "request_stream_from_files",
    "request_stream_from_kafka",
    "rate_request_stream",
    "request_stream_from_socket",
]
