"""Source/sink connectors for the event store.

The reference's only ingress is RESP3 appends and its only storage is
its own segment format (SURVEY §2.7: no file-format connectors). A
Spark-native engine gets format breadth from the platform; this module
pins down the *contract*: anything that can produce rows with
``stream_id, event_name [, payload, metadata, expected_version,
timestamp_ms, partition_key, event_id]`` can feed the append path
(batch `EventStore.append_df` or streaming `StreamIngest`).

Scale notes: file sources list directories on the driver — at 100 TB
ingest should come from a queue source (Kafka) where offsets are the
source of truth; the request contract is identical, so swapping
`request_stream_from_files` for `spark.readStream.format("kafka")` +
a `from_json` projection changes one line of glue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Minimal request columns a source must provide; the rest are defaulted
# by enrichment (streaming/ingest.py, mirroring request/eappend.rs:189-217).
REQUEST_CORE_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.StringType(), False),
        T.StructField("event_name", T.StringType(), False),
        T.StructField("payload", T.StringType(), True),
        T.StructField("metadata", T.StringType(), True),
        T.StructField("expected_version", T.StringType(), True),
        T.StructField("timestamp_ms", T.LongType(), True),
    ]
)


def _normalize(df: DataFrame) -> DataFrame:
    """Fill optional request columns and coerce payload/metadata to binary."""
    cols = set(df.columns)
    if "expected_version" in cols:
        df = df.withColumn(
            "expected_version", F.coalesce(F.col("expected_version"), F.lit("any"))
        )
    else:
        df = df.withColumn("expected_version", F.lit("any"))
    for c in ("payload", "metadata"):
        if c in cols:
            df = df.withColumn(c, F.col(c).cast("binary"))
        else:
            df = df.withColumn(c, F.lit(b""))
    return df


def events_from_json(spark: SparkSession, path: str) -> DataFrame:
    """Batch-read newline-delimited JSON append requests."""
    return _normalize(spark.read.schema(REQUEST_CORE_SCHEMA).json(path))


def events_from_csv(spark: SparkSession, path: str) -> DataFrame:
    """Batch-read CSV append requests (header row required)."""
    return _normalize(
        spark.read.schema(REQUEST_CORE_SCHEMA).option("header", True).csv(path)
    )


def request_stream_from_files(
    spark: SparkSession, path: str, fmt: str = "json", max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming source of append requests from a landing directory.

    json/csv/parquet; each discovered file becomes part of a micro-batch
    (one group commit). Kafka replaces this 1:1 at scale.
    """
    reader = spark.readStream.schema(REQUEST_CORE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if fmt == "json":
        return _normalize(reader.json(path))
    if fmt == "csv":
        return _normalize(reader.option("header", True).csv(path))
    if fmt == "parquet":
        return _normalize(reader.parquet(path))
    raise ValueError(f"unsupported stream format {fmt}")


def request_stream_from_socket(
    spark: SparkSession, host: str, port: int
) -> DataFrame:
    """Queue-shaped streaming source: JSON append requests over a TCP
    socket, one request per line.

    This is the Kafka shape exactly — an unbounded, non-replayable feed
    whose rows arrive as opaque strings and are projected through
    ``from_json``. Swapping for Kafka changes only the reader line::

        spark.readStream.format("kafka")
             .option("kafka.bootstrap.servers", ...)
             .option("subscribe", topic).load()
             .select(F.col("value").cast("string").alias("value"))

    and keeps the identical from_json projection + `StreamIngest` path
    (the container has no Kafka broker, so the socket source is the
    testable stand-in; see tests/test_sources.py).
    """
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    parsed = raw.select(
        F.from_json(F.col("value"), REQUEST_CORE_SCHEMA).alias("r")
    ).select("r.*")
    return _normalize(parsed)


# The exact row shape Spark's Kafka source produces (KafkaSourceProvider
# output schema) — the contract test constructs batch rows with this
# schema so the decode path is verifiable without a broker.
KAFKA_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), True),
    ]
)


def decode_kafka_records(records: DataFrame) -> DataFrame:
    """Kafka records -> append requests: the one projection between the
    wire and ``StreamIngest``, shared by the live reader and the
    brokerless contract test.

    ``value`` holds a UTF-8 JSON append request (one per record); the
    projection is ``cast(value as string)`` + ``from_json`` +
    ``_normalize`` — byte-identical to the socket source's line decode,
    so the two sources are interchangeable downstream. A record whose
    value is not valid JSON decodes to a row of nulls from ``from_json``
    (Kafka offsets must keep advancing past poison messages — a
    malformed producer must not wedge ingestion); gate such rows out
    with ``where(col("stream_id").isNotNull())`` into a dead-letter sink
    if the topic is untrusted. Works on batch and streaming frames
    alike — the contract test feeds constructed batch rows with
    :data:`KAFKA_RECORD_SCHEMA`.
    """
    raw = records.select(F.col("value").cast("string").alias("value"))
    parsed = raw.select(
        F.from_json(F.col("value"), REQUEST_CORE_SCHEMA).alias("r")
    ).select("r.*")
    return _normalize(parsed)


def kafka_available(spark: SparkSession) -> bool:
    """True iff the spark-sql-kafka connector is on the session's
    classpath (it ships separately from core Spark)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def request_stream_from_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """The real queue source: JSON append requests from a Kafka topic.

    Identical downstream contract to the socket/file sources — the same
    from_json projection and ``StreamIngest`` path; Kafka offsets become
    the replayable source of truth, which is what makes the manifest's
    idempotence tokens exactly-once end to end (offset range → batch
    token → CAS-committed manifest).

    ``max_offsets_per_trigger`` is the ingest-side backpressure knob
    (rows per micro-batch == group-commit size), the queue analogue of
    ``maxFilesPerTrigger`` on the landing-directory source.

    Raises a capability error when the spark-sql-kafka connector jar is
    absent (it is not part of core Spark); everything else about the
    pipeline is connector-agnostic.
    """
    if not kafka_available(spark):
        raise RuntimeError(
            "spark-sql-kafka connector not on the classpath; launch with "
            "spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:"
            "<spark-version> (or use request_stream_from_socket/"
            "request_stream_from_files, which share the same contract)"
        )
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        if max_offsets_per_trigger <= 0:
            raise ValueError("max_offsets_per_trigger must be positive")
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return decode_kafka_records(reader.load())


def rate_request_stream(
    spark: SparkSession, rows_per_second: int = 1000, n_streams: int = 100
) -> DataFrame:
    """Synthetic append-request stream (rate source) for ingest load tests.

    Mirrors the reference's benchmark harness role
    (crates/sierradb/benches/random_sequential.rs): deterministic
    stream routing, tiny payloads, tunable rate.
    """
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return rate.select(
        F.concat(F.lit("stream-"), (F.col("value") % n_streams).cast("string")).alias(
            "stream_id"
        ),
        F.lit("BenchEvent").alias("event_name"),
        F.encode(F.col("value").cast("string"), "utf-8").alias("payload"),
        F.lit(b"").alias("metadata"),
        F.lit("any").alias("expected_version"),
        (F.col("timestamp").cast("double") * 1000).cast("long").alias("timestamp_ms"),
    )


def export_events(events: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Sink: export an events DataFrame (payload/metadata hex-encoded for
    text formats so the files round-trip losslessly)."""
    if fmt == "parquet":
        events.write.mode("overwrite").parquet(path)
        return
    text = events.withColumn("payload", F.hex("payload")).withColumn(
        "metadata", F.hex("metadata")
    )
    if fmt == "json":
        text.write.mode("overwrite").json(path)
    elif fmt == "csv":
        text.drop("timestamp").write.mode("overwrite").option("header", True).csv(path)
    else:
        raise ValueError(f"unsupported export format {fmt}")
