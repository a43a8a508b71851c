"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content is carried as opaque BINARY columns with a
typed metadata struct — exactly SierraDB's opaque-payload convention
(SURVEY §1.3) applied to media. The Spark-side plumbing (schema,
Arrow-batched decode UDF signature, per-batch iteration) is real and
tested; the actual codec step is a deterministic stub (in
``_media_codec.py``, kept import-light for worker unpickling) because
the test container ships no image/audio libraries — swap
``fake_decode`` for a PIL/ffmpeg call in production and nothing else
changes.

``mapInPandas`` is the right shape at 100 TB: decode happens
partition-local in Arrow batches, metadata-only queries never touch
the binary column (column pruning), and the decode stage can be scaled
independently by repartitioning before it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sierradb_spark.functions._media_codec import (
    DECODED_SCHEMA,
    FEATURES_SCHEMA,
    FRAMES_SCHEMA,
    REAL_DECODED_SCHEMA,
    RESIZED_SCHEMA,
    decode_media_batches,
    decode_media_batches_real,
    feature_batches,
    frame_sample_batches,
    resize_batches,
)
from sierradb_spark.registry import Registry, load

REG = Registry()


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize a media-shaped table from documents: text bytes stand
    in for encoded image blobs (no media files ship with the testdata)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media"),
        F.struct(
            F.lit("image/fake").alias("content_type"),
            F.col("n_chars").alias("content_length"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


_SQL_HEXBYTE = (
    "(strpos('0123456789abcdef', substr(s, {p1}, 1)) - 1) * 16 + "
    "strpos('0123456789abcdef', substr(s, {p2}, 1)) - 1"
)
_SQL_B0 = _SQL_HEXBYTE.format(p1=1, p2=2)
_SQL_B1 = _SQL_HEXBYTE.format(p1=3, p2=4)


@REG.add(
    "multimodal_decode_metadata",
    # The decode stub derives dimensions from sha256(blob) — which DuckDB
    # can compute too, so the Pandas-UDF pipeline gets a REAL value oracle:
    # the oracle re-derives the stub's spec in SQL (hash -> first two
    # digest bytes -> dims), proving the mapInPandas plumbing delivers
    # exactly one correct row per blob.
    oracle=f"""
        WITH h AS (
            SELECT doc_id, octet_length(encode(text)) AS n_bytes,
                   sha256(text) AS s
            FROM documents
        )
        SELECT doc_id,
               CAST(n_bytes AS BIGINT) AS n_bytes,
               substr(s, 1, 8) AS sha8,
               CAST(64 + ({_SQL_B0}) % 192 AS INT) AS fake_width,
               CAST(64 + ({_SQL_B1}) % 192 AS INT) AS fake_height,
               3 AS fake_channels
        FROM h
    """,
    doc="Decode pipeline over binary media columns via mapInPandas (Arrow "
    "batches). Codec stubbed deterministically from the content hash; the "
    "oracle recomputes the same spec in SQL, so this Pandas-UDF stage is "
    "value-hash-checked like every JVM operator.",
)
def multimodal_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    return media.select("doc_id", "media").mapInPandas(
        decode_media_batches, schema=DECODED_SCHEMA
    )


def decode_media(df: DataFrame) -> DataFrame:
    """Capability-gated decode API over any (doc_id, media) DataFrame:
    real codec (PIL when importable, stdlib header parser otherwise) for
    recognizable image bytes, deterministic stub for everything else.
    The ``codec`` column says which path produced each row. The registry
    query keeps the stub so its oracle stays hash-exact; this is the
    production entry point a real corpus would use."""
    return df.select("doc_id", "media").mapInPandas(
        decode_media_batches_real, schema=REAL_DECODED_SCHEMA
    )


@REG.add(
    "multimodal_metadata_only",
    oracle="""
        SELECT source AS origin,
               CAST(count(*) AS BIGINT) AS n_media,
               CAST(sum(n_chars) AS BIGINT) AS total_bytes,
               CAST(max(n_chars) AS BIGINT) AS max_bytes
        FROM documents
    GROUP BY source
    """,
    doc="Metadata-only media query: aggregates over the typed metadata struct "
    "WITHOUT touching the binary column — column pruning keeps the blob out of "
    "the scan entirely (the 100 TB win: metadata queries cost MB, not TB).",
)
def multimodal_metadata_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    return media.groupBy(F.col("media_meta.origin").alias("origin")).agg(
        F.count("*").alias("n_media"),
        F.sum("media_meta.content_length").alias("total_bytes"),
        F.max("media_meta.content_length").alias("max_bytes"),
    )


@REG.add(
    "multimodal_byte_features",
    # The media blob is the document's utf-8 bytes, so DuckDB can
    # re-derive every feature by exploding hex(blob) into byte values:
    # mean/stddev_pop over small ints are exact in double on both
    # engines, entropy/std agree to well past the 6th decimal, and both
    # sides round half-up (floor(x*1e6+0.5)/1e6 — Python's banker's
    # round would diverge on exact ties like k/128 means).
    oracle="""
        WITH m AS (
            SELECT doc_id, lower(hex(encode(text))) AS bh,
                   octet_length(encode(text)) AS n
            FROM documents
        ),
        b AS (
            SELECT doc_id, ('0x' || substr(bh, 2*i - 1, 2))::INT AS v
            FROM m, unnest(generate_series(1, n)) t(i)
        ),
        stats AS (
            SELECT doc_id,
                   avg(v) AS mean_b,
                   stddev_pop(v) AS std_b,
                   CAST(count(DISTINCT v) AS INT) AS nd
            FROM b GROUP BY doc_id
        ),
        ent AS (
            SELECT doc_id, -sum(p * log2(p)) AS e
            FROM (
                SELECT doc_id,
                       count(*)::DOUBLE
                       / sum(count(*)) OVER (PARTITION BY doc_id) AS p
                FROM b GROUP BY doc_id, v
            )
            GROUP BY doc_id
        )
        SELECT m.doc_id,
               COALESCE(floor(stats.mean_b * 1e6 + 0.5) / 1e6, 0.0) AS mean_byte,
               COALESCE(floor(stats.std_b * 1e6 + 0.5) / 1e6, 0.0) AS std_byte,
               COALESCE(floor(ent.e * 1e6 + 0.5) / 1e6, 0.0) AS entropy,
               COALESCE(stats.nd, 0) AS n_distinct_bytes
        FROM m
        LEFT JOIN stats USING (doc_id)
        LEFT JOIN ent USING (doc_id)
    """,
    doc="Feature-extraction stage: blob → numeric feature vector (mean/std/"
    "entropy/distinct bytes) via numpy per Arrow batch — the CLIP/CNN-shaped "
    "stage. The oracle re-derives every feature from the blob bytes in SQL, "
    "so even this numpy stage is value-hash-checked.",
)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    return media.select("doc_id", "media").mapInPandas(
        feature_batches, schema=FEATURES_SCHEMA
    )


@REG.add(
    "multimodal_resize_plan",
    oracle=f"""
        WITH h AS (SELECT doc_id, sha256(text) AS s FROM documents),
        dims AS (
            SELECT doc_id,
                   64 + ({_SQL_B0}) % 192 AS w,
                   64 + ({_SQL_B1}) % 192 AS h
            FROM h
        )
        SELECT doc_id,
               CAST(w AS INT) AS src_width, CAST(h AS INT) AS src_height,
               CAST(greatest(floor(w * (256.0 / greatest(w, h)) + 0.5), 1)
                    AS INT) AS dst_width,
               CAST(greatest(floor(h * (256.0 / greatest(w, h)) + 0.5), 1)
                    AS INT) AS dst_height,
               floor(256.0 / greatest(w, h) * 1e6 + 0.5) / 1e6 AS scale
        FROM dims
    """,
    doc="Resize stage: decode dims -> target-256 geometry (aspect preserved, "
    "half-up rounding). Oracle re-derives the geometry from the same content "
    "hash, value-checking the Pandas-UDF stage.",
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    return media.select("doc_id", "media").mapInPandas(
        resize_batches(256), schema=RESIZED_SCHEMA
    )


@REG.add(
    "multimodal_frame_sample",
    # Frame fingerprints are sha256 over the hex of each byte range, so
    # the oracle re-derives them with string slicing on lower(hex(blob)).
    oracle="""
        WITH m AS (
            SELECT doc_id, lower(hex(encode(text))) AS bh,
                   octet_length(encode(text)) AS n_bytes
            FROM documents
        ),
        p AS (
            SELECT doc_id, bh,
                   greatest(n_bytes // 64, 1) AS n_avail,
                   least(4, greatest(n_bytes // 64, 1)) AS take
            FROM m
        ),
        f AS (
            SELECT doc_id, CAST(k AS INT) AS frame_no,
                   CAST((k * n_avail // take) * 64 AS BIGINT) AS frame_offset,
                   substr(bh, (k * n_avail // take) * 128 + 1, 128) AS fh
            FROM p, unnest(generate_series(0, take - 1)) t(k)
        )
        SELECT doc_id, frame_no, frame_offset,
               substr(sha256(fh), 1, 8) AS frame_sha8
        FROM f
    """,
    doc="Frame-sampling stage: 1->N fan-out (4 evenly spaced 64-byte 'frames' "
    "per blob) — the ffmpeg-shaped stage whose output cardinality drives "
    "downstream repartitioning. Value-checked: the oracle re-derives each "
    "frame's offset and hex-range fingerprint in SQL.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    return media.select("doc_id", "media").mapInPandas(
        frame_sample_batches(n_frames=4, frame_size=64), schema=FRAMES_SCHEMA
    )
