"""Payload interpretation helpers — the query layer over opaque bytes.

SierraDB never interprets ``payload``/``metadata`` (SURVEY §1.3: fixed
envelope, schemaless body; applications conventionally store JSON).
The Spark-native contract is the same: the store carries BINARY, and
these helpers let queries decode at read time — schema-on-read, pushed
into the same JVM pipeline as the rest of the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def payload_str(col: Column | str = "payload") -> Column:
    """Payload bytes as UTF-8 text."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string")


def payload_json(
    col: Column | str = "payload", schema: T.StructType | str = "map<string,string>"
) -> Column:
    """Parse payload as JSON with an explicit schema (from_json: malformed
    rows become NULL, never errors — the right failure mode at scale)."""
    return F.from_json(payload_str(col), schema)


def payload_field(path: str, col: Column | str = "payload") -> Column:
    """Extract one JSON field without a schema (get_json_object)."""
    return F.get_json_object(payload_str(col), path)


def with_payload_fields(df: DataFrame, **fields: str) -> DataFrame:
    """Project JSON-path fields out of the payload:
    ``with_payload_fields(df, name='$.name', age='$.age')``."""
    out = df
    for alias, path in fields.items():
        out = out.withColumn(alias, payload_field(path))
    return out
