"""Assembled query registry — the declared operator surface.

``REGISTRY.queries`` maps name → Query(spark_fn, oracle_sql). This is
what ``__spark_entry__.py`` exposes to the driver's correctness gate,
and what ``bench.py`` samples its headline set from.
"""

from sierradb_spark.operators.base import Query, Registry, load

from sierradb_spark.operators import (
    event_analytics,
    event_reads,
    relational,
    relational2,
    relational3,
    sketches,
    windows,
)
from sierradb_spark.functions import (
    contamination,
    dedup,
    multimodal,
    pipeline,
    quality,
    similarity,
    text,
    udx,
)

REGISTRY = Registry()
for mod in (
    event_reads,
    relational,
    relational2,
    relational3,
    event_analytics,
    sketches,
    windows,
    text,
    dedup,
    similarity,
    multimodal,
    pipeline,
    quality,
    contamination,
    udx,
):
    REGISTRY.merge(mod.REG)

__all__ = ["Query", "Registry", "REGISTRY", "load"]
