"""sierradb_spark — a PySpark-native event-store + analytics engine.

Re-expresses the capabilities of sierra-db/sierradb (an immutable,
append-only, distributed event-sourcing database; see /root/repo/SURVEY.md)
idiomatically on Apache Spark:

- ``eventstore`` — the SierraDB semantic core: gapless per-partition
  sequences, gapless per-stream versions, optimistic concurrency
  (expected-version truth table), atomic multi-event transactions,
  watermark-gated reads, point/range/head read patterns.
- ``operators`` — the declared query surface (read patterns re-expressed
  over the driver's analytic tables, relational/window/set operators).
- ``functions`` — LLM-data-pipeline extensions: dedup (exact, MinHash,
  n-gram Jaccard), similarity search, text analysis, multimodal columns.
- ``streaming`` — Structured Streaming ingest and subscriptions.

Everything is DataFrame-first: logical plans are declared via the
DataFrame/SQL API and Catalyst picks the physical strategy. Python UDFs
appear only where built-ins genuinely cannot express the semantics.
"""

from sierradb_spark.commands import execute_command
from sierradb_spark.config import EngineConfig
from sierradb_spark.session import get_spark

__all__ = ["EngineConfig", "execute_command", "get_spark"]

__version__ = "0.1.0"
