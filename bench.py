"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect) after a
warm-up pass of one tiny query so JVM/session startup isn't billed to
the first query. Value = sum of per-query wall seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sierradb_spark.operators import REGISTRY  # noqa: E402
from sierradb_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    spark = get_spark(app_name="bench")

    headline = {n: q for n, q in REGISTRY.queries.items() if q.headline}

    # Warm up: session init, parquet footer reads, codegen caches.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    for name, q in headline.items():
        t0 = time.perf_counter()
        df = q.spark(spark, sf_dir)
        n = len(df.collect())
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s rows={n}", file=sys.stderr)

    # Ingest throughput: 20k-event append batch (validate + assign gapless
    # sequences + commit) into a scratch store — the reference's headline
    # write-path concern (group commit, writer_thread_pool.rs:687-699).
    import shutil
    import tempfile

    from pyspark.sql import functions as F
    from sierradb_spark.eventstore import EventStore

    scratch = tempfile.mkdtemp(prefix="bench_store_")
    try:
        store = EventStore(spark, scratch)
        n_ev = 20_000
        reqs = spark.range(n_ev).select(
            F.concat(F.lit("bench-"), (F.col("id") % 200).cast("string")).alias(
                "stream_id"
            ),
            F.lit("BenchEvent").alias("event_name"),
            F.encode(F.col("id").cast("string"), "utf-8").alias("payload"),
        )
        t0 = time.perf_counter()
        res = store.append_df(reqs)
        n_ok = res.where("accepted").count()
        timings["ingest_20k_events"] = round(time.perf_counter() - t0, 3)
        print(
            f"# ingest_20k_events: {timings['ingest_20k_events']}s accepted={n_ok} "
            f"({int(n_ok / timings['ingest_20k_events'])} ev/s)",
            file=sys.stderr,
        )
        # Sustained ingest: consecutive micro-batches into the SAME growing
        # table — the reference's headline claim is write performance
        # independent of database size (README.md:96-99). Flat ev/s across
        # batches is that claim, measured: per-batch cost must stay
        # O(batch) because heads recovery reads the heads log (not the
        # events table) and sequences come from the manifest watermarks.
        n_batches, per_batch = 8, 5_000
        evps: list[float] = []
        for b in range(n_batches):
            reqs_b = spark.range(per_batch).select(
                F.concat(
                    F.lit(f"sust-{b}-"), (F.col("id") % 200).cast("string")
                ).alias("stream_id"),
                F.lit("SustainedEvent").alias("event_name"),
                F.encode(F.col("id").cast("string"), "utf-8").alias("payload"),
            )
            tb = time.perf_counter()
            nb = store.append_df(reqs_b).where("accepted").count()
            dt = time.perf_counter() - tb
            evps.append(round(nb / dt, 1))
        half = n_batches // 2
        # Size-degradation signal: a table-size-dependent write path shows
        # a monotonic decline; single-batch GC/JIT noise does not move the
        # half-means. Flat == ratio near (or above) 1.
        trend = round(
            (sum(evps[half:]) / half) / (sum(evps[:half]) / half), 3
        )
        # Reported in its own JSON section, NOT in the headline timings:
        # the headline value is compared round-over-round on a stable
        # query set, and this phase is a throughput probe, not a query.
        sustained = {
            "total_seconds": round(sum(per_batch / r for r in evps), 3),
            "batches_evps": evps,
            "trend_ratio_last_half_over_first_half": trend,
            "events_per_batch": per_batch,
        }
        print(
            f"# ingest_sustained: {evps} ev/s over {n_batches} batches "
            f"(last-half/first-half={trend})",
            file=sys.stderr,
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "sustained_ingest": sustained,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
