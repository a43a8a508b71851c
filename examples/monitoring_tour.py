"""Operational-monitoring tour over the events table — the alerting
half of the engine in one runnable script.

Stops: inter-arrival fingerprints → dense-grid burst detection →
EWMA anomaly fold (batch) → the SAME fold as a streaming alert
pipeline with a checkpoint restart in the middle → Holt forecast →
Markov stationary distribution vs the empirical mix. The streaming
stop asserts the batch/stream state equality the module docs promise.

Run:  PYTHONPATH=/root/repo python examples/monitoring_tour.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sierradb_spark.operators import REGISTRY  # noqa: E402
from sierradb_spark.session import get_spark  # noqa: E402
from sierradb_spark.streaming.alerts import anomaly_alert_stream  # noqa: E402


def run(sf_dir: str) -> None:
    spark = get_spark(shuffle_partitions=8)
    q = lambda name: REGISTRY.queries[name].spark(spark, sf_dir)  # noqa: E731

    print("== Arrival-process fingerprint (per type) ==")
    q("interarrival_time_stats").orderBy("event_type").show(truncate=False)

    print("== Bursts vs the trailing 24h baseline (dense grid) ==")
    bursts = q("hourly_burst_detection").orderBy("hour", "event_type")
    print(f"burst hours: {bursts.count()}")
    bursts.show(8, truncate=False)

    print("== EWMA anomaly fold (batch) ==")
    batch = q("ewma_anomaly_daily").orderBy("event_type")
    batch.show(truncate=False)

    print("== Same fold as a streaming alert pipeline ==")
    daily = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy(
            F.col("event_type").alias("key"), F.to_date("ts").alias("day")
        )
        .agg(F.round(F.sum("value"), 6).alias("y"))
    )
    days = sorted(r["day"] for r in daily.select("day").distinct().collect())
    mid = days[len(days) // 2]
    work = tempfile.mkdtemp(prefix="monitoring_tour_")
    land, ckpt, out = (os.path.join(work, d) for d in ("land", "ckpt", "out"))

    def drain(chunk):
        chunk.coalesce(1).write.mode("append").parquet(land)
        src = spark.readStream.schema("key string, day date, y double").parquet(land)
        sq = (
            anomaly_alert_stream(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        sq.awaitTermination(300)

    drain(daily.where(F.col("day") <= F.lit(mid)))
    drain(daily.where(F.col("day") > F.lit(mid)))  # restart: state from ckpt

    alerts = spark.read.parquet(out)
    flagged = alerts.where("flagged")
    print(f"alert rows: {alerts.count()}, flagged days: {flagged.count()}")
    flagged.orderBy("day", "key").show(8, truncate=False)

    stream_state = {
        r["key"]: (r["n_days"], round(r["ewma_level"], 4), r["anomaly_days"])
        for r in alerts.orderBy("day")
        .groupBy("key")
        .agg(
            F.max("n_days").alias("n_days"),
            F.last("ewma_level").alias("ewma_level"),
            F.max("anomaly_days").alias("anomaly_days"),
        )
        .collect()
    }
    batch_state = {
        r["event_type"]: (r["n_days"], r["ewma_level"], r["anomaly_days"])
        for r in batch.collect()
    }
    assert stream_state == batch_state, (stream_state, batch_state)
    print("stream state == batch fold (exact), across a checkpoint restart")

    print("== Holt forecast (7-day-ahead level+trend) ==")
    q("holt_linear_forecast").orderBy("event_type").show(truncate=False)

    print("== Holt-Winters: + weekly seasonality ==")
    q("holt_winters_forecast").orderBy("event_type").show(truncate=False)

    print("== Markov stationary distribution vs empirical mix ==")
    q("markov_stationary_distribution").orderBy("event_type").show(
        truncate=False
    )

    print("== Drift: KS (CDF gap) and PSI (share shift), per type ==")
    q("ks_drift_by_event_type").orderBy("event_type").show(truncate=False)
    q("psi_value_drift").orderBy("event_type").show(truncate=False)

    print("== Changepoint: best binary-segmentation split per type ==")
    q("changepoint_binary_segmentation").orderBy("event_type").show(
        truncate=False
    )

    print("== Robust location + outliers (MAD z, trimmed/winsorized) ==")
    q("mad_robust_outliers").orderBy("event_type").show(truncate=False)
    q("trimmed_winsorized_stats").orderBy("event_type").show(truncate=False)

    print("== Inference: bootstrap CI, median CI, A/A z-test ==")
    q("poisson_bootstrap_ci").orderBy("event_type").show(truncate=False)
    q("median_ci_order_stat").orderBy("event_type").show(truncate=False)
    q("ab_test_proportions").show(truncate=False)

    print("== Session survival (Kaplan-Meier product-limit curve) ==")
    q("kaplan_meier_retention").orderBy("duration_minutes").show(
        10, truncate=False
    )


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
