"""Statistical aggregate surface: correlation, covariance, regression.

The reference has no aggregate expression language at all (SURVEY §2.7:
only max-version/max-sequence); these operators declare the statistical
aggregate family a Spark-native analytics engine exposes for free —
and pin, via the oracle hash, that Spark's and DuckDB's definitions
agree (both use sample covariance and OLS `regr_*`; verified to 8
decimals before these operators were added).

Scale shape: single-pass partial aggregates (corr/covar/regr all fold
into (n, Σx, Σy, Σxy, Σx², Σy²) per group map-side), so cost is one
scan + one tiny shuffle of per-group moment tuples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sierradb_spark.registry import Registry, load

REG = Registry()


@REG.add(
    "lineitem_price_stats",
    oracle="""
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
               round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
               round(stddev_samp(l_quantity), 6) AS qty_stddev,
               round(regr_slope(l_extendedprice, l_quantity), 4) AS price_per_qty,
               round(regr_intercept(l_extendedprice, l_quantity), 2) AS price_intercept
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="Per-returnflag price statistics: Pearson correlation, sample "
    "covariance, stddev, and the OLS regression of extended price on "
    "quantity — the statistical-aggregate family (corr/covar/regr) in one "
    "single-pass grouped scan. All six aggregates fold into one moment "
    "tuple per group map-side.",
)
def lineitem_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("double")
    p = F.col("l_extendedprice").cast("double")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.corr(q, p), 6).alias("qty_price_corr"),
        F.round(F.covar_samp(q, p), 2).alias("qty_price_covar"),
        F.round(F.stddev_samp(q), 6).alias("qty_stddev"),
        F.round(F.regr_slope(p, q), 4).alias("price_per_qty"),
        F.round(F.regr_intercept(p, q), 2).alias("price_intercept"),
    )


@REG.add(
    "event_value_trend",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(regr_slope(value, epoch_ms(ts) / 1000.0) * 86400, 6)
                   AS value_per_day,
               round(corr(value, epoch_ms(ts) / 1000.0), 6) AS time_corr,
               round(avg(value), 4) AS avg_value
        FROM events GROUP BY event_type
    """,
    doc="Per-event-type value trend: OLS slope of value over event time "
    "(scaled to per-day drift) plus the time correlation — the cheap "
    "monitoring regression every metrics pipeline runs. Timestamps enter "
    "as epoch milliseconds (`unix_millis` / `epoch_ms` — integer on both "
    "engines, no float-conversion skew).",
)
def event_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # ts arrives as TIMESTAMP_NTZ; the session runs UTC, so the cast to
    # instant-typed TIMESTAMP matches DuckDB's naive epoch_ms exactly.
    t = F.unix_millis(F.col("ts").cast("timestamp")) / 1000.0
    v = F.col("value").cast("double")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.regr_slope(v, t) * 86400, 6).alias("value_per_day"),
        F.round(F.corr(v, t), 6).alias("time_corr"),
        F.round(F.avg(v), 4).alias("avg_value"),
    )
