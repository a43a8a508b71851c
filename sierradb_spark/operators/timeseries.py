"""Time-series / temporal-state operators over the events table.

The reference is an event store; the temporal queries its users run
daily beyond plain scans are continuous aggregates ("hypertable
rollups"), temporal state reconstruction, sequence mining, and
event-time disorder diagnostics. Each is expressed as built-in
DataFrame algebra (no UDFs) with an exact DuckDB oracle.

Scale shapes: every query here shuffles once on its natural key
(event_type or user_id); time grids are generated from one global
bounds aggregate (2 timestamps to the driver) and are |types| x |buckets|
rows — broadcast-sized regardless of corpus size; windows are always
key-partitioned (no global WindowExec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sierradb_spark.registry import Registry, load

REG = Registry()


@REG.add(
    "gapfill_hourly_rollup",
    oracle="""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 2) AS hour_value
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        ),
        bounds AS (
            SELECT date_trunc('hour', min(ts)) AS lo,
                   date_trunc('hour', max(ts)) AS hi
            FROM events
        ),
        hours AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
            FROM bounds
        ),
        grid AS (
            SELECT t.event_type, h.hour
            FROM hours h, (SELECT DISTINCT event_type FROM events) t
        )
        SELECT g.event_type, g.hour,
               coalesce(a.n_events, 0) AS n_events,
               a.hour_value,
               last_value(a.hour_value IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_value
        FROM grid g LEFT JOIN hourly a USING (event_type, hour)
    """,
    doc="Hypertable-style continuous aggregate with gap filling: hourly "
    "count/sum per event type over a DENSE hour grid (empty buckets "
    "materialized as zero-count rows) with last-observation-carried-"
    "forward interpolation of the hourly value — the "
    "time_bucket_gapfill + locf() query of timescale-like stores. The "
    "grid is generated from ONE bounds aggregate (two timestamps to "
    "the driver) and is |types| x |hours| rows — broadcast-sized at any "
    "corpus size; the LOCF window is type-partitioned, never global.",
)
def gapfill_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = ev.groupBy(
        "event_type", hour.alias("hour")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("hour_value"),
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("hour")
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(hours))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            "hour_value",
            F.last("hour_value", ignorenulls=True).over(w).alias(
                "filled_value"
            ),
        )
    )


@REG.add(
    "scd2_entity_history",
    oracle="""
        SELECT user_id,
               event_type AS state,
               ts AS valid_from,
               lead(ts) OVER w AS valid_to,
               CAST(row_number() OVER w AS BIGINT) AS version,
               (lead(ts) OVER w IS NULL) AS is_current
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="SCD type-2 history from the event log: every event opens a "
    "state interval [valid_from, valid_to) closed by the user's next "
    "event (NULL valid_to = current state), with a per-user version "
    "counter — the temporal-table reconstruction a warehouse derives "
    "from an event-sourced entity. One user-partitioned window serves "
    "lead, row_number, and the is_current flag; the shuffle key is the "
    "natural entity key, so at 100 TB this is one exchange.",
)
def scd2_entity_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version"),
        nxt.isNull().alias("is_current"),
    )


@REG.add(
    "event_type_trigrams",
    oracle="""
        WITH seq AS (
            SELECT event_type AS t1,
                   lead(event_type, 1) OVER w AS t2,
                   lead(event_type, 2) OVER w AS t3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE t3 IS NOT NULL
        GROUP BY t1, t2, t3
        ORDER BY n DESC, t1 ASC, t2 ASC, t3 ASC
        LIMIT 25
    """,
    doc="Behavioral sequence mining: the 25 most frequent event-type "
    "trigrams over per-user event-time order — the pattern table "
    "feeding next-event prediction and anomaly screens. One "
    "user-partitioned window (two leads share it), one aggregate; the "
    "top-25 is TakeOrderedAndProject, never a global sort of the "
    "pattern space.",
)
def event_type_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    return (
        seq.where(F.col("t3").isNotNull())
        .groupBy("t1", "t2", "t3")
        .agg(F.count("*").alias("n"))
        .orderBy(
            F.col("n").desc(),
            F.col("t1").asc(),
            F.col("t2").asc(),
            F.col("t3").asc(),
        )
        .limit(25)
    )


@REG.add(
    "late_arrival_stats",
    oracle="""
        WITH arr AS (
            SELECT event_type, ts,
                   max(ts) OVER (
                       PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS high
            FROM events
        ),
        late AS (
            SELECT event_type,
                   CASE WHEN high IS NULL OR ts >= high THEN 0.0
                        ELSE date_diff('microsecond', ts, high) / 1000000.0
                   END AS late_s
            FROM arr
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(*) FILTER (WHERE late_s > 0) AS BIGINT) AS n_late,
               round(count(*) FILTER (WHERE late_s > 0)
                     / CAST(count(*) AS DOUBLE), 4) AS late_share,
               round(quantile_cont(late_s, 0.95), 3) AS p95_late_s,
               round(max(late_s), 3) AS max_late_s
        FROM late GROUP BY event_type
    """,
    doc="Event-time disorder diagnostic: per type, how often an event "
    "arrives (arrival order = event_id) behind the user's event-time "
    "high-water mark, and by how much (p95/max seconds) — exactly the "
    "numbers that size a Structured Streaming watermark delay "
    "(withWatermark chooses the allowed lateness; p95_late_s is its "
    "empirical floor). Lateness is keyed per user — the granularity at "
    "which stateful operators actually hold state — so the window is "
    "user-partitioned, never global.",
)
def late_arrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    arr = ev.select(
        "event_type", "ts", F.max("ts").over(w).alias("high")
    )
    late_s = F.when(
        F.col("high").isNull() | (F.col("ts") >= F.col("high")), F.lit(0.0)
    ).otherwise(
        # cast("timestamp_ltz"): unix_micros rejects TIMESTAMP_NTZ
        (
            F.unix_micros(F.col("high").cast("timestamp_ltz"))
            - F.unix_micros(F.col("ts").cast("timestamp_ltz"))
        )
        / F.lit(1_000_000.0)
    )
    late = arr.select("event_type", late_s.alias("late_s"))
    return late.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count(F.when(F.col("late_s") > 0, 1)).alias("n_late"),
        F.round(
            F.count(F.when(F.col("late_s") > 0, 1))
            / F.count("*").cast("double"),
            4,
        ).alias("late_share"),
        F.round(F.expr("percentile(late_s, 0.95)"), 3).alias("p95_late_s"),
        F.round(F.max("late_s"), 3).alias("max_late_s"),
    )


@REG.add(
    "rolling_7d_user_value",
    oracle="""
        SELECT event_id, user_id, ts,
               CAST(count(*) OVER w AS BIGINT) AS n_7d,
               round(sum(value) OVER w, 4) AS sum_7d
        FROM events
        WINDOW w AS (
            PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW
        )
    """,
    doc="Trailing 7-day rolling aggregate per user over EVENT TIME — a "
    "RANGE frame (every event within [ts - 7d, ts]), not a ROWS frame, "
    "so ties and irregular spacing are handled by value: the rolling "
    "feature shape behind rate limits, spend caps, and behavioral "
    "features. Spark expresses the interval as a rangeBetween on "
    "unix_micros (fixed 7*86400s — NTZ time, no DST step), DuckDB as "
    "RANGE INTERVAL; both engines see identical frames. One "
    "user-partitioned window, one exchange.",
)
def rolling_7d_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    micros = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(micros)
        .rangeBetween(-7 * 86400 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).alias("n_7d"),
        F.round(F.sum("value").over(w), 4).alias("sum_7d"),
    )


# ---------------------------------------------------------------------------
# Holt linear exponential smoothing (sequential fold)
# ---------------------------------------------------------------------------

_HOLT_ALPHA = 0.5  # level smoothing
_HOLT_BETA = 0.3  # trend smoothing
_HOLT_H = 7  # forecast horizon (days)

# One recurrence step as SQL over acc = [level, trend] and x = [y_t]:
#   level' = a*y + (1-a)*(level + trend)
#   trend' = b*(level' - level) + (1-b)*trend
_SQL_HOLT_LEVEL = (
    f"({_HOLT_ALPHA} * x[1] + {1 - _HOLT_ALPHA} * (acc[1] + acc[2]))"
)
_SQL_HOLT_STEP = (
    f"[{_SQL_HOLT_LEVEL}, "
    f"{_HOLT_BETA} * ({_SQL_HOLT_LEVEL} - acc[1]) "
    f"+ {1 - _HOLT_BETA} * acc[2]]"
)


@REG.add(
    "holt_linear_forecast",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   round(sum(value), 6) AS y
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ),
        series AS (
            SELECT event_type, list(y ORDER BY day) AS ys
            FROM daily GROUP BY event_type
        ),
        folded AS (
            SELECT event_type, len(ys) AS n_days,
                   list_reduce(
                       list_prepend([ys[1], 0.0],
                           list_transform(ys[2:], v -> [v])),
                       (acc, x) -> {_SQL_HOLT_STEP}) AS lt
            FROM series
        )
        SELECT event_type,
               CAST(n_days AS BIGINT) AS n_days,
               round(lt[1], 4) AS level,
               round(lt[2], 4) AS trend,
               round(lt[1] + {_HOLT_H} * lt[2], 4) AS forecast_{_HOLT_H}d
        FROM folded
    """,
    doc=f"Holt linear exponential smoothing (alpha={_HOLT_ALPHA}, "
    f"beta={_HOLT_BETA}) over each event type's daily value series: "
    "final level/trend state and the "
    f"{_HOLT_H}-day-ahead forecast. Init convention: level = first "
    "day's value, trend = 0, recurrence from day 2. The recurrence is "
    "a SEQUENTIAL FOLD (F.aggregate / list_reduce) — both engines "
    "evaluate the identical operation order, so the state matches "
    "bit-for-bit with no per-step rounding; only the daily sums "
    "feeding the series are rounded (they're order-dependent). Scale "
    "shape: one daily aggregate, then one fold per key whose state is "
    "2 doubles — series arrays are bounded by the day count, never by "
    "event count; no window functions at all.",
)
def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("y"))
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "y"))),
            lambda s: s["y"],
        ).alias("ys")
    )
    ys = F.col("ys")
    a, b = _HOLT_ALPHA, _HOLT_BETA

    def step(acc, x):
        level = a * F.get(x, 0) + (1 - a) * (F.get(acc, 0) + F.get(acc, 1))
        trend = b * (level - F.get(acc, 0)) + (1 - b) * F.get(acc, 1)
        return F.array(level, trend)

    init = F.array(F.get(ys, 0), F.lit(0.0))
    rest = F.slice(ys, 2, F.greatest(F.size(ys) - 1, F.lit(0)))
    lt = F.aggregate(
        F.transform(rest, lambda v: F.array(v)), init, step
    )
    return series.select(
        "event_type",
        F.size("ys").cast("long").alias("n_days"),
        F.round(F.get(lt, 0), 4).alias("level"),
        F.round(F.get(lt, 1), 4).alias("trend"),
        F.round(F.get(lt, 0) + _HOLT_H * F.get(lt, 1), 4).alias(
            f"forecast_{_HOLT_H}d"
        ),
    )


# ---------------------------------------------------------------------------
# EWMA anomaly detection (sequential fold, like Holt above)
# ---------------------------------------------------------------------------

_EWMA_ALPHA = 0.3  # smoothing factor for mean and variance
_EWMA_WARMUP = 7  # days before anomaly scoring starts
_EWMA_Z = 3.0  # flag |value - ewma| > Z * ewm-sigma

# One recurrence step over acc = [mu, var, n, anom] and x = [y_t]:
#   flag   = n >= WARMUP AND var > 0 AND |y - mu| > Z * sqrt(var)
#   mu'    = mu + a*(y - mu)
#   var'   = (1-a)*(var + a*(y - mu)^2)   (West's EWM variance recurrence)
# The flag is tested against the PRE-update state — a genuinely novel
# value is scored against the history that did not yet absorb it.
_SQL_EWMA_STEP = (
    f"[acc[1] + {_EWMA_ALPHA} * (x[1] - acc[1]), "
    f"{1 - _EWMA_ALPHA} * (acc[2] + {_EWMA_ALPHA} "
    f"* (x[1] - acc[1]) * (x[1] - acc[1])), "
    "acc[3] + 1, "
    f"acc[4] + (CASE WHEN acc[3] >= {_EWMA_WARMUP} AND acc[2] > 0 "
    f"AND abs(x[1] - acc[1]) > {_EWMA_Z} * sqrt(acc[2]) "
    "THEN 1.0 ELSE 0.0 END)]"
)


@REG.add(
    "ewma_anomaly_daily",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   round(sum(value), 6) AS y
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ),
        series AS (
            SELECT event_type, list(y ORDER BY day) AS ys
            FROM daily GROUP BY event_type
        ),
        folded AS (
            SELECT event_type, len(ys) AS n_days,
                   list_reduce(
                       list_prepend([ys[1], 0.0, 1.0, 0.0],
                           list_transform(ys[2:], v -> [v])),
                       (acc, x) -> {_SQL_EWMA_STEP}) AS st
            FROM series
        )
        SELECT event_type,
               CAST(n_days AS BIGINT) AS n_days,
               round(st[1], 4) AS ewma_level,
               round(sqrt(st[2]), 4) AS ewma_sigma,
               CAST(st[4] AS BIGINT) AS anomaly_days
        FROM folded
    """,
    doc=f"Streaming-style anomaly detection over each event type's daily "
    f"value series: an exponentially weighted mean AND variance "
    f"(alpha={_EWMA_ALPHA}) evolve together in one sequential fold, and a "
    f"day is flagged anomalous when it deviates from the PRE-update state "
    f"by more than {_EWMA_Z} EWM sigmas (after a {_EWMA_WARMUP}-day "
    "warmup, so the near-zero startup variance cannot flag everything). "
    "Like holt_linear_forecast, the recurrence is a SEQUENTIAL FOLD "
    "(F.aggregate / list_reduce) evaluated in identical order by both "
    "engines — state matches bit-for-bit; only the order-dependent daily "
    "sums are rounded. Scale shape: one daily aggregate, then one "
    "4-double fold per key; series arrays are bounded by the day count. "
    "This is the batch twin of the alerting rule a streaming deployment "
    "would run with applyInPandasWithState.",
)
def ewma_anomaly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("y"))
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "y"))),
            lambda s: s["y"],
        ).alias("ys")
    )
    ys = F.col("ys")
    a, w, z = _EWMA_ALPHA, _EWMA_WARMUP, _EWMA_Z

    def step(acc, x):
        mu, var, n, anom = (F.get(acc, i) for i in range(4))
        v = F.get(x, 0)
        flag = (
            (n >= w) & (var > 0) & (F.abs(v - mu) > z * F.sqrt(var))
        )
        return F.array(
            mu + a * (v - mu),
            (1 - a) * (var + a * (v - mu) * (v - mu)),
            n + 1,
            anom + F.when(flag, F.lit(1.0)).otherwise(F.lit(0.0)),
        )

    init = F.array(F.get(ys, 0), F.lit(0.0), F.lit(1.0), F.lit(0.0))
    rest = F.slice(ys, 2, F.greatest(F.size(ys) - 1, F.lit(0)))
    st = F.aggregate(F.transform(rest, lambda v: F.array(v)), init, step)
    return series.select(
        "event_type",
        F.size("ys").cast("long").alias("n_days"),
        F.round(F.get(st, 0), 4).alias("ewma_level"),
        F.round(F.sqrt(F.get(st, 1)), 4).alias("ewma_sigma"),
        F.get(st, 3).cast("long").alias("anomaly_days"),
    )


@REG.add(
    "weekly_seasonal_decompose",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   round(sum(value), 6) AS y
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ),
        trended AS (
            SELECT event_type, day, y, (isodow(day) - 1) AS dow,
                   round(avg(y) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                   ), 6) AS trend
            FROM daily
        ),
        detr AS (
            SELECT event_type, dow, round(y - trend, 6) AS d
            FROM trended
        ),
        seas AS (
            SELECT event_type, dow,
                   CAST(count(*) AS BIGINT) AS n_days,
                   round(avg(d), 6) AS s_raw
            FROM detr GROUP BY event_type, dow
        ),
        centered AS (
            SELECT event_type, dow, n_days,
                   round(s_raw - avg(s_raw) OVER (
                       PARTITION BY event_type), 6) AS seasonal
            FROM seas
        )
        SELECT c.event_type, CAST(c.dow AS INT) AS dow, c.n_days,
               round(c.seasonal, 4) AS seasonal,
               round(avg(abs(d.d - c.seasonal)), 4) AS mean_abs_residual
        FROM centered c
        JOIN detr d ON d.event_type = c.event_type AND d.dow = c.dow
        GROUP BY c.event_type, c.dow, c.n_days, c.seasonal
    """,
    doc="STL-style weekly seasonal decomposition of each event type's "
    "daily value series: trend = centered 7-day moving average (ROWS "
    "frame), seasonal = day-of-week mean of the detrended series, "
    "re-centered to sum to zero per type, residual = what remains. "
    "Output is |types| x 7 rows — the weekly fingerprint plus the "
    "mean absolute residual (how much signal seasonality+trend fail "
    "to explain). Scale shape: one daily aggregate shuffle, then "
    "type-partitioned windows over day-count-bounded series and a "
    "broadcast-sized seasonal join; nothing scales with raw event "
    "count. Day-of-week uses Monday=0 in both engines (Spark weekday, "
    "DuckDB isodow-1).",
)
def weekly_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("y"))
    w_trend = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    )
    detr = daily.select(
        "event_type",
        F.weekday("day").alias("dow"),
        F.round(
            F.col("y") - F.round(F.avg("y").over(w_trend), 6), 6
        ).alias("d"),
    )
    seas = detr.groupBy("event_type", "dow").agg(
        F.count("*").alias("n_days"),
        F.round(F.avg("d"), 6).alias("s_raw"),
    )
    centered = seas.select(
        "event_type",
        "dow",
        "n_days",
        F.round(
            F.col("s_raw")
            - F.avg("s_raw").over(Window.partitionBy("event_type")),
            6,
        ).alias("seasonal"),
    )
    return (
        detr.join(F.broadcast(centered), ["event_type", "dow"])
        .groupBy("event_type", "dow", "n_days", "seasonal")
        .agg(
            F.round(
                F.avg(F.abs(F.col("d") - F.col("seasonal"))), 4
            ).alias("mean_abs_residual")
        )
        .select(
            "event_type",
            F.col("dow").cast("int").alias("dow"),
            "n_days",
            F.round("seasonal", 4).alias("seasonal"),
            "mean_abs_residual",
        )
    )


# ---------------------------------------------------------------------------
# Burst detection over the dense hourly grid
# ---------------------------------------------------------------------------

_BURST_HIST = 24  # trailing window (hours) the baseline is computed over
_BURST_MIN_N = 3  # ignore bursts below this absolute hourly count
_BURST_FACTOR = 2.5  # burst = count > FACTOR * trailing average
# Ratio denominator floor: one event across the trailing day. Keeps the
# burst_ratio finite when a type wakes from total silence.
_BURST_EPS = 1.0 / _BURST_HIST


@REG.add(
    "hourly_burst_detection",
    oracle=f"""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   count(*) AS n
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        ),
        bounds AS (
            SELECT date_trunc('hour', min(ts)) AS lo,
                   date_trunc('hour', max(ts)) AS hi
            FROM events
        ),
        hours AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
            FROM bounds
        ),
        grid AS (
            SELECT t.event_type, h.hour
            FROM hours h, (SELECT DISTINCT event_type FROM events) t
        ),
        dense AS (
            SELECT g.event_type, g.hour, coalesce(a.n, 0) AS n
            FROM grid g LEFT JOIN hourly a USING (event_type, hour)
        ),
        trail AS (
            SELECT event_type, hour, n,
                   avg(CAST(n AS DOUBLE)) OVER w AS base,
                   count(*) OVER w AS n_hist
            FROM dense
            WINDOW w AS (PARTITION BY event_type ORDER BY hour
                         ROWS BETWEEN {_BURST_HIST} PRECEDING
                                  AND 1 PRECEDING)
        )
        SELECT event_type, hour, CAST(n AS BIGINT) AS n_events,
               round(base, 4) AS trailing_avg,
               round(n / greatest(base, {_BURST_EPS}), 4) AS burst_ratio
        FROM trail
        WHERE n_hist >= {_BURST_HIST} AND n >= {_BURST_MIN_N}
          AND n > {_BURST_FACTOR} * base
    """,
    doc=f"Burst detection per event type: hours whose count exceeds "
    f"{_BURST_FACTOR}x the trailing {_BURST_HIST}-hour average (with "
    f"an absolute floor of {_BURST_MIN_N} events and a full-history "
    "requirement so the series head cannot self-flag). Runs over the "
    "DENSE hourly grid — silent hours count as zeros in the baseline, "
    "so a type waking from silence IS a burst; aggregate-only "
    "detectors that skip empty buckets systematically understate "
    "these. Same scale shape as gapfill_hourly_rollup: one hourly "
    "aggregate, a broadcast-sized grid from one bounds row, and a "
    "type-partitioned ROWS window over |types| x |hours| rows; the "
    "trailing average of integer counts is exact rational arithmetic, "
    "identical in both engines.",
)
def hourly_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count("*").alias("n"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias(
            "hour"
        )
    )
    grid = ev.select("event_type").distinct().crossJoin(F.broadcast(hours))
    dense = grid.join(hourly, ["event_type", "hour"], "left").select(
        "event_type", "hour", F.coalesce("n", F.lit(0)).alias("n")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-_BURST_HIST, -1)
    )
    trail = dense.select(
        "event_type",
        "hour",
        "n",
        F.avg(F.col("n").cast("double")).over(w).alias("base"),
        F.count("*").over(w).alias("n_hist"),
    )
    return trail.where(
        (F.col("n_hist") >= _BURST_HIST)
        & (F.col("n") >= _BURST_MIN_N)
        & (F.col("n") > _BURST_FACTOR * F.col("base"))
    ).select(
        "event_type",
        "hour",
        F.col("n").cast("long").alias("n_events"),
        F.round("base", 4).alias("trailing_avg"),
        F.round(
            F.col("n") / F.greatest(F.col("base"), F.lit(_BURST_EPS)), 4
        ).alias("burst_ratio"),
    )


@REG.add(
    "changepoint_binary_segmentation",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   round(avg(value), 6) AS v
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ),
        pre AS (
            SELECT event_type, day, v,
                   row_number() OVER w AS i,
                   sum(v) OVER w AS cs,
                   sum(v * v) OVER w AS cs2,
                   count(*) OVER (PARTITION BY event_type) AS n,
                   last_value(cs) OVER wf AS s,
                   last_value(cs2) OVER wf AS s2
            FROM (
                SELECT event_type, day, v,
                       sum(v) OVER w AS cs, sum(v * v) OVER w AS cs2
                FROM daily
                WINDOW w AS (PARTITION BY event_type ORDER BY day
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW)
            )
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wf AS (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)
        ),
        scored AS (
            SELECT event_type, day, i, n,
                   s2 - s * s / n AS sse_before,
                   (cs2 - cs * cs / i)
                   + ((s2 - cs2) - (s - cs) * (s - cs) / (n - i))
                       AS sse_after
            FROM pre WHERE i < n
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n_days,
               day AS split_day,
               CAST(i AS BIGINT) AS left_days,
               round(sse_before, 4) AS sse_before,
               round(sse_after, 4) AS sse_after,
               round((sse_before - sse_after) / nullif(sse_before, 0), 4)
                   AS gain
        FROM scored
        QUALIFY row_number() OVER (
            PARTITION BY event_type ORDER BY round(sse_after, 6) ASC, day ASC
        ) = 1
    """,
    doc="Single-changepoint detection per event type (the first split of "
    "binary segmentation): the day boundary minimizing total within-"
    "segment squared error of the daily mean-value series, with the "
    "variance-reduction gain. Prefix sums run under a type-partitioned "
    "ORDERED window (sequential adds in day order, so both engines fold "
    "identical doubles in identical order — the same discipline as the "
    "EWMA/Holt folds); totals are the last cumulative value, NOT an "
    "unordered aggregate, so no float-order nondeterminism exists "
    "anywhere. The argmin runs on the 6-dp-rounded SSE with day "
    "tiebreak. Everything after the daily aggregate is O(days) per "
    "type.",
)
def changepoint_binary_segmentation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.round(F.avg("value"), 6).alias("v"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    pre = (
        daily.select(
            "event_type",
            "day",
            F.row_number()
            .over(Window.partitionBy("event_type").orderBy("day"))
            .alias("i"),
            F.sum("v").over(w).alias("cs"),
            F.sum(F.col("v") * F.col("v")).over(w).alias("cs2"),
        )
        .select(
            "*",
            F.count("*").over(wf).alias("n"),
            F.last("cs").over(wf).alias("s"),
            F.last("cs2").over(wf).alias("s2"),
        )
        .where(F.col("i") < F.col("n"))
    )
    i, n = F.col("i"), F.col("n")
    cs, cs2, s, s2 = F.col("cs"), F.col("cs2"), F.col("s"), F.col("s2")
    sse_before = s2 - s * s / n
    sse_after = (cs2 - cs * cs / i) + (
        (s2 - cs2) - (s - cs) * (s - cs) / (n - i)
    )
    scored = pre.select(
        "event_type",
        "day",
        i.alias("i"),
        n.alias("n"),
        sse_before.alias("sse_before"),
        sse_after.alias("sse_after"),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.round(F.col("sse_after"), 6).asc(), F.col("day").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_days"),
            F.col("day").alias("split_day"),
            F.col("i").cast("bigint").alias("left_days"),
            F.round("sse_before", 4).alias("sse_before"),
            F.round("sse_after", 4).alias("sse_after"),
            F.round(
                (F.col("sse_before") - F.col("sse_after"))
                / F.nullif(F.col("sse_before"), F.lit(0.0)),
                4,
            ).alias("gain"),
        )
    )


# ---------------------------------------------------------------------------
# Holt-Winters additive seasonal smoothing (weekly season, sequential fold)
# ---------------------------------------------------------------------------

_HW_A, _HW_B, _HW_G = 0.5, 0.3, 0.4  # level / trend / seasonal factors
_HW_M = 7  # season length (weekly)
_HW_H = 7  # forecast horizon (days ahead)

# State (SQL 1-based): acc = [level, trend, n, s1..s7]; x = [y].
# The seasonal slot for day n (0-based) is n % 7. lvl/sold are inlined
# wherever referenced (lambdas cannot bind locals); identical inlining
# on both engines keeps the fold bit-exact.
_HW_SOLD = f"acc[4 + (CAST(acc[3] AS INT) % {_HW_M})]"
_HW_LVL = (
    f"({_HW_A} * (x[1] - {_HW_SOLD}) + {1 - _HW_A} * (acc[1] + acc[2]))"
)
_HW_TRD = f"({_HW_B} * ({_HW_LVL} - acc[1]) + {1 - _HW_B} * acc[2])"
_HW_SNW = f"({_HW_G} * (x[1] - {_HW_LVL}) + {1 - _HW_G} * {_HW_SOLD})"
_SQL_HW_STEP = (
    f"[{_HW_LVL}, {_HW_TRD}, acc[3] + 1] || "
    f"list_transform(acc[4:{3 + _HW_M}], (sx, i) -> "
    f"CASE WHEN i - 1 = CAST(acc[3] AS INT) % {_HW_M} "
    f"THEN {_HW_SNW} ELSE sx END)"
)


@REG.add(
    "holt_winters_forecast",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   round(sum(value), 6) AS y
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ),
        series AS (
            SELECT event_type, list(y ORDER BY day) AS ys
            FROM daily GROUP BY event_type
        ),
        folded AS (
            SELECT event_type, len(ys) AS n_days,
                   list_reduce(
                       list_prepend(
                           [ys[1], 0.0, 1.0{', 0.0' * _HW_M}],
                           list_transform(ys[2:], v -> [v])),
                       (acc, x) -> {_SQL_HW_STEP}) AS st
            FROM series
        )
        SELECT event_type,
               CAST(n_days AS BIGINT) AS n_days,
               round(st[1], 4) AS level,
               round(st[2], 4) AS trend,
               round(list_max(st[4:{3 + _HW_M}])
                     - list_min(st[4:{3 + _HW_M}]), 4) AS seasonal_range,
               round(st[1] + {_HW_H} * st[2]
                     + st[4 + ((CAST(st[3] AS INT) + {_HW_H} - 1)
                               % {_HW_M})], 4) AS forecast_{_HW_H}d
        FROM folded
    """,
    doc=f"Holt-Winters additive seasonal smoothing (alpha={_HW_A}, "
    f"beta={_HW_B}, gamma={_HW_G}, weekly season) over each type's "
    "daily value series — the forecasting upgrade over holt_linear "
    "when traffic has a day-of-week shape. Init: level = day 1, trend "
    "= 0, seasonals = 0 (learned in the first weeks); the recurrence "
    "updates ONE seasonal slot per day via an index-aware lambda "
    "inside the same sequential fold both engines evaluate in "
    "identical order (nested-lambda accumulator capture, 10-double "
    "state). Reports final state, seasonal amplitude, and the "
    f"{_HW_H}-day-ahead forecast level + h*trend + s[slot]. One daily "
    "aggregate then one bounded fold per key — no windows.",
)
def holt_winters_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("y"))
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "y"))),
            lambda s: s["y"],
        ).alias("ys")
    )
    ys = F.col("ys")
    a, b, g, m = _HW_A, _HW_B, _HW_G, _HW_M

    def step(acc, x):
        y = F.get(x, 0)
        n = F.get(acc, 2)
        idx = n.cast("int") % m
        sold = F.get(acc, F.lit(3) + idx)
        lvl = a * (y - sold) + (1 - a) * (F.get(acc, 0) + F.get(acc, 1))
        trd = b * (lvl - F.get(acc, 0)) + (1 - b) * F.get(acc, 1)
        snw = g * (y - lvl) + (1 - g) * sold
        seas = F.transform(
            F.slice(acc, 4, m),
            lambda sx, i: F.when(i == idx, snw).otherwise(sx),
        )
        return F.concat(F.array(lvl, trd, n + 1), seas)

    init = F.concat(
        F.array(F.get(ys, 0), F.lit(0.0), F.lit(1.0)),
        F.array(*[F.lit(0.0)] * m),
    )
    rest = F.slice(ys, 2, F.greatest(F.size(ys) - 1, F.lit(0)))
    st = F.aggregate(F.transform(rest, lambda v: F.array(v)), init, step)
    seas = F.slice(st, 4, m)
    fc_idx = (F.get(st, 2).cast("int") + _HW_H - 1) % m
    return series.select(
        "event_type",
        F.size("ys").cast("long").alias("n_days"),
        F.round(F.get(st, 0), 4).alias("level"),
        F.round(F.get(st, 1), 4).alias("trend"),
        F.round(
            F.array_max(seas) - F.array_min(seas), 4
        ).alias("seasonal_range"),
        F.round(
            F.get(st, 0)
            + _HW_H * F.get(st, 1)
            + F.get(st, F.lit(3) + fc_idx),
            4,
        ).alias(f"forecast_{_HW_H}d"),
    )
