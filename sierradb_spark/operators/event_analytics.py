"""Event-sourcing analytics: state projections, cohorts, funnels.

The reference is an event store: its applications rebuild aggregate
state by folding a stream's events in order (the event-sourcing
read-model pattern its README describes). These operators are the
batch-analytics versions of those folds over the driver's ``events``
table: current-state projection (the materialized read model),
retention cohorts, and conversion funnels — the queries an
event-sourced system answers daily.

Scale shapes: every query here is one shuffle on ``user_id`` (the
natural partition key); projections use a row_number window and
aggregates under the SAME partitioning, so Catalyst reuses one
exchange. At 100 TB the events table is hive-partitioned and these
plans read only the columns they name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sierradb_spark.registry import Registry, load

REG = Registry()


@REG.add(
    "user_state_projection",
    headline=True,
    oracle="""
        WITH ranked AS (
            SELECT user_id, ts, event_type, value,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        ),
        agg AS (
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   min(ts) AS first_seen, max(ts) AS last_seen,
                   round(sum(value), 2) AS total_value
            FROM events GROUP BY user_id
        )
        SELECT a.user_id, r.event_type AS last_event_type,
               round(r.value, 4) AS last_value,
               a.n_events, a.first_seen, a.last_seen, a.total_value
        FROM agg a JOIN ranked r ON a.user_id = r.user_id AND r.rn = 1
    """,
    doc="Current-state projection (the event-sourcing read model): fold each "
    "user's stream to its latest event + lifetime aggregates. One shuffle on "
    "user_id serves both the row_number window and the groupBy; the join of the "
    "two is co-partitioned, so no further exchange.",
)
def user_state_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    last = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.round("value", 4).alias("last_value"),
        )
    )
    agg = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return agg.join(last, "user_id").select(
        "user_id",
        "last_event_type",
        "last_value",
        "n_events",
        "first_seen",
        "last_seen",
        "total_value",
    )


@REG.add(
    "retention_cohorts",
    oracle="""
        WITH first_seen AS (
            SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        )
        SELECT f.cohort_day,
               CAST((a.day - f.cohort_day) // 7 AS BIGINT) AS offset_week,
               CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
        FROM activity a JOIN first_seen f ON a.user_id = f.user_id
        GROUP BY f.cohort_day, (a.day - f.cohort_day) // 7
    """,
    doc="Retention cohort matrix: users grouped by first-seen day, activity "
    "counted per week offset. first-seen and distinct-activity both partial-"
    "aggregate map-side before one user_id shuffle; the final matrix is "
    "|cohorts x offsets| rows.",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    activity = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    offset_week = F.floor(
        F.datediff(F.col("day"), F.col("cohort_day")) / 7
    ).cast("long")
    return (
        activity.join(first_seen, "user_id")
        .groupBy("cohort_day", offset_week.alias("offset_week"))
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@REG.add(
    "funnel_signup_purchase",
    oracle="""
        WITH s AS (
            SELECT user_id, min(ts) AS signup_ts
            FROM events WHERE event_type = 'signup' GROUP BY user_id
        ),
        conv AS (
            SELECT s.user_id, s.signup_ts, min(e.ts) AS conv_ts
            FROM s JOIN events e
              ON e.user_id = s.user_id
             AND e.event_type = 'purchase'
             AND e.ts >= s.signup_ts
            GROUP BY s.user_id, s.signup_ts
        )
        SELECT CAST((SELECT count(*) FROM s) AS BIGINT) AS n_signup,
               CAST(count(*) AS BIGINT) AS n_converted,
               CAST(count(*) FILTER (
                   WHERE conv_ts <= signup_ts + INTERVAL 7 DAY
               ) AS BIGINT) AS n_converted_7d,
               round(avg(epoch(conv_ts) - epoch(signup_ts)) / 3600, 2)
                   AS avg_hours_to_convert
        FROM conv
    """,
    doc="Conversion funnel: first signup -> first subsequent purchase, with a "
    "7-day-window conversion count and mean hours-to-convert. Both stages "
    "partial-aggregate to one row per user before the user_id-co-partitioned "
    "join; the final result is a single row.",
)
def funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    s = ev.where(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("signup_ts")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    conv = (
        s.join(p, "user_id")
        .where(F.col("p_ts") >= F.col("signup_ts"))
        .groupBy("user_id", "signup_ts")
        .agg(F.min("p_ts").alias("conv_ts"))
    )
    n_signup = s.agg(F.count("*").alias("n_signup"))
    secs = (
        # NTZ-safe: see sessionize_streams — UTC session tz makes this exact.
        F.unix_micros(F.col("conv_ts").cast("timestamp_ltz"))
        - F.unix_micros(F.col("signup_ts").cast("timestamp_ltz"))
    ).cast("double") / 1_000_000.0
    within_7d = F.col("conv_ts") <= F.col("signup_ts") + F.expr("INTERVAL 7 DAY")
    stats = conv.agg(
        F.count("*").alias("n_converted"),
        F.count(F.when(within_7d, 1)).alias("n_converted_7d"),
        F.round(F.avg(secs) / 3600, 2).alias("avg_hours_to_convert"),
    )
    return F.broadcast(n_signup).crossJoin(stats).select(
        "n_signup", "n_converted", "n_converted_7d", "avg_hours_to_convert"
    )


@REG.add(
    "range_join_value_bands",
    oracle="""
        WITH bands AS (
            SELECT k AS band_id,
                   (k * k * 20)::DOUBLE AS lo,
                   (k * k * 20 + 50 + 10 * k)::DOUBLE AS hi
            FROM range(10) t(k)
        )
        SELECT b.band_id, b.lo, b.hi,
               CAST(count(e.event_id) AS BIGINT) AS n_events,
               round(avg(e.value), 4) AS avg_value
        FROM bands b LEFT JOIN events e
          ON e.value >= b.lo AND e.value < b.hi
        GROUP BY b.band_id, b.lo, b.hi
    """,
    doc="Range join: events matched into IRREGULAR, overlapping value bands "
    "(no closed-form bucket function exists, so this cannot be rewritten as a "
    "groupBy). The band table is tiny -> broadcast nested-loop with the range "
    "predicate evaluated stream-side, which is the correct 100 TB plan: the "
    "fact table is scanned once, never shuffled. An event falling in two "
    "overlapping bands counts in both (join, not partition, semantics).",
)
def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bands = spark.range(10).select(
        F.col("id").alias("band_id"),
        (F.col("id") * F.col("id") * 20).cast("double").alias("lo"),
        (F.col("id") * F.col("id") * 20 + 50 + 10 * F.col("id"))
        .cast("double")
        .alias("hi"),
    )
    joined = F.broadcast(bands).join(
        ev, (ev.value >= bands.lo) & (ev.value < bands.hi), "left"
    )
    return joined.groupBy("band_id", "lo", "hi").agg(
        F.count("event_id").alias("n_events"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


TS_WIN = 8  # sliding-window length for the pattern search


@REG.add(
    "tseries_pattern_search",
    oracle=f"""
        WITH w AS (
            SELECT user_id, event_id,
                   list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN CURRENT ROW
                                     AND {TS_WIN - 1} FOLLOWING) AS win
            FROM events
        ),
        f AS (SELECT * FROM w WHERE len(win) = {TS_WIN}),
        st AS (
            SELECT user_id, event_id, win,
                   list_sum(win) / {TS_WIN}.0 AS m
            FROM f
        ),
        z AS (
            SELECT user_id, event_id,
                   list_transform(win, v -> (v - m) / s) AS zwin
            FROM (
                SELECT user_id, event_id, win, m,
                       sqrt(list_sum(list_transform(win,
                            v -> (v - m) * (v - m))) / {TS_WIN}.0) AS s
                FROM st
            )
            WHERE s > 0
        ),
        q AS (
            SELECT zwin AS qz, user_id AS qu, event_id AS qe
            FROM z ORDER BY user_id, event_id LIMIT 1
        )
        SELECT z.user_id, z.event_id,
               round(list_sum(list_transform(range(1, {TS_WIN + 1}),
                     i -> (z.zwin[i] - q.qz[i]) * (z.zwin[i] - q.qz[i]))), 4)
                   AS dist
        FROM z, q
        WHERE NOT (z.user_id = q.qu AND z.event_id = q.qe)
        ORDER BY dist ASC, z.user_id ASC, z.event_id ASC
        LIMIT 10
    """,
    doc="Z-normalized sliding-window pattern search over per-user event-value "
    "series (the distributed time-series subsequence similarity shape, EDBT "
    "2019): per-user windows of 8 values under a user-partitioned ordered "
    "frame, z-normalized in place (array algebra, no extra shuffle), ranked "
    "by squared distance to a broadcast query window, top-10 as "
    "TakeOrderedAndProject. At 100 TB the window build shuffles each user's "
    "series once; normalization and distance are whole-stage codegen.",
)
def tseries_pattern_search(
    spark: SparkSession, sf_dir: str, materialize: bool = True
) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    wspec = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, TS_WIN - 1)
    )
    f = (
        ev.select(
            "user_id",
            "event_id",
            F.collect_list("value").over(wspec).alias("win"),
        )
        .where(F.size("win") == TS_WIN)
    )
    st = f.withColumn(
        "m",
        F.aggregate("win", F.lit(0.0), lambda a, v: a + v) / float(TS_WIN),
    )
    z = (
        st.withColumn(
            "s",
            F.sqrt(
                F.aggregate(
                    "win",
                    F.lit(0.0),
                    lambda a, v: a + (v - F.col("m")) * (v - F.col("m")),
                )
                / float(TS_WIN)
            ),
        )
        .where(F.col("s") > 0)
        .select(
            "user_id",
            "event_id",
            F.transform(
                "win", lambda v: (v - F.col("m")) / F.col("s")
            ).alias("zwin"),
        )
    )
    if materialize:
        # Barrier: the query-row branch (orderBy.limit(1)) and the main
        # distance branch both consume this table; without it the
        # per-user window + normalization runs twice per invocation.
        # (materialize=False keeps the single-plan form inspectable for
        # the plan-shape tests.)
        z = z.localCheckpoint(eager=False)
    q = (
        z.orderBy("user_id", "event_id")
        .limit(1)
        .select(
            F.col("zwin").alias("qz"),
            F.col("user_id").alias("qu"),
            F.col("event_id").alias("qe"),
        )
    )
    dist = F.round(
        F.aggregate(
            F.zip_with(
                F.col("zwin"), F.col("qz"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda a, v: a + v,
        ),
        4,
    ).alias("dist")
    return (
        z.crossJoin(F.broadcast(q))
        .where(~((F.col("user_id") == F.col("qu")) & (F.col("event_id") == F.col("qe"))))
        .select("user_id", "event_id", dist)
        .orderBy(F.col("dist").asc(), F.col("user_id").asc(), F.col("event_id").asc())
        .limit(10)
    )


@REG.add(
    "value_outlier_stats",
    oracle="""
        WITH med AS (
            SELECT event_type,
                   median(value) AS med
            FROM events GROUP BY event_type
        ),
        dev AS (
            SELECT e.event_type, e.value, med.med,
                   abs(e.value - med.med) AS adev
            FROM events e JOIN med USING (event_type)
        ),
        mad AS (
            SELECT event_type, median(adev) AS mad
            FROM dev GROUP BY event_type
        )
        SELECT dev.event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(any_value(dev.med), 4) AS median_value,
               round(any_value(mad.mad), 4) AS mad,
               CAST(sum(CASE WHEN mad.mad > 0
                        AND abs(dev.value - dev.med) / (1.4826 * mad.mad) > 3
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM dev JOIN mad USING (event_type)
        GROUP BY dev.event_type
    """,
    doc="Robust outlier detection per event type: median + MAD (the "
    "robust z-score every data-quality funnel uses where mean/std would "
    "be dragged by the outliers themselves). Two exact-median aggregates "
    "(Spark percentile), deviations joined back via a BROADCAST of the "
    "O(|types|) median table — the fact table scans twice, shuffles never.",
)
def value_outlier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    flagged = dev.join(F.broadcast(mad), "event_type")
    outlier = (F.col("mad") > 0) & (
        F.col("adev") / (1.4826 * F.col("mad")) > 3
    )
    return flagged.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.first("med"), 4).alias("median_value"),
        F.round(F.first("mad"), 4).alias("mad"),
        F.sum(outlier.cast("bigint")).alias("n_outliers"),
    )


@REG.add(
    "event_transition_matrix",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS next_type
            FROM events
        ),
        pairs AS (
            SELECT event_type, next_type, count(*) AS n
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY event_type, next_type
        )
        SELECT event_type, next_type, CAST(n AS BIGINT) AS n,
               round(n::DOUBLE / sum(n) OVER (PARTITION BY event_type), 4)
                   AS p
        FROM pairs
    """,
    doc="First-order event-type transition matrix over per-user sequences "
    "(the Markov-chain view of behavioral event streams): lead() under a "
    "user-partitioned ordered window, pair counts, row-normalized "
    "probabilities. The normalizing window runs over the O(|types|^2) "
    "aggregate, never the event table.",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    pairs = seq.groupBy("event_type", "next_type").agg(
        F.count("*").alias("n")
    )
    norm = Window.partitionBy("event_type")
    return pairs.select(
        "event_type",
        "next_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") / F.sum("n").over(norm), 4).alias("p"),
    )


@REG.add(
    "event_daily_autocorr",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d,
                   count(*) AS n
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ),
        lagged AS (
            SELECT event_type, d, n,
                   lag(n) OVER (PARTITION BY event_type ORDER BY d)
                       AS prev_n
            FROM daily
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               round(avg(n), 4) AS avg_daily,
               round(corr(n, prev_n), 4) AS lag1_autocorr
        FROM lagged WHERE prev_n IS NOT NULL
        GROUP BY event_type
    """,
    doc="Day-over-day autocorrelation of event volume per type: daily "
    "counts, lag-1 self-join via a type-partitioned window, Pearson "
    "correlation of consecutive days — the periodicity/trend detector "
    "behind rate-anomaly monitoring (high positive = momentum/weekly "
    "rhythm, near zero = noise). One aggregate over (type, day) — "
    "days x types rows, tiny — then a window and a correlation fold; "
    "the event table itself is touched once, map-side partial-agged.",
)
def event_daily_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.withColumn("prev_n", F.lag("n").over(w)).where(
        F.col("prev_n").isNotNull()
    )
    return lagged.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.round(F.avg("n"), 4).alias("avg_daily"),
        F.round(F.corr("n", "prev_n"), 4).alias("lag1_autocorr"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation
# ---------------------------------------------------------------------------

_RFM_PS = (0.2, 0.4, 0.6, 0.8)  # quintile boundaries


@REG.add(
    "user_rfm_segments",
    oracle=f"""
        WITH u AS (
            SELECT user_id,
                   epoch_us(max(ts)) AS last_us,
                   count(*) AS freq,
                   round(sum(value), 6) AS mon
            FROM events GROUP BY user_id
        ),
        thr AS (
            SELECT
                {", ".join(f"round(quantile_cont(last_us, {p}), 6) AS r{i}" for i, p in enumerate(_RFM_PS))},
                {", ".join(f"round(quantile_cont(freq, {p}), 6) AS f{i}" for i, p in enumerate(_RFM_PS))},
                {", ".join(f"round(quantile_cont(mon, {p}), 6) AS m{i}" for i, p in enumerate(_RFM_PS))}
            FROM u
        )
        SELECT r_score, f_score, m_score,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(freq) AS BIGINT) AS total_events
        FROM (
            SELECT
                1 {" ".join(f"+ (CASE WHEN u.last_us > t.r{i} THEN 1 ELSE 0 END)" for i in range(len(_RFM_PS)))} AS r_score,
                1 {" ".join(f"+ (CASE WHEN u.freq > t.f{i} THEN 1 ELSE 0 END)" for i in range(len(_RFM_PS)))} AS f_score,
                1 {" ".join(f"+ (CASE WHEN u.mon > t.m{i} THEN 1 ELSE 0 END)" for i in range(len(_RFM_PS)))} AS m_score,
                u.freq
            FROM u, thr t
        )
        GROUP BY r_score, f_score, m_score
    """,
    doc="RFM segmentation: per-user recency (last event time), "
    "frequency, and monetary value scored into quintiles against EXACT "
    "interpolated percentile thresholds, reported as segment sizes. "
    "Scale shape: scoring deliberately avoids ntile()/percent_rank() — "
    "a partitionless window that single-tasks at scale — and instead "
    "folds the 12 thresholds to ONE broadcast row; assignment is then "
    "a pure map over the per-user aggregate. Thresholds are rounded to "
    "6 decimals on both engines (interpolation is float-order "
    "sensitive); score boundaries use strict >.",
)
def user_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(F.unix_micros(F.col("ts").cast("timestamp_ltz"))).alias("last_us"),
        F.count("*").alias("freq"),
        F.round(F.sum("value"), 6).alias("mon"),
    )
    thr = u.agg(
        *[
            F.round(F.expr(f"percentile(last_us, {p})"), 6).alias(f"r{i}")
            for i, p in enumerate(_RFM_PS)
        ],
        *[
            F.round(F.expr(f"percentile(freq, {p})"), 6).alias(f"f{i}")
            for i, p in enumerate(_RFM_PS)
        ],
        *[
            F.round(F.expr(f"percentile(mon, {p})"), 6).alias(f"m{i}")
            for i, p in enumerate(_RFM_PS)
        ],
    )

    def score(metric: str, pfx: str):
        s = F.lit(1)
        for i in range(len(_RFM_PS)):
            s = s + F.when(F.col(metric) > F.col(f"{pfx}{i}"), 1).otherwise(0)
        return s

    scored = u.crossJoin(F.broadcast(thr)).select(
        score("last_us", "r").alias("r_score"),
        score("freq", "f").alias("f_score"),
        score("mon", "m").alias("m_score"),
        "freq",
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").alias("n_users"),
        F.sum("freq").alias("total_events"),
    )


# ---------------------------------------------------------------------------
# Multi-touch attribution
# ---------------------------------------------------------------------------

_ATTR_WINDOW_DAYS = 3


@REG.add(
    "multitouch_attribution",
    oracle=f"""
        WITH conv AS (
            SELECT event_id AS conv_id, user_id, ts AS cts
            FROM events WHERE event_type = 'purchase'
        ),
        touch AS (
            SELECT event_id AS touch_id, user_id, ts AS tts, event_type
            FROM events WHERE event_type IN ('click', 'view')
        ),
        pairs AS (
            SELECT c.conv_id, t.touch_id, t.event_type,
                   epoch_us(t.tts) AS tus
            FROM conv c JOIN touch t ON t.user_id = c.user_id
             AND t.tts < c.cts
             AND t.tts >= c.cts - INTERVAL {_ATTR_WINDOW_DAYS} DAY
        ),
        per_conv AS (
            SELECT conv_id, count(*) AS n,
                   min(tus) AS first_tus, max(tus) AS last_tus
            FROM pairs GROUP BY conv_id
        ),
        flagged AS (
            SELECT p.conv_id, p.event_type,
                   pc.n,
                   CASE WHEN p.tus = pc.first_tus THEN 1 ELSE 0 END AS is_first,
                   CASE WHEN p.tus = pc.last_tus THEN 1 ELSE 0 END AS is_last
            FROM pairs p JOIN per_conv pc USING (conv_id)
        ),
        ties AS (
            SELECT conv_id, sum(is_first) AS n_first, sum(is_last) AS n_last
            FROM flagged GROUP BY conv_id
        )
        SELECT f.event_type,
               CAST(count(*) AS BIGINT) AS touches,
               CAST(count(DISTINCT f.conv_id) AS BIGINT) AS conversions,
               round(sum(f.is_first / CAST(t.n_first AS DOUBLE)), 4)
                   AS first_credits,
               round(sum(f.is_last / CAST(t.n_last AS DOUBLE)), 4)
                   AS last_credits,
               round(sum(1.0 / CAST(f.n AS DOUBLE)), 4) AS linear_credits
        FROM flagged f JOIN ties t USING (conv_id)
        GROUP BY f.event_type
    """,
    doc="Multi-touch attribution: every purchase's click/view touches "
    f"within the preceding {_ATTR_WINDOW_DAYS} days share credit under "
    "three standard models at once — first-touch, last-touch, and "
    "linear (1/n). Boundary ties split the first/last credit equally "
    "(deterministic, no arbitrary row pick), so totals conserve one "
    "credit per converted purchase per model. Scale shape: the "
    "conversion-touch pairing is a user-equi-join with a bounded time "
    "band (per-user work only, the as-of/interval-join family); "
    "first/last flags come from conversion-keyed aggregates, NOT a "
    "global window; credit sums shuffle (conv_id, counters) rows.",
)
def multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    conv = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id"),
        us.alias("cus"),
    )
    touch = ev.where(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id"),
        us.alias("tus"),
        "event_type",
    )
    horizon = _ATTR_WINDOW_DAYS * 86_400 * 1_000_000
    pairs = conv.join(
        touch,
        (conv.user_id == touch.user_id)
        & (F.col("tus") < F.col("cus"))
        & (F.col("tus") >= F.col("cus") - F.lit(horizon)),
    ).select("conv_id", "touch_id", "event_type", "tus")
    pairs = pairs.localCheckpoint(eager=True)  # read by three aggregates
    per_conv = pairs.groupBy("conv_id").agg(
        F.count("*").alias("n"),
        F.min("tus").alias("first_tus"),
        F.max("tus").alias("last_tus"),
    )
    flagged = pairs.join(per_conv, "conv_id").select(
        "conv_id",
        "event_type",
        "n",
        (F.col("tus") == F.col("first_tus")).cast("int").alias("is_first"),
        (F.col("tus") == F.col("last_tus")).cast("int").alias("is_last"),
    )
    ties = flagged.groupBy("conv_id").agg(
        F.sum("is_first").alias("n_first"),
        F.sum("is_last").alias("n_last"),
    )
    return (
        flagged.join(ties, "conv_id")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("touches"),
            F.countDistinct("conv_id").alias("conversions"),
            F.round(
                F.sum(F.col("is_first") / F.col("n_first").cast("double")), 4
            ).alias("first_credits"),
            F.round(
                F.sum(F.col("is_last") / F.col("n_last").cast("double")), 4
            ).alias("last_credits"),
            F.round(F.sum(1.0 / F.col("n").cast("double")), 4).alias(
                "linear_credits"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Markov-chain stationary distribution (power iteration)
# ---------------------------------------------------------------------------

_MK_ITERS = 12

_SQL_MK_BASE = """
        seq AS (
            SELECT event_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS next_type
            FROM events
        ),
        pairs AS MATERIALIZED (
            SELECT event_type AS src, next_type AS dst, count(*) AS n
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY event_type, next_type
        ),
        p AS MATERIALIZED (
            SELECT src, dst,
                   n::DOUBLE / sum(n) OVER (PARTITION BY src) AS p
            FROM pairs
        ),
        states AS (SELECT DISTINCT src FROM pairs),
        nst AS (SELECT count(*)::DOUBLE AS k FROM states),
        pi0 AS (SELECT src AS s, 1.0 / k AS v FROM states, nst)
"""


def _sql_markov() -> str:
    ctes = [_SQL_MK_BASE]
    for i in range(_MK_ITERS):
        ctes.append(
            f"""
        raw{i + 1} AS MATERIALIZED (
            SELECT p.dst AS s, sum(pi.v * p.p) AS v
            FROM pi{i} pi JOIN p ON p.src = pi.s
            GROUP BY p.dst
        ),
        pi{i + 1} AS MATERIALIZED (
            SELECT s, v / (SELECT sum(v) FROM raw{i + 1}) AS v
            FROM raw{i + 1}
        )
        """
        )
    return (
        "WITH "
        + ",".join(ctes)
        + f""",
        outdeg AS (
            SELECT src, CAST(count(*) AS BIGINT) AS n_out,
                   CAST(sum(n) AS BIGINT) AS n_transitions
            FROM pairs GROUP BY src
        ),
        emp AS (
            SELECT event_type,
                   count(*)::DOUBLE / (SELECT count(*) FROM events)
                       AS empirical_p
            FROM events GROUP BY event_type
        )
        SELECT pi.s AS event_type,
               round(pi.v, 6) AS stationary_p,
               round(emp.empirical_p, 6) AS empirical_p,
               o.n_out, o.n_transitions
        FROM pi{_MK_ITERS} pi
        JOIN outdeg o ON o.src = pi.s
        JOIN emp ON emp.event_type = pi.s
        """
    )


@REG.add(
    "markov_stationary_distribution",
    oracle=_sql_markov(),
    doc="Stationary distribution of the first-order event-type Markov "
    "chain (the long-run fraction of time a user's behavior spends in "
    f"each state), by {_MK_ITERS} renormalized power-iteration steps "
    "over the row-normalized transition matrix from "
    "event_transition_matrix, compared side-by-side with the EMPIRICAL "
    "type distribution — a gap between the two is the fingerprint of "
    "non-ergodic flows (onboarding funnels, absorbing churn states). "
    "Renormalizing each step keeps mass exact even when transitions "
    "point at sink types with no outgoing edges. Scale shape: the "
    "event table is touched twice (pair counts + empirical counts, "
    "both map-side combined); the iteration state is an O(|types|) "
    "vector against an O(|types|^2) matrix — bounded by the event-type "
    "vocabulary at any corpus scale, so the power iteration runs "
    "driver-side over the collected matrix (the k-means-centroid "
    "boundedness argument) instead of paying a Spark job per step; the "
    "fixed iteration count keeps the oracle expressible as unrolled "
    "SQL (same convention as pagerank_near_dup).",
)
def markov_stationary_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ONE events pass (r11 second cut): keeping the null-next rows in the
    # pair aggregate makes it carry the empirical marginals too — every
    # event contributes exactly one (event_type, next_type) row, so
    # sum(n) over a src's rows INCLUDING the null-dst group is that
    # type's total event count and sum over everything is count(*).
    # The old shape paid a second full events scan just for the
    # empirical distribution, plus an eager localCheckpoint of the pair
    # table so two downstream consumers (normalization window + outdeg)
    # could share it. The collected pair table is O(|types|^2+|types|),
    # bounded by the event-type vocabulary at any corpus scale, so
    # outdeg / normalization / the 12 renormalized power-iteration
    # steps all run driver-side (the k-means-centroid boundedness
    # argument); the inner join's sink-drop semantics (a state
    # contributes only while it has a pi row) are reproduced by the
    # presence check below. Exactness: n/total is the same IEEE-double
    # division of exact integers both engines perform, and the
    # accumulation order is pinned by the (src, dst) sort.
    allpairs = (
        ev.select(
            "event_type", F.lead("event_type").over(w).alias("next_type")
        )
        .groupBy(
            F.col("event_type").alias("src"), F.col("next_type").alias("dst")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    )
    out_n: dict = {}
    out_cnt: dict = {}
    emp_n: dict = {}
    for r in allpairs:
        emp_n[r["src"]] = emp_n.get(r["src"], 0) + r["n"]
        if r["dst"] is not None:
            out_n[r["src"]] = out_n.get(r["src"], 0) + r["n"]
            out_cnt[r["src"]] = out_cnt.get(r["src"], 0) + 1
    tot_ev = sum(emp_n.values())
    p_rows = sorted(
        (r["src"], r["dst"], r["n"] / out_n[r["src"]])
        for r in allpairs
        if r["dst"] is not None
    )
    srcs = sorted(out_n)
    v: dict = {s: 1.0 / len(srcs) for s in srcs}
    for _ in range(_MK_ITERS):
        raw: dict = {}
        for s, d, p in p_rows:
            m = v.get(s)
            if m is None:  # join semantics: absent state, not zero mass
                continue
            raw[d] = raw.get(d, 0.0) + m * p
        tot = sum(raw.values())
        v = {d: x / tot for d, x in raw.items()}
    # Output rows = pi INNER JOIN outdeg INNER JOIN emp: sink states
    # (no outgoing edges) drop, exactly as the old distributed joins
    # did. Rounding stays in Spark so HALF_UP semantics are unchanged.
    out = spark.createDataFrame(
        [
            (s, float(v[s]), emp_n[s] / tot_ev, out_cnt[s], out_n[s])
            for s in sorted(v)
            if s in out_n
        ],
        "s string, v double, e double, n_out long, n_transitions long",
    )
    return out.select(
        F.col("s").alias("event_type"),
        F.round("v", 6).alias("stationary_p"),
        F.round("e", 6).alias("empirical_p"),
        "n_out",
        "n_transitions",
    )


@REG.add(
    "interarrival_time_stats",
    oracle="""
        WITH seq AS (
            SELECT event_type,
                   (epoch_us(ts) - epoch_us(lag(ts) OVER (
                       PARTITION BY event_type ORDER BY ts, event_id
                   ))) / 1000000.0 AS gap_s
            FROM events
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_gaps,
               round(avg(gap_s), 3) AS avg_gap_s,
               round(quantile_cont(gap_s, 0.5), 3) AS median_gap_s,
               round(quantile_cont(gap_s, 0.95), 3) AS p95_gap_s,
               round(max(gap_s), 3) AS max_gap_s
        FROM seq WHERE gap_s IS NOT NULL
        GROUP BY event_type
    """,
    doc="Inter-arrival time distribution per event type (seconds between "
    "consecutive events of the same type, ordered by ts with event_id "
    "tiebreak): mean / exact median / p95 / max. The arrival-process "
    "fingerprint — Poisson-like types show mean ~ p50/ln2; heavy-tailed "
    "p95/median ratios expose burst-and-silence patterns that capacity "
    "planning and anomaly thresholds must account for. One "
    "type-partitioned window (single exchange, reused by the aggregate "
    "on the same key), exact percentile over per-type gap arrays; gaps "
    "are integer-second epochs diffed NTZ so both engines agree "
    "exactly.",
)
def interarrival_time_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    epoch = F.unix_micros(F.col("ts").cast("timestamp_ltz")) / 1_000_000.0
    seq = ev.select(
        "event_type", (epoch - F.lag(epoch).over(w)).alias("gap_s")
    ).where(F.col("gap_s").isNotNull())
    return seq.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.round(F.avg("gap_s"), 3).alias("avg_gap_s"),
        F.round(F.expr("percentile(gap_s, 0.5)"), 3).alias("median_gap_s"),
        F.round(F.expr("percentile(gap_s, 0.95)"), 3).alias("p95_gap_s"),
        F.round(F.max("gap_s"), 3).alias("max_gap_s"),
    )


_PATH_LEN = 5  # path prefix length (events per session considered)
_PATH_TOP = 20


@REG.add(
    "top_session_paths",
    oracle=f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN ts - lag(ts) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id)
                            > INTERVAL 30 MINUTE
                        OR lag(ts) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id)
                            IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        sessions AS (
            SELECT user_id, ts, event_id, event_type,
                   CAST(sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_no
            FROM flagged
        ),
        ranked AS (
            SELECT user_id, session_no, event_type,
                   row_number() OVER (
                       PARTITION BY user_id, session_no
                       ORDER BY ts, event_id) AS rk,
                   count(*) OVER (
                       PARTITION BY user_id, session_no) AS n_events
            FROM sessions
        ),
        paths AS (
            SELECT user_id, session_no,
                   CAST(max(n_events) AS BIGINT) AS n_events,
                   string_agg(event_type, '>' ORDER BY rk) AS path
            FROM ranked WHERE rk <= {_PATH_LEN}
            GROUP BY user_id, session_no
        )
        SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
               round(avg(CAST(n_events AS DOUBLE)), 4) AS avg_session_events
        FROM paths GROUP BY path
        ORDER BY n_sessions DESC, path ASC LIMIT {_PATH_TOP}
    """,
    doc=f"Behavioral path mining: the {_PATH_TOP} most common session "
    f"journeys, where a journey is the first {_PATH_LEN} event types of "
    "a 30-minute-gap session in event-time order — the table a funnel "
    "designer reads before hard-coding funnel steps (funnel_signup_"
    "purchase checks ONE hypothesized path; this surfaces the paths "
    "that actually happen, with each path's session count and average "
    "full-session length). Scale shape: sessionization windows hash on "
    "user_id (one exchange), the per-session window and its groupBy "
    "share the (user_id, session_no) exchange, and the final top-"
    f"{_PATH_TOP} is a TakeOrderedAndProject over per-path counters — "
    "no global sort, no text beyond short type names.",
)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                # µs-exact gap (NTZ-safe): see sessionize_streams.
                F.unix_micros(F.col("ts").cast("timestamp_ltz"))
                - F.unix_micros(F.lag("ts").over(w).cast("timestamp_ltz"))
                > 30 * 60 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_no",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ws = Window.partitionBy("user_id", "session_no").orderBy("ts", "event_id")
    ranked = sessions.select(
        "user_id",
        "session_no",
        "event_type",
        F.row_number().over(ws).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("user_id", "session_no"))
        .alias("n_events"),
    )
    paths = (
        ranked.where(F.col("rk") <= _PATH_LEN)
        .groupBy("user_id", "session_no")
        .agg(
            F.max("n_events").cast("long").alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rk", "event_type"))),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path"),
        )
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(F.avg(F.col("n_events").cast("double")), 4).alias(
                "avg_session_events"
            ),
        )
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(_PATH_TOP)
    )

_KM_GAP_US = 30 * 60 * 1_000_000  # session gap, microsecond-exact


@REG.add(
    "kaplan_meier_retention",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, ts,
                   CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                             > {_KM_GAP_US}
                        OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts,
                   sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS sid
            FROM seq
        ),
        spans AS (
            SELECT user_id, sid, min(ts) AS first_ts, max(ts) AS last_ts
            FROM sess GROUP BY user_id, sid
        ),
        horizon AS (SELECT max(ts) AS mx FROM events),
        lab AS (
            SELECT CAST(floor((epoch_us(last_ts) - epoch_us(first_ts))
                              / 60000000.0) AS BIGINT) AS d,
                   CAST(epoch_us(mx) - epoch_us(last_ts) <= {_KM_GAP_US}
                        AS INT) AS cens
            FROM spans, horizon
        ),
        hist AS (
            SELECT d, count(*) FILTER (WHERE cens = 0) AS n_churn,
                   count(*) FILTER (WHERE cens = 1) AS n_cens
            FROM lab GROUP BY d
        ),
        risk AS (
            SELECT h.d, h.n_churn, h.n_cens,
                   sum(r.n_churn + r.n_cens) AS n_at_risk
            FROM hist h JOIN hist r ON r.d >= h.d
            GROUP BY h.d, h.n_churn, h.n_cens
        ),
        surv AS (
            SELECT h.d,
                   sum(ln(1.0 - p.n_churn::DOUBLE / p.n_at_risk)) AS log_s
            FROM risk h JOIN risk p
              ON p.d <= h.d AND p.n_churn > 0
                 AND p.n_churn < p.n_at_risk
            GROUP BY h.d
        ),
        dead AS (
            SELECT DISTINCT h.d
            FROM risk h JOIN risk z
              ON z.d <= h.d AND z.n_churn >= z.n_at_risk
        )
        SELECT CAST(h.d AS BIGINT) AS duration_minutes,
               CAST(h.n_at_risk AS BIGINT) AS n_at_risk,
               CAST(h.n_churn AS BIGINT) AS n_ended,
               CAST(h.n_cens AS BIGINT) AS n_censored,
               round(CASE WHEN dead.d IS NOT NULL THEN 0.0
                          WHEN s.log_s IS NULL THEN 1.0
                          ELSE exp(s.log_s) END, 6) AS survival
        FROM risk h
        LEFT JOIN surv s ON s.d = h.d
        LEFT JOIN dead ON dead.d = h.d
        WHERE h.n_churn > 0
    """,
    doc="Kaplan-Meier survival curve over session durations (30-min-gap "
    "sessions, the windows.py convention): a session's duration is "
    "first-to-last event minutes; sessions whose last event is within "
    "one gap of the corpus horizon are right-censored (they might have "
    "continued). S(t) is the product-limit estimator computed WITHOUT "
    "a global window: sessions collapse to a duration histogram "
    "(bounded by the max session length in minutes), the risk set and "
    "log-survival cumulative are nested-loop joins over that tiny "
    "aggregate, and the product is exp(sum(ln)) with the everyone-"
    "ended boundary handled exactly (survival 0, no ln(0)). The "
    "sessionization windows are user-partitioned.",
)
def kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    prev = F.lag(us).over(w)
    seq = ev.select(
        "user_id",
        "ts",
        F.when(
            prev.isNull() | ((us - prev) > _KM_GAP_US), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("brk"),
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = seq.select(
        "user_id", "ts", F.sum("brk").over(wc).alias("sid")
    )
    spans = sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    horizon = ev.agg(F.max("ts").alias("mx"))
    lab = spans.crossJoin(F.broadcast(horizon)).select(
        F.floor(
            (F.unix_micros(F.col("last_ts").cast("timestamp_ltz"))
            - F.unix_micros(F.col("first_ts").cast("timestamp_ltz")))
            / 60000000.0
        )
        .cast("bigint")
        .alias("d"),
        (
            (F.unix_micros(F.col("mx").cast("timestamp_ltz"))
                - F.unix_micros(F.col("last_ts").cast("timestamp_ltz"))) <= _KM_GAP_US
        )
        .cast("int")
        .alias("cens"),
    )
    hist = lab.groupBy("d").agg(
        F.count(F.when(F.col("cens") == 0, 1)).alias("n_churn"),
        F.count(F.when(F.col("cens") == 1, 1)).alias("n_cens"),
    )
    h, r = hist.alias("h"), hist.alias("r")
    risk = (
        h.join(F.broadcast(r), F.col("r.d") >= F.col("h.d"))
        .groupBy(
            F.col("h.d").alias("d"),
            F.col("h.n_churn").alias("n_churn"),
            F.col("h.n_cens").alias("n_cens"),
        )
        .agg(F.sum(F.col("r.n_churn") + F.col("r.n_cens")).alias("n_at_risk"))
    )
    hh, p = risk.alias("hh"), risk.alias("p")
    factor = 1.0 - F.col("p.n_churn").cast("double") / F.col("p.n_at_risk")
    surv = (
        hh.join(
            F.broadcast(p),
            (F.col("p.d") <= F.col("hh.d"))
            & (F.col("p.n_churn") > 0)
            & (F.col("p.n_churn") < F.col("p.n_at_risk")),
        )
        .groupBy(F.col("hh.d").alias("d"))
        .agg(F.sum(F.log(factor)).alias("log_s"))
    )
    z = risk.alias("z")
    dead = hh.join(
        F.broadcast(z),
        (F.col("z.d") <= F.col("hh.d"))
        & (F.col("z.n_churn") >= F.col("z.n_at_risk")),
        "left_semi",
    ).select(F.col("hh.d").alias("d"), F.lit(1).alias("dead"))
    out = (
        risk.join(surv, "d", "left")
        .join(dead, "d", "left")
        .where(F.col("n_churn") > 0)
    )
    survival = F.when(F.col("dead") == 1, F.lit(0.0)).otherwise(
        F.when(F.col("log_s").isNull(), F.lit(1.0)).otherwise(
            F.exp(F.col("log_s"))
        )
    )
    return out.select(
        F.col("d").cast("bigint").alias("duration_minutes"),
        F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
        F.col("n_churn").cast("bigint").alias("n_ended"),
        F.col("n_cens").cast("bigint").alias("n_censored"),
        F.round(survival, 6).alias("survival"),
    )


@REG.add(
    "ab_test_proportions",
    oracle="""
        WITH g AS (
            SELECT CAST(count(*) FILTER (WHERE grp = 0) AS BIGINT) AS n_a,
                   CAST(count(*) FILTER (WHERE grp = 1) AS BIGINT) AS n_b,
                   CAST(count(*) FILTER (WHERE grp = 0
                        AND event_type = 'purchase') AS BIGINT) AS conv_a,
                   CAST(count(*) FILTER (WHERE grp = 1
                        AND event_type = 'purchase') AS BIGINT) AS conv_b
            FROM (
                SELECT event_type,
                       ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                           ::UBIGINT % 2 AS grp
                FROM events
            )
        )
        SELECT n_a, n_b, conv_a, conv_b,
               round(conv_a::DOUBLE / n_a, 6) AS rate_a,
               round(conv_b::DOUBLE / n_b, 6) AS rate_b,
               round((conv_a::DOUBLE / n_a - conv_b::DOUBLE / n_b)
                     / sqrt(((conv_a + conv_b)::DOUBLE / (n_a + n_b))
                            * (1.0 - (conv_a + conv_b)::DOUBLE / (n_a + n_b))
                            * (1.0 / n_a + 1.0 / n_b)), 4) AS z_stat,
               abs(round((conv_a::DOUBLE / n_a - conv_b::DOUBLE / n_b)
                     / sqrt(((conv_a + conv_b)::DOUBLE / (n_a + n_b))
                            * (1.0 - (conv_a + conv_b)::DOUBLE / (n_a + n_b))
                            * (1.0 / n_a + 1.0 / n_b)), 4)) > 1.96
                   AS significant
        FROM g
    """,
    doc="Two-proportion z-test between deterministic hash-split halves "
    "(md5-slice user assignment — the portable bucketing an "
    "experimentation platform uses), on the purchase share of events: "
    "pooled-variance z statistic, 5% two-sided significance on the "
    "ROUNDED z. On a hash split of homogeneous traffic this is the A/A "
    "calibration run (expected: not significant). One 4-counter fold — "
    "no joins, no windows; every count is an exact integer so both "
    "engines compute the identical statistic. (Unit = event; for "
    "user-level units aggregate per user first and feed the same "
    "fold.)",
)
def ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    grp = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 2
    )
    tagged = ev.select("event_type", grp.alias("grp"))
    g = tagged.agg(
        F.count(F.when(F.col("grp") == 0, 1)).cast("bigint").alias("n_a"),
        F.count(F.when(F.col("grp") == 1, 1)).cast("bigint").alias("n_b"),
        F.count(
            F.when(
                (F.col("grp") == 0) & (F.col("event_type") == "purchase"), 1
            )
        )
        .cast("bigint")
        .alias("conv_a"),
        F.count(
            F.when(
                (F.col("grp") == 1) & (F.col("event_type") == "purchase"), 1
            )
        )
        .cast("bigint")
        .alias("conv_b"),
    )
    ra = F.col("conv_a").cast("double") / F.col("n_a")
    rb = F.col("conv_b").cast("double") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = F.round(
        (ra - rb)
        / F.sqrt(
            pool
            * (1.0 - pool)
            * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
        ),
        4,
    )
    return g.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(ra, 6).alias("rate_a"),
        F.round(rb, 6).alias("rate_b"),
        z.alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant"),
    )


_SHAP_CHANNELS = (("view", 1), ("click", 2), ("signup", 4), ("error", 8))
# Shapley weight by coalition size for |U|=4: s!(4-s-1)!/4!
_SHAP_W = {0: 0.25, 1: 1.0 / 12.0, 2: 1.0 / 12.0, 3: 0.25}


@REG.add(
    "shapley_channel_attribution",
    oracle="""
        WITH um AS (
            SELECT user_id,
                   CAST(sum(DISTINCT CASE event_type
                        WHEN 'view' THEN 1 WHEN 'click' THEN 2
                        WHEN 'signup' THEN 4 WHEN 'error' THEN 8
                        ELSE 0 END) AS BIGINT) AS mask,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS conv
            FROM events GROUP BY user_id
        ),
        cnt AS (
            SELECT mask, count(*) AS n, sum(conv) AS c
            FROM um GROUP BY mask
        ),
        tot AS (SELECT sum(n) AS nu FROM cnt),
        subsets AS (SELECT unnest(range(16)) AS s),
        v AS (
            SELECT s.s, coalesce(sum(c.c), 0) AS cv
            FROM subsets s LEFT JOIN cnt c ON (c.mask & s.s) = c.mask
            GROUP BY s.s
        ),
        chan AS (
            SELECT * FROM (VALUES (1, 'view'), (2, 'click'),
                                  (4, 'signup'), (8, 'error'))
                 AS t(bit, channel)
        ),
        terms AS (
            SELECT ch.channel, ch.bit,
                   CASE bit_count(CAST(v0.s AS BIGINT))
                        WHEN 0 THEN 0.25
                        WHEN 1 THEN (1.0::DOUBLE) / 12
                        WHEN 2 THEN (1.0::DOUBLE) / 12
                        ELSE 0.25 END
                   * (v1.cv - v0.cv) AS term
            FROM chan ch
            JOIN v v0 ON (v0.s & ch.bit) = 0
            JOIN v v1 ON v1.s = (v0.s | ch.bit)
        ),
        touched AS (
            SELECT ch.channel, sum(cnt.n) AS n_touched
            FROM chan ch JOIN cnt ON (cnt.mask & ch.bit) <> 0
            GROUP BY ch.channel
        )
        SELECT t.channel,
               CAST(coalesce(tc.n_touched, 0) AS BIGINT) AS n_touched_users,
               round(sum(t.term) / min(tot.nu), 6) AS shapley_conversions
        FROM terms t
        LEFT JOIN touched tc ON tc.channel = t.channel
        CROSS JOIN tot
        GROUP BY t.channel, tc.n_touched
    """,
    doc="Exact Shapley-value channel attribution over the 4 non-purchase "
    "touch channels: each user collapses to a 4-bit touched-channel "
    "mask + converted flag; the coalition value v(S) is the converter "
    "count among users whose whole touch-set fits in S, and the Shapley "
    "sum runs over ALL 2^4 coalitions with exact factorial weights — "
    "the data-driven attribution marketers approximate by sampling, "
    "exact here because the channel universe is small. Everything after "
    "the per-user fold is arithmetic over a 16-row coalition table "
    "(counts are integers; both engines compute identical values). "
    "phi sums to v(U)-v(empty) by construction.",
)
def shapley_channel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bit = (
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "error", 8)
        .otherwise(0)
    )
    um = ev.groupBy("user_id").agg(
        F.sum_distinct(bit).cast("bigint").alias("mask"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    cnt = um.groupBy("mask").agg(
        F.count("*").alias("n"), F.sum("conv").alias("c")
    )
    tot = cnt.agg(F.sum("n").alias("nu"))
    subsets = spark.range(16).select(F.col("id").cast("bigint").alias("s"))
    v = (
        subsets.join(
            F.broadcast(cnt),
            (F.col("mask").bitwiseAND(F.col("s")) == F.col("mask")),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("cv"))
    )
    chan = spark.createDataFrame(
        [(b, name) for name, b in _SHAP_CHANNELS], "bit long, channel string"
    )
    w = (
        F.when(F.bit_count(F.col("v0.s")) == 0, F.lit(0.25))
        .when(F.bit_count(F.col("v0.s")) == 1, F.lit(1.0 / 12.0))
        .when(F.bit_count(F.col("v0.s")) == 2, F.lit(1.0 / 12.0))
        .otherwise(F.lit(0.25))
    )
    v0, v1 = v.alias("v0"), v.alias("v1")
    terms = (
        chan.join(
            F.broadcast(v0),
            F.col("v0.s").bitwiseAND(F.col("bit")) == 0,
        )
        .join(
            F.broadcast(v1),
            F.col("v1.s") == F.col("v0.s").bitwiseOR(F.col("bit")),
        )
        .select(
            "channel",
            "bit",
            (w * (F.col("v1.cv") - F.col("v0.cv"))).alias("term"),
        )
    )
    touched = (
        chan.join(
            F.broadcast(cnt),
            F.col("mask").bitwiseAND(F.col("bit")) != 0,
        )
        .groupBy("channel")
        .agg(F.sum("n").alias("n_touched"))
    )
    return (
        terms.join(F.broadcast(touched), "channel", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("channel", "n_touched")
        .agg(
            F.round(F.sum("term") / F.min("nu"), 6).alias(
                "shapley_conversions"
            )
        )
        .select(
            "channel",
            F.coalesce(F.col("n_touched"), F.lit(0))
            .cast("bigint")
            .alias("n_touched_users"),
            "shapley_conversions",
        )
    )


@REG.add(
    "time_to_convert_stats",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                   min(CASE WHEN event_type = 'purchase' THEN ts END)
                       AS t_buy
            FROM events GROUP BY user_id
        ),
        conv AS (
            SELECT user_id,
                   CAST(floor((epoch_us(t_buy) - epoch_us(t_view))
                              / 60000000.0) AS BIGINT) AS mins
            FROM firsts
            WHERE t_view IS NOT NULL AND t_buy IS NOT NULL
              AND t_buy >= t_view
        ),
        ranked AS (
            SELECT mins,
                   row_number() OVER (ORDER BY mins, user_id) AS rn,
                   count(*) OVER () AS n
            FROM conv
        ),
        tot AS (SELECT count(*) AS n_users FROM firsts)
        SELECT CAST(min(t.n_users) AS BIGINT) AS n_users,
               CAST(min(r.n) AS BIGINT) AS n_converted,
               round(min(r.n)::DOUBLE / min(t.n_users), 6) AS conversion,
               min(CASE WHEN rn = CAST(floor((n + 1) / 2) AS BIGINT)
                        THEN mins END) AS p50_minutes,
               min(CASE WHEN rn = greatest(1,
                        CAST(ceil(0.9 * n) AS BIGINT)) THEN mins END)
                   AS p90_minutes,
               max(mins) AS max_minutes
        FROM ranked r CROSS JOIN tot t
    """,
    doc="Time-to-convert funnel timing: minutes from a user's first "
    "'view' to their first 'purchase' (converters = both present, in "
    "order), with exact p50/p90 order statistics and the conversion "
    "share. The rank runs over the CONVERTERS aggregate (one row per "
    "converting user — already a contraction of the event table); at "
    "true scale the percentile swaps to approx_percentile with this "
    "exact form as its oracle, same as the sketch family does.",
)
def time_to_convert_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp_ltz"))  # noqa: E731
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "t_view"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("t_buy"),
    )
    conv = firsts.where(
        F.col("t_view").isNotNull()
        & F.col("t_buy").isNotNull()
        & (F.col("t_buy") >= F.col("t_view"))
    ).select(
        "user_id",
        F.floor((us("t_buy") - us("t_view")) / 60000000.0)
        .cast("bigint")
        .alias("mins"),
    )
    # Percentiles WITHOUT a global window: converters collapse to a
    # minutes histogram, and the ascending inclusive cumulative is the
    # two-level prefix sum (registry.bucketed_cumulative). The old
    # broadcast range join was "bounded by corpus age in minutes" —
    # but a multi-year corpus is ~10^6 distinct latency minutes, and
    # O(minutes²) is 10^12 comparisons; the prefix sum is linear and
    # exactly reproduces the oracle's direct row_number() definition.
    hist = conv.groupBy("mins").agg(F.count("*").alias("c"))
    from sierradb_spark.registry import bucketed_cumulative

    cum = bucketed_cumulative(
        hist, "mins", {"c": "cum"}, inclusive=True
    ).select("mins", "cum")
    nconv = hist.agg(F.sum("c").alias("n"))
    tot = firsts.agg(F.count("*").alias("n_users"))
    n = F.col("n")
    r50 = F.floor((n + 1) / 2).cast("bigint")
    r90 = F.greatest(F.lit(1), F.ceil(0.9 * n).cast("bigint"))
    return (
        cum.crossJoin(F.broadcast(nconv))
        .crossJoin(F.broadcast(tot))
        .agg(
            F.min("n_users").cast("bigint").alias("n_users"),
            F.min("n").cast("bigint").alias("n_converted"),
            F.round(
                F.min("n").cast("double") / F.min("n_users"), 6
            ).alias("conversion"),
            F.min(
                F.when(F.col("cum") >= r50, F.col("mins"))
            ).alias("p50_minutes"),
            F.min(
                F.when(F.col("cum") >= r90, F.col("mins"))
            ).alias("p90_minutes"),
            F.max("mins").alias("max_minutes"),
        )
    )



_POWER_LIFTS = (0.01, 0.02, 0.05, 0.10)  # relative MDE grid
_Z_ALPHA = 1.959963984540054  # two-sided 5%
_Z_BETA = 0.8416212335729143  # 80% power


@REG.add(
    "ab_test_power",
    oracle=f"""
        WITH base AS (
            SELECT count(*) AS n,
                   count(*) FILTER (WHERE event_type = 'purchase') AS conv
            FROM events
        ),
        grid AS (SELECT unnest(([{', '.join(str(x) for x in _POWER_LIFTS)}])::DOUBLE[])
                     AS lift)
        SELECT round(lift, 4) AS relative_lift,
               round(conv::DOUBLE / n, 6) AS base_rate,
               round(conv::DOUBLE / n * (1 + lift), 6) AS target_rate,
               CAST(ceil(
                   pow({_Z_ALPHA} + {_Z_BETA}, 2)
                   * ((conv::DOUBLE / n) * (1 - conv::DOUBLE / n)
                      + (conv::DOUBLE / n * (1 + lift))
                        * (1 - conv::DOUBLE / n * (1 + lift)))
                   / pow(conv::DOUBLE / n * lift, 2)) AS BIGINT)
                   AS n_per_arm
        FROM base CROSS JOIN grid
    """,
    doc="Sample-size (power) analysis for the purchase-rate experiment: "
    "for each relative MDE on the observed base rate, the users-per-arm "
    "needed at alpha=5% two-sided / 80% power (classic two-proportion "
    "normal approximation) — the planning companion to "
    "ab_test_proportions. One 2-counter aggregate crossed with a "
    "4-row literal grid; z quantiles are fixed literals so both "
    "engines evaluate the identical closed form.",
)
def ab_test_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    base = ev.agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("conv"),
    )
    grid = spark.createDataFrame(
        [(float(x),) for x in _POWER_LIFTS], "lift double"
    )
    p = F.col("conv").cast("double") / F.col("n")
    p2 = p * (1 + F.col("lift"))
    n_arm = F.ceil(
        F.pow(F.lit(_Z_ALPHA + _Z_BETA), F.lit(2.0))
        * (p * (1 - p) + p2 * (1 - p2))
        / F.pow(p * F.col("lift"), F.lit(2.0))
    ).cast("bigint")
    return base.crossJoin(F.broadcast(grid)).select(
        F.round("lift", 4).alias("relative_lift"),
        F.round(p, 6).alias("base_rate"),
        F.round(p2, 6).alias("target_rate"),
        n_arm.alias("n_per_arm"),
    )


_STEPS_HORIZON = 12
_STEPS_TARGET = "purchase"


def _round9(x: float) -> float:
    """Driver-side twin of Spark's ``round(col, 9)`` on doubles
    (HALF_UP over the shortest decimal representation): Java's
    ``BigDecimal.valueOf(double)`` quantizes ``Double.toString``'s
    shortest-roundtrip decimal, and Python's ``repr(float)`` is the
    same shortest-roundtrip string, so the two quantized grids agree.
    Python's builtin ``round()`` is half-even and would diverge at
    exact .5e-9 ties."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP)
    )


def _sql_expected_steps() -> str:
    parts = [
        """
        seq AS (
            SELECT event_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS next_type
            FROM events
        ),
        pairs AS (
            SELECT event_type AS src, next_type AS dst, count(*) AS c
            FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
        ),
        pm AS (
            SELECT src, dst,
                   c::DOUBLE / sum(c) OVER (PARTITION BY src) AS p
            FROM pairs
        ),
        types AS (
            SELECT DISTINCT src AS t FROM pairs
            UNION SELECT DISTINCT dst FROM pairs
        ),
        e0 AS (SELECT t, 0.0 AS e FROM types)
        """
    ]
    for k in range(1, _STEPS_HORIZON + 1):
        parts.append(
            f"""
        e{k} AS (
            SELECT ty.t,
                   CASE WHEN ty.t = '{_STEPS_TARGET}' THEN 0.0
                        ELSE round(1.0 + coalesce(sum(pm.p * prev.e), 0.0), 9)
                   END AS e
            FROM types ty
            LEFT JOIN pm ON pm.src = ty.t
            LEFT JOIN e{k - 1} prev ON prev.t = pm.dst
            GROUP BY ty.t
        )
        """
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
        SELECT t AS event_type,
               round(e, 4) AS expected_steps_{_STEPS_HORIZON}h
        FROM e{_STEPS_HORIZON}
        """
    )


@REG.add(
    "expected_steps_to_purchase",
    oracle=_sql_expected_steps(),
    doc=f"Finite-horizon expected steps to reach '{_STEPS_TARGET}' from "
    f"each event type, under the empirical transition chain: "
    f"{_STEPS_HORIZON} rounds of value iteration e_i <- 1 + sum_j "
    "P_ij e_j with the target absorbing at 0 — 'how far is each state "
    "from conversion', truncated at the horizon so the quantity is "
    "well-defined even for states that may never convert. Each round "
    "multiplies the O(|types|) value vector against the O(|types|^2) "
    "broadcast transition matrix with 9-dp per-round rounding (the "
    "kmeans/pagerank iteration discipline); the event table is "
    "touched once. Oracle: the rounds unrolled as chained CTEs.",
)
def expected_steps_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # r11: the 12 value-iteration rounds run driver-side over the
    # collected transition matrix — the same treatment (and boundedness
    # argument) as markov_stationary_distribution above: the iteration
    # state is an O(|types|) vector against an O(|types|^2) matrix,
    # bounded by the event-type vocabulary at any corpus scale, yet
    # each round paid an eager localCheckpoint Spark job plus two
    # broadcast joins (14 jobs per invocation with the pm/types pins).
    # The corpus-scale pass (lead window + pair aggregate) stays
    # in-engine; ONE events pass, one collect of the tiny pair table.
    # Exactness: p = c/tc is the same IEEE-double division of exact
    # integers both engines perform; the per-round HALF_UP round(_, 9)
    # is reproduced exactly via Decimal(repr(x)) quantization — Java's
    # BigDecimal.valueOf(double) and Python's repr(float) both take the
    # shortest decimal representation, so the quantized grids agree;
    # the dot-product accumulation order is pinned by the (src, dst)
    # sort; the final round(_, 4) stays in Spark, unchanged.
    allpairs = (
        ev.select(
            "event_type", F.lead("event_type").over(w).alias("next_type")
        )
        .where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("src"),
            F.col("next_type").alias("dst"),
        )
        .agg(F.count("*").alias("c"))
        .collect()
    )
    tc: dict = {}
    for r in allpairs:
        tc[r["src"]] = tc.get(r["src"], 0) + r["c"]
    p_rows = sorted((r["src"], r["dst"], r["c"] / tc[r["src"]]) for r in allpairs)
    types = sorted({s for s, _, _ in p_rows} | {d for _, d, _ in p_rows})
    e: dict = {t: 0.0 for t in types}
    for _ in range(_STEPS_HORIZON):
        acc = {t: 0.0 for t in types}
        for s, d, p in p_rows:
            acc[s] += p * e[d]
        e = {
            t: (0.0 if t == _STEPS_TARGET else _round9(1.0 + acc[t]))
            for t in types
        }
    out = spark.createDataFrame(
        [(t, e[t]) for t in types], "t string, e double"
    )
    return out.select(
        F.col("t").alias("event_type"),
        F.round("e", 4).alias(f"expected_steps_{_STEPS_HORIZON}h"),
    )


@REG.add(
    "longest_activity_streak",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
            FROM events
        ),
        grp AS (
            SELECT user_id, day,
                   CAST(day AS DATE) - CAST(row_number() OVER (
                       PARTITION BY user_id ORDER BY day) AS INT)
                       AS island
            FROM days
        ),
        streaks AS (
            SELECT user_id, count(*) AS len
            FROM grp GROUP BY user_id, island
        ),
        per_user AS (
            SELECT user_id, max(len) AS best, count(*) AS n_streaks
            FROM streaks GROUP BY user_id
        )
        SELECT CAST(best AS BIGINT) AS streak_days,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(min(n_streaks) AS BIGINT) AS min_streaks,
               CAST(max(n_streaks) AS BIGINT) AS max_streaks
        FROM per_user GROUP BY best
    """,
    doc="Longest consecutive-day activity streak per user, histogrammed "
    "— the engagement 'streak' metric, computed with the classic "
    "gaps-and-islands identity (day minus the per-user day rank is "
    "constant within a consecutive run). One distinct-days aggregate, "
    "one user-partitioned rank window, two count folds; nothing "
    "row-scaled crosses an unpartitioned boundary.",
)
def longest_activity_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.select(
        "user_id",
        "day",
        F.date_sub(
            F.col("day"), F.row_number().over(w)
        ).alias("island"),
    )
    streaks = grp.groupBy("user_id", "island").agg(
        F.count("*").alias("len")
    )
    per_user = streaks.groupBy("user_id").agg(
        F.max("len").alias("best"), F.count("*").alias("n_streaks")
    )
    return per_user.groupBy("best").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.min("n_streaks").cast("bigint").alias("min_streaks"),
        F.max("n_streaks").cast("bigint").alias("max_streaks"),
    ).select(
        F.col("best").cast("bigint").alias("streak_days"),
        "n_users",
        "min_streaks",
        "max_streaks",
    )


@REG.add(
    "session_bounce_stats",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, ts,
                   CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                             > {30 * 60 * 1_000_000}
                        OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts,
                   sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS sid
            FROM seq
        ),
        spans AS (
            SELECT user_id, sid, count(*) AS n_events
            FROM sess GROUP BY user_id, sid
        )
        SELECT CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(count(*) FILTER (WHERE n_events = 1) AS BIGINT)
                   AS n_bounces,
               round(count(*) FILTER (WHERE n_events = 1)::DOUBLE
                     / count(*), 6) AS bounce_rate,
               round(avg(n_events), 4) AS avg_events_per_session,
               CAST(max(n_events) AS BIGINT) AS max_events_in_session
        FROM spans
    """,
    doc="Session bounce metrics over the 30-min-gap sessionization "
    "(windows.py convention, same construction Kaplan-Meier uses): "
    "share of single-event sessions, average session depth, and the "
    "deepest session — the product-health trio read next to the "
    "survival curve. User-partitioned windows only; the final fold is "
    "integer counts.",
)
def session_bounce_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    prev = F.lag(us).over(w)
    seq = ev.select(
        "user_id",
        "ts",
        F.when(
            prev.isNull() | ((us - prev) > 30 * 60 * 1_000_000), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("brk"),
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = (
        seq.select("user_id", F.sum("brk").over(wc).alias("sid"))
        .groupBy("user_id", "sid")
        .agg(F.count("*").alias("n_events"))
    )
    bounce = F.count(F.when(F.col("n_events") == 1, 1))
    return spans.agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        bounce.cast("bigint").alias("n_bounces"),
        F.round(bounce.cast("double") / F.count("*"), 6).alias("bounce_rate"),
        F.round(F.avg("n_events"), 4).alias("avg_events_per_session"),
        F.max("n_events").cast("bigint").alias("max_events_in_session"),
    )
