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

from sierradb_spark.registry import Registry, load, spread

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


@REG.add(
    "event_value_cusum",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   avg(value) AS v
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ),
        params AS (
            SELECT event_type, avg(v) AS mu, stddev_pop(v) AS sigma
            FROM daily GROUP BY event_type
        ),
        z AS (
            SELECT d.event_type, d.day,
                   (d.v - p.mu) / nullif(p.sigma, 0) AS z
            FROM daily d JOIN params p USING (event_type)
        ),
        cum1 AS (
            SELECT event_type, day,
                   sum(z) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS c
            FROM z
        ),
        cum AS (
            SELECT event_type, day, c,
                   min(c) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS floor_c
            FROM cum1
        ),
        drawup AS (
            SELECT event_type, day, c - floor_c AS s FROM cum
        ),
        best AS (
            SELECT event_type, day, s,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY s DESC, day ASC
                   ) AS rn
            FROM drawup
        )
        SELECT b.event_type,
               CAST((SELECT count(*) FROM daily d
                     WHERE d.event_type = b.event_type) AS BIGINT) AS n_days,
               round(b.s, 6) AS cusum_max,
               b.day AS cusum_day
        FROM best b WHERE b.rn = 1
    """,
    doc="CUSUM upward-shift detection per event type: daily means are "
    "z-scored against the type's own (mu, sigma), and the detection "
    "statistic is the maximum drawup of the cumulative z — "
    "max_d (C_d - min_{j<=d} C_j), algebraically the k=0 one-sided "
    "CUSUM without the non-SQL recursive max(0, .) fold. A level shift "
    "mid-series produces a large cusum_max at the shift's end "
    "(cusum_day); a stable series stays near sqrt(n). Two stacked "
    "type-partitioned windows (running sum, running min) and one "
    "top-1-per-type window — three passes over |types| x |days| rows, "
    "never the event table.",
)
def event_value_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.avg("value").alias("v"))
    params = daily.groupBy("event_type").agg(
        F.avg("v").alias("mu"),
        F.stddev_pop("v").alias("sigma"),
        F.count("*").alias("n_days"),
    )
    z = daily.join(F.broadcast(params), "event_type").select(
        "event_type",
        "day",
        "n_days",
        ((F.col("v") - F.col("mu")) / F.nullif("sigma", F.lit(0))).alias("z"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = z.withColumn("c", F.sum("z").over(w)).withColumn(
        "floor_c", F.min("c").over(w)
    )
    drawup = cum.select(
        "event_type", "day", "n_days", (F.col("c") - F.col("floor_c")).alias("s")
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.col("s").desc(), F.col("day").asc()
    )
    return (
        drawup.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("n_days").cast("long").alias("n_days"),
            F.round("s", 6).alias("cusum_max"),
            F.col("day").alias("cusum_day"),
        )
    )


@REG.add(
    "value_equidepth_histogram",
    oracle="""
        WITH tiled AS (
            SELECT event_type, value,
                   ntile(8) OVER (
                       PARTITION BY event_type
                       ORDER BY value, event_id
                   ) AS bucket
            FROM events
        )
        SELECT event_type, CAST(bucket AS INT) AS bucket,
               CAST(count(*) AS BIGINT) AS n,
               round(min(value), 4) AS lo,
               round(max(value), 4) AS hi
        FROM tiled GROUP BY event_type, bucket
    """,
    doc="Equi-depth histogram (8 buckets) of value per event type — the "
    "quantile-boundary statistics an optimizer or drift monitor keeps "
    "(equal COUNT per bucket, not equal width; skew shows as narrow "
    "hot buckets). ntile over a type-partitioned window with an "
    "event_id tie-break makes boundary assignment deterministic in "
    "both engines; one exchange on the partition key, then a "
    "co-partitioned aggregate.",
)
def value_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select("event_type", "value", F.ntile(8).over(w).alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
        .select(
            "event_type",
            F.col("bucket").cast("int").alias("bucket"),
            "n",
            "lo",
            "hi",
        )
    )


_KS_BINS = 32


@REG.add(
    "ks_drift_by_event_type",
    oracle=f"""
        WITH b AS (SELECT min(value) AS mn, max(value) AS mx FROM events),
        binned AS (
            SELECT event_type,
                   coalesce(CAST(least({_KS_BINS - 1}, greatest(0,
                       floor((value - mn) / nullif(mx - mn, 0)
                             * {_KS_BINS}))) AS INT), 0) AS bin
            FROM events, b
        ),
        cnt AS (
            SELECT event_type, bin, count(*) AS c
            FROM binned GROUP BY event_type, bin
        ),
        grid AS (
            SELECT t.event_type, g.bin
            FROM (SELECT DISTINCT event_type FROM events) t
            CROSS JOIN (SELECT unnest(range({_KS_BINS})) AS bin) g
        ),
        dense AS (
            SELECT g.event_type, g.bin, coalesce(c.c, 0) AS c
            FROM grid g LEFT JOIN cnt c USING (event_type, bin)
        ),
        cum AS (
            SELECT event_type, bin,
                   sum(c) OVER (PARTITION BY event_type ORDER BY bin
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cc,
                   sum(c) OVER (PARTITION BY event_type) AS n
            FROM dense
        ),
        gcdf AS (SELECT bin, sum(cc) AS gc, sum(n) AS gn FROM cum
                 GROUP BY bin),
        scored AS (
            SELECT c.event_type, c.bin, c.n, g.gn,
                   abs(c.cc::DOUBLE / c.n - g.gc::DOUBLE / g.gn) AS d
            FROM cum c JOIN gcdf g USING (bin)
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n_values,
               CAST(bin AS INT) AS ks_bin,
               round(d, 6) AS ks_stat,
               round(1.36 * sqrt((n + gn)::DOUBLE / (n::DOUBLE * gn)), 6)
                   AS ks_crit,
               round(d, 6) > round(1.36 * sqrt((n + gn)::DOUBLE
                   / (n::DOUBLE * gn)), 6) AS drifted
        FROM scored
        QUALIFY row_number() OVER (
            PARTITION BY event_type ORDER BY d DESC, bin ASC
        ) = 1
    """,
    doc=f"Two-sample Kolmogorov-Smirnov drift statistic per event type vs "
    "the overall value mixture, over a fixed {_KS_BINS}-bin equal-width "
    "grid (bounds from ONE broadcast min/max row): D = max CDF gap, the "
    "bin where it occurs, and the 95% critical value. CDFs are integer "
    "cumulative counts under type-partitioned ordered windows — the "
    "global CDF is the SUM of the per-type cumulatives (cumulative of a "
    "sum = sum of cumulatives), so no global window exists; everything "
    "after the per-(type,bin) count is O(types x bins).",
)
def ks_drift_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    b = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    raw_bin = F.floor(
        (F.col("value") - F.col("mn"))
        / F.nullif(F.col("mx") - F.col("mn"), F.lit(0.0))
        * _KS_BINS
    )
    binned = ev.crossJoin(F.broadcast(b)).select(
        "event_type",
        F.coalesce(
            F.least(F.lit(_KS_BINS - 1), F.greatest(F.lit(0), raw_bin)).cast(
                "int"
            ),
            F.lit(0),
        ).alias("bin"),
    )
    cnt = binned.groupBy("event_type", "bin").agg(F.count("*").alias("c"))
    grid = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(
                F.sequence(F.lit(0), F.lit(_KS_BINS - 1))
            ).alias("bin"),
        )
    )
    dense = grid.join(cnt, ["event_type", "bin"], "left").select(
        "event_type", "bin", F.coalesce("c", F.lit(0)).alias("c")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("event_type")
    cum = dense.select(
        "event_type",
        "bin",
        F.sum("c").over(wc).alias("cc"),
        F.sum("c").over(wn).alias("n"),
    )
    glob = cum.groupBy("bin").agg(
        F.sum("cc").alias("gc"), F.sum("n").alias("gn")
    )
    d = F.abs(
        F.col("cc").cast("double") / F.col("n")
        - F.col("gc").cast("double") / F.col("gn")
    )
    crit = F.round(
        1.36
        * F.sqrt(
            (F.col("n") + F.col("gn")).cast("double")
            / (F.col("n").cast("double") * F.col("gn"))
        ),
        6,
    )
    scored = cum.join(glob, "bin").select(
        "event_type",
        "bin",
        "n",
        d.alias("d"),
        crit.alias("ks_crit"),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.col("d").desc(), F.col("bin").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_values"),
            F.col("bin").cast("int").alias("ks_bin"),
            F.round("d", 6).alias("ks_stat"),
            "ks_crit",
            (F.round("d", 6) > F.col("ks_crit")).alias("drifted"),
        )
    )


_BOOT_B = 64
# Poisson(1) CDF thresholds for the inverse-CDF weight draw.
_POIS_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)


@REG.add(
    "poisson_bootstrap_ci",
    oracle=f"""
        WITH rep AS (
            SELECT event_type, value, b,
                   ('0x' || substr(md5(CAST(event_id AS VARCHAR)
                        || ':' || b), 1, 8))::UBIGINT / 4294967296.0 AS u
            FROM events
            CROSS JOIN (SELECT unnest(range({_BOOT_B})) AS b)
        ),
        wtd AS (
            SELECT event_type, b, value,
                   CASE WHEN u < {_POIS_CDF[0]} THEN 0
                        WHEN u < {_POIS_CDF[1]} THEN 1
                        WHEN u < {_POIS_CDF[2]} THEN 2
                        WHEN u < {_POIS_CDF[3]} THEN 3
                        WHEN u < {_POIS_CDF[4]} THEN 4
                        WHEN u < {_POIS_CDF[5]} THEN 5
                        ELSE 6 END AS w
            FROM rep
        ),
        means AS (
            SELECT event_type, b,
                   round(sum(w * value) / nullif(sum(w), 0), 6) AS m
            FROM wtd GROUP BY event_type, b
        ),
        ranked AS (
            SELECT event_type, m,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY m ASC, b ASC) AS rn
            FROM means
        ),
        obs AS (
            SELECT event_type, count(*) AS n,
                   round(avg(value), 6) AS mean_obs
            FROM events GROUP BY event_type
        )
        SELECT o.event_type,
               CAST(o.n AS BIGINT) AS n_events,
               o.mean_obs,
               min(CASE WHEN rn = 2 THEN m END) AS ci_lo,
               min(CASE WHEN rn = {_BOOT_B - 1} THEN m END) AS ci_hi
        FROM obs o JOIN ranked r USING (event_type)
        GROUP BY o.event_type, o.n, o.mean_obs
    """,
    doc=f"Poisson-bootstrap 95% confidence interval for the mean value per "
    f"event type — THE bootstrap that works on distributed data "
    f"(Poisson(1) weights per (row, replicate) need no global resample): "
    f"{_BOOT_B} replicates, weight drawn by inverse-CDF from a portable "
    "md5-slice uniform, CI from fixed ranks 2 and 63 of the per-"
    "replicate means (~2.5/97.5%). Replicate means are rounded to 6 dp "
    "BEFORE ranking with a replicate-id tiebreak, so both engines rank "
    "the identical ladder. One scan fanned x64 map-side; the shuffle "
    "carries (type, replicate) partial sums only.",
)
def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    # spread before the x64 explode + per-row md5: that fan-out is the
    # query's whole cost and sits upstream of the first shuffle, i.e. on
    # the scan's single input split otherwise (see registry.spread)
    rep = spread(ev, "event_id").select(
        "event_type",
        "value",
        "event_id",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    )
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("event_id").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("double") / F.lit(4294967296.0)
    w = (
        F.when(u < _POIS_CDF[0], 0)
        .when(u < _POIS_CDF[1], 1)
        .when(u < _POIS_CDF[2], 2)
        .when(u < _POIS_CDF[3], 3)
        .when(u < _POIS_CDF[4], 4)
        .when(u < _POIS_CDF[5], 5)
        .otherwise(6)
    )
    means = (
        rep.select("event_type", "b", "value", w.alias("w"))
        .groupBy("event_type", "b")
        .agg(
            F.round(
                F.sum(F.col("w") * F.col("value"))
                / F.nullif(F.sum("w"), F.lit(0)),
                6,
            ).alias("m")
        )
    )
    rk = Window.partitionBy("event_type").orderBy(
        F.col("m").asc(), F.col("b").asc()
    )
    ranked = means.withColumn("rn", F.row_number().over(rk))
    obs = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.round(F.avg("value"), 6).alias("mean_obs"),
    )
    return (
        obs.join(ranked, "event_type")
        .groupBy("event_type", "n_events", "mean_obs")
        .agg(
            F.min(F.when(F.col("rn") == 2, F.col("m"))).alias("ci_lo"),
            F.min(
                F.when(F.col("rn") == _BOOT_B - 1, F.col("m"))
            ).alias("ci_hi"),
        )
    )


_OOF_FOLDS = 5


@REG.add(
    "target_encoding_oof",
    oracle=f"""
        WITH tagged AS (
            SELECT event_type, value,
                   ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                       ::UBIGINT % {_OOF_FOLDS} AS fold
            FROM events
        ),
        per AS (
            SELECT event_type, fold, count(*) AS n_f, sum(value) AS s_f
            FROM tagged GROUP BY event_type, fold
        ),
        tot AS (
            SELECT event_type, sum(n_f) AS n, sum(s_f) AS s
            FROM per GROUP BY event_type
        )
        SELECT p.event_type,
               CAST(p.fold AS INT) AS fold,
               CAST(p.n_f AS BIGINT) AS n_rows,
               round((t.s - p.s_f) / (t.n - p.n_f), 6) AS encoding,
               round(t.s / t.n, 6) AS global_mean
        FROM per p JOIN tot t USING (event_type)
    """,
    doc=f"Leakage-safe out-of-fold target encoding of event_type against "
    f"value ({_OOF_FOLDS} md5-hash folds): each fold's encoding is the "
    "mean over the OTHER folds — (S - s_f)/(N - n_f) from one partial-"
    "aggregated pass, the feature-engineering primitive that prevents "
    "target leakage in production ML pipelines. One scan, one "
    "(type, fold) aggregate, one |types|-row equi-join; fold assignment "
    "is the repo's portable md5-slice hash so both engines build "
    "identical folds.",
)
def target_encoding_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    fold = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _OOF_FOLDS
    )
    per = (
        ev.select("event_type", "value", fold.alias("fold"))
        .groupBy("event_type", "fold")
        .agg(F.count("*").alias("n_f"), F.sum("value").alias("s_f"))
    )
    tot = per.groupBy("event_type").agg(
        F.sum("n_f").alias("n"), F.sum("s_f").alias("s")
    )
    return per.join(tot, "event_type").select(
        "event_type",
        F.col("fold").cast("int").alias("fold"),
        F.col("n_f").cast("bigint").alias("n_rows"),
        F.round(
            (F.col("s") - F.col("s_f")) / (F.col("n") - F.col("n_f")), 6
        ).alias("encoding"),
        F.round(F.col("s") / F.col("n"), 6).alias("global_mean"),
    )


@REG.add(
    "median_ci_order_stat",
    oracle="""
        WITH ranked AS (
            SELECT event_type, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM events
        ),
        marks AS (
            SELECT event_type, n,
                   greatest(1, CAST(floor((n - 1.96 * sqrt(n)) / 2)
                                    AS BIGINT)) AS k_lo,
                   least(n, CAST(ceil(1 + (n + 1.96 * sqrt(n)) / 2)
                                 AS BIGINT)) AS k_hi,
                   CAST(floor((n + 1) / 2) AS BIGINT) AS k_med
            FROM (SELECT DISTINCT event_type, n FROM ranked)
        )
        SELECT r.event_type,
               CAST(min(r.n) AS BIGINT) AS n_values,
               round(min(CASE WHEN rn = k_med THEN value END), 6) AS median,
               round(min(CASE WHEN rn = k_lo THEN value END), 6) AS ci_lo,
               round(min(CASE WHEN rn = k_hi THEN value END), 6) AS ci_hi
        FROM ranked r JOIN marks m USING (event_type)
        GROUP BY r.event_type
    """,
    doc="Exact nonparametric 95% CI for the per-type median via binomial "
    "order statistics (ranks n/2 +- 1.96*sqrt(n)/2 — the distribution-"
    "free interval that needs no resampling and no normality): one "
    "type-partitioned rank window with a deterministic event_id "
    "tiebreak, then three order statistics read off by rank. The CI "
    "values are actual data points, so no float accumulation exists "
    "anywhere.",
)
def median_ci_order_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    n = F.col("n")
    k_lo = F.greatest(
        F.lit(1), F.floor((n - 1.96 * F.sqrt(n)) / 2).cast("bigint")
    )
    k_hi = F.least(
        n.cast("bigint"),
        F.ceil(1 + (n + 1.96 * F.sqrt(n)) / 2).cast("bigint"),
    )
    k_med = F.floor((n + 1) / 2).cast("bigint")
    marked = ranked.select(
        "event_type",
        "value",
        "rn",
        "n",
        k_lo.alias("k_lo"),
        k_hi.alias("k_hi"),
        k_med.alias("k_med"),
    )
    return marked.groupBy("event_type").agg(
        F.min("n").cast("bigint").alias("n_values"),
        F.round(
            F.min(F.when(F.col("rn") == F.col("k_med"), F.col("value"))), 6
        ).alias("median"),
        F.round(
            F.min(F.when(F.col("rn") == F.col("k_lo"), F.col("value"))), 6
        ).alias("ci_lo"),
        F.round(
            F.min(F.when(F.col("rn") == F.col("k_hi"), F.col("value"))), 6
        ).alias("ci_hi"),
    )


_TRIM_PCT = 0.05


@REG.add(
    "trimmed_winsorized_stats",
    oracle=f"""
        WITH ranked AS (
            SELECT event_type, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM events
        ),
        marked AS (
            SELECT event_type, value, rn, n,
                   CAST(ceil({_TRIM_PCT} * n) AS BIGINT) AS k
            FROM ranked
        )
        SELECT event_type,
               CAST(min(n) AS BIGINT) AS n_values,
               round(avg(value), 6) AS mean_raw,
               round(avg(CASE WHEN rn > k AND rn <= n - k
                              THEN value END), 6) AS mean_trimmed,
               round((sum(CASE WHEN rn > k AND rn <= n - k
                               THEN value ELSE 0 END)
                      + min(k) * min(CASE WHEN rn = k + 1 THEN value END)
                      + min(k) * min(CASE WHEN rn = n - k THEN value END))
                     / min(n), 6) AS mean_winsorized
        FROM marked
        GROUP BY event_type
    """,
    doc=f"Robust location statistics per event type: the "
    f"{int(_TRIM_PCT * 100)}%-trimmed mean (drop k=ceil(pn) rows each "
    "tail) and the winsorized mean (clamp each tail to the boundary "
    "order statistic) next to the raw mean — how much outliers move "
    "the metric, read from one type-partitioned rank window and one "
    "grouped conditional aggregate. Tail boundaries are actual data "
    "points selected by integer rank, so both engines clamp to "
    "identical values.",
)
def trimmed_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    ).withColumn("k", F.ceil(_TRIM_PCT * F.col("n")).cast("bigint"))
    kept = (F.col("rn") > F.col("k")) & (F.col("rn") <= F.col("n") - F.col("k"))
    return ranked.groupBy("event_type").agg(
        F.min("n").cast("bigint").alias("n_values"),
        F.round(F.avg("value"), 6).alias("mean_raw"),
        F.round(F.avg(F.when(kept, F.col("value"))), 6).alias("mean_trimmed"),
        F.round(
            (
                F.sum(F.when(kept, F.col("value")).otherwise(F.lit(0.0)))
                + F.min("k")
                * F.min(
                    F.when(F.col("rn") == F.col("k") + 1, F.col("value"))
                )
                + F.min("k")
                * F.min(
                    F.when(F.col("rn") == F.col("n") - F.col("k"), F.col("value"))
                )
            )
            / F.min("n"),
            6,
        ).alias("mean_winsorized"),
    )


@REG.add(
    "value_concentration_gini",
    oracle="""
        WITH uv AS (
            SELECT event_type, user_id, sum(value) AS uval
            FROM events GROUP BY event_type, user_id
        ),
        ranked AS (
            SELECT event_type, uval,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY uval, user_id) AS i,
                   count(*) OVER (PARTITION BY event_type) AS n,
                   sum(uval) OVER (PARTITION BY event_type) AS s
            FROM uv
        )
        SELECT event_type,
               CAST(min(n) AS BIGINT) AS n_users,
               round((2 * sum(i * uval) - (min(n) + 1) * min(s))
                     / (min(n) * min(s)), 6) AS gini,
               round(sum((uval / s) * (uval / s)), 6) AS hhi,
               round(max(uval) / min(s), 6) AS top1_share
        FROM ranked GROUP BY event_type
    """,
    doc="Concentration of per-user value within each event type: the Gini "
    "coefficient (rank formula over the user-partitioned ascending "
    "order), the Herfindahl-Hirschman index of user shares, and the top "
    "user's share — the 'is engagement dominated by whales' diagnostics. "
    "One per-user aggregate, one type-partitioned rank window, one "
    "grouped fold; all values non-negative in this corpus (rank-formula "
    "precondition).",
)
def value_concentration_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    uv = ev.groupBy("event_type", "user_id").agg(
        F.sum("value").alias("uval")
    )
    w = Window.partitionBy("event_type").orderBy("uval", "user_id")
    wn = Window.partitionBy("event_type")
    ranked = uv.select(
        "event_type",
        "uval",
        F.row_number().over(w).alias("i"),
        F.count("*").over(wn).alias("n"),
        F.sum("uval").over(wn).alias("s"),
    )
    return ranked.groupBy("event_type").agg(
        F.min("n").cast("bigint").alias("n_users"),
        F.round(
            (
                2 * F.sum(F.col("i") * F.col("uval"))
                - (F.min("n") + 1) * F.min("s")
            )
            / (F.min("n") * F.min("s")),
            6,
        ).alias("gini"),
        F.round(
            F.sum((F.col("uval") / F.col("s")) * (F.col("uval") / F.col("s"))),
            6,
        ).alias("hhi"),
        F.round(F.max("uval") / F.min("s"), 6).alias("top1_share"),
    )


_MAD_K = 3.5 * 1.4826  # robust-z cutoff x MAD-to-sigma consistency factor


@REG.add(
    "mad_robust_outliers",
    oracle=f"""
        WITH ranked AS (
            SELECT event_type, event_id, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM events
        ),
        med AS (
            SELECT event_type,
                   min(CASE WHEN rn = CAST(floor((n + 1) / 2) AS BIGINT)
                            THEN value END) AS med,
                   min(n) AS n
            FROM ranked GROUP BY event_type
        ),
        dev AS (
            SELECT e.event_type, e.event_id, m.med, m.n,
                   abs(e.value - m.med) AS dv
            FROM events e JOIN med m USING (event_type)
        ),
        r2a AS (
            SELECT event_type, med, n, dv,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY dv, event_id) AS rn2
            FROM dev
        ),
        r2 AS (
            SELECT event_type, med, n, dv,
                   min(CASE WHEN rn2 = CAST(floor((n + 1) / 2) AS BIGINT)
                            THEN dv END) OVER
                       (PARTITION BY event_type) AS mad
            FROM r2a
        )
        SELECT event_type,
               CAST(min(n) AS BIGINT) AS n_values,
               round(min(med), 6) AS median,
               round(min(mad), 6) AS mad,
               CAST(count(CASE WHEN dv > {_MAD_K} * mad THEN 1 END)
                    AS BIGINT) AS n_outliers,
               round(count(CASE WHEN dv > {_MAD_K} * mad THEN 1 END)::DOUBLE
                     / min(n), 6) AS outlier_share
        FROM r2 GROUP BY event_type
    """,
    doc="Robust outlier detection per event type via the median absolute "
    "deviation: robust z = |x - median| / (1.4826 * MAD), flagged beyond "
    "3.5 — the detector that does not let the outliers it hunts inflate "
    "its own scale (unlike mean/stddev z-scores). Median and MAD are "
    "exact order statistics selected by integer rank under type-"
    "partitioned windows with id tiebreaks; the threshold comparison "
    "runs on identical doubles in both engines, so counts are exact.",
)
def mad_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    med = ranked.groupBy("event_type").agg(
        F.min(
            F.when(
                F.col("rn") == F.floor((F.col("n") + 1) / 2).cast("bigint"),
                F.col("value"),
            )
        ).alias("med"),
        F.min("n").alias("n"),
    )
    dev = ev.join(med, "event_type").select(
        "event_type",
        "event_id",
        "med",
        "n",
        F.abs(F.col("value") - F.col("med")).alias("dv"),
    )
    w2 = Window.partitionBy("event_type").orderBy("dv", "event_id")
    r2 = dev.select(
        "event_type",
        "med",
        "n",
        "dv",
        F.min(
            F.when(
                F.row_number().over(w2)
                == F.floor((F.col("n") + 1) / 2).cast("bigint"),
                F.col("dv"),
            )
        )
        .over(wn)
        .alias("mad"),
    )
    hit = F.col("dv") > _MAD_K * F.col("mad")
    return r2.groupBy("event_type").agg(
        F.min("n").cast("bigint").alias("n_values"),
        F.round(F.min("med"), 6).alias("median"),
        F.round(F.min("mad"), 6).alias("mad"),
        F.count(F.when(hit, 1)).cast("bigint").alias("n_outliers"),
        F.round(
            F.count(F.when(hit, 1)).cast("double") / F.min("n"), 6
        ).alias("outlier_share"),
    )


_PSI_BINS = 16


@REG.add(
    "psi_value_drift",
    oracle=f"""
        WITH b AS (
            SELECT min(value) AS mn, max(value) AS mx,
                   min(ts) AS t0, max(ts) AS t1
            FROM events
        ),
        tagged AS (
            SELECT event_type,
                   coalesce(CAST(least({_PSI_BINS - 1}, greatest(0,
                       floor((value - mn) / nullif(mx - mn, 0)
                             * {_PSI_BINS}))) AS INT), 0) AS bin,
                   CAST(epoch_us(ts) - epoch_us(t0)
                        > (epoch_us(t1) - epoch_us(t0)) / 2 AS INT)
                       AS half
            FROM events, b
        ),
        cnt AS (
            SELECT event_type, bin, half, count(*) AS c
            FROM tagged GROUP BY event_type, bin, half
        ),
        grid AS (
            SELECT t.event_type, g.bin, h.half
            FROM (SELECT DISTINCT event_type FROM events) t
            CROSS JOIN (SELECT unnest(range({_PSI_BINS})) AS bin) g
            CROSS JOIN (SELECT unnest([0, 1]) AS half) h
        ),
        dense AS (
            SELECT g.event_type, g.bin, g.half, coalesce(c.c, 0) AS c
            FROM grid g LEFT JOIN cnt c USING (event_type, bin, half)
        ),
        tot AS (
            SELECT event_type, half, sum(c) AS n
            FROM dense GROUP BY event_type, half
        ),
        shares AS (
            SELECT d.event_type, d.bin, d.half,
                   (d.c + 1.0) / (t.n + {_PSI_BINS}) AS p
            FROM dense d JOIN tot t USING (event_type, half)
        ),
        wide AS (
            SELECT r.event_type, r.bin, r.p AS p_ref, c.p AS p_cur
            FROM shares r JOIN shares c
              ON r.event_type = c.event_type AND r.bin = c.bin
             AND r.half = 0 AND c.half = 1
        )
        SELECT w.event_type,
               CAST(min(t0.n) AS BIGINT) AS n_ref,
               CAST(min(t1.n) AS BIGINT) AS n_cur,
               round(sum((p_cur - p_ref) * ln(p_cur / p_ref)), 6) AS psi,
               round(sum((p_cur - p_ref) * ln(p_cur / p_ref)), 6) > 0.2
                   AS drifted
        FROM wide w
        JOIN tot t0 ON t0.event_type = w.event_type AND t0.half = 0
        JOIN tot t1 ON t1.event_type = w.event_type AND t1.half = 1
        GROUP BY w.event_type
    """,
    doc=f"Population stability index of per-type value distributions, "
    f"first time-half vs second time-half ({_PSI_BINS} equal-width bins "
    "from ONE broadcast bounds row, Laplace-smoothed shares so no bin "
    "is zero): PSI = sum((cur-ref)*ln(cur/ref)), flagged at the "
    "standard 0.2 threshold — the ML-monitoring drift metric next to "
    "the KS statistic's CDF view. Counts are exact integers; shares "
    "and logs are identical doubles in both engines; everything after "
    "the (type,bin,half) count is O(types x bins).",
)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    b = ev.agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.min("ts").alias("t0"),
        F.max("ts").alias("t1"),
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp_ltz"))  # noqa: E731
    raw_bin = F.floor(
        (F.col("value") - F.col("mn"))
        / F.nullif(F.col("mx") - F.col("mn"), F.lit(0.0))
        * _PSI_BINS
    )
    tagged = ev.crossJoin(F.broadcast(b)).select(
        "event_type",
        F.coalesce(
            F.least(F.lit(_PSI_BINS - 1), F.greatest(F.lit(0), raw_bin)).cast(
                "int"
            ),
            F.lit(0),
        ).alias("bin"),
        (
            (us("ts") - us("t0")) > (us("t1") - us("t0")) / 2
        )
        .cast("int")
        .alias("half"),
    )
    cnt = tagged.groupBy("event_type", "bin", "half").agg(
        F.count("*").alias("c")
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(_PSI_BINS - 1))).alias("bin"),
        )
        .select(
            "event_type", "bin", F.explode(F.array(F.lit(0), F.lit(1))).alias("half")
        )
    )
    dense = (
        grid.join(cnt, ["event_type", "bin", "half"], "left")
        .select(
            "event_type", "bin", "half", F.coalesce("c", F.lit(0)).alias("c")
        )
        # O(types x bins x 2) rows; pin so the six downstream branches
        # read the tiny table instead of replaying the events scan.
        .localCheckpoint(eager=True)
    )
    tot = dense.groupBy("event_type", "half").agg(F.sum("c").alias("n"))
    shares = dense.join(tot, ["event_type", "half"]).select(
        "event_type",
        "bin",
        "half",
        ((F.col("c") + 1.0) / (F.col("n") + _PSI_BINS)).alias("p"),
    )
    ref = shares.where(F.col("half") == 0).select(
        "event_type", "bin", F.col("p").alias("p_ref")
    )
    cur = shares.where(F.col("half") == 1).select(
        "event_type", "bin", F.col("p").alias("p_cur")
    )
    t0 = tot.where(F.col("half") == 0).select(
        "event_type", F.col("n").alias("n_ref")
    )
    t1 = tot.where(F.col("half") == 1).select(
        "event_type", F.col("n").alias("n_cur")
    )
    term = (F.col("p_cur") - F.col("p_ref")) * F.log(
        F.col("p_cur") / F.col("p_ref")
    )
    psi = F.round(F.sum(term), 6)
    return (
        ref.join(cur, ["event_type", "bin"])
        .join(t0, "event_type")
        .join(t1, "event_type")
        .groupBy("event_type")
        .agg(
            F.min("n_ref").cast("bigint").alias("n_ref"),
            F.min("n_cur").cast("bigint").alias("n_cur"),
            psi.alias("psi"),
            (psi > 0.2).alias("drifted"),
        )
    )


@REG.add(
    "theil_sen_trend",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   round(avg(value), 6) AS y
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ),
        idx AS (
            SELECT event_type, y,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY day) AS i
            FROM daily
        ),
        slopes AS (
            SELECT a.event_type,
                   (b.y - a.y) / (b.i - a.i) AS m,
                   row_number() OVER (
                       PARTITION BY a.event_type
                       ORDER BY (b.y - a.y) / (b.i - a.i), a.i, b.i) AS rn,
                   count(*) OVER (PARTITION BY a.event_type) AS np
            FROM idx a JOIN idx b
              ON a.event_type = b.event_type AND a.i < b.i
        ),
        ols AS (
            SELECT event_type, regr_slope(y, i) AS ols_m
            FROM idx GROUP BY event_type
        )
        SELECT s.event_type,
               CAST(min(np) AS BIGINT) AS n_pairs,
               round(min(CASE WHEN rn = CAST(floor((np + 1) / 2) AS BIGINT)
                              THEN m END), 6) AS theil_sen_slope,
               round(min(o.ols_m), 6) AS ols_slope
        FROM slopes s JOIN ols o USING (event_type)
        GROUP BY s.event_type
    """,
    doc="Theil-Sen robust trend per event type: the MEDIAN of all "
    "pairwise day-slopes of the daily mean series, next to the OLS "
    "slope it robustifies (up to ~29% outlier days cannot move it). "
    "The pair join is per-type over the DAILY aggregate — O(days^2) "
    "pairs per type, bounded by corpus age, never by event count; the "
    "median is an exact order statistic by integer rank with an (i,j) "
    "tiebreak.",
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.round(F.avg("value"), 6).alias("y")
    )
    idx = daily.select(
        "event_type",
        "y",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .alias("i"),
    )
    a, b = idx.alias("a"), idx.alias("b")
    m = (F.col("b.y") - F.col("a.y")) / (F.col("b.i") - F.col("a.i"))
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.i") < F.col("b.i")),
    ).select(F.col("a.event_type").alias("event_type"), m.alias("m"),
             F.col("a.i").alias("i"), F.col("b.i").alias("j"))
    w = Window.partitionBy("event_type").orderBy("m", "i", "j")
    wn = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "m",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("np"),
    )
    ols = idx.groupBy("event_type").agg(
        F.regr_slope(F.col("y"), F.col("i").cast("double")).alias("ols_m")
    )
    return (
        ranked.join(ols, "event_type")
        .groupBy("event_type")
        .agg(
            F.min("np").cast("bigint").alias("n_pairs"),
            F.round(
                F.min(
                    F.when(
                        F.col("rn")
                        == F.floor((F.col("np") + 1) / 2).cast("bigint"),
                        F.col("m"),
                    )
                ),
                6,
            ).alias("theil_sen_slope"),
            F.round(F.min("ols_m"), 6).alias("ols_slope"),
        )
    )


@REG.add(
    "empirical_bayes_user_means",
    oracle="""
        WITH per_u AS (
            SELECT event_type, user_id, count(*) AS n_u,
                   sum(value) AS s_u, sum(value * value) AS ss_u
            FROM events GROUP BY event_type, user_id
        ),
        per_t AS (
            SELECT event_type,
                   count(*) AS u,
                   sum(n_u) AS n,
                   sum(s_u) AS s,
                   sum(ss_u - s_u * s_u / n_u) AS sse_within,
                   sum(n_u * n_u) AS sum_n2
            FROM per_u GROUP BY event_type
        ),
        moments AS (
            SELECT event_type, u, n, s / n AS mu,
                   sse_within / (n - u) AS s2w,
                   greatest(0.0,
                       ((SELECT sum(n_u * (s_u / n_u - t.s / t.n)
                                    * (s_u / n_u - t.s / t.n))
                         FROM per_u p WHERE p.event_type = t.event_type)
                        - (u - 1) * (sse_within / (n - u)))
                       / (n - sum_n2::DOUBLE / n)) AS tau2
            FROM per_t t
        )
        SELECT m.event_type,
               CAST(min(u) AS BIGINT) AS n_users,
               round(min(mu), 6) AS grand_mean,
               round(min(s2w), 6) AS s2_within,
               round(min(tau2), 6) AS tau2,
               round(avg(CASE WHEN min_tau2 = 0 THEN 0.0
                              ELSE min_tau2
                                   / (min_tau2 + min_s2w / p.n_u) END), 6)
                   AS mean_shrink_weight
        FROM (SELECT event_type, u, mu, s2w, tau2,
                     min(tau2) OVER (PARTITION BY event_type) AS min_tau2,
                     min(s2w) OVER (PARTITION BY event_type) AS min_s2w
              FROM moments) m
        JOIN per_u p USING (event_type)
        GROUP BY m.event_type
    """,
    doc="Empirical-Bayes (James-Stein style) shrinkage diagnostics for "
    "per-user mean value within each event type: one-way random-effects "
    "method of moments — within-user variance s2w, between-user "
    "variance tau2 (clamped at 0), and the average shrinkage weight "
    "tau2/(tau2 + s2w/n_u) that a production metrics pipeline applies "
    "before ranking small-sample users. Two aggregates (per-user, "
    "per-type moment fold) and one |users|-row equi-join; all variance "
    "pieces come from sums/sums-of-squares so both engines compute the "
    "identical doubles before the 6-dp rounding.",
)
def empirical_bayes_user_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_u = ev.groupBy("event_type", "user_id").agg(
        F.count("*").alias("n_u"),
        F.sum("value").alias("s_u"),
        F.sum(F.col("value") * F.col("value")).alias("ss_u"),
    )
    per_t = per_u.groupBy("event_type").agg(
        F.count("*").alias("u"),
        F.sum("n_u").alias("n"),
        F.sum("s_u").alias("s"),
        F.sum(
            F.col("ss_u") - F.col("s_u") * F.col("s_u") / F.col("n_u")
        ).alias("sse_within"),
        F.sum(F.col("n_u") * F.col("n_u")).alias("sum_n2"),
    )
    mu = F.col("s") / F.col("n")
    mean_u = F.col("s_u") / F.col("n_u")
    between = per_u.join(per_t, "event_type").groupBy("event_type").agg(
        F.sum(F.col("n_u") * (mean_u - mu) * (mean_u - mu)).alias("ssb")
    )
    stats = per_t.join(between, "event_type").select(
        "event_type",
        "u",
        "n",
        mu.alias("mu"),
        (F.col("sse_within") / (F.col("n") - F.col("u"))).alias("s2w"),
        F.greatest(
            F.lit(0.0),
            (
                F.col("ssb")
                - (F.col("u") - 1)
                * (F.col("sse_within") / (F.col("n") - F.col("u")))
            )
            / (
                F.col("n")
                - F.col("sum_n2").cast("double") / F.col("n")
            ),
        ).alias("tau2"),
    )
    wgt = F.when(F.col("tau2") == 0, F.lit(0.0)).otherwise(
        F.col("tau2") / (F.col("tau2") + F.col("s2w") / F.col("n_u"))
    )
    return (
        per_u.join(stats, "event_type")
        .groupBy("event_type")
        .agg(
            F.min("u").cast("bigint").alias("n_users"),
            F.round(F.min("mu"), 6).alias("grand_mean"),
            F.round(F.min("s2w"), 6).alias("s2_within"),
            F.round(F.min("tau2"), 6).alias("tau2"),
            F.round(F.avg(wgt), 6).alias("mean_shrink_weight"),
        )
    )


@REG.add(
    "overdispersion_index",
    oracle="""
        WITH duc AS (
            SELECT event_type, user_id, CAST(ts AS DATE) AS day,
                   count(*) AS c
            FROM events GROUP BY event_type, user_id, CAST(ts AS DATE)
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_cells,
               round(avg(c), 6) AS mean_count,
               round(var_samp(c), 6) AS var_count,
               round(var_samp(c) / avg(c), 6) AS dispersion_index,
               var_samp(c) / avg(c) > 1.5 AS overdispersed
        FROM duc GROUP BY event_type
    """,
    doc="Overdispersion diagnostic for per-(user, day) event counts: the "
    "variance-to-mean ratio per type (1 = Poisson; >1 = bursty/clumped "
    "traffic, the signal that a negative-binomial model — and wider "
    "alerting bands — fit better than Poisson assumptions). One count "
    "aggregate + one moment fold; var_samp/avg agree across engines "
    "because counts are exact integers folded into a single moment "
    "tuple.",
)
def overdispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    duc = ev.groupBy(
        "event_type", "user_id", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("c"))
    c = F.col("c").cast("double")
    return duc.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_cells"),
        F.round(F.avg(c), 6).alias("mean_count"),
        F.round(F.var_samp(c), 6).alias("var_count"),
        F.round(F.var_samp(c) / F.avg(c), 6).alias("dispersion_index"),
        (F.var_samp(c) / F.avg(c) > 1.5).alias("overdispersed"),
    )


# F critical value for (6, inf) df at alpha = 0.05 (fixed literal, like
# the z quantiles in ab_test_power).
_F_CRIT_6 = 2.0986


@REG.add(
    "dow_anova_ftest",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   dayofweek(CAST(ts AS DATE)) AS dow,
                   round(sum(value), 6) AS y
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ),
        g AS (
            SELECT event_type, dow, count(*) AS n_g, avg(y) AS m_g,
                   sum(y * y) AS ss_g, sum(y) AS s_g
            FROM daily GROUP BY event_type, dow
        ),
        t AS (
            SELECT event_type,
                   count(*) AS k,
                   sum(n_g) AS n,
                   sum(s_g) AS s,
                   sum(ss_g) AS ss,
                   sum(s_g * s_g / n_g) AS ss_groups
            FROM g GROUP BY event_type
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n_days,
               CAST(k AS BIGINT) AS n_groups,
               round((ss_groups - s * s / n) / (k - 1), 4) AS ms_between,
               round((ss - ss_groups) / (n - k), 4) AS ms_within,
               round(((ss_groups - s * s / n) / (k - 1))
                     / ((ss - ss_groups) / (n - k)), 4) AS f_stat,
               round(((ss_groups - s * s / n) / (k - 1))
                     / ((ss - ss_groups) / (n - k)), 4) > {_F_CRIT_6}
                   AS seasonal
        FROM t
    """,
    doc="One-way ANOVA F-test for day-of-week seasonality of the daily "
    "value series per event type: between-group vs within-group mean "
    "squares over the 7 weekday groups, flagged against the fixed "
    "F(6, inf) 5% critical value — 'does this metric need a weekly "
    "seasonal model' answered before fitting one (the decision gate in "
    "front of holt_winters_forecast). All sums fold from the same "
    "rounded daily aggregate the forecasting family uses; the sums-of-"
    "squares identity (SSB = sum(s_g^2/n_g) - S^2/N) keeps it one "
    "grouped pass.",
)
def dow_anova_ftest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("y"))
    daily = daily.withColumn("dow", F.dayofweek("day"))
    g = daily.groupBy("event_type", "dow").agg(
        F.count("*").alias("n_g"),
        F.sum(F.col("y") * F.col("y")).alias("ss_g"),
        F.sum("y").alias("s_g"),
    )
    t = g.groupBy("event_type").agg(
        F.count("*").alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("ss_g").alias("ss"),
        F.sum(F.col("s_g") * F.col("s_g") / F.col("n_g")).alias("ss_groups"),
    )
    msb = (F.col("ss_groups") - F.col("s") * F.col("s") / F.col("n")) / (
        F.col("k") - 1
    )
    msw = (F.col("ss") - F.col("ss_groups")) / (F.col("n") - F.col("k"))
    return t.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.col("k").cast("bigint").alias("n_groups"),
        F.round(msb, 4).alias("ms_between"),
        F.round(msw, 4).alias("ms_within"),
        F.round(msb / msw, 4).alias("f_stat"),
        (F.round(msb / msw, 4) > _F_CRIT_6).alias("seasonal"),
    )


@REG.add(
    "mann_whitney_u_test",
    oracle="""
        WITH tagged AS (
            SELECT event_type, value,
                   ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                       ::UBIGINT % 2 AS grp,
                   event_id
            FROM events
        ),
        ranked AS (
            SELECT event_type, grp,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rk
            FROM tagged
        ),
        agg AS (
            SELECT event_type,
                   count(*) FILTER (WHERE grp = 0) AS n_a,
                   count(*) FILTER (WHERE grp = 1) AS n_b,
                   sum(rk) FILTER (WHERE grp = 0) AS r_a
            FROM ranked GROUP BY event_type
        )
        SELECT event_type,
               CAST(n_a AS BIGINT) AS n_a,
               CAST(n_b AS BIGINT) AS n_b,
               CAST(r_a - n_a * (n_a + 1) / 2 AS BIGINT) AS u_stat,
               round(((r_a - n_a * (n_a + 1) / 2)
                      - n_a::DOUBLE * n_b / 2)
                     / sqrt(n_a::DOUBLE * n_b * (n_a + n_b + 1) / 12), 4)
                   AS z_stat,
               abs(round(((r_a - n_a * (n_a + 1) / 2)
                      - n_a::DOUBLE * n_b / 2)
                     / sqrt(n_a::DOUBLE * n_b * (n_a + n_b + 1) / 12), 4))
                   > 1.96 AS significant
        FROM agg
    """,
    doc="Mann-Whitney U test per event type between deterministic "
    "md5-hash-split halves — the nonparametric two-sample test that "
    "needs no normality (ranks instead of values; the robust sibling "
    "of ab_test_proportions' z on proportions). Ranks are exact "
    "integers from ONE type-partitioned window with an id tiebreak "
    "(values are continuous doubles — tie correction omitted and "
    "documented); U, z, and the 5% flag are closed-form over integer "
    "rank sums, so both engines agree exactly.",
)
def mann_whitney_u_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    grp = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 2
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.select(
        "event_type",
        grp.alias("grp"),
        F.row_number().over(w).cast("long").alias("rk"),
    )
    agg = ranked.groupBy("event_type").agg(
        F.count(F.when(F.col("grp") == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("grp") == 1, 1)).alias("n_b"),
        F.sum(F.when(F.col("grp") == 0, F.col("rk"))).alias("r_a"),
    )
    na, nb, ra = (
        F.col("n_a"),
        F.col("n_b"),
        F.col("r_a"),
    )
    u = ra - na * (na + 1) / 2
    z = F.round(
        (u - na.cast("double") * nb / 2)
        / F.sqrt(na.cast("double") * nb * (na + nb + 1) / 12),
        4,
    )
    return agg.select(
        "event_type",
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        u.cast("bigint").alias("u_stat"),
        z.alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant"),
    )


@REG.add(
    "spearman_rank_correlation",
    oracle="""
        WITH base AS (
            SELECT event_type, event_id, value,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
            WHERE json_extract_string(props, '$.k') IS NOT NULL
        ),
        ranked AS (
            SELECT event_type,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rv,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY k, event_id) AS rkk
            FROM base
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(corr(rv, rkk), 6) AS spearman_rho,
               round(corr(rv, rkk)
                     * sqrt((count(*) - 2)
                            / (1 - corr(rv, rkk) * corr(rv, rkk))), 4)
                   AS t_stat
        FROM ranked GROUP BY event_type
    """,
    doc="Spearman rank correlation between value and the JSON payload's "
    "k property, per event type — monotone association without assuming "
    "linearity (the robust sibling of lineitem_price_stats' Pearson "
    "family), with the t statistic. Both variables reduce to exact "
    "integer ranks (two type-partitioned windows, id tiebreaks — the "
    "standard big-data Spearman where tie correction is negligible for "
    "continuous values), so corr() folds identical integers in both "
    "engines.",
)
def spearman_rank_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        "event_id",
        "value",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    ).where(F.col("k").isNotNull())
    wv = Window.partitionBy("event_type").orderBy("value", "event_id")
    wk = Window.partitionBy("event_type").orderBy("k", "event_id")
    ranked = base.select(
        "event_type",
        F.row_number().over(wv).cast("double").alias("rv"),
        F.row_number().over(wk).cast("double").alias("rkk"),
    )
    rho = F.corr("rv", "rkk")
    return ranked.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(rho, 6).alias("spearman_rho"),
        F.round(
            rho * F.sqrt((F.count("*") - 2) / (1 - rho * rho)), 4
        ).alias("t_stat"),
    )


@REG.add(
    "cramers_v_association",
    oracle="""
        WITH cell AS (
            SELECT lang, source, count(*) AS o
            FROM documents GROUP BY lang, source
        ),
        rowt AS (SELECT lang, sum(o) AS rn FROM cell GROUP BY lang),
        colt AS (SELECT source, sum(o) AS cn FROM cell GROUP BY source),
        tot AS (
            SELECT sum(o) AS n,
                   (SELECT count(*) FROM rowt) AS r,
                   (SELECT count(*) FROM colt) AS c
            FROM cell
        ),
        chi AS (
            SELECT sum(pow(cell.o - rowt.rn::DOUBLE * colt.cn / tot.n, 2)
                       / (rowt.rn::DOUBLE * colt.cn / tot.n)) AS chi2
            FROM cell
            JOIN rowt USING (lang)
            JOIN colt USING (source)
            CROSS JOIN tot
        )
        SELECT CAST(tot.n AS BIGINT) AS n_docs,
               CAST(tot.r AS BIGINT) AS n_langs,
               CAST(tot.c AS BIGINT) AS n_sources,
               round(chi.chi2, 4) AS chi2,
               round(sqrt(chi.chi2 / (tot.n
                     * (least(tot.r, tot.c) - 1))), 6) AS cramers_v
        FROM chi CROSS JOIN tot
    """,
    doc="Cramér's V association between language and source in the "
    "document corpus — 'are sources language-siloed' quantified on a "
    "0-1 scale (0 = independent mixture, 1 = fully determined), with "
    "the underlying chi-square. The contingency table is one grouped "
    "count (|langs| x |sources| cells); expected counts come from "
    "broadcast marginals; every input to the formula is an exact "
    "integer. The mixture-health check run before trusting per-source "
    "language statistics.",
)
def cramers_v_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    cell = d.groupBy("lang", "source").agg(F.count("*").alias("o"))
    rowt = cell.groupBy("lang").agg(F.sum("o").alias("rn"))
    colt = cell.groupBy("source").agg(F.sum("o").alias("cn"))
    tot = cell.agg(F.sum("o").alias("n")).crossJoin(
        F.broadcast(rowt.agg(F.count("*").alias("r")))
    ).crossJoin(F.broadcast(colt.agg(F.count("*").alias("c"))))
    e = F.col("rn").cast("double") * F.col("cn") / F.col("n")
    chi = (
        cell.join(F.broadcast(rowt), "lang")
        .join(F.broadcast(colt), "source")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(F.pow(F.col("o") - e, F.lit(2.0)) / e).alias("chi2"),
            F.min("n").alias("n"),
            F.min("r").alias("r"),
            F.min("c").alias("c"),
        )
    )
    return chi.select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("r").cast("bigint").alias("n_langs"),
        F.col("c").cast("bigint").alias("n_sources"),
        F.round("chi2", 4).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * (F.least(F.col("r"), F.col("c")) - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


@REG.add(
    "cohort_value_matrix",
    oracle="""
        WITH bounds AS (SELECT CAST(min(ts) AS DATE) AS d0 FROM events),
        firsts AS (
            SELECT user_id,
                   CAST(floor(datediff('day', d0, CAST(min(ts) AS DATE))
                              / 7) AS BIGINT) AS cohort_week
            FROM events CROSS JOIN bounds GROUP BY user_id, d0
        ),
        contrib AS (
            SELECT f.cohort_week,
                   CAST(floor(datediff('day', b.d0, CAST(e.ts AS DATE))
                              / 7) AS BIGINT) - f.cohort_week AS age_week,
                   e.value
            FROM events e
            JOIN firsts f USING (user_id)
            CROSS JOIN bounds b
        ),
        cellv AS (
            SELECT cohort_week, age_week,
                   round(sum(value), 6) AS week_value
            FROM contrib GROUP BY cohort_week, age_week
        ),
        size_c AS (
            SELECT cohort_week, count(*) AS n_users
            FROM firsts GROUP BY cohort_week
        )
        SELECT c.cohort_week, c.age_week,
               CAST(s.n_users AS BIGINT) AS cohort_users,
               round(sum(c2.week_value) / s.n_users, 4)
                   AS cum_value_per_user
        FROM cellv c
        JOIN cellv c2 ON c2.cohort_week = c.cohort_week
                     AND c2.age_week <= c.age_week
        JOIN size_c s ON s.cohort_week = c.cohort_week
        GROUP BY c.cohort_week, c.age_week, s.n_users
    """,
    doc="Cohort LTV matrix: users grouped by first-activity week, each "
    "cell the CUMULATIVE value per user at cohort-age k weeks — the "
    "triangle a growth team reads next to retention_cohorts' count "
    "view. The cumulative rides a self-join over the (cohorts x ages) "
    "aggregate — bounded by corpus age squared in weeks, never by "
    "users or events — so no window touches anything row-scaled; "
    "weekly cell sums are rounded before accumulation (the one "
    "order-dependent float), accumulated identically in both engines.",
)
def cohort_value_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(F.to_date(F.min("ts")).alias("d0"))
    firsts = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id", "d0")
        .agg(
            F.floor(
                F.datediff(F.to_date(F.min("ts")), F.col("d0")) / 7
            )
            .cast("bigint")
            .alias("cohort_week")
        )
        .select("user_id", "cohort_week")
    )
    contrib = (
        ev.join(firsts, "user_id")
        .crossJoin(F.broadcast(bounds))
        .select(
            "cohort_week",
            (
                F.floor(
                    F.datediff(F.to_date("ts"), F.col("d0")) / 7
                ).cast("bigint")
                - F.col("cohort_week")
            ).alias("age_week"),
            "value",
        )
    )
    cellv = contrib.groupBy("cohort_week", "age_week").agg(
        F.round(F.sum("value"), 6).alias("week_value")
    )
    size_c = firsts.groupBy("cohort_week").agg(
        F.count("*").alias("n_users")
    )
    c1, c2 = cellv.alias("c1"), cellv.alias("c2")
    return (
        c1.join(
            F.broadcast(c2),
            (F.col("c2.cohort_week") == F.col("c1.cohort_week"))
            & (F.col("c2.age_week") <= F.col("c1.age_week")),
        )
        .groupBy(
            F.col("c1.cohort_week").alias("cohort_week"),
            F.col("c1.age_week").alias("age_week"),
        )
        .agg(F.sum("c2.week_value").alias("cum"))
        .join(F.broadcast(size_c), "cohort_week")
        .select(
            "cohort_week",
            "age_week",
            F.col("n_users").cast("bigint").alias("cohort_users"),
            F.round(F.col("cum") / F.col("n_users"), 4).alias(
                "cum_value_per_user"
            ),
        )
    )


_WILSON_Z = 1.959963984540054  # two-sided 95%


@REG.add(
    "event_mix_wilson_ci",
    oracle=f"""
        WITH c AS (
            SELECT event_type, count(*) AS k FROM events GROUP BY event_type
        ),
        t AS (SELECT sum(k) AS n FROM c)
        SELECT event_type,
               CAST(k AS BIGINT) AS n_events,
               round(k::DOUBLE / n, 6) AS share,
               round(((k::DOUBLE / n + {_WILSON_Z} * {_WILSON_Z} / (2 * n))
                      - {_WILSON_Z} * sqrt((k::DOUBLE / n)
                            * (1 - k::DOUBLE / n) / n
                            + {_WILSON_Z} * {_WILSON_Z} / (4 * n * n)))
                     / (1 + {_WILSON_Z} * {_WILSON_Z} / n), 6) AS wilson_lo,
               round(((k::DOUBLE / n + {_WILSON_Z} * {_WILSON_Z} / (2 * n))
                      + {_WILSON_Z} * sqrt((k::DOUBLE / n)
                            * (1 - k::DOUBLE / n) / n
                            + {_WILSON_Z} * {_WILSON_Z} / (4 * n * n)))
                     / (1 + {_WILSON_Z} * {_WILSON_Z} / n), 6) AS wilson_hi
        FROM c CROSS JOIN t
    """,
    doc="Wilson score 95% interval for each event type's share of the "
    "mix — the binomial interval that behaves at extreme shares and "
    "small counts where the normal approximation fails (the interval "
    "the bootstrap CI and the z-test lean on implicitly, in closed "
    "form). One grouped count + a 1-row total broadcast; inputs are "
    "exact integers, z is a fixed literal, so both engines evaluate "
    "the identical formula.",
)
def event_mix_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(F.count("*").alias("k"))
    t = c.agg(F.sum("k").alias("n"))
    z = _WILSON_Z
    p = F.col("k").cast("double") / F.col("n")
    n = F.col("n")
    center = p + z * z / (2 * n)
    half = z * F.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    denom = 1 + z * z / n
    return c.crossJoin(F.broadcast(t)).select(
        "event_type",
        F.col("k").cast("bigint").alias("n_events"),
        F.round(p, 6).alias("share"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    )


@REG.add(
    "daily_value_bands",
    oracle="""
        WITH ranked AS (
            SELECT event_type, CAST(ts AS DATE) AS day, value,
                   row_number() OVER (PARTITION BY event_type,
                                          CAST(ts AS DATE)
                                      ORDER BY value, event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type,
                                      CAST(ts AS DATE)) AS n
            FROM events
        )
        SELECT event_type, day,
               CAST(min(n) AS BIGINT) AS n_events,
               round(min(CASE WHEN rn = CAST(floor((n + 1) / 2) AS BIGINT)
                              THEN value END), 6) AS p50,
               round(min(CASE WHEN rn = greatest(1,
                        CAST(ceil(0.9 * n) AS BIGINT)) THEN value END), 6)
                   AS p90
        FROM ranked GROUP BY event_type, day
    """,
    doc="Daily exact p50/p90 value bands per event type — the band feed "
    "a monitoring dashboard charts and the EWMA/changepoint detectors "
    "consume. Exact order statistics by integer rank under "
    "(type, day)-partitioned windows with id tiebreaks (each partition "
    "is one day of one type — at 100 TB swap in approx_percentile with "
    "this exact form as its oracle, the sketch-family convention).",
)
def daily_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    w = Window.partitionBy("event_type", F.to_date("ts")).orderBy(
        "value", "event_id"
    )
    wn = Window.partitionBy("event_type", F.to_date("ts"))
    ranked = ev.select(
        "event_type",
        day,
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    return ranked.groupBy("event_type", "day").agg(
        F.min("n").cast("bigint").alias("n_events"),
        F.round(
            F.min(
                F.when(
                    F.col("rn")
                    == F.floor((F.col("n") + 1) / 2).cast("bigint"),
                    F.col("value"),
                )
            ),
            6,
        ).alias("p50"),
        F.round(
            F.min(
                F.when(
                    F.col("rn")
                    == F.greatest(
                        F.lit(1), F.ceil(0.9 * F.col("n")).cast("bigint")
                    ),
                    F.col("value"),
                )
            ),
            6,
        ).alias("p90"),
    )


@REG.add(
    "weekend_lift_welch_t",
    oracle="""
        WITH tagged AS (
            SELECT event_type, value,
                   CAST(dayofweek(CAST(ts AS DATE)) IN (0, 6) AS INT)
                       AS wkd
            FROM events
        ),
        g AS (
            SELECT event_type,
                   count(*) FILTER (WHERE wkd = 1) AS n1,
                   avg(value) FILTER (WHERE wkd = 1) AS m1,
                   var_samp(value) FILTER (WHERE wkd = 1) AS v1,
                   count(*) FILTER (WHERE wkd = 0) AS n2,
                   avg(value) FILTER (WHERE wkd = 0) AS m2,
                   var_samp(value) FILTER (WHERE wkd = 0) AS v2
            FROM tagged GROUP BY event_type
        )
        SELECT event_type,
               CAST(n1 AS BIGINT) AS n_weekend,
               CAST(n2 AS BIGINT) AS n_weekday,
               round(m1 / m2 - 1, 6) AS weekend_lift,
               round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4) AS welch_t,
               abs(round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4)) > 1.96
                   AS significant
        FROM g
    """,
    doc="Weekend-vs-weekday value lift per event type with Welch's "
    "unequal-variance t statistic — the two-sample mean test that does "
    "NOT assume equal variances or equal group sizes (the honest "
    "default; Student's pooled t is the special case). One conditional "
    "moment fold; the normal critical value applies at these df "
    "(documented). Weekend = Sat/Sun in each engine's own dayofweek "
    "convention (Spark 1=Sun..7=Sat; DuckDB 0=Sun..6=Sat).",
)
def weekend_lift_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    wkd = F.dayofweek(F.to_date("ts")).isin(1, 7)
    g = ev.select("event_type", "value", wkd.cast("int").alias("wkd")).groupBy(
        "event_type"
    ).agg(
        F.count(F.when(F.col("wkd") == 1, 1)).alias("n1"),
        F.avg(F.when(F.col("wkd") == 1, F.col("value"))).alias("m1"),
        F.var_samp(F.when(F.col("wkd") == 1, F.col("value"))).alias("v1"),
        F.count(F.when(F.col("wkd") == 0, 1)).alias("n2"),
        F.avg(F.when(F.col("wkd") == 0, F.col("value"))).alias("m2"),
        F.var_samp(F.when(F.col("wkd") == 0, F.col("value"))).alias("v2"),
    )
    t = F.round(
        (F.col("m1") - F.col("m2"))
        / F.sqrt(F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")),
        4,
    )
    return g.select(
        "event_type",
        F.col("n1").cast("bigint").alias("n_weekend"),
        F.col("n2").cast("bigint").alias("n_weekday"),
        F.round(F.col("m1") / F.col("m2") - 1, 6).alias("weekend_lift"),
        t.alias("welch_t"),
        (F.abs(t) > 1.96).alias("significant"),
    )
