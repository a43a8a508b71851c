"""Relational operator coverage: aggregation, joins, set ops, rollup,
pivot, JSON/date scalar functions.

The reference has no relational surface (SURVEY §2.7: no joins, no
aggregation language) — these operators are the *extension* surface
every Spark analytics engine must provide, exercised over the driver's
TPC-H-ish tables. Each is written the way it should execute at 100 TB:
filters before joins, broadcast for dimension tables, partial
aggregation, top-k via TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sierradb_spark.registry import Registry, load

REG = Registry()


@REG.add(
    "q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                                       AS sum_qty,
               round(sum(l_extendedprice), 2)                                  AS sum_base_price,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                              * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
                    AS DOUBLE)                                                 AS sum_disc_price,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                              * (1 - CAST(l_discount AS DECIMAL(4,2)))
                              * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2)
                    AS DOUBLE)                                                 AS sum_charge,
               round(avg(l_quantity), 4)                                       AS avg_qty,
               round(avg(l_extendedprice), 4)                                  AS avg_price,
               round(avg(l_discount), 4)                                       AS avg_disc,
               CAST(count(*) AS BIGINT)                                        AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
    doc="TPC-H Q1-shaped pricing summary: the canonical scan→filter→partial-agg→final-agg "
    "pipeline. Whole-stage codegen end to end; shuffle carries ≤ |flags×statuses| rows.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # Exact decimal money arithmetic (the q9 idiom): decimal sums are
    # order-independent, so partial-agg interleaving can never flip a
    # half-cent round boundary between engines.
    disc_price = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    charge = disc_price * (
        F.lit(1).cast("decimal(4,2)") + F.col("l_tax").cast("decimal(4,2)")
    )
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@REG.add(
    "q3_top_revenue_orders",
    oracle="""
        SELECT o.o_orderkey,
               CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                              * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2)
                    AS DOUBLE) AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
    headline=True,
    doc="TPC-H Q3-shaped: selective dimension filter → fact join → agg → top-k. Customer "
    "side is small after the segment filter → broadcast; top-k is TakeOrderedAndProject "
    "(never a full sort). Ordering ties broken by o_orderkey so the rounded top-10 set "
    "is engine-independent.",
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(12,2)")
                    * (F.lit(1).cast("decimal(4,2)")
                       - F.col("l_discount").cast("decimal(4,2)"))
                ),
                2,
            ).cast("double").alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@REG.add(
    "q5_nation_revenue",
    oracle="""
        SELECT n.n_name,
               CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                              * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2)
                    AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN customer c  ON o.o_custkey = c.c_custkey
        JOIN supplier s  ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n    ON s.s_nationkey = n.n_nationkey
        JOIN region r    ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n.n_name
    """,
    headline=True,
    doc="TPC-H Q5-shaped: 6-table join tree. All dimensions (region/nation/supplier/"
    "customer-after-filter) broadcast; only the fact-fact lineitem⋈orders shuffles. "
    "At 100 TB that one shuffle is co-partitionable by orderkey (bucketing).",
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(12,2)")
                    * (F.lit(1).cast("decimal(4,2)")
                       - F.col("l_discount").cast("decimal(4,2)"))
                ),
                2,
            ).cast("double").alias("revenue")
        )
    )


@REG.add(
    "top_customers_by_spend",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               round(sum(o.o_totalprice), 2) AS total_spend,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey, c.c_name
        ORDER BY total_spend DESC, c_custkey ASC
        LIMIT 10
    """,
    doc="Join + agg + deterministic top-k (rounded sort key, unique tiebreak).",
)
def top_customers_by_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.col("total_spend").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


@REG.add(
    "distinct_user_counts",
    oracle="""
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY event_type
    """,
    doc="Distinct aggregation (expand + two-phase agg in Spark; at scale prefer "
    "approx_count_distinct when exactness isn't required).",
)
def distinct_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@REG.add(
    "rollup_lineitem_status",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="Hierarchical rollup (grouping sets). Spark expands grouping sets before the "
    "shuffle — partial agg still applies.",
)
def rollup_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n"),
    )


@REG.add(
    "pivot_status_by_priority",
    oracle="""
        SELECT o_orderpriority,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_filled,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_pending,
               round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS open_value
        FROM orders GROUP BY o_orderpriority
    """,
    doc="Pivot as conditional aggregation — one pass, no pivot-specific shuffle; "
    "column set is static so the plan is fully codegen'd.",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_filled"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_pending"),
        F.round(
            F.sum(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))), 2
        ).alias("open_value"),
    )


@REG.add(
    "set_op_repeat_customers",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="Set operation (INTERSECT → left-semi join on distinct sets in Spark).",
)
def set_op_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    open_c = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    filled_c = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_c.intersect(filled_c)


@REG.add(
    "anti_join_inactive_customers",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    doc="NOT EXISTS as left-anti join (the scalable plan for set difference on keys).",
)
def anti_join_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@REG.add(
    "json_props_stats",
    oracle="""
        SELECT event_type,
               round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
               max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
               CAST(count(json_extract_string(props, '$.k')) AS BIGINT) AS n_with_k
        FROM events GROUP BY event_type
    """,
    doc="JSON scalar extraction from the opaque payload column — the query-layer "
    "equivalent of SierraDB's schemaless payload convention (SURVEY §1.3): the engine "
    "stores bytes, the query layer interprets.",
)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.count(k).alias("n_with_k"),
    )


@REG.add(
    "tumbling_window_value",
    oracle="""
        SELECT time_bucket(INTERVAL '6 hours', ts) AS w_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY time_bucket(INTERVAL '6 hours', ts), event_type
    """,
    doc="Event-time tumbling window aggregation (6h buckets) — the batch form of "
    "the streaming windowed agg (F.window is the same operator under a watermark "
    "in readStream). Epoch-aligned in both engines.",
)
def tumbling_window_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@REG.add(
    "value_percentiles_by_type",
    oracle="""
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.9), 4) AS p90,
               round(quantile_cont(value, 0.99), 4) AS p99
        FROM events GROUP BY event_type
    """,
    doc="Exact interpolated percentiles per group (Spark `percentile` == DuckDB "
    "`quantile_cont`, both linear interpolation). At 100 TB swap for "
    "approx_percentile (t-digest): single-pass, mergeable, no full sort.",
)
def value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
    )


@REG.add(
    "string_funcs_suppliers",
    oracle="""
        SELECT p_partkey,
               upper(p_brand) AS brand_upper,
               CAST(length(p_name) AS BIGINT) AS name_len,
               substr(p_type, 1, 5) AS type_prefix,
               concat(p_brand, '/', CAST(p_size AS VARCHAR)) AS brand_size,
               CAST(contains(p_type, 'BRUSHED') AS INT) AS is_brushed,
               replace(p_name, ' ', '_') AS name_slug
        FROM part
        WHERE p_name LIKE 'p%'
    """,
    doc="Scalar string-function surface (upper/length/substr/concat/contains/"
    "replace/LIKE) — all whole-stage-codegen built-ins; the LIKE prefix is a "
    "pushed-down StringStartsWith filter at the scan.",
)
def string_funcs_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.where(F.col("p_name").like("p%")).select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("/", "p_brand", F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
        F.col("p_type").contains("BRUSHED").cast("int").alias("is_brushed"),
        F.regexp_replace("p_name", " ", "_").alias("name_slug"),
    )


@REG.add(
    "orders_above_customer_avg",
    oracle="""
        SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS price
        FROM orders o
        WHERE o.o_totalprice > 1.5 * (
            SELECT avg(i.o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey
        )
    """,
    doc="Correlated scalar subquery (orders 50% above their customer's average). "
    "Decorrelated the scalable way: one partial-aggregated pass builds per-customer "
    "averages, then an equi-join — never a per-row subquery execution.",
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    avgs = o.groupBy("o_custkey").agg(F.avg("o_totalprice").alias("cust_avg"))
    return (
        o.join(avgs, "o_custkey")
        .where(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select(
            "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price")
        )
    )


@REG.add(
    "salted_event_type_stats",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events GROUP BY event_type
    """,
    doc="Skew-safe aggregation: low-cardinality hot keys (5 event types) are "
    "salted with hash(event_id)%16 for the first shuffle, then merged — no "
    "single reducer owns a hot key's full volume. Results are identical to the "
    "direct groupBy (the oracle); only the shuffle distribution changes. At "
    "100 TB this (or AQE skew-join splitting) is what keeps p99 task time flat.",
)
def salted_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    salted = ev.withColumn("salt", F.pmod(F.hash("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("pc"),
        F.sum("value").alias("pv"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pc").alias("n_events"),
        F.round(F.sum("pv"), 2).alias("total_value"),
    )


@REG.add(
    "monthly_event_rollup",
    oracle="""
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS total_value,
               round(avg(value), 4) AS avg_value
        FROM events GROUP BY date_trunc('day', ts)
    """,
    headline=True,
    doc="Time-bucketed rollup (date_trunc) — the hypertable-style downsample query. "
    "At 100 TB: partition the table by day and this becomes partition-local.",
)
def monthly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )
