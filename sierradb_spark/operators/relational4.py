"""TPC-H q2/q11/q16/q20 shapes, adapted to the testdata schema.

The four partsupp-dependent TPC-H queries were previously skipped
because the testdata ships no partsupp table; lineitem encodes the
part-supplier relationship though, so a derived partsupp —

    ps(partkey, suppkey,
       availqty    := round(sum(l_quantity), 2),
       supplycost  := round(min(l_extendedprice / l_quantity), 2))

— restores all four query *shapes* (min-cost supplier per part,
value-important stock, supplier counts per part class, concentration
screening). Both engines derive ps identically, so the oracles stay
exact. Scale notes per query; the derivation itself is one lineitem
aggregation whose shuffle carries (partkey, suppkey) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sierradb_spark.registry import Registry, load

REG = Registry()

# Integer-cent arithmetic keeps the derivation engine-exact: per-row
# round(x*100) is deterministic (identical double input in both engines),
# and BIGINT sums are associative — no float-accumulation-order boundary
# flips, which round(sum(double), 2) is vulnerable to.
_SQL_PS = """
        ps AS (
            SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                   CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                       AS ps_availqty_c,
                   CAST(round(min(l_extendedprice / l_quantity) * 100) AS BIGINT)
                       AS ps_supplycost_c
            FROM lineitem GROUP BY 1, 2
        )
"""


def _ps(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.sum(F.round(F.col("l_quantity") * 100).cast("long"))
        .cast("long")
        .alias("ps_availqty_c"),
        F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")) * 100)
        .cast("long")
        .alias("ps_supplycost_c"),
    )


@REG.add(
    "q2_min_cost_supplier",
    oracle=f"""
        WITH {_SQL_PS},
        eu AS (
            SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
            FROM supplier s
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = 'EUROPE'
        ),
        cand AS (
            SELECT p.p_partkey, p.p_brand, ps.ps_suppkey,
                   ps.ps_supplycost_c / 100.0 AS ps_supplycost
            FROM part p JOIN ps ON ps.ps_partkey = p.p_partkey
            JOIN eu ON eu.s_suppkey = ps.ps_suppkey
            WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'STANDARD'
        ),
        best AS (
            SELECT p_partkey, min(ps_supplycost) AS mc FROM cand GROUP BY 1
        ),
        pick AS (
            SELECT c.p_partkey, min(c.ps_suppkey) AS sk
            FROM cand c JOIN best b
              ON b.p_partkey = c.p_partkey AND c.ps_supplycost = b.mc
            GROUP BY 1
        )
        SELECT eu.s_acctbal, eu.s_name, eu.n_name,
               c.p_partkey, c.p_brand, c.ps_supplycost
        FROM pick
        JOIN cand c ON c.p_partkey = pick.p_partkey AND c.ps_suppkey = pick.sk
        JOIN eu ON eu.s_suppkey = pick.sk
    """,
    doc="TPC-H Q2 shape: for each STANDARD part in a size band, the EUROPE "
    "supplier with the minimum derived supply cost (ties -> lowest supplier "
    "key, fully deterministic). Region/nation/supplier dims broadcast; the "
    "min-cost pick is two per-part aggregates over the candidate set — no "
    "correlated rescan.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _ps(spark, sf_dir)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    p = load(spark, sf_dir, "part")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.where(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        p.where(F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD"))
        .join(ps, ps.ps_partkey == F.col("p_partkey"))
        .join(F.broadcast(eu), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_brand",
            "ps_suppkey",
            (F.col("ps_supplycost_c") / 100.0).alias("ps_supplycost"),
        )
    )
    cand = cand.localCheckpoint(eager=True)  # shared by best/pick/final
    best = cand.groupBy("p_partkey").agg(F.min("ps_supplycost").alias("mc"))
    pick = (
        cand.alias("c1")
        .join(
            F.broadcast(best.alias("b")),
            (F.col("c1.p_partkey") == F.col("b.p_partkey"))
            & (F.col("c1.ps_supplycost") == F.col("b.mc")),
        )
        .groupBy(F.col("c1.p_partkey").alias("pk"))
        .agg(F.min("c1.ps_suppkey").alias("sk"))
    )
    return (
        cand.alias("c2")
        .join(
            F.broadcast(pick),
            (F.col("c2.p_partkey") == F.col("pk"))
            & (F.col("c2.ps_suppkey") == F.col("sk")),
        )
        .join(F.broadcast(eu), F.col("sk") == eu.s_suppkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "ps_supplycost"
        )
    )


@REG.add(
    "q11_important_stock",
    oracle=f"""
        WITH {_SQL_PS},
        nat AS (
            SELECT ps.ps_partkey,
                   ps.ps_supplycost_c * ps.ps_availqty_c AS val_c
            FROM ps
            JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = 'ASIA'
        ),
        per_part AS (
            SELECT ps_partkey, CAST(sum(val_c) AS BIGINT) AS value_c FROM nat GROUP BY 1
        ),
        tot AS (SELECT CAST(sum(value_c) AS BIGINT) AS t_c, count(*) AS np FROM per_part)
        SELECT ps_partkey, round(value_c / 10000.0, 2) AS stock_value
        FROM per_part, tot
        WHERE value_c > 2.0 * t_c / np
    """,
    doc="TPC-H Q11 shape: per-part stock value (derived supplycost x availqty) "
    "for one region's suppliers, keeping parts above a fraction of the grand "
    "mean (scale-free: a fixed fraction of the total empties out as the part "
    "count grows). The scalar aggregate is a 1-row broadcast cross join — no "
    "second scan, no correlated subquery.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _ps(spark, sf_dir)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    nat = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(r.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_c") * F.col("ps_availqty_c")).alias("val_c"),
        )
    )
    per_part = nat.groupBy("ps_partkey").agg(
        F.sum("val_c").cast("long").alias("value_c")
    )
    tot = per_part.agg(
        F.sum("value_c").cast("long").alias("t_c"), F.count("*").alias("np")
    )
    return (
        per_part.crossJoin(F.broadcast(tot))
        .where(F.col("value_c") > 2.0 * F.col("t_c") / F.col("np"))
        .select(
            "ps_partkey",
            F.round(F.col("value_c") / 10000.0, 2).alias("stock_value"),
        )
    )


@REG.add(
    "q16_parts_supplier_count",
    oracle=f"""
        WITH {_SQL_PS}
        SELECT p.p_brand, p.p_type, p.p_size,
               CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
        FROM ps
        JOIN part p ON p.p_partkey = ps.ps_partkey
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_type NOT LIKE 'PROMO%'
          AND p.p_size IN (5, 10, 15, 20, 25, 30)
          AND s.s_acctbal >= 0
        GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape: distinct-supplier counts per (brand, type, size) "
    "class, excluding one brand, a type family, and negative-balance "
    "suppliers (the complaints filter stand-in; the schema has no comment "
    "column). Dims broadcast; the distinct count shuffles (class, suppkey) "
    "pairs only.",
)
def q16_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _ps(spark, sf_dir)
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    return (
        ps.join(
            F.broadcast(
                p.where(
                    (F.col("p_brand") != "Brand#1")
                    & ~F.col("p_type").like("PROMO%")
                    & F.col("p_size").isin(5, 10, 15, 20, 25, 30)
                )
            ),
            ps.ps_partkey == F.col("p_partkey"),
        )
        .join(
            F.broadcast(s.where(F.col("s_acctbal") >= 0)),
            ps.ps_suppkey == F.col("s_suppkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@REG.add(
    "q20_concentrated_suppliers",
    oracle="""
        WITH yr AS (
            SELECT l_partkey, l_suppkey,
                   sum(l_quantity) AS q_all,
                   sum(l_quantity) FILTER (
                       WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                         AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                   ) AS q_96
            FROM lineitem GROUP BY 1, 2
        ),
        conc AS (
            SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_concentrated
            FROM yr
            WHERE q_96 > 0.5 * q_all
            GROUP BY 1
        )
        SELECT s.s_name, n.n_name, c.n_concentrated
        FROM conc c
        JOIN supplier s ON s.s_suppkey = c.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'AMERICA'
    """,
    doc="TPC-H Q20 shape: suppliers in one region whose 1996 shipments of a "
    "part exceeded half that part-supplier's all-time quantity — the "
    "excess-stock/concentration screen. Both the yearly and all-time sums "
    "come from ONE lineitem aggregation (conditional sum), then a tiny "
    "per-supplier rollup joins the broadcast dims.",
)
def q20_concentrated_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    in96 = (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")
    )
    yr = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("q_all"),
        F.sum(F.when(in96, F.col("l_quantity"))).alias("q_96"),
    )
    conc = (
        yr.where(F.col("q_96") > 0.5 * F.col("q_all"))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_concentrated"))
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        conc.join(F.broadcast(s), conc.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(r.where(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_name", "n_name", "n_concentrated")
    )


@REG.add(
    "pareto_skyline_orders",
    oracle="""
        WITH pd AS (
            SELECT o_orderdate AS d, max(o_totalprice) AS mp
            FROM orders GROUP BY o_orderdate
        ),
        sky AS (
            SELECT p.d, p.mp
            FROM pd p LEFT JOIN pd q ON q.d > p.d AND q.mp >= p.mp
            WHERE q.d IS NULL
        )
        SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice
        FROM orders o
        JOIN sky s ON o.o_orderdate = s.d AND o.o_totalprice = s.mp
    """,
    doc="Skyline (Pareto-frontier) of orders maximizing BOTH recency and "
    "total price — the multi-criteria operator ('show me orders not "
    "beaten on every axis') classic engines special-case. 2D skylines "
    "collapse exactly: per-date max price first (the skyline is a "
    "subset of per-date maxima), then dominance testing on the DATES "
    "aggregate — bounded by distinct dates, never row count — via a "
    "broadcast anti-join; order rows rejoin by (date, price) equi-key. "
    "Ties on the frontier (same date+price) all survive, matching the "
    "standard skyline definition.",
)
def pareto_skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    pd_ = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.max("o_totalprice").alias("mp")
    )
    p, q = pd_.alias("p"), pd_.alias("q")
    sky = p.join(
        F.broadcast(q),
        (F.col("q.d") > F.col("p.d")) & (F.col("q.mp") >= F.col("p.mp")),
        "left_anti",
    ).select(F.col("d"), F.col("mp"))
    return o.join(
        F.broadcast(sky),
        (o["o_orderdate"] == sky["d"]) & (o["o_totalprice"] == sky["mp"]),
    ).select("o_orderkey", "o_orderdate", "o_totalprice")


@REG.add(
    "cohens_d_priority",
    oracle="""
        WITH g AS (
            SELECT count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
                       AS n1,
                   avg(o_totalprice) FILTER
                       (WHERE o_orderpriority = '1-URGENT') AS m1,
                   var_samp(o_totalprice) FILTER
                       (WHERE o_orderpriority = '1-URGENT') AS v1,
                   count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS n2,
                   avg(o_totalprice) FILTER
                       (WHERE o_orderpriority = '5-LOW') AS m2,
                   var_samp(o_totalprice) FILTER
                       (WHERE o_orderpriority = '5-LOW') AS v2
            FROM orders
        )
        SELECT CAST(n1 AS BIGINT) AS n_urgent,
               CAST(n2 AS BIGINT) AS n_low,
               round(m1, 2) AS mean_urgent,
               round(m2, 2) AS mean_low,
               round((m1 - m2)
                     / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
                            / (n1 + n2 - 2)), 6) AS cohens_d,
               abs(round((m1 - m2)
                     / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
                            / (n1 + n2 - 2)), 6)) >= 0.2 AS at_least_small
        FROM g
    """,
    doc="Cohen's d effect size between urgent and low-priority order "
    "values (pooled-variance standardized mean difference) — the "
    "'significant but does it MATTER' companion to the test "
    "statistics: a z-test flags any difference at scale; d says "
    "whether it clears even the 'small effect' 0.2 bar. One "
    "conditional-aggregate fold; means/variances come from exact "
    "moment tuples.",
)
def cohens_d_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    u = F.col("o_orderpriority") == "1-URGENT"
    lo = F.col("o_orderpriority") == "5-LOW"
    price = F.col("o_totalprice")
    g = o.agg(
        F.count(F.when(u, 1)).alias("n1"),
        F.avg(F.when(u, price)).alias("m1"),
        F.var_samp(F.when(u, price)).alias("v1"),
        F.count(F.when(lo, 1)).alias("n2"),
        F.avg(F.when(lo, price)).alias("m2"),
        F.var_samp(F.when(lo, price)).alias("v2"),
    )
    d = F.round(
        (F.col("m1") - F.col("m2"))
        / F.sqrt(
            ((F.col("n1") - 1) * F.col("v1") + (F.col("n2") - 1) * F.col("v2"))
            / (F.col("n1") + F.col("n2") - 2)
        ),
        6,
    )
    return g.select(
        F.col("n1").cast("bigint").alias("n_urgent"),
        F.col("n2").cast("bigint").alias("n_low"),
        F.round("m1", 2).alias("mean_urgent"),
        F.round("m2", 2).alias("mean_low"),
        d.alias("cohens_d"),
        (F.abs(d) >= 0.2).alias("at_least_small"),
    )


@REG.add(
    "interpurchase_time_stats",
    oracle="""
        WITH gaps AS (
            SELECT o_custkey,
                   datediff('day',
                       lag(o_orderdate) OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS gap
            FROM orders
        ),
        g AS (SELECT gap FROM gaps WHERE gap IS NOT NULL),
        hist AS (SELECT gap, count(*) AS c FROM g GROUP BY gap),
        cum AS (
            SELECT h.gap, sum(r.c) AS cc
            FROM hist h JOIN hist r ON r.gap <= h.gap
            GROUP BY h.gap
        ),
        tot AS (SELECT sum(c) AS n FROM hist)
        SELECT CAST(min(n) AS BIGINT) AS n_gaps,
               min(CASE WHEN cc * 2 >= n THEN gap END) AS p50_days,
               min(CASE WHEN cc * 10 >= 9 * n THEN gap END) AS p90_days,
               CAST(max(gap) AS BIGINT) AS max_days
        FROM cum CROSS JOIN tot
    """,
    doc="Inter-purchase time distribution: days between a customer's "
    "consecutive orders, with exact p50/p90 — the repurchase-cycle "
    "metric inventory and retention planning read. Gaps come from one "
    "customer-partitioned lag window; the percentiles come from the "
    "day-gap histogram cumulative (bounded by corpus age in days — "
    "broadcast join, no global window), with integer rank thresholds "
    "(cc*2 >= n is the windowless lower median).",
)
def interpurchase_time_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap")
    ).where(F.col("gap").isNotNull())
    hist = gaps.groupBy("gap").agg(F.count("*").alias("c"))
    h, r = hist.alias("h"), hist.alias("r")
    cum = (
        h.join(F.broadcast(r), F.col("r.gap") <= F.col("h.gap"))
        .groupBy(F.col("h.gap").alias("gap"))
        .agg(F.sum("r.c").alias("cc"))
    )
    tot = hist.agg(F.sum("c").alias("n"))
    return cum.crossJoin(F.broadcast(tot)).agg(
        F.min("n").cast("bigint").alias("n_gaps"),
        F.min(
            F.when(F.col("cc") * 2 >= F.col("n"), F.col("gap"))
        ).alias("p50_days"),
        F.min(
            F.when(F.col("cc") * 10 >= 9 * F.col("n"), F.col("gap"))
        ).alias("p90_days"),
        F.max("gap").cast("bigint").alias("max_days"),
    )


_PARETO_PCTS = (1, 10, 20)


@REG.add(
    "revenue_concentration_8020",
    oracle=f"""
        WITH rev AS (
            SELECT o_custkey,
                   CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS cents
            FROM orders GROUP BY o_custkey
        ),
        hist AS (SELECT cents, count(*) AS c, sum(cents) AS mass
                 FROM rev GROUP BY cents),
        above AS (
            SELECT h.cents, h.c, h.mass,
                   coalesce(sum(r.c), 0) AS n_above,
                   coalesce(sum(r.mass), 0) AS mass_above
            FROM hist h LEFT JOIN hist r ON r.cents > h.cents
            GROUP BY h.cents, h.c, h.mass
        ),
        tot AS (SELECT sum(c) AS n, sum(mass) AS total FROM hist),
        grid AS (SELECT unnest([{', '.join(str(p) for p in _PARETO_PCTS)}])
                     AS pct)
        SELECT pct,
               CAST(min(n) AS BIGINT) AS n_customers,
               round(min(CASE
                   WHEN n_above * 100 < pct * n
                        AND (n_above + c) * 100 >= pct * n
                   THEN (mass_above
                         + ceil((pct * n - 100.0 * n_above) / 100.0)
                           * cents)::DOUBLE / total END), 6)
                   AS top_share
        FROM above CROSS JOIN tot CROSS JOIN grid
        GROUP BY pct
    """,
    doc="Revenue concentration: the share of total revenue held by the "
    "top 1/10/20% of customers — the Pareto read-out behind account "
    "tiering. Per-customer revenue folds to INTEGER CENTS, and the "
    "descending cumulative (customers above each revenue level, and "
    "their mass) is an exact TWO-LEVEL PREFIX SUM: cents are near-"
    "unique per customer, so unlike the bounded count-of-counts "
    "histograms (vocab_coverage_curve, the gap percentiles) this "
    "histogram grows with the customer count and the broadcast range-"
    "join form is O(customers^2) — 225M comparisons at sf0.1, "
    "unrunnable at 100 TB. Instead: approximate-quantile boundaries "
    "bucket the levels (balance only — correctness never depends on "
    "where the cuts fall), a broadcast B-row join supplies each "
    "bucket's exact above-bucket totals, and a window PARTITIONED by "
    "bucket supplies the exact within-bucket strict-above remainder. "
    "The within-level remainder takes whole customers (ceil), matching "
    "the rank definition.",
)
def revenue_concentration_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sierradb_spark.registry import bucketed_cumulative

    o = load(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice") * 100, 0).cast("bigint").alias("cents")
    )
    hist = rev.groupBy("cents").agg(
        F.count("*").alias("c"), F.sum("cents").alias("mass")
    )
    above = bucketed_cumulative(
        hist,
        "cents",
        {"c": "n_above", "mass": "mass_above"},
        descending=True,
    )
    tot = hist.agg(F.sum("c").alias("n"), F.sum("mass").alias("total"))
    grid = spark.createDataFrame(
        [(int(p),) for p in _PARETO_PCTS], "pct int"
    )
    k = F.ceil(
        (F.col("pct") * F.col("n") - 100.0 * F.col("n_above")) / 100.0
    )
    hit = (F.col("n_above") * 100 < F.col("pct") * F.col("n")) & (
        (F.col("n_above") + F.col("c")) * 100 >= F.col("pct") * F.col("n")
    )
    share = (
        (F.col("mass_above") + k * F.col("cents")).cast("double")
        / F.col("total")
    )
    return (
        above.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(grid))
        .groupBy("pct")
        .agg(
            F.min("n").cast("bigint").alias("n_customers"),
            F.round(F.min(F.when(hit, share)), 6).alias("top_share"),
        )
    )
