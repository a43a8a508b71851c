"""Entity resolution / record linkage over structured tables.

A data platform ingesting many sources needs fuzzy record matching
next to document-level dedup: the same real-world entity arrives with
slightly different spellings. The two classic scalable shapes are both
here, each as an oracle-checked aggregate:

- **Blocked pairwise matching**: candidate pairs only within a block
  (here ``c_nationkey``; at 100 TB the block key is a q-gram LSH digest
  of the name, exactly like the document band joins in dedup_wide.py).
  The join is an equi-join on the block key — never a cartesian — so
  the pair count is sum(block_size^2), bounded by the blocking choice.
- **Sorted-neighborhood matching** (Hernandez & Stolfo 1995): sort
  records within a block, compare each record to its next ``w``
  neighbors only — O(N*w) comparisons regardless of block size, the
  shape that survives skewed blocks. Expressed as a window ``lead``:
  one shuffle on the block key, no self-join at all.

Distance is ``levenshtein`` (JVM built-in in Spark, native in DuckDB —
identical semantics, so the oracle matches exactly).

Reference parity note: the reference engine (sierradb, an event store)
has no record-linkage surface; these follow the published methods and
the repo-wide oracle conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sierradb_spark.registry import Registry, load, spread

REG = Registry()

# Maximum edit distance for a match. TPC-H-style names ("Customer#0000x")
# differ only in digits, so small distances are common within a block —
# which is exactly what makes the aggregate a meaningful oracle target.
MATCH_MAX_DIST = 2
# Sorted-neighborhood window: compare with the next W records.
NEIGHBOR_W = 3


@REG.add(
    "blocked_name_match_stats",
    oracle=f"""
        SELECT a.c_nationkey AS nationkey,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(count(*) FILTER (WHERE levenshtein(a.c_name, b.c_name) = 1)
                    AS BIGINT) AS n_d1,
               CAST(count(*) FILTER (WHERE levenshtein(a.c_name, b.c_name) = 2)
                    AS BIGINT) AS n_d2,
               round(avg(CAST(levenshtein(a.c_name, b.c_name) AS DOUBLE)), 4)
                   AS avg_dist
        FROM customer a JOIN customer b
          ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= {MATCH_MAX_DIST}
        GROUP BY a.c_nationkey
    """,
    doc="Blocked entity resolution: customer-name pairs within a "
    f"nation block at edit distance <= {MATCH_MAX_DIST}, aggregated per "
    "block. The self-join is an EQUI-join on the block key (plan-"
    "asserted: no cartesian), so candidate pairs are bounded by block "
    "sizes; at 100 TB the block key becomes a q-gram LSH digest of the "
    "name (same band-join shape as dedup_wide.py) and this query is "
    "unchanged. levenshtein runs JVM-side in codegen.",
)
def blocked_name_match_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    # spread the probe side: the build side broadcasts, so the whole
    # sum(block^2) levenshtein loop runs on a's partitions — the scan's
    # single input split otherwise (see registry.spread). 14.9 s ->
    # 0.8 s at sf0.1.
    a, b = spread(c, "c_custkey").alias("a"), c.alias("b")
    # Thresholded levenshtein (Spark 3.5+): the banded DP early-abandons
    # once the distance provably exceeds MATCH_MAX_DIST and returns -1,
    # so each comparison costs O(len * threshold) instead of O(len^2) —
    # result-identical to the unthresholded filter (kept pairs report
    # their true distance). The oracle keeps plain levenshtein (DuckDB
    # has no threshold arg); both engines agree on every kept pair.
    # The distance predicate is placed LAST in the join condition so
    # codegen can short-circuit it behind the free custkey ordering
    # check (a<b pairs only). Best-effort: Catalyst does not guarantee
    # conjunct evaluation order across optimizer rules/versions, so
    # treat this as a likely-but-unpinned saving — results are
    # identical either way.
    dist = F.levenshtein(
        F.col("a.c_name"), F.col("b.c_name"), MATCH_MAX_DIST
    )
    pairs = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey"))
        & (dist >= 0),  # -1 = "exceeds MATCH_MAX_DIST"
    ).select(
        F.col("a.c_nationkey").alias("nationkey"),
        dist.alias("dist"),  # evaluate once per surviving pair
    )
    return pairs.groupBy("nationkey").agg(
        F.count("*").alias("n_pairs"),
        F.count(F.when(F.col("dist") == 1, 1)).alias("n_d1"),
        F.count(F.when(F.col("dist") == 2, 1)).alias("n_d2"),
        F.round(F.avg(F.col("dist").cast("double")), 4).alias("avg_dist"),
    )


@REG.add(
    "sorted_neighborhood_matches",
    oracle=f"""
        WITH nb AS (
            SELECT c_nationkey, c_name,
                   {", ".join(
                       f"lead(c_name, {k}) OVER "
                       "(PARTITION BY c_nationkey ORDER BY c_name, c_custkey)"
                       f" AS nb{k}"
                       for k in range(1, NEIGHBOR_W + 1)
                   )}
            FROM customer
        ),
        cmp AS (
            SELECT c_nationkey, c_name,
                   unnest([{", ".join(f"nb{k}" for k in range(1, NEIGHBOR_W + 1))}]) AS nb
            FROM nb
        ),
        dists AS (
            SELECT c_nationkey, levenshtein(c_name, nb) AS dist
            FROM cmp WHERE nb IS NOT NULL
        )
        SELECT c_nationkey AS nationkey,
               CAST(count(*) AS BIGINT) AS n_compared,
               CAST(count(*) FILTER (WHERE dist <= {MATCH_MAX_DIST})
                    AS BIGINT) AS n_matched,
               round(avg(CASE WHEN dist <= {MATCH_MAX_DIST}
                              THEN CAST(dist AS DOUBLE) END), 4) AS avg_match_dist
        FROM dists GROUP BY c_nationkey
    """,
    doc="Sorted-neighborhood entity resolution (Hernandez-Stolfo): sort "
    f"each nation block by name, compare each record to its next "
    f"{NEIGHBOR_W} neighbors only — O(N*w) comparisons however large "
    "the block, the ER shape that survives skewed blocks where blocked "
    "all-pairs blows up. One shuffle (the window partition key), zero "
    "self-joins; lead() keeps everything in a single window pass.",
)
def sorted_neighborhood_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    w = Window.partitionBy("c_nationkey").orderBy("c_name", "c_custkey")
    nb = c.select(
        "c_nationkey",
        "c_name",
        *[
            F.lead("c_name", k).over(w).alias(f"nb{k}")
            for k in range(1, NEIGHBOR_W + 1)
        ],
    )
    cmp = nb.select(
        "c_nationkey",
        F.explode(
            F.array(*[F.col(f"nb{k}") for k in range(1, NEIGHBOR_W + 1)])
        ).alias("nb"),
        "c_name",
    ).where(F.col("nb").isNotNull())
    dist = F.levenshtein("c_name", "nb")
    matched = F.when(dist <= MATCH_MAX_DIST, dist.cast("double"))
    return cmp.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count("*").alias("n_compared"),
        F.count(F.when(dist <= MATCH_MAX_DIST, 1)).alias("n_matched"),
        F.round(F.avg(matched), 4).alias("avg_match_dist"),
    )
