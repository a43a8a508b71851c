"""Iterative graph analytics over the near-duplicate graph.

Connected components (functions/pipeline.py) answers "which documents
are the same"; PageRank over the same LSH candidate graph answers
"which documents are the TEMPLATES" — high-degree hubs whose boilerplate
radiates through the corpus (the canonical target for aggressive
dedup / downweighting in a pretraining mix).

Scale shape (100 TB): edges come from the production-width MinHash band
join (collision-scaled, never N^2); each PageRank iteration is one
join + one aggregate with the rank vector on the small side. A fixed
iteration count keeps the plan static and the oracle expressible as
unrolled SQL; at a billion nodes you'd checkpoint per iteration
(lineage barrier), which the implementation already does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sierradb_spark.registry import Registry
from sierradb_spark.functions.dedup_wide import (
    _SQL_CAND,
    _SQL_CAND_EDGES,
    _SQL_WIDE_MINS,
)

REG = Registry()

_ITERS = 8
_DAMP = 0.85


def _sql_pagerank() -> str:
    """Unrolled fixed-iteration PageRank oracle (recursive CTEs with
    aggregation in the recursive term are non-portable; 8 chained CTEs
    are boring and exact)."""
    # MATERIALIZED: the iteration CTEs reference edges/deg ~9 times
    # each, and DuckDB would otherwise re-derive the (expensive) MinHash
    # band join per reference — same result, ~7x oracle wall-time.
    ctes = [
        _SQL_CAND_EDGES
        + """,
        deg AS MATERIALIZED (SELECT u, count(*) AS d FROM edges GROUP BY u),
        n AS MATERIALIZED (SELECT count(*)::DOUBLE AS nn FROM deg),
        pr0 AS (SELECT u AS node, 1.0 / nn AS r FROM deg, n)
        """
    ]
    for i in range(_ITERS):
        ctes.append(
            f"""
        pr{i + 1} AS (
            SELECT e.v AS node,
                   (1.0 - {_DAMP}) / (SELECT nn FROM n)
                   + {_DAMP} * sum(p.r / dg.d) AS r
            FROM pr{i} p
            JOIN edges e ON p.node = e.u
            JOIN deg dg ON dg.u = p.node
            GROUP BY e.v
        )
        """
        )
    return (
        "WITH "
        + _SQL_WIDE_MINS
        + ","
        + ",".join(ctes)
        + f"""
        SELECT p.node AS doc_id, CAST(dg.d AS BIGINT) AS degree,
               round(p.r, 6) AS pagerank
        FROM pr{_ITERS} p JOIN deg dg ON dg.u = p.node
        """
    )


@REG.add(
    "pagerank_near_dup",
    oracle=_sql_pagerank(),
    doc=f"PageRank ({_ITERS} iterations, damping {_DAMP}) over the undirected "
    "near-duplicate candidate graph from the production-width MinHash LSH "
    "band join — surfaces template/boilerplate hub documents for targeted "
    "downweighting. Every node in the edge list has degree >= 1, so there is "
    "no dangling mass; total rank is conserved. The rank vector is broadcast "
    "per iteration (O(near-dup nodes), tiny next to the corpus); the edge "
    "list is pinned once behind a checkpoint barrier.",
)
def pagerank_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sierradb_spark.functions.dedup_wide import _wide_candidates_pinned

    cand = _wide_candidates_pinned(spark, sf_dir)
    edges = (
        cand.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(
            cand.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
        .localCheckpoint(eager=True)  # pin: read 8 + 2 times below
    )
    deg = edges.groupBy("u").agg(F.count("*").alias("d"))
    # Carry the source degree on each edge; iterations sum r/d — the
    # SAME float expression the oracle sums (r * (1/d) differs from r/d
    # by an ulp for non-power-of-two degrees, and over 8 iterations that
    # drift is the kind of cross-engine divergence the sequential-fold
    # dot products elsewhere exist to prevent).
    ew = (
        edges.join(deg, "u")
        .select("u", "v", "d")
        .localCheckpoint(eager=True)
    )
    nn = float(deg.count())
    ranks = deg.select(F.col("u").alias("node"), F.lit(1.0 / nn).alias("r"))
    for _ in range(_ITERS):
        ranks = (
            ew.join(
                F.broadcast(ranks), ew["u"] == F.col("node")
            )
            .groupBy("v")
            .agg(
                (
                    F.lit((1.0 - _DAMP) / nn)
                    + F.lit(_DAMP) * F.sum(F.col("r") / F.col("d"))
                ).alias("r")
            )
            .select(F.col("v").alias("node"), "r")
        )
    return (
        ranks.join(deg, ranks["node"] == deg["u"])
        .select(
            F.col("node").alias("doc_id"),
            F.col("d").cast("long").alias("degree"),
            F.round("r", 6).alias("pagerank"),
        )
    )


@REG.add(
    "triangle_count_near_dup",
    oracle="WITH "
    + _SQL_WIDE_MINS
    + ","
    + _SQL_CAND
    + """,
        canduv AS (SELECT doc_a AS u, doc_b AS v FROM cand),
        und AS (
            SELECT u, v FROM canduv
            UNION ALL
            SELECT v AS u, u AS v FROM canduv
        ),
        deg AS (SELECT u, count(*) AS d FROM und GROUP BY u),
        tri AS (
            SELECT count(*) AS n_triangles
            FROM canduv e1
            JOIN canduv e2 ON e2.u = e1.v
            JOIN canduv e3 ON e3.u = e1.u AND e3.v = e2.v
        )
        SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
               CAST((SELECT count(*) FROM canduv) AS BIGINT) AS n_edges,
               CAST((SELECT n_triangles FROM tri) AS BIGINT) AS n_triangles,
               floor(3.0 * (SELECT n_triangles FROM tri)
                     / nullif((SELECT sum(d * (d - 1)) / 2 FROM deg), 0)
                     * 1e6 + 0.5) / 1e6 AS transitivity
    """,
    doc="Triangle count + global clustering coefficient (transitivity = "
    "3*triangles/wedges) over the production-width MinHash near-duplicate "
    "graph — distinguishes tight template cliques (high transitivity) "
    "from chain-like drift (low). The canonical ordered-edge triangle "
    "join: each edge stored once as (u < v), triangles enumerated "
    "u < v < w exactly once via two equi-joins — never an unordered "
    "N^3 enumeration; wedges are pure degree arithmetic.",
)
def triangle_count_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sierradb_spark.functions.dedup_wide import _wide_candidates_pinned

    cand = (
        _wide_candidates_pinned(spark, sf_dir)
        .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .localCheckpoint(eager=True)  # read 5 times below
    )
    und = cand.unionByName(
        cand.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count("*").alias("d"))
    e1, e2, e3 = cand.alias("e1"), cand.alias("e2"), cand.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    n_nodes = deg.agg(F.count("*").alias("n_nodes"))
    n_edges = cand.agg(F.count("*").alias("n_edges"))
    wedges = deg.agg((F.sum(F.col("d") * (F.col("d") - 1)) / 2).alias("w"))
    return (
        n_nodes.crossJoin(n_edges)
        .crossJoin(tri)
        .crossJoin(wedges)
        .select(
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_triangles").cast("long").alias("n_triangles"),
            (
                F.floor(
                    3.0
                    * F.col("n_triangles")
                    / F.nullif(F.col("w"), F.lit(0.0))
                    * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("transitivity"),
        )
    )


# ---------------------------------------------------------------------------
# Label-propagation communities
# ---------------------------------------------------------------------------

_LP_ITERS = 5


def _sql_label_prop() -> str:
    """Unrolled synchronous label propagation: each round every node
    takes the most frequent label among its neighbors (ties -> smallest
    label), which is deterministic — the classic LPA pathology (random
    tie-breaks) is removed so both engines converge identically."""
    ctes = [
        _SQL_CAND_EDGES
        + """,
        lp0 AS (SELECT DISTINCT u AS node, u AS label FROM edges)
        """
    ]
    for i in range(_LP_ITERS):
        ctes.append(
            f"""
        lp{i + 1} AS (
            SELECT node, label FROM (
                SELECT e.u AS node, l.label,
                       row_number() OVER (
                           PARTITION BY e.u
                           ORDER BY count(*) DESC, l.label) AS rn
                FROM edges e JOIN lp{i} l ON l.node = e.v
                GROUP BY e.u, l.label
            ) WHERE rn = 1
        )
        """
        )
    return (
        "WITH "
        + _SQL_WIDE_MINS
        + ","
        + ",".join(ctes)
        + f"""
        SELECT label AS community,
               CAST(count(*) AS BIGINT) AS n_members,
               CAST(min(node) AS BIGINT) AS min_member,
               CAST(max(node) AS BIGINT) AS max_member
        FROM lp{_LP_ITERS}
        GROUP BY label
        """
    )


@REG.add(
    "label_prop_communities",
    oracle=_sql_label_prop(),
    doc=f"Synchronous label-propagation community detection ({_LP_ITERS} "
    "rounds, most-frequent-neighbor label, deterministic min-label "
    "tie-break) over the production-width MinHash near-duplicate graph. "
    "Connected components answers reachability; LPA splits a component "
    "into densely-linked template families, which is the granularity "
    "boilerplate downweighting actually wants. Scale shape: each round "
    "is one broadcast join of the O(near-dup nodes) label vector onto "
    "the collision-scaled edge list plus one (node,label) aggregate; "
    "the fixed round count keeps the plan static and the oracle "
    "expressible as unrolled SQL.",
)
def label_prop_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sierradb_spark.functions.dedup_wide import _wide_candidates_pinned

    cand = _wide_candidates_pinned(spark, sf_dir)
    edges = (
        cand.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(
            cand.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
        .localCheckpoint(eager=True)  # read once per round + seed
    )
    labels = edges.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    # Deterministic argmax (count desc, label asc) as ONE long max:
    # m = c * 2^32 + (2^32-1 - label) ranks by count first, then by
    # SMALLEST label on ties — the identical winner the old
    # row_number()-over-(desc c, label) window picked, but as a plain
    # hash-aggregable max: partial aggregation before the exchange and
    # zero per-round Sort/Window of the (u, label, c) relation (r11; a
    # struct-valued max would fall back to SortAggregate). Exact long
    # arithmetic: labels are doc ids < 2^31 (the shared multiplicative-
    # hash precondition, functions/pipeline.py) and c <= degree < 2^31,
    # so m < 2^63 never overflows.
    _ENC = 1 << 32
    for _ in range(_LP_ITERS):
        labels = (
            edges.join(F.broadcast(labels), F.col("v") == F.col("node"))
            .groupBy("u", "label")
            .agg(F.count("*").alias("c"))
            .groupBy("u")
            .agg(
                F.max(
                    F.col("c") * _ENC + (_ENC - 1 - F.col("label"))
                ).alias("m")
            )
            .select(
                F.col("u").alias("node"),
                (_ENC - 1 - (F.col("m") % _ENC)).alias("label"),
            )
        )
    return labels.groupBy("label").agg(
        F.count("*").alias("n_members"),
        F.min("node").alias("min_member"),
        F.max("node").alias("max_member"),
    ).select(
        F.col("label").alias("community"),
        F.col("n_members").cast("long").alias("n_members"),
        F.col("min_member").cast("long").alias("min_member"),
        F.col("max_member").cast("long").alias("max_member"),
    )


# ---------------------------------------------------------------------------
# Local clustering structure + 2-hop reach
# ---------------------------------------------------------------------------


@REG.add(
    "local_clustering_histogram",
    oracle="WITH "
    + _SQL_WIDE_MINS
    + ","
    + _SQL_CAND
    + """,
        canduv AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM cand),
        und AS (
            SELECT u, v FROM canduv
            UNION ALL
            SELECT v AS u, u AS v FROM canduv
        ),
        deg AS (SELECT u AS node, count(*) AS d FROM und GROUP BY u),
        tri_nodes AS (
            SELECT unnest([e1.u, e1.v, e2.v]) AS node
            FROM canduv e1
            JOIN canduv e2 ON e2.u = e1.v
            JOIN canduv e3 ON e3.u = e1.u AND e3.v = e2.v
        ),
        tri AS (SELECT node, count(*) AS t FROM tri_nodes GROUP BY node),
        lcc AS (
            SELECT deg.node, deg.d,
                   CASE WHEN deg.d >= 2
                        THEN 2.0 * coalesce(tri.t, 0) / (deg.d * (deg.d - 1))
                        ELSE 0.0 END AS c
            FROM deg LEFT JOIN tri ON tri.node = deg.node
        )
        SELECT floor(c * 10) / 10 AS lcc_bucket,
               CAST(count(*) AS BIGINT) AS n_nodes,
               round(avg(CAST(d AS DOUBLE)), 4) AS avg_degree,
               round(avg(c), 4) AS avg_lcc
        FROM lcc GROUP BY floor(c * 10) / 10
    """,
    doc="Histogram of LOCAL clustering coefficients over the production-"
    "width MinHash near-duplicate graph: per node, the fraction of its "
    "neighbor pairs that are themselves connected (2*tri/(d*(d-1)); 0 "
    "for degree<2), bucketed to 0.1. Where triangle_count_near_dup "
    "gives the one-number global transitivity, this separates clique "
    "members (bucket 1.0 — exact-template families worth collapsing to "
    "one survivor) from bridge/chain nodes (bucket 0.0 — drift chains "
    "where transitive merging over-collapses). Per-node triangle counts "
    "come from exploding each ordered triangle (u<v<w, two equi-joins) "
    "to its 3 corners — never an N^3 enumeration; the bucket division "
    "is a single IEEE op on integer-valued doubles, bit-identical "
    "across engines.",
)
def local_clustering_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sierradb_spark.functions.dedup_wide import _wide_candidates_pinned

    cand = (
        _wide_candidates_pinned(spark, sf_dir)
        .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .localCheckpoint(eager=True)  # read 5 times below
    )
    und = cand.unionByName(
        cand.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = und.groupBy(F.col("u").alias("node")).agg(F.count("*").alias("d"))
    e1, e2, e3 = cand.alias("e1"), cand.alias("e2"), cand.alias("e3")
    corners = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u"))
            & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.explode(
                F.array(F.col("e1.u"), F.col("e1.v"), F.col("e2.v"))
            ).alias("node")
        )
    )
    tri = corners.groupBy("node").agg(F.count("*").alias("t"))
    c = F.when(
        F.col("d") >= 2,
        2.0 * F.coalesce(F.col("t"), F.lit(0)) / (F.col("d") * (F.col("d") - 1)),
    ).otherwise(F.lit(0.0))
    lcc = deg.join(tri, "node", "left").select("node", "d", c.alias("c"))
    return (
        lcc.groupBy((F.floor(F.col("c") * 10) / 10).alias("lcc_bucket"))
        .agg(
            F.count("*").alias("n_nodes"),
            F.round(F.avg(F.col("d").cast("double")), 4).alias("avg_degree"),
            F.round(F.avg("c"), 4).alias("avg_lcc"),
        )
    )


@REG.add(
    "two_hop_reach_topk",
    oracle="WITH "
    + _SQL_WIDE_MINS
    + ","
    + _SQL_CAND_EDGES
    + """,
        reach AS (
            SELECT DISTINCT e1.u, e2.v
            FROM edges e1 JOIN edges e2 ON e2.u = e1.v
            WHERE e2.v <> e1.u
            UNION
            SELECT u, v FROM edges
        ),
        deg AS (SELECT u, count(*) AS d FROM edges GROUP BY u),
        sz AS (SELECT u, count(*) AS n_within_2 FROM reach GROUP BY u)
        SELECT sz.u AS doc_id,
               CAST(deg.d AS BIGINT) AS degree,
               CAST(sz.n_within_2 AS BIGINT) AS n_within_2hops
        FROM sz JOIN deg ON deg.u = sz.u
        ORDER BY n_within_2hops DESC, doc_id ASC
        LIMIT 20
    """,
    doc="Top-20 documents by 2-hop reach over the near-duplicate graph: "
    "|{distinct nodes within <=2 hops}| (self excluded). Direct degree "
    "finds the template hub itself; 2-hop reach finds the hub whose "
    "NEIGHBORS are also hubs — the center of a template FAMILY, which "
    "is the unit a curation pass should inspect before bulk-dropping. "
    "One self-equi-join of the collision-bounded edge list + a distinct "
    "— candidate edges come from LSH banding, never N^2; top-k is "
    "TakeOrderedAndProject on the aggregated per-node counts.",
)
def two_hop_reach_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sierradb_spark.functions.dedup_wide import _wide_candidates_pinned

    cand = (
        _wide_candidates_pinned(spark, sf_dir)
        .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .localCheckpoint(eager=True)  # read 4 times below
    )
    edges = cand.unionByName(
        cand.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    e1, e2 = edges.alias("e1"), edges.alias("e2")
    two = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .where(F.col("e2.v") != F.col("e1.u"))
        .select(F.col("e1.u").alias("u"), F.col("e2.v").alias("v"))
    )
    reach = two.unionByName(edges.select("u", "v")).distinct()
    deg = edges.groupBy("u").agg(F.count("*").alias("d"))
    sz = reach.groupBy("u").agg(F.count("*").alias("n_within_2"))
    return (
        sz.join(deg, "u")
        .select(
            F.col("u").alias("doc_id"),
            F.col("d").cast("long").alias("degree"),
            F.col("n_within_2").cast("long").alias("n_within_2hops"),
        )
        .orderBy(F.col("n_within_2hops").desc(), F.col("doc_id").asc())
        .limit(20)
    )


_KCORE_K = 2
_KCORE_ROUNDS = 6


def _sql_kcore() -> str:
    ctes = [
        _SQL_CAND_EDGES
        + ",\n        e0 AS MATERIALIZED (SELECT u, v FROM edges)"
    ]
    for r in range(1, _KCORE_ROUNDS + 1):
        ctes.append(
            f"""
        d{r} AS (SELECT u, count(*) AS d FROM e{r - 1} GROUP BY u),
        k{r} AS (SELECT u FROM d{r} WHERE d >= {_KCORE_K}),
        e{r} AS (
            SELECT e.u, e.v FROM e{r - 1} e
            JOIN k{r} a ON e.u = a.u
            JOIN k{r} b ON e.v = b.u
        )
        """
        )
    return (
        "WITH "
        + _SQL_WIDE_MINS
        + ","
        + ",".join(ctes)
        + f"""
        SELECT u AS doc_id, CAST(count(*) AS BIGINT) AS core_degree
        FROM e{_KCORE_ROUNDS} GROUP BY u
        """
    )


@REG.add(
    "kcore_near_dup",
    oracle=_sql_kcore(),
    doc=f"{_KCORE_K}-core decomposition of the near-dup graph "
    f"({_KCORE_ROUNDS} peeling rounds, fixed like the PageRank unroll): "
    "iteratively drop nodes with degree below k and keep edges whose "
    "BOTH endpoints survive — what remains are the dense template "
    "cores, stripped of the chance-collision fringe that inflates "
    "component sizes. Each round is one degree aggregate + two semi-"
    "joins on node ids (edges come from the band join, never N^2); "
    "per-round checkpoints bound lineage exactly as the CC fixpoint "
    "does. The fixed round count keeps both engines on the identical "
    "subgraph even if the peel has not fully converged.",
)
def kcore_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sierradb_spark.functions.dedup_wide import _wide_candidates_pinned

    cand = _wide_candidates_pinned(spark, sf_dir)
    # Lazy per-round checkpoints (r11): each round's barrier still
    # truncates lineage (the DataFrame is a LogicalRDD immediately) and
    # still evaluates once (blocks cache on first access — the degree
    # aggregate and the semi-join of the SAME round share them), but
    # materialization happens inside the final action instead of one
    # standalone Spark job per round: 7 jobs -> 1, identical subgraph.
    edges = (
        cand.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(
            cand.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(_KCORE_ROUNDS):
        deg = edges.groupBy("u").agg(F.count("*").alias("d"))
        keep = deg.where(F.col("d") >= _KCORE_K).select("u")
        edges = (
            edges.join(keep, "u", "left_semi")
            .join(
                keep.select(F.col("u").alias("v")), "v", "left_semi"
            )
            .localCheckpoint(eager=False)
        )
    return edges.groupBy("u").agg(
        F.count("*").cast("bigint").alias("core_degree")
    ).select(F.col("u").alias("doc_id"), "core_degree")


@REG.add(
    "degree_assortativity",
    oracle="WITH "
    + _SQL_WIDE_MINS
    + ","
    + _SQL_CAND_EDGES
    + """,
        deg AS MATERIALIZED (SELECT u, count(*) AS d FROM edges GROUP BY u),
        de AS (
            SELECT du.d::DOUBLE AS dx, dv.d::DOUBLE AS dy
            FROM edges e
            JOIN deg du ON du.u = e.u
            JOIN deg dv ON dv.u = e.v
        )
        SELECT CAST(count(*) AS BIGINT) AS n_directed_edges,
               round(avg(dx), 4) AS mean_degree,
               round(corr(dx, dy), 6) AS assortativity
        FROM de
    """,
    doc="Degree assortativity of the near-dup graph: the Pearson "
    "correlation of endpoint degrees over the (symmetrized) edge list — "
    "positive means template hubs link to other hubs (one mega-family "
    "to dedup), negative means hub-and-spoke boilerplate radiating into "
    "singletons. Edges come from the band join (never N^2); the degree "
    "table joins back twice by node id and corr folds into one moment "
    "tuple map-side.",
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sierradb_spark.functions.dedup_wide import _wide_candidates_pinned

    cand = _wide_candidates_pinned(spark, sf_dir)
    edges = (
        cand.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(
            cand.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
        .localCheckpoint(eager=True)  # read 3x below (two deg joins + count)
    )
    deg = edges.groupBy("u").agg(F.count("*").alias("d"))
    du = deg.select(F.col("u").alias("ju"), F.col("d").alias("dx"))
    dv = deg.select(F.col("u").alias("jv"), F.col("d").alias("dy"))
    de = (
        edges.join(du, edges["u"] == du["ju"])
        .join(dv, edges["v"] == dv["jv"])
        .select(
            F.col("dx").cast("double").alias("dx"),
            F.col("dy").cast("double").alias("dy"),
        )
    )
    return de.agg(
        F.count("*").cast("bigint").alias("n_directed_edges"),
        F.round(F.avg("dx"), 4).alias("mean_degree"),
        F.round(F.corr("dx", "dy"), 6).alias("assortativity"),
    )
