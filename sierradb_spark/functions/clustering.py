"""K-means clustering over the embedding corpus (Lloyd's algorithm).

The clustering primitive behind IVF coarse quantizers, SemDeDup cell
assignment, and corpus topic balancing — here as a first-class operator
with deterministic initialization (centroids = the k lowest vec_ids)
and a FIXED iteration count, so the whole run is expressible as
unrolled SQL and value-oracle-checked like everything else.

Scale shape (100 TB): the canonical distributed k-means — centroids
live driver-side (k x dims doubles, trivially small) and are broadcast
into each assignment pass; each iteration is one crossJoin(broadcast) +
one aggregate over the corpus, nothing ever shuffles the embedding
table by key. Distances use the expanded form |a|^2 - 2ab + |b|^2 with
sequential-fold dot products (`F.aggregate` / `list_dot_product`), and
updated centroid coordinates are rounded to 9 decimals on both sides
(the mean is an order-dependent float sum; rounding re-pins the two
engines to identical centroids each round) — so the discrete
assignments feeding the oracle hash stay bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sierradb_spark.registry import Registry, load, spread
from sierradb_spark.functions.similarity import dot_col

REG = Registry()

_K = 8
_ITERS = 3  # assignment rounds (centroid updates between them: _ITERS - 1)


def _sql_kmeans() -> str:
    parts = [
        f"""
        v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        u AS (
            SELECT vec_id, unnest(range(len(emb))) AS i, unnest(emb) AS x
            FROM v
        ),
        c0 AS (SELECT vec_id AS cid, emb AS cent FROM v WHERE vec_id < {_K})
        """
    ]
    for t in range(1, _ITERS + 1):
        parts.append(
            f"""
        d{t} AS (
            SELECT v.vec_id, c.cid,
                   list_dot_product(v.emb, v.emb)
                   - 2 * list_dot_product(v.emb, c.cent)
                   + list_dot_product(c.cent, c.cent) AS dist
            FROM v, c{t - 1} c
        ),
        a{t} AS (
            SELECT vec_id, min(cid) AS cid, min(md) AS md
            FROM (
                SELECT vec_id, cid, dist,
                       min(dist) OVER (PARTITION BY vec_id) AS md
                FROM d{t}
            ) WHERE dist = md
            GROUP BY vec_id
        )
        """
        )
        if t < _ITERS:
            # round(mu, 9): the mean is an order-dependent float sum
            # (engines aggregate partials in different orders); rounding
            # the centroid coordinates pins both engines to IDENTICAL
            # centroids each round, so the sequential-fold distances —
            # and hence the discrete assignments — stay bit-identical.
            parts.append(
                f"""
        m{t} AS (
            SELECT a.cid, u.i, round(avg(u.x), 9) AS mu
            FROM a{t} a JOIN u USING (vec_id)
            GROUP BY a.cid, u.i
        ),
        c{t} AS (SELECT cid, list(mu ORDER BY i) AS cent FROM m{t} GROUP BY cid)
        """
            )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
        SELECT CAST(cid AS BIGINT) AS cluster_id,
               CAST(count(*) AS BIGINT) AS n_vectors,
               round(sum(md), 4) AS sse
        FROM a{_ITERS} GROUP BY cid
        """
    )


_KNN_K = 5
# Deterministic eval-query sample: accuracy is measured for vec_id <
# _KNN_EVAL_N (neighbors still come from the FULL corpus), so the eval
# cost scales linearly with corpus size instead of quadratically — the
# standard sampled-eval protocol. At the correctness gate's sf0.01 the
# sample covers every vector.
_KNN_EVAL_N = 500


@REG.add(
    "knn_label_accuracy",
    oracle=f"""
        WITH nv AS MATERIALIZED (
            SELECT vec_id, label,
                   list_transform(embedding::DOUBLE[],
                       x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                                      embedding::DOUBLE[])))
                       AS nd
            FROM embeddings
            WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
        ),
        p AS (
            SELECT a.vec_id AS va, a.label AS la, b.vec_id AS vb,
                   b.label AS lb,
                   round(list_dot_product(a.nd, b.nd), 6) AS c
            FROM nv a JOIN nv b ON a.vec_id <> b.vec_id
            WHERE a.vec_id < {_KNN_EVAL_N}
        ),
        nn AS (
            SELECT va, la, lb,
                   row_number() OVER (
                       PARTITION BY va ORDER BY c DESC, vb ASC
                   ) AS rk
            FROM p
        ),
        votes AS (
            SELECT va, la, lb, count(*) AS cnt
            FROM nn WHERE rk <= {_KNN_K}
            GROUP BY va, la, lb
        ),
        pred AS (
            SELECT va, la, min(lb) AS pred
            FROM (
                SELECT va, la, lb, cnt,
                       max(cnt) OVER (PARTITION BY va) AS mc
                FROM votes
            ) WHERE cnt = mc
            GROUP BY va, la
        )
        SELECT la AS label,
               CAST(count(*) AS BIGINT) AS n_vectors,
               CAST(count(*) FILTER (WHERE pred = la) AS BIGINT) AS n_correct
        FROM pred GROUP BY la
    """,
    doc=f"Leave-one-out {_KNN_K}-NN label classification accuracy per label — "
    "the standard embedding-quality eval (are same-label vectors actually "
    "neighbors?). Majority vote over the top-k by cosine (rounded, vec_id "
    "tiebreak; vote ties break to the smallest label — deterministic in both "
    "engines). Accuracy is measured on a deterministic query sample "
    f"(vec_id < {_KNN_EVAL_N}) against the FULL corpus as neighbor pool, so "
    "cost is sample x corpus, not corpus^2; the production candidate source "
    "is the IVF/LSH operators in similarity.py.",
)
def knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("emb")
    )
    # Normalize BEFORE the pair join: higher-order functions run
    # interpreted (outside codegen), so the per-pair work must be ONE
    # sequential fold (the dot product), not three — norms are a
    # per-vector cost, corpus-sized, not pair-count-sized. Zero-norm
    # vectors have no cosine direction and are excluded on both sides.
    n2 = dot_col(F.col("emb"), F.col("emb"))
    nv = (
        e.withColumn("n2", n2)
        .where(F.col("n2") > 0)
        .select(
            "vec_id",
            "label",
            F.transform(
                F.col("emb"), lambda x: x / F.sqrt(F.col("n2"))
            ).alias("nd"),
        )
        .localCheckpoint(eager=False)  # normalize once, not per pair side
    )
    # spread the eval sample: the neighbor pool broadcasts, so the whole
    # sample x corpus dot-product loop runs on a's partitions — which
    # inherit the checkpointed scan's single input split otherwise (see
    # registry.spread)
    a = spread(nv.where(F.col("vec_id") < _KNN_EVAL_N), "vec_id").select(
        F.col("vec_id").alias("va"),
        F.col("label").alias("la"),
        F.col("nd").alias("nda"),
    )
    b = nv.select(
        F.col("vec_id").alias("vb"),
        F.col("label").alias("lb"),
        F.col("nd").alias("ndb"),
    )
    cos = F.round(dot_col(F.col("nda"), F.col("ndb")), 6)
    p = a.join(b, F.col("va") != F.col("vb")).select(
        "va", "la", "vb", "lb", cos.alias("c")
    )
    rk = F.row_number().over(
        Window.partitionBy("va").orderBy(F.col("c").desc(), F.col("vb").asc())
    )
    votes = (
        p.withColumn("rk", rk)
        .where(F.col("rk") <= _KNN_K)
        .groupBy("va", "la", "lb")
        .agg(F.count("*").alias("cnt"))
    )
    mc = F.max("cnt").over(Window.partitionBy("va"))
    pred = (
        votes.withColumn("mc", mc)
        .where(F.col("cnt") == F.col("mc"))
        .groupBy("va", "la")
        .agg(F.min("lb").alias("pred"))
    )
    return pred.groupBy(F.col("la").alias("label")).agg(
        F.count("*").alias("n_vectors"),
        F.count(F.when(F.col("pred") == F.col("la"), 1)).alias("n_correct"),
    )


@REG.add(
    "kmeans_embedding_clusters",
    oracle=_sql_kmeans(),
    doc=f"Lloyd's k-means (k={_K}, {_ITERS} assignment rounds, deterministic "
    "init from the lowest vec_ids) over the embedding corpus — the coarse-"
    "quantizer/cell-assignment primitive IVF and SemDeDup build on. Centroids "
    "are collected driver-side between rounds (k x dims doubles) and re-"
    "broadcast, exactly how production distributed k-means works; each round "
    "is one broadcast crossJoin + one aggregate, never a corpus shuffle. "
    "Reports per-cluster sizes and within-cluster SSE.",
)
def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ).localCheckpoint(eager=False)  # read once per round, not rebuilt
    cent_rows = [
        (int(r["vec_id"]), list(r["emb"]))
        for r in v.where(F.col("vec_id") < _K).collect()
    ]
    def assign(centers):
        """MAP-ONLY assignment: the k centroids are broadcast literals,
        so the per-vector argmin is an array_min over (dist, cid)
        structs — struct ordering is (dist asc, cid asc), the exact
        min-distance / min-cid tiebreak — inside one projection. The
        old form shuffled the V x K relation twice per round (window
        partitioned by vec_id, then a re-join with v for the means);
        at cluster scale assignment now touches no exchange at all and
        each round's only shuffle is the centroid-mean reduce. The
        Python-side center self-dot is the same sequential left fold
        as dot_col, so the doubles are bit-identical.

        Built as ONE SQL string (r11): the k x dim centroid literals
        plus 2k dot folds cost ~1 ms of py4j per node to construct as
        Columns — ~1 s per round before any data moved; sql_dot/sql_arr
        compile to the identical Catalyst expressions (same folds, same
        literal bits — see similarity.sql_dlit) through a single
        F.expr call. The per-vector self dot stays inside each struct
        exactly as before, so dist arithmetic order is unchanged."""
        from sierradb_spark.functions.similarity import sql_arr, sql_dot

        entries = []
        ee = sql_dot("emb", "emb")
        for cid, cent in centers:
            dist = (
                f"{ee} - 2 * {sql_dot('emb', sql_arr(cent))}"
                f" + {float(sum(x * x for x in cent))!r}D"
            )
            entries.append(f"named_struct('md', {dist}, 'cid', {int(cid)})")
        best = F.expr(f"array_min(array({', '.join(entries)}))")
        return v.select(
            "vec_id", "emb", best["cid"].alias("cid"), best["md"].alias("md")
        )

    assigned = None
    for t in range(_ITERS):
        assigned = assign(cent_rows)
        if t < _ITERS - 1:
            means = (
                assigned.select("cid", F.posexplode("emb").alias("i", "x"))
                .groupBy("cid", "i")
                # round: see the oracle's m{t} comment — pins centroids
                # identically across engines despite summation order.
                .agg(F.round(F.avg("x"), 9).alias("mu"))
                .groupBy("cid")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("i", "mu"))),
                        lambda s: s["mu"],
                    ).alias("cent")
                )
            )
            cent_rows = [
                (int(r["cid"]), list(r["cent"])) for r in means.collect()
            ]
    return assigned.groupBy("cid").agg(
        F.count("*").alias("n_vectors"),
        F.round(F.sum("md"), 4).alias("sse"),
    ).select(
        F.col("cid").cast("long").alias("cluster_id"), "n_vectors", "sse"
    )
