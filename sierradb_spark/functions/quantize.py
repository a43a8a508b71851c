"""Scalar (int8-style) embedding quantization with a recall audit.

The standard ANN memory/IO lever: store each dimension as an 8-bit code
against per-dimension [min, max] corpus statistics (4x smaller than
float32, SIMD-friendly on real vector engines), search on dequantized
codes, and AUDIT the recall loss against the exact float ranking.

Scale shape (100 TB): the dimension-stats table is one aggregation over
the exploded corpus (64 rows out — broadcast), quantization is a
map-side join against it, and the recall audit is two top-k's. The
rounding rule is ``floor(x + 0.5)`` — identical in every engine, unlike
``round()`` whose half-breaking mode differs across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sierradb_spark.operators.base import Registry, load
from sierradb_spark.functions.similarity import _sql_cos

REG = Registry()

_LEVELS = 254  # codes 0..254 (8-bit)

# Shared oracle CTEs: exploded values -> per-dim stats -> dequantized codes.
_SQL_DEQUANT = f"""
        v AS (
            SELECT vec_id,
                   unnest(range(len(embedding))) AS i,
                   unnest(embedding::DOUBLE[]) AS x
            FROM embeddings
        ),
        st AS (
            SELECT i, min(x) AS mn, max(x) AS mx,
                   (max(x) - min(x)) / {_LEVELS} AS scale
            FROM v GROUP BY i
        ),
        dq AS (
            SELECT v.vec_id, v.i, v.x,
                   CASE WHEN st.scale = 0 THEN st.mn
                        ELSE st.mn + floor((v.x - st.mn) / st.scale + 0.5)
                             * st.scale
                   END AS d
            FROM v JOIN st USING (i)
        )
"""


@REG.add(
    "sq8_quantized_recall",
    oracle=f"""
        WITH {_SQL_DEQUANT},
        qd AS (SELECT i, d AS dquery FROM dq WHERE vec_id = 0),
        qcos AS (
            SELECT dq.vec_id,
                   sum(dq.d * qd.dquery)
                   / nullif(sqrt(sum(dq.d * dq.d))
                            * sqrt(sum(qd.dquery * qd.dquery)), 0) AS c
            FROM dq JOIN qd USING (i)
            WHERE dq.vec_id <> 0
            GROUP BY dq.vec_id
        ),
        topq AS (
            SELECT vec_id FROM qcos
            ORDER BY round(c, 4) DESC, vec_id ASC LIMIT 10
        ),
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        topx AS (
            SELECT e.vec_id FROM embeddings e, q
            WHERE e.vec_id <> 0
            ORDER BY round({_sql_cos('e.embedding', 'q.qv')}, 4) DESC,
                     e.vec_id ASC
            LIMIT 10
        )
        SELECT CAST((SELECT max(i) + 1 FROM st) AS INT) AS n_dims,
               CAST((SELECT count(*) FROM topq JOIN topx USING (vec_id))
                    AS BIGINT) AS overlap_at_10,
               round((SELECT avg(abs(d - x)) FROM dq), 6) AS mean_abs_err
    """,
    doc="Int8-style scalar quantization audit: per-dim [min,max] codes "
    "(0..254), cosine top-10 on DEQUANTIZED codes vs the exact float top-10, "
    "reporting the overlap and the mean absolute reconstruction error. "
    "overlap_at_10 == 10 on this corpus (asserted in pytest) — the 4x storage "
    "saving costs nothing here. Dim stats: one aggregation, 64 rows, "
    "broadcast back; everything else is map-side.",
)
def sq8_quantized_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "x"),
    )
    st = v.groupBy("i").agg(
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
        ((F.max("x") - F.min("x")) / _LEVELS).alias("scale"),
    )
    dq = v.join(F.broadcast(st), "i").select(
        "vec_id",
        "i",
        "x",
        F.when(F.col("scale") == 0, F.col("mn"))
        .otherwise(
            F.col("mn")
            + F.floor((F.col("x") - F.col("mn")) / F.col("scale") + 0.5)
            * F.col("scale")
        )
        .alias("d"),
    )
    # Pin the dequantized values: the query side, the corpus side, and
    # the error aggregate all read them; without the barrier the
    # explode+join would run three times.
    dq = dq.localCheckpoint(eager=False)
    qd = dq.where(F.col("vec_id") == 0).select(
        "i", F.col("d").alias("dquery")
    )
    qcos = (
        dq.where(F.col("vec_id") != 0)
        .join(F.broadcast(qd), "i")
        .groupBy("vec_id")
        .agg(
            (
                F.sum(F.col("d") * F.col("dquery"))
                / F.nullif(
                    F.sqrt(F.sum(F.col("d") * F.col("d")))
                    * F.sqrt(F.sum(F.col("dquery") * F.col("dquery"))),
                    F.lit(0.0),
                )
            ).alias("c")
        )
    )
    topq = (
        qcos.orderBy(F.round("c", 4).desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id")
    )
    from sierradb_spark.functions.similarity import cosine_col, _dvec

    q = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    topx = (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine_col(_dvec("embedding"), F.col("qv")), 4).alias("c"),
        )
        .orderBy(F.col("c").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id")
    )
    # From the pinned dq blocks — NOT st, whose subtree would re-run the
    # corpus explode+aggregate a second time.
    n_dims = dq.agg((F.max("i") + 1).cast("int").alias("n_dims"))
    overlap = topq.join(topx, "vec_id").agg(
        F.count("*").alias("overlap_at_10")
    )
    err = dq.agg(
        F.round(F.avg(F.abs(F.col("d") - F.col("x"))), 6).alias("mean_abs_err")
    )
    return n_dims.crossJoin(overlap).crossJoin(err)
