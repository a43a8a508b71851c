"""Lexical retrieval scoring over the documents table.

The RAG side of a training-data platform needs lexical retrieval next
to the vector path (functions/similarity.py): BM25 is the standard
first-stage ranker, and hybrid search fuses it with dense scores.
Everything here is built-in DataFrame algebra — term statistics are one
corpus aggregate folded to a single broadcastable row; per-document
scoring is a map with no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sierradb_spark.registry import Registry, load

REG = Registry()

# Fixed query-term set (present across the synthetic corpus) and the
# standard Lucene BM25 parameters.
BM25_TERMS = ("vector", "join", "scan")
BM25_K1 = 1.2
BM25_B = 0.75

_SQL_TF = {
    t: f"len(list_filter(toks, x -> lower(x) = '{t}'))" for t in BM25_TERMS
}


@REG.add(
    "bm25_top_docs",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN []
                        ELSE regexp_split_to_array(trim(text), '\\s+')
                   END AS toks
            FROM documents
        ),
        tf AS (
            SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
                   {", ".join(f"CAST({_SQL_TF[t]} AS DOUBLE) AS tf_{t}" for t in BM25_TERMS)}
            FROM tok
        ),
        stats AS (
            SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                   avg(dl) AS avgdl,
                   {", ".join(f"CAST(count(*) FILTER (WHERE tf_{t} > 0) AS DOUBLE) AS df_{t}" for t in BM25_TERMS)}
            FROM tf
        )
        SELECT f.doc_id,
               round(
                   {" + ".join(
                       f"ln((s.n_docs - s.df_{t} + 0.5) / (s.df_{t} + 0.5) + 1)"
                       f" * (f.tf_{t} * ({BM25_K1} + 1))"
                       f" / (f.tf_{t} + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * f.dl / s.avgdl))"
                       for t in BM25_TERMS
                   )},
                   6) AS bm25
        FROM tf f, stats s
        ORDER BY bm25 DESC, f.doc_id ASC
        LIMIT 15
    """,
    doc=f"BM25 retrieval (k1={BM25_K1}, b={BM25_B}, Lucene idf) for the "
    f"query terms {list(BM25_TERMS)}: top-15 documents by summed "
    "per-term score. Term statistics (N, avgdl, per-term df) are ONE "
    "corpus aggregate folded to a single row and broadcast back — the "
    "inverted-index-free shape that works at any corpus size because "
    "per-document scoring is then a pure map; the top-15 is "
    "TakeOrderedAndProject, never a global sort. The lexical sibling "
    "of the dense-vector top-k in functions/similarity.py.",
)
def bm25_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.when(
        F.length(F.trim("text")) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.col("text")), r"\s+"))
    tf_cols = [
        F.size(
            F.filter(F.col("toks"), lambda x: F.lower(x) == F.lit(t))
        )
        .cast("double")
        .alias(f"tf_{t}")
        for t in BM25_TERMS
    ]
    tf = d.select("doc_id", toks.alias("toks")).select(
        "doc_id", F.size("toks").cast("double").alias("dl"), *tf_cols
    )
    stats = tf.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.count(F.when(F.col(f"tf_{t}") > 0, 1))
            .cast("double")
            .alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )
    score = None
    for t in BM25_TERMS:
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{t}") + 0.5)
            / (F.col(f"df_{t}") + 0.5)
            + 1
        )
        term = (
            idf
            * (F.col(f"tf_{t}") * (BM25_K1 + 1))
            / (
                F.col(f"tf_{t}")
                + BM25_K1
                * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
            )
        )
        score = term if score is None else score + term
    return (
        tf.crossJoin(F.broadcast(stats))
        .select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(15)
    )
