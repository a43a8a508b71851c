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

# Shared oracle CTEs (tok -> tf -> stats) and the per-document score
# expression — reused verbatim by the RRF fusion oracle below so both
# rank on the identical rounded score.
_SQL_BM25_CTES = f"""
        tok AS (
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
"""

_SQL_BM25_SCORE = "round(" + " + ".join(
    f"ln((s.n_docs - s.df_{t} + 0.5) / (s.df_{t} + 0.5) + 1)"
    f" * (f.tf_{t} * ({BM25_K1} + 1))"
    f" / (f.tf_{t} + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * f.dl / s.avgdl))"
    for t in BM25_TERMS
) + ", 6)"


@REG.add(
    "bm25_top_docs",
    oracle=f"""
        WITH {_SQL_BM25_CTES}
        SELECT f.doc_id,
               {_SQL_BM25_SCORE} AS bm25
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
    return (
        _bm25_scores(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(15)
    )


def _bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document rounded BM25 score (doc_id, bm25) for BM25_TERMS."""
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
    return tf.crossJoin(F.broadcast(stats)).select(
        "doc_id", F.round(score, 6).alias("bm25")
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion: BM25 x dense cosine
# ---------------------------------------------------------------------------

RRF_K = 60  # the standard fusion constant (Cormack et al. 2009)
RRF_LIST_N = 20  # depth of each per-system ranked list
RRF_TOP = 10


def _rank_within(top: DataFrame, score: str, asc_tiebreak: str) -> DataFrame:
    """Rank a small (<= RRF_LIST_N rows) ranked list WITHOUT a global
    window: rank(d) = 1 + |rows strictly ahead of d|, via a broadcast
    theta self-join over the k-row list. Keeps the plan free of
    partitionless WindowExec at any corpus size (the list is already
    top-k bounded)."""
    a, b = top.alias("a"), top.alias("b")
    ahead = (F.col(f"b.{score}") > F.col(f"a.{score}")) | (
        (F.col(f"b.{score}") == F.col(f"a.{score}"))
        & (F.col(f"b.{asc_tiebreak}") < F.col(f"a.{asc_tiebreak}"))
    )
    return (
        a.join(F.broadcast(b), ahead, "left")
        .groupBy(F.col(f"a.{asc_tiebreak}").alias("doc_id"))
        .agg((F.count(F.col(f"b.{asc_tiebreak}")) + 1).cast("int").alias("rank"))
    )


@REG.add(
    "rrf_hybrid_topk",
    oracle=f"""
        WITH {_SQL_BM25_CTES},
        lex AS (
            SELECT f.doc_id, {_SQL_BM25_SCORE} AS bm25
            FROM tf f, stats s WHERE f.doc_id <> 0
        ),
        lexr AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
            FROM lex QUALIFY r <= {RRF_LIST_N}
        ),
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        den AS (
            SELECT e.vec_id AS doc_id,
                   round(list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[])
                         / nullif(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                                  * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])), 0),
                         4) AS cosine
            FROM embeddings e, q WHERE e.vec_id <> 0
        ),
        denr AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY cosine DESC, doc_id) AS r
            FROM den QUALIFY r <= {RRF_LIST_N}
        )
        SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
               CAST(l.r AS INT) AS lex_rank,
               CAST(d.r AS INT) AS dense_rank,
               round(coalesce(CAST(1 AS DOUBLE) / ({RRF_K} + l.r), 0)
                     + coalesce(CAST(1 AS DOUBLE) / ({RRF_K} + d.r), 0),
                     6) AS rrf
        FROM lexr l FULL OUTER JOIN denr d ON l.doc_id = d.doc_id
        ORDER BY rrf DESC, doc_id ASC
        LIMIT {RRF_TOP}
    """,
    doc=f"Hybrid retrieval via reciprocal-rank fusion (k={RRF_K}): the "
    f"BM25 list for {list(BM25_TERMS)} and the dense cosine list for "
    "the pinned query embedding (vec_id 0, excluded from both lists) "
    f"are each cut to their top-{RRF_LIST_N}, then fused by "
    "sum(1/(k+rank)) and re-cut to the final top-10. Both per-system "
    "lists are TakeOrderedAndProject; ranking within each k-row list "
    "is a broadcast theta-join (1 + |rows ahead|), NOT a partitionless "
    "window, so the plan stays bounded at any corpus size. The fusion "
    "join touches 2k rows total.",
)
def rrf_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sierradb_spark.functions.similarity import _dvec, cosine_col

    lex_top = (
        _bm25_scores(spark, sf_dir)
        .where(F.col("doc_id") != 0)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(RRF_LIST_N)
        .localCheckpoint(eager=True)  # both sides of the rank self-join
    )
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    den_top = (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine_col(_dvec("embedding"), F.col("qv")), 4).alias(
                "cosine"
            ),
        )
        .orderBy(F.col("cosine").desc(), F.col("doc_id").asc())
        .limit(RRF_LIST_N)
        .localCheckpoint(eager=True)
    )
    lexr = _rank_within(lex_top, "bm25", "doc_id").withColumnRenamed(
        "rank", "lex_rank"
    )
    denr = _rank_within(den_top, "cosine", "doc_id").withColumnRenamed(
        "rank", "dense_rank"
    )
    rrf = F.round(
        F.coalesce(F.lit(1.0) / (RRF_K + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (RRF_K + F.col("dense_rank")), F.lit(0.0)),
        6,
    )
    return (
        lexr.join(denr, "doc_id", "full_outer")
        .select("doc_id", "lex_rank", "dense_rank", rrf.alias("rrf"))
        .orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
        .limit(RRF_TOP)
    )


# ---------------------------------------------------------------------------
# IR ranking metrics: how good is the cheap ranking, in ranking terms?
# ---------------------------------------------------------------------------

# Queries are the vectors with vec_id < _RQ_N_QUERIES; the "system"
# ranking scores on the first _RQ_PREFIX dims only (the Matryoshka
# coarse stage); ground truth is the full-dim exact cosine top-10.
_RQ_N_QUERIES = 5
_RQ_PREFIX = 16
_RQ_K = 10
# Binary-gain ideal DCG at cutoff 10: sum_{i=1..10} 1/log2(i+1),
# computed once in Python and embedded as the SAME literal in both
# engines so the normalization is bit-identical.
_RQ_IDCG = 4.543559338088346


@REG.add(
    "retrieval_rank_quality",
    oracle=f"""
        WITH v AS MATERIALIZED (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        q AS MATERIALIZED (
            SELECT vec_id AS qid, emb AS qv FROM v
            WHERE vec_id < {_RQ_N_QUERIES}
        ),
        p AS MATERIALIZED (
            SELECT q.qid, v.vec_id,
                   round(list_dot_product(v.emb, q.qv)
                         / nullif(sqrt(list_dot_product(v.emb, v.emb))
                                  * sqrt(list_dot_product(q.qv, q.qv)), 0),
                         4) AS c_full,
                   round(list_dot_product(v.emb[1:{_RQ_PREFIX}],
                                          q.qv[1:{_RQ_PREFIX}])
                         / nullif(sqrt(list_dot_product(v.emb[1:{_RQ_PREFIX}],
                                                        v.emb[1:{_RQ_PREFIX}]))
                                  * sqrt(list_dot_product(q.qv[1:{_RQ_PREFIX}],
                                                          q.qv[1:{_RQ_PREFIX}])),
                                  0),
                         4) AS c_16
            FROM v, q WHERE v.vec_id <> q.qid
        ),
        r AS (
            SELECT qid, vec_id,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY c_full DESC, vec_id ASC)
                       AS rk_full,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY c_16 DESC, vec_id ASC)
                       AS rk_16
            FROM p
        )
        SELECT CAST(qid AS BIGINT) AS query_id,
               round(count(*) FILTER (WHERE rk_full <= {_RQ_K}
                                        AND rk_16 <= {_RQ_K})
                     / {float(_RQ_K)}, 6) AS recall_at_10,
               round(coalesce(
                   1.0 / min(rk_16) FILTER (WHERE rk_full <= {_RQ_K}
                                              AND rk_16 <= {_RQ_K}),
                   0.0), 6) AS mrr_at_10,
               round(coalesce(
                   sum(1.0 / log2(rk_16 + 1))
                       FILTER (WHERE rk_full <= {_RQ_K}
                                 AND rk_16 <= {_RQ_K}),
                   0.0) / {_RQ_IDCG!r}, 6) AS ndcg_at_10
        FROM r GROUP BY qid
    """,
    doc=f"IR ranking-quality audit: recall@10, MRR@10, and binary-gain "
    f"nDCG@10 of the {_RQ_PREFIX}-dim Matryoshka-prefix cosine ranking "
    f"against the full-dim exact top-10, per query ({_RQ_N_QUERIES} "
    "pinned query vectors). Overlap (recall) says WHETHER the cheap "
    "stage finds the right documents; MRR/nDCG say WHERE it puts them "
    "— the numbers that decide if a coarse stage can serve results "
    "directly or only feed a reranker. One pass computes both cosines "
    "per (query, candidate); the two rankings are windows over the "
    "SAME query-id partitioning (one exchange, reused). At corpus "
    "scale the exact ground-truth side caps to these sampled queries — "
    "the audit is O(queries x corpus), never corpus^2.",
)
def retrieval_rank_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from sierradb_spark.functions.similarity import _dvec, cosine_col

    v = load(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec("embedding").alias("emb")
    )
    q = v.where(F.col("vec_id") < _RQ_N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("qv")
    )
    emb16 = F.slice(F.col("emb"), 1, _RQ_PREFIX)
    qv16 = F.slice(F.col("qv"), 1, _RQ_PREFIX)
    pairs = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine_col(F.col("emb"), F.col("qv")), 4).alias("c_full"),
            F.round(cosine_col(emb16, qv16), 4).alias("c_16"),
        )
    )
    wf = W.partitionBy("qid").orderBy(F.col("c_full").desc(), F.col("vec_id").asc())
    w16 = W.partitionBy("qid").orderBy(F.col("c_16").desc(), F.col("vec_id").asc())
    ranked = pairs.select(
        "qid",
        F.row_number().over(wf).alias("rk_full"),
        F.row_number().over(w16).alias("rk_16"),
    )
    hit = (F.col("rk_full") <= _RQ_K) & (F.col("rk_16") <= _RQ_K)
    return ranked.groupBy(F.col("qid").alias("query_id")).agg(
        F.round(
            F.count(F.when(hit, 1)) / F.lit(float(_RQ_K)), 6
        ).alias("recall_at_10"),
        F.round(
            F.coalesce(
                F.lit(1.0) / F.min(F.when(hit, F.col("rk_16"))), F.lit(0.0)
            ),
            6,
        ).alias("mrr_at_10"),
        F.round(
            F.coalesce(
                F.sum(F.when(hit, F.lit(1.0) / F.log2(F.col("rk_16") + 1))),
                F.lit(0.0),
            )
            / F.lit(_RQ_IDCG),
            6,
        ).alias("ndcg_at_10"),
    )


# ---------------------------------------------------------------------------
# MMR diversity reranking
# ---------------------------------------------------------------------------

_MMR_POOL = 12
_MMR_K = 5
_MMR_LAMBDA = 0.7


def _mmr_cos(a: str, b: str) -> str:
    dot = f"list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"
    na = f"sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[]))"
    nb = f"sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[]))"
    return f"({dot} / nullif({na} * {nb}, 0))"


def _mmr_sql() -> str:
    parts = [
        f"""
        cand AS (
            SELECT e.vec_id, round({_mmr_cos('e.embedding', 'q.qv')}, 6)
                       AS rel,
                   e.embedding
            FROM embeddings e,
                 (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
            WHERE e.vec_id <> 0
            ORDER BY rel DESC, e.vec_id ASC LIMIT {_MMR_POOL}
        ),
        sims AS (
            SELECT a.vec_id AS va, b.vec_id AS vb,
                   round({_mmr_cos('a.embedding', 'b.embedding')}, 6) AS s
            FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
        ),
        m0 AS (
            SELECT vec_id, rel, rel AS mmr FROM cand
            ORDER BY rel DESC, vec_id ASC LIMIT 1
        )
        """
    ]
    for j in range(1, _MMR_K):
        sel = " UNION ALL ".join(
            f"SELECT vec_id FROM m{i}" for i in range(j)
        )
        parts.append(
            f"""
        m{j} AS (
            SELECT c.vec_id, c.rel,
                   {_MMR_LAMBDA} * c.rel - {round(1 - _MMR_LAMBDA, 10)}
                       * max(s.s) AS mmr
            FROM cand c JOIN sims s ON s.va = c.vec_id
            WHERE s.vb IN ({sel}) AND c.vec_id NOT IN ({sel})
            GROUP BY c.vec_id, c.rel
            ORDER BY mmr DESC, c.vec_id ASC LIMIT 1
        )
        """
        )
    final = " UNION ALL ".join(
        f"SELECT {j} AS sel_order, CAST(vec_id AS BIGINT) AS vec_id, rel,"
        f" round(mmr, 6) AS mmr FROM m{j}"
        for j in range(_MMR_K)
    )
    return "WITH " + ",".join(parts) + final


@REG.add(
    "mmr_diverse_rerank",
    oracle=_mmr_sql(),
    doc=f"Maximal-marginal-relevance reranking (lambda={_MMR_LAMBDA}): the "
    f"top-{_MMR_POOL} cosine candidates for query vec 0 are greedily "
    f"reranked to {_MMR_K} picks maximizing lambda*relevance - "
    "(1-lambda)*max-similarity-to-already-picked — the diversity pass a "
    "RAG stack runs after retrieval to stop near-duplicate passages "
    "crowding the context. The candidate pool comes from ONE distributed "
    "top-k scan (TakeOrderedAndProject); the greedy runs driver-side "
    "over the O(pool^2) rounded similarity matrix (144 numbers — bounded "
    "regardless of corpus size). All scores rounded to 6 dp before "
    "comparison so both engines pick identical chains; oracle = the "
    "greedy unrolled as chained 1-row CTEs.",
)
def mmr_diverse_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from sierradb_spark.functions.similarity import _dvec, cosine_col

    e = load(spark, sf_dir, "embeddings")
    qrow = e.where(F.col("vec_id") == 0).select("embedding").head()
    q = F.array(*[F.lit(float(x)) for x in qrow[0]])
    pool = (
        e.where(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.round(cosine_col(_dvec("embedding"), q), 6).alias("rel"),
            "embedding",
        )
        .orderBy(F.col("rel").desc(), F.col("vec_id").asc())
        .limit(_MMR_POOL)
        .collect()
    )

    def _r6(x: float) -> float:
        return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6

    def _cos(a, b) -> float:
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += float(x) * float(y)
            na += float(x) * float(x)
            nb += float(y) * float(y)
        denom = math.sqrt(na) * math.sqrt(nb)
        return _r6(dot / denom) if denom else 0.0

    cand = [(int(r["vec_id"]), float(r["rel"]), r["embedding"]) for r in pool]
    sims = {
        (a[0], b[0]): _cos(a[2], b[2])
        for a in cand
        for b in cand
        if a[0] != b[0]
    }
    picked: list[tuple[int, int, float, float]] = []
    chosen: list[int] = []
    for j in range(_MMR_K):
        best = None
        for cid, rel, _ in cand:
            if cid in chosen:
                continue
            if j == 0:
                score = rel
            else:
                score = _MMR_LAMBDA * rel - (1 - _MMR_LAMBDA) * max(
                    sims[(cid, s)] for s in chosen
                )
            if best is None or score > best[0] or (
                score == best[0] and cid < best[1]
            ):
                best = (score, cid, rel)
        picked.append((j, best[1], best[2], _r6(best[0])))
        chosen.append(best[1])
    return spark.createDataFrame(
        picked, "sel_order int, vec_id bigint, rel double, mmr double"
    )
