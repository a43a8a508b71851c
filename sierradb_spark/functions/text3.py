"""Corpus keyword / n-gram-LM / chunking operators (round-4 extensions).

Three more text stages every pretraining-data funnel runs:

- TF-IDF keyword extraction — the classic relevance weighting for
  corpus inspection and topic-mixture audits;
- a bigram language model scored over the corpus itself — one notch
  above the unigram surprisal in ``text2.py`` on the cheap-perplexity
  ladder (KenLM stand-in);
- fixed-stride token chunking — the RAG/window-packing primitive that
  turns documents into overlapping retrieval units.

Scale shape (100 TB): every operator is explode → aggregate → join on
token/bigram keys with map-side partial combine; model tables (vocab,
bigram counts, dim stats) are the small side and broadcast. No Python
in any loop; slicing/hashing are whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sierradb_spark.registry import Registry, load
from sierradb_spark.functions.text2 import _SQL_WORDS, _toks

from sierradb_spark.functions.text import (
    BPE_PATTERN,
    STOPWORDS,
    _SQL_WINNOW_CTES,
    winnow_fps_df,
)

REG = Registry()

# Stop-fingerprint cap: a fingerprint shared by more documents than this
# is boilerplate (license headers, navigation chrome) and is excluded
# from pair generation — the standard guard that keeps the fingerprint
# self-join collision-scaled instead of quadratic on common shingles.
_FP_MAX_DOCS = 10
_FP_MIN_SHARED = 5


@REG.add(
    "winnow_near_dup_pairs",
    oracle=f"""
        WITH {_SQL_WINNOW_CTES},
        fp AS (SELECT doc_id, unnest(fps) AS fp FROM w),
        rare AS (
            SELECT fp FROM fp GROUP BY fp
            HAVING count(*) <= {_FP_MAX_DOCS}
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM fp a
        JOIN rare r ON a.fp = r.fp
        JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING count(*) >= {_FP_MIN_SHARED}
    """,
    doc="Near-dup pairs by shared winnowing fingerprints — the third dedup "
    "modality next to MinHash and SimHash, and the one that catches PARTIAL "
    "overlap (a copied section inside an otherwise-different document), which "
    "whole-document sketches dilute away. Fingerprints shared by more than "
    f"{_FP_MAX_DOCS} documents are dropped as boilerplate before the "
    "self-join, so pair generation is collision-scaled (equi-join on the "
    f"fingerprint key), never N^2; pairs need >= {_FP_MIN_SHARED} shared "
    "prints to surface.",
)
def winnow_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    fps = winnow_fps_df(spark, sf_dir)
    fp = fps.select("doc_id", F.explode("fps").alias("fp"))
    rare = (
        fp.groupBy("fp")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") <= _FP_MAX_DOCS)
        .select("fp")
    )
    fp = fp.join(rare, "fp")
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= _FP_MIN_SHARED)
    )


@REG.add(
    "tfidf_top_terms",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, source, unnest({_SQL_WORDS}) AS word
            FROM documents
        ),
        tf AS (
            SELECT doc_id, source, word, count(*) AS c
            FROM w GROUP BY doc_id, source, word
        ),
        dfreq AS (
            SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY word
        ),
        n AS (SELECT count(*)::DOUBLE AS nd FROM documents),
        scored AS (
            SELECT tf.source, tf.word,
                   sum(tf.c * (ln((n.nd + 1.0) / (dfreq.df + 1.0)) + 1.0))
                       AS tfidf
            FROM tf JOIN dfreq USING (word), n
            GROUP BY tf.source, tf.word
        ),
        ranked AS (
            SELECT source, word, round(tfidf, 4) AS tfidf,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY round(tfidf, 4) DESC, word ASC
                   ) AS rk
            FROM scored
        )
        SELECT source, word, tfidf, CAST(rk AS INT) AS rk
        FROM ranked WHERE rk <= 5
    """,
    doc="Top-5 TF-IDF terms per source — the corpus-inspection keyword pass. "
    "One tf aggregation, one document-frequency aggregation (broadcast back: "
    "vocab-sized), one per-source rollup, then a per-source top-k window. "
    "Ranking is on the ROUNDED score with a word tiebreak → engine-stable.",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = d.select("doc_id", "source", F.explode(_toks()).alias("word"))
    tf = w.groupBy("doc_id", "source", "word").agg(F.count("*").alias("c"))
    dfreq = w.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    nd = d.agg(F.count("*").cast("double").alias("nd"))
    scored = (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(nd))
        .groupBy("source", "word")
        .agg(
            F.sum(
                F.col("c")
                * (F.log((F.col("nd") + 1.0) / (F.col("df") + 1.0)) + 1.0)
            ).alias("tfidf")
        )
        .select("source", "word", F.round("tfidf", 4).alias("tfidf"))
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.col("tfidf").desc(), F.col("word").asc()
        )
    )
    return (
        scored.withColumn("rk", rk.cast("int"))
        .where(F.col("rk") <= 5)
        .select("source", "word", "tfidf", "rk")
    )


@REG.add(
    "bigram_surprisal_scores",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang, {_SQL_WORDS} AS toks FROM documents
        ),
        bg AS (
            SELECT doc_id, lang,
                   unnest(toks[1:len(toks) - 1]) AS w1,
                   unnest(toks[2:len(toks)]) AS w2
            FROM t WHERE len(toks) >= 2
        ),
        c1 AS (SELECT w1 AS word, count(*) AS c FROM bg GROUP BY w1),
        c12 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2),
        v AS (
            SELECT count(DISTINCT word)::DOUBLE AS vocab
            FROM (SELECT unnest({_SQL_WORDS}) AS word FROM documents)
        ),
        s AS (
            SELECT bg.doc_id, bg.lang,
                   count(*) AS n_bigrams,
                   avg(-log2((c12.c + 1.0) / (c1.c + v.vocab))) AS sur
            FROM bg
            JOIN c12 USING (w1, w2)
            JOIN c1 ON bg.w1 = c1.word, v
            GROUP BY bg.doc_id, bg.lang
        )
        SELECT doc_id, lang, CAST(n_bigrams AS BIGINT) AS n_bigrams,
               round(sur, 4) AS avg_surprisal
        FROM s
    """,
    doc="Per-document surprisal under an add-one-smoothed BIGRAM LM trained on "
    "the corpus — the next rung above text2's unigram model on the cheap-"
    "perplexity ladder (word-order-violating text now scores high too). "
    "Bigrams come from zipping two array slices (no self-join); the count "
    "tables are token-keyed aggregates joined back with partial combine. "
    "Documents with <2 tokens have no bigrams and drop out, matching SQL "
    "inner-join semantics.",
)
def bigram_surprisal_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", _toks().alias("toks"))
    n = F.size("toks")
    bg = (
        t.where(n >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("toks"), 1, n - 1).alias("w1"),
                    F.slice(F.col("toks"), 2, n - 1).alias("w2"),
                )
            ).alias("p"),
        )
        .select("doc_id", "lang", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    vocab = (
        d.select(F.explode(_toks()).alias("word"))
        .agg(F.countDistinct("word").cast("double").alias("vocab"))
    )
    return (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.avg(
                    -F.log2((F.col("c12") + 1.0) / (F.col("c1") + F.col("vocab")))
                ),
                4,
            ).alias("avg_surprisal"),
        )
    )


# Chunking parameters: 32-token windows, stride 24 (25% overlap) — the
# common RAG retrieval-unit shape. Shared between both engines.
_CHUNK_W, _CHUNK_S = 32, 24


@REG.add(
    "doc_chunk_index",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_SQL_WORDS} AS toks FROM documents
        ),
        c AS (
            SELECT doc_id, len(toks) AS n_tokens,
                   unnest(range(0, (len(toks) - 1) // {_CHUNK_S} + 1))
                       AS chunk_idx
            FROM t WHERE len(toks) >= 1
        )
        SELECT c.doc_id, CAST(c.chunk_idx AS INT) AS chunk_idx,
               CAST(least({_CHUNK_W}, c.n_tokens - c.chunk_idx * {_CHUNK_S})
                    AS INT) AS chunk_tokens,
               md5(array_to_string(
                   t.toks[c.chunk_idx * {_CHUNK_S} + 1 :
                          c.chunk_idx * {_CHUNK_S} + {_CHUNK_W}], ' '))
                   AS chunk_hash
        FROM c JOIN t USING (doc_id)
    """,
    doc="Fixed-stride token chunk index (32-token windows, stride 24) — the "
    "RAG primitive that turns documents into overlapping retrieval units. "
    "Chunk enumeration is sequence+explode on the already-tokenized row (no "
    "join, no shuffle: each document expands locally); the md5 chunk hash is "
    "the dedup/lookup key downstream chunk-level dedup joins on.",
)
def doc_chunk_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", _toks().alias("toks"))
    n = F.size("toks")
    c = t.where(n >= 1).select(
        "doc_id",
        "toks",
        n.alias("n_tokens"),
        F.explode(
            F.sequence(F.lit(0), F.floor((n - 1) / _CHUNK_S).cast("int"))
        ).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * _CHUNK_S
    return c.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.least(F.lit(_CHUNK_W), F.col("n_tokens") - start)
        .cast("int")
        .alias("chunk_tokens"),
        F.md5(
            F.array_join(F.slice(F.col("toks"), start + 1, _CHUNK_W), " ")
        ).alias("chunk_hash"),
    )


@REG.add(
    "readability_scores",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang, {_SQL_WORDS} AS toks,
                   greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                       AS n_sentences
            FROM documents
        ),
        s AS (
            SELECT doc_id, lang, n_sentences,
                   len(toks) AS n_words,
                   list_sum(list_transform(toks,
                       w -> greatest(len(regexp_extract_all(lower(w),
                                                            '[aeiouy]+')), 1)))
                       AS n_syllables
            FROM t WHERE len(toks) >= 1
        )
        SELECT doc_id, lang,
               CAST(n_words AS BIGINT) AS n_words,
               CAST(n_syllables AS BIGINT) AS n_syllables,
               round(206.835 - 1.015 * (n_words::DOUBLE / n_sentences)
                     - 84.6 * (n_syllables::DOUBLE / n_words), 3)
                   AS flesch_ease
        FROM s
    """,
    doc="Flesch reading-ease per document with a vowel-group syllable "
    "heuristic (every [aeiouy]+ run = one syllable, floor 1/word) and "
    "[.!?]+ runs as sentence breaks — the classic cheap readability gate "
    "(too-easy = listicles/spam, too-hard = OCR garbage). Single map-side "
    "pass: tokenization, syllable counting, and the formula are all "
    "array/regex built-ins; no shuffle at all.",
)
def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n_sent = F.greatest(
        F.size(F.expr(r"regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
    )
    toks = _toks()
    # Syllables per word = vowel-group runs (floor 1). Counted by
    # replacing each [aeiouy]+ run with a sentinel and splitting on it:
    # n_parts - 1 == n_runs (regexp_extract_all has no Column form that
    # a transform lambda variable can reach).
    syll = F.aggregate(
        F.transform(
            toks,
            lambda w: F.greatest(
                F.size(
                    F.split(F.regexp_replace(F.lower(w), "[aeiouy]+", "\x01"), "\x01")
                )
                - 1,
                F.lit(1),
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    t = d.select(
        "doc_id",
        "lang",
        toks.alias("toks"),
        n_sent.alias("n_sentences"),
        syll.alias("n_syllables"),
    ).where(F.size("toks") >= 1)
    nw = F.size("toks").cast("double")
    return t.select(
        "doc_id",
        "lang",
        F.size("toks").cast("long").alias("n_words"),
        F.col("n_syllables").cast("long").alias("n_syllables"),
        F.round(
            206.835
            - 1.015 * (nw / F.col("n_sentences"))
            - 84.6 * (F.col("n_syllables") / nw),
            3,
        ).alias("flesch_ease"),
    )


@REG.add(
    "zipf_law_fit",
    oracle="""
        WITH tok AS (
            SELECT lang, unnest(CASE WHEN length(trim(text)) = 0 THEN ['']
                 ELSE regexp_split_to_array(trim(text), '\\s+') END) AS t
            FROM documents
        ),
        cnt AS (
            SELECT lang, lower(t) AS tk, count(*) AS c
            FROM tok GROUP BY lang, lower(t)
        ),
        rk AS (
            SELECT lang, c,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY c DESC, tk ASC) AS r
            FROM cnt
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_ranks,
               round(regr_slope(ln(c), ln(r)), 6) AS zipf_slope,
               round(regr_intercept(ln(c), ln(r)), 6) AS zipf_intercept,
               round(corr(ln(c), ln(r)) * corr(ln(c), ln(r)), 6) AS r_squared
        FROM rk WHERE r <= 200 GROUP BY lang
    """,
    doc="Zipf's-law fit per language: log-log regression of token frequency "
    "on frequency rank over the top 200 ranks. A natural-language corpus "
    "fits slope ~ -1 with high R^2; synthetic/templated/spammy text "
    "deviates — a cheap corpus-health diagnostic (one token aggregate, "
    "one lang-partitioned rank window over distinct tokens, one "
    "regression fold).",
)
def zipf_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.when(
        F.length(F.trim("text")) == 0, F.array(F.lit(""))
    ).otherwise(F.split(F.trim(F.col("text")), r"\s+"))
    cnt = (
        d.select("lang", F.explode(toks).alias("t"))
        .groupBy("lang", F.lower("t").alias("tk"))
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("c").desc(), F.col("tk").asc())
    rk = cnt.withColumn("r", F.row_number().over(w)).where(F.col("r") <= 200)
    lc, lr = F.log(F.col("c")), F.log(F.col("r"))
    return rk.groupBy("lang").agg(
        F.count("*").alias("n_ranks"),
        F.round(F.regr_slope(lc, lr), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(lc, lr), 6).alias("zipf_intercept"),
        F.round(F.corr(lc, lr) * F.corr(lc, lr), 6).alias("r_squared"),
    )


_HEAPS_POINTS = (50, 100, 200, 500, 1000, 2000, 5000)


@REG.add(
    "heaps_law_vocab_growth",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(CASE WHEN length(trim(text)) = 0 THEN ['']
                 ELSE regexp_split_to_array(trim(text), '\\s+') END) AS t
            FROM documents
        ),
        doc_rank AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY doc_id) - 1 AS dr
            FROM (SELECT DISTINCT doc_id FROM documents)
        ),
        first_seen AS (
            SELECT lower(t) AS tk, min(r.dr) AS first_rank
            FROM tok JOIN doc_rank r USING (doc_id)
            GROUP BY lower(t)
        ),
        pts AS (SELECT unnest({list(_HEAPS_POINTS)}) AS n_docs),
        growth AS (
            SELECT p.n_docs,
                   count(*) FILTER (WHERE f.first_rank < p.n_docs) AS vocab
            FROM pts p, first_seen f GROUP BY p.n_docs
        )
        SELECT CAST(n_docs AS INT) AS n_docs,
               CAST(vocab AS BIGINT) AS vocab
        FROM growth WHERE vocab > 0
    """,
    doc="Heaps'-law vocabulary growth: distinct-token count after the "
    f"first n documents (doc_id order), sampled at {list(_HEAPS_POINTS)}. "
    "Natural corpora grow ~ K*n^beta with beta ~ 0.5; a flattening curve "
    "means the corpus is recycling vocabulary (templates) and more data "
    "adds little. 'First n documents' is defined by RANK of doc_id (not "
    "the raw id), so sparse/offset id spaces compute the same prefix. "
    "Rank is resolved WITHOUT a global window: the n-th-smallest doc_id "
    "thresholds come from a distributed top-k (TakeOrderedAndProject, "
    "bounded at max(points) driver rows regardless of corpus size), and "
    "the curve is then one aggregate over (token -> min doc_id) against "
    "those literal thresholds.",
)
def heaps_law_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.when(
        F.length(F.trim("text")) == 0, F.array(F.lit(""))
    ).otherwise(F.split(F.trim(F.col("text")), r"\s+"))
    # n-th smallest doc_ids (distributed top-k, O(max(points)) rows to
    # the driver): "first n docs" == docs with doc_id <= thresholds[n].
    smallest = [
        r[0]
        for r in d.select("doc_id")
        .distinct()
        .orderBy("doc_id")
        .limit(max(_HEAPS_POINTS))
        .collect()
    ]
    if not smallest:
        return spark.createDataFrame([], "n_docs int, vocab long")
    thresholds = {
        p: smallest[min(p, len(smallest)) - 1] for p in _HEAPS_POINTS
    }
    first_seen = (
        d.select("doc_id", F.explode(toks).alias("t"))
        .groupBy(F.lower("t").alias("tk"))
        .agg(F.min("doc_id").alias("first_doc"))
    )
    pts = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(int(p)).alias("n_docs"),
                    F.lit(int(t)).alias("thr"),
                )
                for p, t in sorted(thresholds.items())
            ]
        )
    ).alias("pt")
    growth = (
        first_seen.select("first_doc", pts)
        .select("first_doc", "pt.n_docs", "pt.thr")
        .groupBy("n_docs")
        .agg(
            F.sum(
                (F.col("first_doc") <= F.col("thr")).cast("bigint")
            ).alias("vocab")
        )
    )
    return growth.where(F.col("vocab") > 0).select(
        F.col("n_docs").cast("int").alias("n_docs"), "vocab"
    )


@REG.add(
    "trigram_interpolated_surprisal",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang, {_SQL_WORDS} AS toks FROM documents
        ),
        tg AS (
            SELECT doc_id, lang,
                   unnest(toks[1:len(toks) - 2]) AS w1,
                   unnest(toks[2:len(toks) - 1]) AS w2,
                   unnest(toks[3:len(toks)]) AS w3
            FROM t WHERE len(toks) >= 3
        ),
        c123 AS (SELECT w1, w2, w3, count(*) AS c FROM tg GROUP BY w1, w2, w3),
        c12 AS (SELECT w1, w2, count(*) AS c FROM tg GROUP BY w1, w2),
        c23 AS (SELECT w2, w3, count(*) AS c FROM tg GROUP BY w2, w3),
        c2 AS (SELECT w2, count(*) AS c FROM tg GROUP BY w2),
        c3 AS (SELECT w3, count(*) AS c FROM tg GROUP BY w3),
        n AS (SELECT count(*)::DOUBLE AS total FROM tg),
        s AS (
            SELECT tg.doc_id, tg.lang,
                   count(*) AS n_trigrams,
                   avg(-log2(
                       0.6 * (c123.c / CAST(c12.c AS DOUBLE))
                     + 0.3 * (c23.c / CAST(c2.c AS DOUBLE))
                     + 0.1 * (c3.c / n.total)
                   )) AS sur
            FROM tg
            JOIN c123 USING (w1, w2, w3)
            JOIN c12 USING (w1, w2)
            JOIN c23 USING (w2, w3)
            JOIN c2 USING (w2)
            JOIN c3 USING (w3), n
            GROUP BY tg.doc_id, tg.lang
        )
        SELECT doc_id, lang, CAST(n_trigrams AS BIGINT) AS n_trigrams,
               round(sur, 4) AS avg_surprisal
        FROM s
    """,
    doc="Per-document surprisal under an interpolated TRIGRAM LM "
    "(lambda = 0.6/0.3/0.1 over trigram/bigram/unigram MLE, all "
    "estimated from the corpus's trigram table so every observed "
    "trigram has non-zero mass at each order — Jelinek-Mercer "
    "interpolation without a tuning loop). The top rung of the "
    "cheap-perplexity ladder (unigram -> bigram -> this): text that "
    "locally imitates corpus word order still scores high when its "
    "longer context is unusual — the standard KenLM-shaped quality "
    "filter. Trigrams come from zipping three array slices (no "
    "self-join); five count tables are token-keyed partial-combine "
    "aggregates joined back on their grams; documents with <3 tokens "
    "drop out by construction.",
)
def trigram_interpolated_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", _toks().alias("toks"))
    n = F.size("toks")
    tg = (
        t.where(n >= 3)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("toks"), 1, n - 2).alias("w1"),
                    F.slice(F.col("toks"), 2, n - 2).alias("w2"),
                    F.slice(F.col("toks"), 3, n - 2).alias("w3"),
                )
            ).alias("p"),
        )
        .select(
            "doc_id",
            "lang",
            F.col("p.w1").alias("w1"),
            F.col("p.w2").alias("w2"),
            F.col("p.w3").alias("w3"),
        )
    )
    c123 = tg.groupBy("w1", "w2", "w3").agg(F.count("*").alias("c123"))
    c12 = tg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c23 = tg.groupBy("w2", "w3").agg(F.count("*").alias("c23"))
    c2 = tg.groupBy("w2").agg(F.count("*").alias("c2"))
    c3 = tg.groupBy("w3").agg(F.count("*").alias("c3"))
    total = tg.agg(F.count("*").cast("double").alias("total"))
    p = (
        0.6 * (F.col("c123") / F.col("c12").cast("double"))
        + 0.3 * (F.col("c23") / F.col("c2").cast("double"))
        + 0.1 * (F.col("c3") / F.col("total"))
    )
    return (
        tg.join(c123, ["w1", "w2", "w3"])
        .join(c12, ["w1", "w2"])
        .join(c23, ["w2", "w3"])
        .join(c2, ["w2"])
        .join(c3, ["w3"])
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_trigrams"),
            F.round(F.avg(-F.log2(p)), 4).alias("avg_surprisal"),
        )
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility
# ---------------------------------------------------------------------------


@REG.add(
    "tokenizer_fertility_stats",
    oracle=f"""
        WITH t AS (
            SELECT lang,
                   len({_SQL_WORDS}) AS n_words,
                   len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_pieces,
                   length(text) AS n_bytes
            FROM documents
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_words) AS BIGINT) AS total_words,
               CAST(sum(n_pieces) AS BIGINT) AS total_pieces,
               round(CAST(sum(n_pieces) AS DOUBLE) / nullif(sum(n_words), 0), 6)
                   AS fertility,
               round(CAST(sum(n_bytes) AS DOUBLE) / nullif(sum(n_pieces), 0), 6)
                   AS bytes_per_piece
        FROM t GROUP BY lang
    """,
    doc="Tokenizer fertility per language: BPE-ish pieces per "
    "whitespace word (fertility) and bytes per piece — the two numbers "
    "that turn a byte budget into a token budget and expose languages "
    "the tokenizer fragments (fertility >> 1 means more compute per "
    "word for that slice). Token counts reuse the exact regexes of "
    "bpe_token_stats / text2's word split, so budgets derived here "
    "agree with every other token-count query in the registry. Single "
    "scan, all JVM regex, counters only in the shuffle.",
)
def tokenizer_fertility_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        F.size(_toks()).alias("n_words"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)).alias(
            "n_pieces"
        ),
        F.length("text").alias("n_bytes"),
    )
    return t.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_pieces").alias("total_pieces"),
        F.round(
            F.sum("n_pieces").cast("double") / F.nullif(F.sum("n_words"), F.lit(0)),
            6,
        ).alias("fertility"),
        F.round(
            F.sum("n_bytes").cast("double") / F.nullif(F.sum("n_pieces"), F.lit(0)),
            6,
        ).alias("bytes_per_piece"),
    )


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOP = 30


@REG.add(
    "pmi_collocations",
    oracle=f"""
        WITH w AS (SELECT {_SQL_WORDS} AS ws FROM documents),
        uni AS (
            SELECT unnest(ws) AS w FROM w
        ),
        ucnt AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
        utot AS (SELECT CAST(sum(c) AS DOUBLE) AS nu FROM ucnt),
        bi AS (
            SELECT unnest(list_zip(ws[:-2], ws[2:])) AS p FROM w
            WHERE len(ws) >= 2
        ),
        bcnt AS (
            SELECT p[1] AS w1, p[2] AS w2, count(*) AS c
            FROM bi GROUP BY p[1], p[2]
        ),
        btot AS (SELECT CAST(sum(c) AS DOUBLE) AS nb FROM bcnt),
        scored AS (
            SELECT b.w1, b.w2,
                   CAST(b.c AS BIGINT) AS n_occurrences,
                   round(ln((b.c / nb) / ((u1.c / nu) * (u2.c / nu))), 4)
                       AS pmi
            FROM bcnt b
            JOIN ucnt u1 ON u1.w = b.w1
            JOIN ucnt u2 ON u2.w = b.w2
            CROSS JOIN utot CROSS JOIN btot
            WHERE b.c >= {_PMI_MIN_COUNT}
        )
        SELECT w1, w2, n_occurrences, pmi FROM scored
        ORDER BY pmi DESC, w1 ASC, w2 ASC
        LIMIT {_PMI_TOP}
    """,
    doc=f"Top-{_PMI_TOP} collocations by pointwise mutual information: "
    "bigrams whose corpus probability most exceeds what their unigram "
    "frequencies predict (PMI = ln(p(ab)/(p(a)p(b))), count >= "
    f"{_PMI_MIN_COUNT}) — multiword expressions and named entities, the "
    "phrase-mining primitive behind tokenizer-vocab audits and "
    "boilerplate discovery. Counts come from one explode+aggregate per "
    "arity with map-side combine; the two corpus totals are 1-row "
    "broadcasts; the unigram joins key on the already-aggregated count "
    "tables (distinct tokens, not the token stream). Both engines "
    "compute the identical ln() over identical integer-ratio doubles, "
    "rounded to 4.",
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(_toks().alias("ws"))
    uni = d.select(F.explode("ws").alias("w"))
    ucnt = uni.groupBy("w").agg(F.count("*").alias("c"))
    utot = ucnt.agg(F.sum("c").cast("double").alias("nu"))
    pairs = d.where(F.size("ws") >= 2).select(
        F.explode(
            F.zip_with(
                F.slice(F.col("ws"), 1, F.size("ws") - 1),
                F.slice(F.col("ws"), 2, F.size("ws") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    )
    bcnt = pairs.groupBy(
        F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    ).agg(F.count("*").alias("c"))
    btot = bcnt.agg(F.sum("c").cast("double").alias("nb"))
    u1 = ucnt.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = ucnt.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    scored = (
        bcnt.where(F.col("c") >= _PMI_MIN_COUNT)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(utot))
        .crossJoin(F.broadcast(btot))
        .select(
            "w1",
            "w2",
            F.col("c").cast("long").alias("n_occurrences"),
            F.round(
                F.log(
                    (F.col("c") / F.col("nb"))
                    / ((F.col("c1") / F.col("nu")) * (F.col("c2") / F.col("nu")))
                ),
                4,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(_PMI_TOP)


# ---------------------------------------------------------------------------
# RAKE keyphrase extraction
# ---------------------------------------------------------------------------

_RAKE_MAX_LEN = 4  # drop stopword-free runs longer than this (boilerplate)
_RAKE_MIN_OCC = 3  # phrase must appear this often corpus-wide
_RAKE_TOP = 25


@REG.add(
    "rake_keyphrases",
    oracle=f"""
        WITH w AS (SELECT doc_id, {_SQL_WORDS} AS ws FROM documents),
        toks AS (
            SELECT doc_id, unnest(ws) AS tok,
                   unnest(range(1, len(ws) + 1)) AS i
            FROM w
        ),
        ns AS (
            SELECT doc_id, i, tok,
                   i - row_number() OVER (
                       PARTITION BY doc_id ORDER BY i) AS grp
            FROM toks
            WHERE tok NOT IN {STOPWORDS!r}
        ),
        occ AS (
            SELECT doc_id, grp,
                   string_agg(tok, ' ' ORDER BY i) AS phrase,
                   count(*) AS plen
            FROM ns GROUP BY doc_id, grp
            HAVING count(*) <= {_RAKE_MAX_LEN}
        ),
        members AS (
            SELECT n.tok, o.plen
            FROM ns n JOIN occ o ON o.doc_id = n.doc_id AND o.grp = n.grp
        ),
        wstat AS (
            SELECT tok, count(*) AS freq, sum(plen) AS deg
            FROM members GROUP BY tok
        ),
        phr AS (
            SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences
            FROM occ GROUP BY phrase
            HAVING count(*) >= {_RAKE_MIN_OCC}
        ),
        pw AS (
            SELECT phrase, n_occurrences,
                   unnest(string_split(phrase, ' ')) AS tok,
                   unnest(range(1, len(string_split(phrase, ' ')) + 1)) AS pos
            FROM phr
        ),
        scored AS (
            SELECT pw.phrase, pw.n_occurrences,
                   round(list_reduce(
                       list_prepend(0.0,
                           list(ws.deg::DOUBLE / ws.freq ORDER BY pw.pos)),
                       (acc, x) -> acc + x), 4) AS rake_score
            FROM pw JOIN wstat ws ON ws.tok = pw.tok
            GROUP BY pw.phrase, pw.n_occurrences
        )
        SELECT phrase, n_occurrences, rake_score
        FROM scored
        ORDER BY rake_score DESC, phrase ASC
        LIMIT {_RAKE_TOP}
    """,
    doc=f"RAKE keyphrase extraction: candidate phrases are maximal "
    "stopword-free token runs (found with the classic gaps-and-islands "
    f"i - row_number() trick, capped at {_RAKE_MAX_LEN} words), each "
    "word is scored degree/frequency over the candidate set (degree = "
    "summed length of the runs it appears in — words that live in "
    "longer phrases score higher), and a phrase scores the sum of its "
    f"word scores; top-{_RAKE_TOP} phrases seen >= {_RAKE_MIN_OCC} "
    "times. The per-phrase sum is folded over words in PHRASE ORDER "
    "(array_sort + F.aggregate / ordered list + list_reduce), so both "
    "engines add identical doubles in identical order — no "
    "nondeterministic float aggregation. Scale shape: the only "
    "token-stream shuffle is the doc-partitioned run-finding window "
    "(same class as every explode aggregate here); everything after "
    "operates on distinct phrases/words with map-side combine.",
)
def rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", _toks().alias("ws")
    )
    toks = d.select(
        "doc_id", F.posexplode("ws").alias("i0", "tok")
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "tok")
    ns = toks.where(~F.col("tok").isin(*STOPWORDS)).withColumn(
        "grp",
        F.col("i")
        - F.row_number().over(
            Window.partitionBy("doc_id").orderBy("i")
        ),
    )
    occ = (
        ns.groupBy("doc_id", "grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.count("*").alias("plen"),
        )
        .where(F.col("plen") <= _RAKE_MAX_LEN)
    )
    members = ns.join(occ, ["doc_id", "grp"]).select("tok", "plen")
    wstat = members.groupBy("tok").agg(
        F.count("*").alias("freq"), F.sum("plen").alias("deg")
    )
    phr = (
        occ.groupBy("phrase")
        .agg(F.count("*").cast("long").alias("n_occurrences"))
        .where(F.col("n_occurrences") >= _RAKE_MIN_OCC)
    )
    pw = phr.select(
        "phrase",
        "n_occurrences",
        F.posexplode(F.split(F.col("phrase"), " ")).alias("pos0", "tok"),
    ).select(
        "phrase", "n_occurrences", (F.col("pos0") + 1).alias("pos"), "tok"
    )
    scored = (
        pw.join(wstat, "tok")
        .groupBy("phrase", "n_occurrences")
        .agg(
            F.round(
                F.aggregate(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    "pos",
                                    (
                                        F.col("deg").cast("double")
                                        / F.col("freq")
                                    ).alias("s"),
                                )
                            )
                        ),
                        lambda x: x["s"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                4,
            ).alias("rake_score")
        )
    )
    return scored.orderBy(
        F.col("rake_score").desc(), F.col("phrase").asc()
    ).limit(_RAKE_TOP)
