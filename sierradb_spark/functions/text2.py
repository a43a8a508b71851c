"""Corpus-statistics text scoring (round-3 extensions).

A unigram language model trained on the corpus itself is the classic
cheap quality signal (the KenLM-perplexity stand-in every pretraining
funnel uses before an expensive model scorer): documents whose words
are globally rare score high surprisal — gibberish, boilerplate
explosions, wrong-language shards — and get reviewed or dropped.

Scale shape (100 TB): the vocab is one word-count aggregation (map-side
partial combine, shuffle carries distinct words); scoring is a join of
the exploded corpus against the vocab — broadcast when the vocab fits,
shuffle-hash otherwise — then one per-doc aggregate. No Python in the
loop; log2/avg are whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sierradb_spark.registry import Registry, load

REG = Registry()

_SQL_WORDS = (
    "CASE WHEN length(trim(text)) = 0 THEN [] "
    "ELSE regexp_split_to_array(trim(text), '\\s+') END"
)


def _toks():
    """Whitespace tokenization, empty-safe — the Spark twin of
    ``_SQL_WORDS`` (change BOTH together or oracles diverge)."""
    return F.when(
        F.length(F.trim(F.col("text"))) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.col("text")), r"\s+"))


@REG.add(
    "unigram_surprisal_scores",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, lang, unnest({_SQL_WORDS}) AS word
            FROM documents
        ),
        v AS (SELECT word, count(*) AS c FROM w GROUP BY word),
        tot AS (
            SELECT sum(c)::DOUBLE AS t, count(*)::DOUBLE AS vocab FROM v
        ),
        p AS (SELECT word, (c + 1.0) / (t + vocab) AS pw FROM v, tot),
        s AS (
            SELECT w.doc_id, w.lang,
                   CAST(count(*) AS BIGINT) AS n_words,
                   avg(-log2(p.pw)) AS sur
            FROM w JOIN p USING (word)
            GROUP BY w.doc_id, w.lang
        )
        SELECT doc_id, lang, n_words, round(sur, 4) AS avg_surprisal
        FROM s
    """,
    doc="Per-document unigram surprisal under an add-one-smoothed LM trained on "
    "the corpus itself — the cheap perplexity stand-in of a pretraining quality "
    "funnel. One vocab aggregation + one word join + one per-doc aggregate, all "
    "JVM-side; rare-word documents surface with high avg_surprisal.",
)
def unigram_surprisal_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = _toks()
    w = d.select("doc_id", "lang", F.explode(toks).alias("word"))
    v = w.groupBy("word").agg(F.count("*").alias("c"))
    tot = v.agg(
        F.sum("c").cast("double").alias("t"),
        F.count("*").cast("double").alias("vocab"),
    )
    p = v.crossJoin(F.broadcast(tot)).select(
        "word", ((F.col("c") + 1.0) / (F.col("t") + F.col("vocab"))).alias("pw")
    )
    return (
        w.join(p, "word")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_words"),
            F.round(F.avg(-F.log2("pw")), 4).alias("avg_surprisal"),
        )
    )


@REG.add(
    "type_token_ratio_by_source",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, source, unnest({_SQL_WORDS}) AS word
            FROM documents
        ),
        per_doc AS (
            SELECT doc_id, source,
                   count(*) AS n_tokens,
                   count(DISTINCT word) AS n_types
            FROM w GROUP BY doc_id, source
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               round(avg(n_types::DOUBLE / n_tokens), 4) AS avg_ttr
        FROM per_doc GROUP BY source
    """,
    doc="Type-token ratio per source — the lexical-diversity screen (template/"
    "boilerplate farms have low TTR). Per-doc distinct counting happens in the "
    "same exploded pass as token counting; the final rollup is |sources| rows.",
)
def type_token_ratio_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = _toks()
    w = d.select("doc_id", "source", F.explode(toks).alias("word"))
    per_doc = w.groupBy("doc_id", "source").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("word").alias("n_types"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(
            F.avg(F.col("n_types").cast("double") / F.col("n_tokens")), 4
        ).alias("avg_ttr"),
    )


# Tiny polarity lexicon over the synthetic corpus vocabulary — the
# demo stand-in for AFINN/VADER (the real lexicon swaps in as the same
# broadcast table).
SENTIMENT_LEXICON = [
    ("fast", 2.0), ("big", 1.0), ("small", -1.0), ("slow", -2.0),
    ("merge", 1.0), ("dup", -1.0), ("error", -2.0), ("value", 1.0),
]

_SQL_LEXICON = " UNION ALL ".join(
    f"SELECT '{w}' AS word, CAST({p} AS DOUBLE) AS polarity"
    for w, p in SENTIMENT_LEXICON
)


@REG.add(
    "lexicon_sentiment_scores",
    oracle=f"""
        WITH lex AS ({_SQL_LEXICON}),
        w AS (
            SELECT doc_id, lang, unnest({_SQL_WORDS}) AS word
            FROM documents
        ),
        s AS (
            SELECT w.doc_id, w.lang,
                   count(lex.word) AS n_hits,
                   coalesce(sum(lex.polarity), 0.0) AS total
            FROM w LEFT JOIN lex ON w.word = lex.word
            GROUP BY w.doc_id, w.lang
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN total > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_positive,
               CAST(sum(CASE WHEN total < 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_negative,
               floor(avg(CASE WHEN n_hits > 0 THEN total / n_hits
                         ELSE 0.0 END) * 1e6 + 0.5) / 1e6 AS avg_polarity
        FROM s GROUP BY lang
    """,
    doc="Lexicon-based sentiment scoring (the large-scale Spark sentiment "
    "shape, EDBT 2016 in PAPERS.md): exploded words join a BROADCAST "
    "polarity lexicon (AFINN/VADER-sized tables always broadcast), one "
    "per-doc aggregate, one per-language rollup. The corpus never "
    "shuffles; only (doc, polarity) partial aggregates do.",
)
def lexicon_sentiment_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    lex = spark.createDataFrame(
        SENTIMENT_LEXICON, "word string, polarity double"
    )
    toks = _toks()
    w = d.select("doc_id", "lang", F.explode(toks).alias("word"))
    s = (
        w.join(F.broadcast(lex), "word", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("polarity").alias("n_hits"),
            F.coalesce(F.sum("polarity"), F.lit(0.0)).alias("total"),
        )
    )
    return s.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("total") > 0).cast("bigint")).alias("n_positive"),
        F.sum((F.col("total") < 0).cast("bigint")).alias("n_negative"),
        (
            F.floor(
                F.avg(
                    F.when(
                        F.col("n_hits") > 0, F.col("total") / F.col("n_hits")
                    ).otherwise(0.0)
                )
                * 1e6
                + 0.5
            )
            / 1e6
        ).alias("avg_polarity"),
    )
