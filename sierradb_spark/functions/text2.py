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

from sierradb_spark.operators.base import Registry, load

REG = Registry()

_SQL_WORDS = (
    "CASE WHEN length(trim(text)) = 0 THEN [] "
    "ELSE regexp_split_to_array(trim(text), '\\s+') END"
)


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
    toks = F.when(
        F.length(F.trim(F.col("text"))) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.col("text")), r"\s+"))
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
    toks = F.when(
        F.length(F.trim(F.col("text"))) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.col("text")), r"\s+"))
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
