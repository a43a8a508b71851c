"""Exact-substring span dedup — maximal repeated token spans.

The dedup family's missing rung between chunk-level dedup (scrub.py:
fixed 8-word chunk boundaries, misses any duplicate that straddles
them) and MinHash (dedup_wide.py: whole-document similarity, blind to
a short boilerplate span inside an otherwise unique doc). Exact
substring dedup — "find every token span of length >= K repeated
anywhere in the corpus, then cut it" — is the pass the
deduplicating-training-data literature runs with a suffix array; the
distributed equivalent used here:

1. slide a K-word gram window over every doc (overlapping, stride 1);
2. a gram digest seen more than once in the corpus marks its start
   position as duplicated;
3. per doc, merge OVERLAPPING duplicated gram positions into maximal
   spans (consecutive starts closer than K words share tokens, so
   their union is one repeated region);
4. report the spans, or rebuild each doc with every duplicated span's
   tokens removed (ALL occurrences cut — the conservative form: no
   copy of corpus-repeated boilerplate survives into training data).

Scale shape (100 TB): step 2 shuffles (digest, doc_id, position) only —
16 B md5 digests plus two longs, never gram text (the same discipline
as chunk dedup); step 3 is a per-doc window over the surviving
duplicated positions (tiny — only duplicated grams reach it); step 4
joins span ranges back to the exploded word table on the doc_id
equi-key with a residual range predicate. Overlapping grams cost
K x the corpus in *digest* rows, not in text: each gram row is ~40 B
regardless of word length.

The synthetic corpus is unique word soup, so — as with the PII
detectors — docs are first enriched with deterministic doc_id-derived
boilerplate (two shared disclaimer templates) and the oracle re-derives
the identical enrichment in SQL: the span machinery is value-checked
with non-zero span counts on BOTH engines.

All JVM built-ins; zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sierradb_spark.registry import Registry, load, spread

REG = Registry()

SPAN_WORDS = 8  # gram width K: the minimum repeated span length detected

# Shared boilerplate templates (plain words only — they pass through
# concat/split on both engines verbatim). Every 4th doc gets the long
# disclaimer, every 6th the short footer; doc_id % 12 == 0 docs carry
# both, so spans also merge across template boundaries there.
_TPL_A = (
    "this document is provided as is without warranty of any kind either "
    "expressed or implied including but not limited to fitness for a "
    "particular purpose"
)
_TPL_B = "all rights reserved unauthorized reproduction of this material is strictly prohibited"


def _enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    text = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 4 == 0, F.lit(" " + _TPL_A)).otherwise(
            F.lit("")
        ),
        F.when(F.col("doc_id") % 6 == 0, F.lit(" " + _TPL_B)).otherwise(
            F.lit("")
        ),
    )
    return d.select("doc_id", "source", "lang", text.alias("text"))


_SQL_ENRICHED = f"""
    SELECT doc_id, source, lang,
           text
           || CASE WHEN doc_id % 4 = 0 THEN ' {_TPL_A}' ELSE '' END
           || CASE WHEN doc_id % 6 = 0 THEN ' {_TPL_B}' ELSE '' END AS text
    FROM documents
"""

_SQL_GRAMS = f"""
    CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) < {SPAN_WORDS}
         THEN []
         ELSE list_transform(
             range(0, len(regexp_split_to_array(trim(text), '\\s+'))
                      - {SPAN_WORDS} + 1),
             p -> array_to_string(
                 regexp_split_to_array(trim(text), '\\s+')
                     [(p + 1):(p + {SPAN_WORDS})],
                 ' '))
    END
"""

# Duplicated gram start positions -> disjoint maximal spans.
# New island iff this start is >= K past the previous one (strictly
# overlapping grams merge; merely adjacent spans stay separate). Because
# every island's next start is < previous + K, and a new island starts
# > previous island's end, the resulting spans are DISJOINT — token
# counts sum without double counting.
_SQL_SPANS = f"""
    dup AS (
        SELECT digest FROM g GROUP BY digest HAVING count(*) >= 2
    ),
    hits AS (
        SELECT g.doc_id, g.p FROM g JOIN dup USING (digest)
    ),
    isl AS (
        SELECT doc_id, p,
               sum(CASE WHEN prev IS NULL OR p - prev >= {SPAN_WORDS}
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY p
                         ROWS UNBOUNDED PRECEDING) AS island
        FROM (
            SELECT doc_id, p,
                   lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
            FROM hits
        )
    ),
    spans AS (
        SELECT doc_id,
               min(p) AS span_start,
               max(p) + {SPAN_WORDS} - 1 AS span_end,
               max(p) - min(p) + {SPAN_WORDS} AS span_len
        FROM isl GROUP BY doc_id, island
    )
"""


def _words_col() -> F.Column:
    """Tokenized text, guarded for empty docs (both engines split '' to
    ['']; the guard keeps the two in lockstep)."""
    return F.when(
        F.length(F.trim("text")) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.col("text")), r"\s+"))


def _gram_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, p, digest): overlapping K-gram start positions. Text is
    digested immediately — nothing downstream ever shuffles gram text.

    The word array is STAGED as its own projection before the gram
    lambda consumes it (the with_shingles discipline): higher-order
    functions run interpreted with no common-subexpression elimination,
    so an inline ``split(...)`` would re-tokenize the whole document for
    every gram position — O(tokens^2) regex work per doc. Behind the
    staged alias each ``slice`` is an O(K) array read. The sequence()
    guard stays: Spark's sequence DESCENDS for a negative stop
    (DuckDB's range is just empty)."""
    e = _enriched(spark, sf_dir)
    # spread before the gram explode + per-gram md5 — the heavy map work
    # sits upstream of the dup-digest shuffle (see registry.spread)
    staged = spread(e, "doc_id").select("doc_id", _words_col().alias("w"))
    w = F.col("w")
    grams = F.when(
        F.size(w) < SPAN_WORDS, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(w) - SPAN_WORDS),
            lambda p: F.concat_ws(" ", F.slice(w, p + 1, SPAN_WORDS)),
        )
    )
    return staged.select("doc_id", F.posexplode(grams)).select(
        "doc_id",
        F.col("pos").cast("bigint").alias("p"),
        F.md5("col").alias("digest"),
    )


def _spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjoint maximal repeated spans per doc: (doc_id, span_start,
    span_end, span_len), token-index inclusive bounds."""
    g = _gram_table(spark, sf_dir)
    dup = g.groupBy("digest").agg(F.count("*").alias("n")).where(F.col("n") >= 2)
    hits = g.join(dup.select("digest"), "digest").select("doc_id", "p")
    w = Window.partitionBy("doc_id").orderBy("p")
    isl = hits.withColumn("prev", F.lag("p").over(w)).withColumn(
        "island",
        F.sum(
            F.when(
                F.col("prev").isNull()
                | (F.col("p") - F.col("prev") >= SPAN_WORDS),
                1,
            ).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return isl.groupBy("doc_id", "island").agg(
        F.min("p").alias("span_start"),
        (F.max("p") + SPAN_WORDS - 1).alias("span_end"),
        (F.max("p") - F.min("p") + SPAN_WORDS).alias("span_len"),
    )


@REG.add(
    "repeated_span_stats",
    oracle=f"""
        WITH e AS ({_SQL_ENRICHED}),
        g AS (
            SELECT doc_id, (i - 1)::BIGINT AS p, md5(gram) AS digest
            FROM (
                SELECT doc_id, unnest(grams) AS gram,
                       unnest(generate_series(1, len(grams))) AS i
                FROM (SELECT doc_id, {_SQL_GRAMS} AS grams FROM e)
            )
        ),
        {_SQL_SPANS},
        per_doc AS (
            SELECT doc_id,
                   count(*) AS n_spans,
                   sum(span_len) AS dup_tokens
            FROM spans GROUP BY doc_id
        )
        SELECT e.doc_id,
               CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
               CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
               CAST(len(regexp_split_to_array(trim(e.text), '\\s+'))
                    AS BIGINT) AS total_tokens,
               floor(coalesce(p.dup_tokens, 0)::DOUBLE
                     / len(regexp_split_to_array(trim(e.text), '\\s+'))
                     * 1e6 + 0.5) / 1e6 AS dup_ratio
        FROM e LEFT JOIN per_doc p USING (doc_id)
    """,
    doc=f"Exact-substring dedup audit: per-doc count of maximal repeated "
    f"token spans (every span of >= {SPAN_WORDS} words whose text recurs "
    "anywhere in the corpus), tokens covered, and the duplicated-token "
    "ratio — the measurement behind a suffix-array-style exact dedup "
    "pass, distributed as a gram-digest shuffle (never gram text) plus a "
    "per-doc island merge over only the duplicated positions.",
)
def repeated_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _enriched(spark, sf_dir)
    spans = _spans(spark, sf_dir)
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum("span_len").alias("dup_tokens"),
    )
    total = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint")
    return (
        e.select("doc_id", total.alias("total_tokens"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0))
            .cast("bigint")
            .alias("dup_tokens"),
            "total_tokens",
            (
                F.floor(
                    F.coalesce("dup_tokens", F.lit(0)).cast("double")
                    / F.col("total_tokens")
                    * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("dup_ratio"),
        )
    )


@REG.add(
    "substring_scrubbed_corpus",
    oracle=f"""
        WITH e AS ({_SQL_ENRICHED}),
        g AS (
            SELECT doc_id, (i - 1)::BIGINT AS p, md5(gram) AS digest
            FROM (
                SELECT doc_id, unnest(grams) AS gram,
                       unnest(generate_series(1, len(grams))) AS i
                FROM (SELECT doc_id, {_SQL_GRAMS} AS grams FROM e)
            )
        ),
        {_SQL_SPANS},
        w AS (
            SELECT doc_id, (i - 1)::BIGINT AS wi, word
            FROM (
                SELECT doc_id, unnest(words) AS word,
                       unnest(generate_series(1, len(words))) AS i
                FROM (
                    SELECT doc_id,
                           regexp_split_to_array(trim(text), '\\s+') AS words
                    FROM e
                )
            )
        ),
        kept AS (
            SELECT w.doc_id, w.wi, w.word
            FROM w
            WHERE NOT EXISTS (
                SELECT 1 FROM spans s
                WHERE s.doc_id = w.doc_id
                  AND w.wi BETWEEN s.span_start AND s.span_end
            )
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS kept_tokens,
               md5(string_agg(word, ' ' ORDER BY wi)) AS scrubbed_md5
        FROM kept GROUP BY doc_id
    """,
    doc="Exact-substring scrub: rebuild each doc with every corpus-"
    "repeated span's tokens removed — ALL occurrences cut, the "
    "conservative form under which no copy of repeated boilerplate "
    "reaches training data. Span ranges join back to the exploded word "
    "table on the doc_id equi-key (range predicate as residual); emits "
    "kept-token counts and an md5 of each scrubbed doc so the oracle "
    "value-checks every surviving character. Docs scrubbed to nothing "
    "drop out.",
)
def substring_scrubbed_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _enriched(spark, sf_dir)
    spans = _spans(spark, sf_dir)
    # spread: the word explode feeds an anti-join probe side whose
    # build is broadcast (see registry.spread)
    words = spread(e, "doc_id").select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")),
    ).select(
        "doc_id", F.col("pos").cast("bigint").alias("wi"), F.col("col").alias("word")
    )
    kept = words.alias("w").join(
        spans.alias("s"),
        (F.col("w.doc_id") == F.col("s.doc_id"))
        & (F.col("w.wi") >= F.col("s.span_start"))
        & (F.col("w.wi") <= F.col("s.span_end")),
        "left_anti",
    )
    return kept.groupBy("doc_id").agg(
        F.count("*").alias("kept_tokens"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("wi", "word"))),
                    lambda s: s.word,
                ),
            )
        ).alias("scrubbed_md5"),
    )
