"""PII scrubbing and chunk-level dedup — pretraining-pipeline stages.

Two stages every production LLM data pipeline runs that the corpus
tooling here previously lacked:

- **PII detection / redaction** (RefinedWeb/FineWeb-style): regex
  detectors for emails, IPv4 addresses, and phone numbers; counts per
  source and a redacted survivor corpus. The synthetic documents table
  contains no PII, so the queries first enrich each doc with
  deterministic doc_id-derived PII spans — the oracle re-derives the
  same enrichment in SQL, which means the detector/redactor machinery
  itself is value-hash-checked with non-zero match counts (a zero-match
  oracle would prove nothing). Patterns use the portable intersection
  of Java regex (Spark) and RE2 (DuckDB): character classes, bounded
  repetition, ``\\b`` — no lookarounds.

- **Chunk-level dedup** (C4's line dedup, generalized): split each doc
  into 8-word chunks, dedup chunks globally keeping the first
  occurrence by (doc_id, chunk_id), reassemble survivors. At 100 TB
  the keep-first window shuffles only (digest, doc_id, chunk_id) — 16 B
  md5 digests plus two longs, never chunk text; survivors join back to
  the chunk table on the (doc_id, chunk_id) equi-key (plan-asserted in
  tests/test_plans.py). Within-doc repetition (Gopher rule) is pure
  array algebra — no shuffle at all beyond the final tiny aggregate.

All JVM built-ins; zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sierradb_spark.registry import Registry, load

REG = Registry()

# Portable Java/RE2 patterns (no lookarounds).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def _enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents with deterministic doc_id-derived PII spans appended.

    The testdata corpus is synthetic word soup with no PII; this makes
    the detectors measurable. Every doc gains an email and an IP; every
    third doc a phone number. The SQL oracle reproduces this expression
    exactly, so both engines scan identical text.
    """
    d = load(spark, sf_dir, "documents")
    email = F.concat(
        F.lit("user"), F.col("doc_id"),
        F.lit("@example-"), F.col("doc_id") % 7, F.lit(".com"),
    )
    ip = F.concat(
        F.lit("10."), F.col("doc_id") % 200,
        F.lit("."), F.col("doc_id") % 250,
        F.lit("."), F.col("doc_id") % 97,
    )
    phone = F.concat(
        F.lit("555-"), (100 + F.col("doc_id") % 900).cast("string"),
        F.lit("-"), (1000 + F.col("doc_id") % 9000).cast("string"),
    )
    enriched = F.concat(
        F.col("text"), F.lit(" contact "), email, F.lit(" from "), ip,
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit(" call "), phone))
        .otherwise(F.lit("")),
    )
    return d.select("doc_id", "source", "lang", enriched.alias("text"))


_SQL_ENRICHED = """
    SELECT doc_id, source, lang,
           text || ' contact user' || doc_id || '@example-'
                || (doc_id % 7) || '.com'
                || ' from 10.' || (doc_id % 200) || '.' || (doc_id % 250)
                || '.' || (doc_id % 97)
                || CASE WHEN doc_id % 3 = 0
                        THEN ' call 555-' || (100 + doc_id % 900)
                             || '-' || (1000 + doc_id % 9000)
                        ELSE '' END AS text
    FROM documents
"""


@REG.add(
    "pii_detection_stats",
    oracle=f"""
        WITH e AS ({_SQL_ENRICHED})
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(regexp_extract_all(text, '{EMAIL_RE}'))) AS BIGINT)
                   AS n_emails,
               CAST(sum(len(regexp_extract_all(text, '{IPV4_RE}'))) AS BIGINT)
                   AS n_ipv4,
               CAST(sum(len(regexp_extract_all(text, '{PHONE_RE}'))) AS BIGINT)
                   AS n_phones,
               CAST(sum(CASE WHEN len(regexp_extract_all(text, '{PHONE_RE}')) > 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_phone
        FROM e GROUP BY source
    """,
    doc="PII detector sweep: per-source counts of email/IPv4/phone matches "
    "over the (deterministically PII-enriched) corpus. regexp_count is "
    "whole-stage codegen; one scan, one tiny aggregate — the audit query "
    "run before any redaction pass.",
)
def pii_detection_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _enriched(spark, sf_dir)
    n_phone = F.regexp_count(F.col("text"), F.lit(PHONE_RE))
    return e.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.regexp_count(F.col("text"), F.lit(EMAIL_RE))).alias("n_emails"),
        F.sum(F.regexp_count(F.col("text"), F.lit(IPV4_RE))).alias("n_ipv4"),
        F.sum(n_phone).alias("n_phones"),
        F.sum((n_phone > 0).cast("bigint")).alias("docs_with_phone"),
    )


def redact_col(text: F.Column) -> F.Column:
    """The canonical PII redaction chain. Order is load-bearing —
    emails first so their domains can't be half-eaten by the IP
    pattern — so every redaction site (this module's operator, the
    example pipeline) must call THIS helper, not rebuild the chain."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, EMAIL_RE, "[EMAIL]"),
            IPV4_RE, "[IP]",
        ),
        PHONE_RE, "[PHONE]",
    )


@REG.add(
    "pii_redacted_corpus",
    oracle=f"""
        WITH e AS ({_SQL_ENRICHED}),
        r AS (
            SELECT doc_id,
                   len(regexp_extract_all(text, '{EMAIL_RE}'))
                   + len(regexp_extract_all(text, '{IPV4_RE}'))
                   + len(regexp_extract_all(text, '{PHONE_RE}')) AS n_redactions,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(text, '{EMAIL_RE}', '[EMAIL]', 'g'),
                           '{IPV4_RE}', '[IP]', 'g'),
                       '{PHONE_RE}', '[PHONE]', 'g') AS redacted
            FROM e
        )
        SELECT doc_id, CAST(n_redactions AS BIGINT) AS n_redactions,
               md5(redacted) AS redacted_md5,
               CAST(length(redacted) AS BIGINT) AS redacted_len
        FROM r
    """,
    doc="Redaction pass: emails -> [EMAIL], IPv4 -> [IP], phones -> [PHONE], "
    "in that order (emails first so their domains can't be half-eaten by the "
    "IP pattern). Emits the per-doc redaction count and an md5 of the full "
    "redacted text, so the oracle value-checks every replaced character "
    "without hauling the corpus through the compare.",
)
def pii_redacted_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _enriched(spark, sf_dir)
    n_red = (
        F.regexp_count(F.col("text"), F.lit(EMAIL_RE))
        + F.regexp_count(F.col("text"), F.lit(IPV4_RE))
        + F.regexp_count(F.col("text"), F.lit(PHONE_RE))
    )
    redacted = redact_col(F.col("text"))
    return e.select(
        "doc_id",
        n_red.cast("bigint").alias("n_redactions"),
        F.md5(redacted).alias("redacted_md5"),
        F.length(redacted).cast("bigint").alias("redacted_len"),
    )


CHUNK_WORDS = 8

_SPARK_CHUNKS = f"""
    CASE WHEN length(trim(text)) = 0 THEN array()
         ELSE transform(
             sequence(0, int(ceil(size(split(trim(text), '\\\\s+')) / {CHUNK_WORDS}.0)) - 1),
             i -> concat_ws(' ', slice(split(trim(text), '\\\\s+'),
                                       i * {CHUNK_WORDS} + 1, {CHUNK_WORDS})))
    END
"""

_SQL_CHUNKS = f"""
    CASE WHEN length(trim(text)) = 0 THEN []
         ELSE list_transform(
             range(0, CAST(ceil(len(regexp_split_to_array(trim(text), '\\s+'))
                                / {CHUNK_WORDS}.0) AS BIGINT)),
             i -> array_to_string(
                 regexp_split_to_array(trim(text), '\\s+')
                     [(i * {CHUNK_WORDS} + 1):(i * {CHUNK_WORDS} + {CHUNK_WORDS})],
                 ' '))
    END
"""


def _chunk_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, chunk_id, chunk, digest): docs exploded into
    8-word chunks with md5 digests — the C4 'line' unit."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "lang", F.posexplode(F.expr(_SPARK_CHUNKS))
    ).select(
        "doc_id",
        "lang",
        F.col("pos").cast("bigint").alias("chunk_id"),
        F.col("col").alias("chunk"),
        F.md5("col").alias("digest"),
    )


# Parallel unnests zip in DuckDB, so the series supplies the ordinal.
_SQL_CHUNK_TABLE = f"""
    SELECT doc_id, lang, (i - 1)::BIGINT AS chunk_id, chunk,
           md5(chunk) AS digest
    FROM (
        SELECT doc_id, lang, unnest(chunks) AS chunk,
               unnest(generate_series(1, len(chunks))) AS i
        FROM (SELECT doc_id, lang, {_SQL_CHUNKS} AS chunks FROM documents)
    )
"""


@REG.add(
    "chunk_dedup_stats",
    oracle=f"""
        WITH c AS ({_SQL_CHUNK_TABLE})
        SELECT lang,
               CAST(count(*) AS BIGINT) AS total_chunks,
               CAST(count(DISTINCT digest) AS BIGINT) AS distinct_chunks,
               floor((1.0 - count(DISTINCT digest)::DOUBLE / count(*))
                     * 1e6 + 0.5) / 1e6 AS dup_fraction
        FROM c GROUP BY lang
    """,
    doc="Corpus-level chunk-dedup audit: per-language total vs distinct "
    "8-word chunks and the duplicate fraction — the measurement that decides "
    "whether a C4-style chunk dedup pass is worth its shuffle. Aggregates "
    "16 B digests, never chunk text.",
)
def chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _chunk_table(spark, sf_dir)
    return c.groupBy("lang").agg(
        F.count("*").alias("total_chunks"),
        F.count_distinct("digest").alias("distinct_chunks"),
        (
            F.floor(
                (1.0 - F.count_distinct("digest") / F.count("*")) * 1e6 + 0.5
            )
            / 1e6
        ).alias("dup_fraction"),
    )


@REG.add(
    "chunk_dedup_survivors",
    oracle=f"""
        WITH c AS ({_SQL_CHUNK_TABLE}),
        w AS (
            SELECT doc_id, chunk_id,
                   row_number() OVER (PARTITION BY digest
                                      ORDER BY doc_id, chunk_id) AS rn
            FROM c
        ),
        kept AS (
            SELECT c.doc_id, c.chunk_id, c.chunk
            FROM c JOIN w ON c.doc_id = w.doc_id AND c.chunk_id = w.chunk_id
            WHERE w.rn = 1
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS kept_chunks,
               md5(string_agg(chunk, ' ' ORDER BY chunk_id)) AS survivor_md5
        FROM kept GROUP BY doc_id
    """,
    doc="C4-style global chunk dedup, keep-first by (doc_id, chunk_id): the "
    "keep-first window runs over (digest, doc_id, chunk_id) ONLY — 16 B "
    "digests plus two longs shuffle, never chunk text — and survivors join "
    "back on the (doc_id, chunk_id) equi-key to reassemble each doc "
    "(docs whose every chunk was seen earlier drop out entirely). Emits "
    "kept-chunk counts and an md5 of each reassembled survivor doc.",
)
def chunk_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _chunk_table(spark, sf_dir)
    w = Window.partitionBy("digest").orderBy("doc_id", "chunk_id")
    winners = (
        c.select("digest", "doc_id", "chunk_id")  # digests only: no text in the shuffle
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "chunk_id")
    )
    kept = c.join(winners, ["doc_id", "chunk_id"], "left_semi")
    return kept.groupBy("doc_id").agg(
        F.count("*").alias("kept_chunks"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("chunk_id", "chunk"))
                    ),
                    lambda s: s.chunk,
                ),
            )
        ).alias("survivor_md5"),
    )


@REG.add(
    "doc_repetition_gopher",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, lang, {_SQL_CHUNKS} AS chunks FROM documents
        ),
        s AS (
            SELECT doc_id, lang,
                   len(chunks) AS n_chunks,
                   len(chunks) - len(list_distinct(chunks)) AS n_dup
            FROM d WHERE len(chunks) > 0
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN n_dup::DOUBLE / n_chunks <= 0.3
                        THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
               floor(avg(n_dup::DOUBLE / n_chunks) * 1e6 + 0.5) / 1e6
                   AS avg_dup_fraction
        FROM s GROUP BY lang
    """,
    doc="Gopher-style within-doc repetition filter: fraction of a doc's "
    "chunks that repeat inside the SAME doc (pure array algebra — "
    "size - size(array_distinct), zero shuffle until the per-language "
    "aggregate); docs over 30% repeated chunks are dropped.",
)
def doc_repetition_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    chunks = F.expr(_SPARK_CHUNKS)
    s = (
        d.select("doc_id", "lang", chunks.alias("chunks"))
        .where(F.size("chunks") > 0)
        .select(
            "lang",
            F.size("chunks").alias("n_chunks"),
            (F.size("chunks") - F.size(F.array_distinct("chunks"))).alias(
                "n_dup"
            ),
        )
    )
    frac = F.col("n_dup").cast("double") / F.col("n_chunks")
    return s.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum((frac <= 0.3).cast("bigint")).alias("docs_kept"),
        (F.floor(F.avg(frac) * 1e6 + 0.5) / 1e6).alias("avg_dup_fraction"),
    )


# --- canonical-URL dedup ----------------------------------------------------
#
# Crawl pipelines dedup by canonical URL before any content pass: the
# same page arrives as http/https, with/without www., with/without a
# trailing slash, and wrapped in tracking params. The corpus has no URL
# column, so docs are enriched with deterministic doc_id-derived URLs
# exhibiting all four variation axes; the oracle re-derives the same
# enrichment (the PII-detector pattern), so the normalizer itself is
# value-checked with real duplicate groups.
#
# Canonical form: https + no www. + no trailing slash + only the id
# param. Extraction regexes use the Java/RE2 intersection (non-capturing
# groups, no lookarounds).

_SPARK_URL = """
    concat(
        CASE WHEN doc_id % 4 = 0 THEN 'http://' ELSE 'https://' END,
        CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END,
        'site', CAST(doc_id % 4 AS STRING), '.com/p/',
        CAST(doc_id % 5 AS STRING),
        CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END,
        CASE WHEN doc_id % 2 = 0
             THEN concat('?utm_source=feed&utm_id=',
                         CAST(doc_id % 5 AS STRING),
                         '&id=', CAST(doc_id % 10 AS STRING))
             ELSE concat('?id=', CAST(doc_id % 10 AS STRING)) END
    )
"""

_SQL_URL = """
    (CASE WHEN doc_id % 4 = 0 THEN 'http://' ELSE 'https://' END)
    || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
    || 'site' || (doc_id % 4) || '.com/p/' || (doc_id % 5)
    || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
    || (CASE WHEN doc_id % 2 = 0
             THEN '?utm_source=feed&utm_id=' || (doc_id % 5)
                  || '&id=' || (doc_id % 10)
             ELSE '?id=' || (doc_id % 10) END)
"""

_HOSTPATH_RE = r"^https?://(?:www\.)?([^?]*)"
_ID_RE = r"[?&]id=([0-9]+)"


@REG.add(
    "url_canonical_dedup",
    oracle=f"""
        WITH u AS (
            SELECT doc_id, {_SQL_URL} AS url FROM documents
        ),
        c AS (
            SELECT doc_id, url,
                   'https://'
                   || regexp_replace(
                          regexp_extract(url, '{_HOSTPATH_RE}', 1), '/$', '')
                   || '?id=' || regexp_extract(url, '{_ID_RE}', 1)
                       AS canonical,
                   regexp_extract(url, 'site([0-9]+)\\.com', 1) AS site
            FROM u
        )
        SELECT 'site' || site || '.com' AS domain,
               CAST(count(*) AS BIGINT) AS n_urls,
               CAST(count(DISTINCT canonical) AS BIGINT) AS n_canonical,
               CAST(min(doc_id) AS BIGINT) AS first_doc,
               floor((1.0 - count(DISTINCT canonical)::DOUBLE / count(*))
                     * 1e6 + 0.5) / 1e6 AS dup_ratio
        FROM c GROUP BY site
    """,
    doc="Canonical-URL dedup audit: normalize scheme (-> https), strip "
    "www., trailing slash, and tracking params (keep only ?id=N), then "
    "count raw vs canonical URLs per domain — the crawl-side dedup pass "
    "that runs before any content hashing. Normalization is three "
    "regexes in whole-stage codegen; the aggregate shuffles canonical "
    "strings only.",
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    u = d.select("doc_id", F.expr(_SPARK_URL).alias("url"))
    canonical = F.concat(
        F.lit("https://"),
        F.regexp_replace(
            F.regexp_extract(F.col("url"), _HOSTPATH_RE, 1), r"/$", ""
        ),
        F.lit("?id="),
        F.regexp_extract(F.col("url"), _ID_RE, 1),
    )
    site = F.regexp_extract(F.col("url"), r"site([0-9]+)\.com", 1)
    c = u.select("doc_id", canonical.alias("canonical"), site.alias("site"))
    return c.groupBy("site").agg(
        F.count("*").alias("n_urls"),
        F.count_distinct("canonical").alias("n_canonical"),
        F.min("doc_id").alias("first_doc"),
        (
            F.floor(
                (1.0 - F.count_distinct("canonical") / F.count("*")) * 1e6
                + 0.5
            )
            / 1e6
        ).alias("dup_ratio"),
    ).select(
        F.concat(F.lit("site"), F.col("site"), F.lit(".com")).alias("domain"),
        "n_urls",
        "n_canonical",
        "first_doc",
        "dup_ratio",
    )
