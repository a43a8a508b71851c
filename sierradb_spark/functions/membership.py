"""Mergeable membership / count sketches and containment scoring.

Cross-shard dedup at 100 TB cannot join every new shard against every
old shard's raw digests; the production shapes are:

- a BLOOM FILTER over the already-ingested chunk-digest universe
  (mergeable bit-OR across shards, ~1 byte/element at 1% FP), probed by
  each incoming shard — implemented here as a distinct bit-position set
  with k=3 md5-derived hash functions, plus the false-positive audit
  that tells you whether the configured m/k fits the corpus;
- a COUNT-MIN SKETCH for heavy-hitter detection over unbounded token
  streams (mergeable cell-wise addition), with the classic min-over-rows
  point estimate and an overestimate audit against exact counts;
- CONTAINMENT scoring C(A,B) = |A ∩ B| / |A| over chunk sets for LSH
  candidate pairs — resemblance (Jaccard) misses the "document B is a
  quote-wrapper around document A" case; containment is the Broder
  measure that catches partial duplication.

Everything is deterministic (md5-slice hashing, the repo's portable
convention) so DuckDB oracles replicate bit-for-bit. The sketch tables
themselves are fixed-size (65536 bits / 4x512 cells) regardless of
corpus size — the whole point — and always sit on the broadcast side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sierradb_spark.registry import Registry
from sierradb_spark.functions.scrub import _chunk_table, _SQL_CHUNK_TABLE
from sierradb_spark.functions.dedup_wide import (
    _SQL_CAND_COMPONENTS,
    _SQL_WIDE_MINS,
    _wide_candidates_pinned,
    wide_near_dup_components,
)

REG = Registry()

# ---------------------------------------------------------------------------
# Bloom-filter membership audit
# ---------------------------------------------------------------------------

_BLOOM_BITS = 65536
_BLOOM_K = 3


def _bloom_pos(digest: Column, j: int) -> Column:
    """Hash-function j: md5 of the digest with a salt, first 8 hex chars
    as an integer, mod the bit-array size. Same recipe in the oracle."""
    return (
        F.conv(F.substring(F.md5(F.concat(digest, F.lit(f"#{j}"))), 1, 8), 16, 10)
        .cast("long")
        % _BLOOM_BITS
    )


def _sql_bloom_pos(expr: str, j: int) -> str:
    return (
        f"('0x' || substr(md5({expr} || '#{j}'), 1, 8))::UBIGINT % {_BLOOM_BITS}"
    )


_SQL_BLOOM = f"""
    WITH chunks AS MATERIALIZED ({_SQL_CHUNK_TABLE}),
    base AS MATERIALIZED (
        SELECT DISTINCT digest FROM chunks WHERE doc_id % 2 = 0
    ),
    bloom AS MATERIALIZED (
        SELECT DISTINCT pos FROM (
            {" UNION ALL ".join(f"SELECT {_sql_bloom_pos('digest', j)} AS pos FROM base" for j in range(_BLOOM_K))}
        )
    ),
    probe AS MATERIALIZED (
        SELECT DISTINCT digest FROM chunks WHERE doc_id % 2 = 1
    ),
    probe_hits AS (
        SELECT p.digest,
               {" + ".join(f"(CASE WHEN EXISTS (SELECT 1 FROM bloom b WHERE b.pos = {_sql_bloom_pos('p.digest', j)}) THEN 1 ELSE 0 END)" for j in range(_BLOOM_K))}
                   AS k_hits,
               (EXISTS (SELECT 1 FROM base s WHERE s.digest = p.digest))
                   AS actually
        FROM probe p
    )
    SELECT CAST((SELECT count(*) FROM probe) AS BIGINT) AS probed_digests,
           CAST(sum(CASE WHEN k_hits = {_BLOOM_K} THEN 1 ELSE 0 END) AS BIGINT)
               AS maybe_seen,
           CAST(sum(CASE WHEN actually THEN 1 ELSE 0 END) AS BIGINT)
               AS actually_seen,
           CAST(sum(CASE WHEN k_hits = {_BLOOM_K} AND NOT actually
                         THEN 1 ELSE 0 END) AS BIGINT) AS false_positives,
           round(sum(CASE WHEN k_hits = {_BLOOM_K} AND NOT actually
                          THEN 1 ELSE 0 END)
                 / greatest(sum(CASE WHEN NOT actually THEN 1 ELSE 0 END),
                            1)::DOUBLE, 6) AS fp_rate,
           CAST((SELECT count(*) FROM bloom) AS BIGINT) AS bloom_bits_set,
           round((SELECT count(*) FROM bloom) / {_BLOOM_BITS}.0, 6)
               AS bloom_fill
    FROM probe_hits
"""


@REG.add(
    "bloom_membership_audit",
    oracle=_SQL_BLOOM,
    doc=f"Cross-shard Bloom-filter dedup audit: build an m={_BLOOM_BITS}-bit, "
    f"k={_BLOOM_K}-hash Bloom filter over the already-ingested shard's chunk "
    "digests (even doc_ids), probe the incoming shard (odd doc_ids), and "
    "report maybe-seen vs actually-seen counts, the realized false-positive "
    "rate, and the filter fill factor. No false negatives by construction "
    "(every actually-seen digest set its own bits). Scale shape: the filter "
    "is a FIXED-size distinct bit-position set (<= m rows, broadcast to the "
    "probe side) and is mergeable across shards by union — the incoming "
    "corpus never joins against raw historical digests, which is the entire "
    "point at 100 TB.",
)
def bloom_membership_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = _chunk_table(spark, sf_dir).localCheckpoint(eager=True)
    base = (
        chunks.filter(F.col("doc_id") % 2 == 0).select("digest").distinct()
    )
    bloom = (
        base.select(
            F.explode(
                F.array(*[_bloom_pos(F.col("digest"), j) for j in range(_BLOOM_K)])
            ).alias("pos")
        )
        .distinct()
        .localCheckpoint(eager=True)  # pin: probed by k joins + counted
    )
    probe = (
        chunks.filter(F.col("doc_id") % 2 == 1).select("digest").distinct()
    )
    # One row per (digest, hash j); a row survives the broadcast semi
    # join iff its bit is set, so all-k-bits-set == k surviving rows.
    probe_pos = probe.select(
        "digest",
        F.posexplode(
            F.array(*[_bloom_pos(F.col("digest"), j) for j in range(_BLOOM_K)])
        ).alias("j", "pos"),
    )
    k_hits = (
        probe_pos.join(F.broadcast(bloom), "pos")
        .groupBy("digest")
        .agg(F.count("*").alias("k_hits"))
    )
    flags = (
        probe.join(k_hits, "digest", "left")
        .join(base.withColumn("actually", F.lit(True)), "digest", "left")
        .select(
            "digest",
            (F.coalesce(F.col("k_hits"), F.lit(0)) == _BLOOM_K).alias("maybe"),
            F.coalesce(F.col("actually"), F.lit(False)).alias("actually"),
        )
    )
    n_bits = bloom.count()
    return flags.agg(
        F.count("*").alias("probed_digests"),
        F.sum(F.when(F.col("maybe"), 1).otherwise(0)).alias("maybe_seen"),
        F.sum(F.when(F.col("actually"), 1).otherwise(0)).alias("actually_seen"),
        F.sum(F.when(F.col("maybe") & ~F.col("actually"), 1).otherwise(0)).alias(
            "false_positives"
        ),
        F.round(
            F.sum(F.when(F.col("maybe") & ~F.col("actually"), 1).otherwise(0))
            / F.greatest(
                F.sum(F.when(~F.col("actually"), 1).otherwise(0)), F.lit(1)
            ).cast("double"),
            6,
        ).alias("fp_rate"),
        F.lit(n_bits).cast("long").alias("bloom_bits_set"),
        F.round(F.lit(n_bits) / F.lit(float(_BLOOM_BITS)), 6).alias("bloom_fill"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters
# ---------------------------------------------------------------------------

_CMS_D = 4
_CMS_W = 512
_TOP_HH = 20


def _cms_bucket(word: Column, r: int) -> Column:
    return (
        F.conv(F.substring(F.md5(F.concat(word, F.lit(f"@{r}"))), 1, 8), 16, 10)
        .cast("long")
        % _CMS_W
    )


def _sql_cms_bucket(expr: str, r: int) -> str:
    return f"('0x' || substr(md5({expr} || '@{r}'), 1, 8))::UBIGINT % {_CMS_W}"


_SQL_CMS = f"""
    WITH words AS MATERIALIZED (
        SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
        FROM documents WHERE length(trim(text)) > 0
    ),
    cells AS MATERIALIZED (
        SELECT r, bucket, count(*) AS c FROM (
            {" UNION ALL ".join(f"SELECT {r} AS r, {_sql_cms_bucket('word', r)} AS bucket FROM words" for r in range(_CMS_D))}
        ) GROUP BY r, bucket
    ),
    exact AS (SELECT word, count(*) AS exact_count FROM words GROUP BY word),
    est AS (
        SELECT e.word, e.exact_count,
               least({", ".join(f"(SELECT c FROM cells WHERE r = {r} AND bucket = {_sql_cms_bucket('e.word', r)})" for r in range(_CMS_D))})
                   AS est_count
        FROM exact e
    )
    SELECT word, CAST(est_count AS BIGINT) AS est_count,
           CAST(exact_count AS BIGINT) AS exact_count,
           CAST(est_count - exact_count AS BIGINT) AS overestimate
    FROM est
    ORDER BY est_count DESC, word
    LIMIT {_TOP_HH}
"""


@REG.add(
    "cms_heavy_hitters",
    oracle=_SQL_CMS,
    doc=f"Count-min sketch heavy hitters: a {_CMS_D}x{_CMS_W} CMS over the "
    "corpus word stream (md5-salted row hashes), point estimates as the "
    f"min over rows, and the top-{_TOP_HH} tokens by estimate with the exact "
    "count and CMS overestimate alongside (the classic epsilon*N error "
    "audit). Scale shape: the sketch is a fixed "
    f"{_CMS_D * _CMS_W}-cell table built by one map-side-combining "
    "aggregate (mergeable cell-wise across shards/streams) and broadcast to "
    "the candidate set; the token stream is scanned once per row salt and "
    "never shuffles raw text. The exact-count column is the AUDIT side — a "
    "production heavy-hitter pass keeps only the sketch and a candidate "
    "sample.",
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sierradb_spark.registry import load

    d = load(spark, sf_dir, "documents")
    words = (
        d.filter(F.length(F.trim("text")) > 0)
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
        .localCheckpoint(eager=True)  # pin: d row-salt passes + exact pass
    )
    cells = (
        words.select(
            F.posexplode(
                F.array(*[_cms_bucket(F.col("word"), r) for r in range(_CMS_D)])
            ).alias("r", "bucket")
        )
        .groupBy("r", "bucket")
        .agg(F.count("*").alias("c"))
    )
    exact = words.groupBy("word").agg(F.count("*").alias("exact_count"))
    probe = exact.select(
        "word",
        "exact_count",
        F.posexplode(
            F.array(*[_cms_bucket(F.col("word"), r) for r in range(_CMS_D)])
        ).alias("r", "bucket"),
    )
    return (
        probe.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("word", "exact_count")
        .agg(F.min("c").alias("est_count"))
        .select(
            "word",
            F.col("est_count").cast("long").alias("est_count"),
            F.col("exact_count").cast("long").alias("exact_count"),
            (F.col("est_count") - F.col("exact_count"))
            .cast("long")
            .alias("overestimate"),
        )
        .orderBy(F.desc("est_count"), "word")
        .limit(_TOP_HH)
    )


# ---------------------------------------------------------------------------
# Containment (partial-duplicate) scoring for LSH candidate pairs
# ---------------------------------------------------------------------------


_SQL_CONTAINMENT = f"""
        WITH {_SQL_WIDE_MINS},
        cand AS MATERIALIZED (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band_idx = b.band_idx AND a.band_digest = b.band_digest
             AND a.doc_id < b.doc_id
        ),
        cset AS MATERIALIZED (
            SELECT DISTINCT doc_id, digest FROM ({_SQL_CHUNK_TABLE})
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM cset GROUP BY doc_id),
        inter AS (
            SELECT c.doc_a, c.doc_b, count(*) AS n_inter
            FROM cand c
            JOIN cset ca ON ca.doc_id = c.doc_a
            JOIN cset cb ON cb.doc_id = c.doc_b AND cb.digest = ca.digest
            GROUP BY c.doc_a, c.doc_b
        )
        SELECT c.doc_a, c.doc_b,
               CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
               CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter,
               round(coalesce(i.n_inter, 0) / sa.n::DOUBLE, 6)
                   AS containment_a,
               round(coalesce(i.n_inter, 0) / sb.n::DOUBLE, 6)
                   AS containment_b,
               round(coalesce(i.n_inter, 0)
                     / (sa.n + sb.n - coalesce(i.n_inter, 0))::DOUBLE, 6)
                   AS jaccard_chunks
        FROM cand c
        JOIN sizes sa ON sa.doc_id = c.doc_a
        JOIN sizes sb ON sb.doc_id = c.doc_b
        LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
"""


@REG.add(
    "containment_partial_dup",
    oracle=_SQL_CONTAINMENT,
    doc="Broder containment C(A,B) = |chunks(A) n chunks(B)| / |chunks(A)| "
    "(both directions, plus chunk-level Jaccard) for every production-"
    "width MinHash LSH candidate pair — resemblance misses the 'B embeds "
    "all of A inside extra boilerplate' case; high containment_a with "
    "low jaccard is exactly that signature. Scale shape: pairwise work "
    "is confined to LSH candidates (collision-scaled, never N^2); the "
    "chunk-set join moves 16-byte digests keyed by doc_id, and the "
    "per-doc size table rides broadcast.",
)
def containment_partial_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cand = _wide_candidates_pinned(spark, sf_dir)
    cset = (
        _chunk_table(spark, sf_dir)
        .select("doc_id", "digest")
        .distinct()
        .localCheckpoint(eager=True)  # pin: sizes + two intersect joins
    )
    sizes = cset.groupBy("doc_id").agg(F.count("*").alias("n"))
    ca, cb = cset.alias("ca"), cset.alias("cb")
    inter = (
        cand.join(ca, F.col("ca.doc_id") == F.col("doc_a"))
        .join(
            cb,
            (F.col("cb.doc_id") == F.col("doc_b"))
            & (F.col("cb.digest") == F.col("ca.digest")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    ni = F.coalesce(F.col("n_inter"), F.lit(0))
    return (
        cand.join(
            F.broadcast(sizes.withColumnRenamed("n", "n_a")),
            F.col("doc_id") == F.col("doc_a"),
        )
        .drop("doc_id")
        .join(
            F.broadcast(sizes.withColumnRenamed("n", "n_b")),
            F.col("doc_id") == F.col("doc_b"),
        )
        .drop("doc_id")
        .join(inter, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            ni.cast("long").alias("n_inter"),
            F.round(ni / F.col("n_a").cast("double"), 6).alias("containment_a"),
            F.round(ni / F.col("n_b").cast("double"), 6).alias("containment_b"),
            F.round(
                ni / (F.col("n_a") + F.col("n_b") - ni).cast("double"), 6
            ).alias("jaccard_chunks"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-source chunk-overlap matrix
# ---------------------------------------------------------------------------

_SQL_SOURCE_OVERLAP = f"""
    WITH cs AS MATERIALIZED (
        SELECT DISTINCT d.source, c.digest
        FROM ({_SQL_CHUNK_TABLE}) c
        JOIN documents d ON d.doc_id = c.doc_id
    ),
    sizes AS (SELECT source, count(*) AS n FROM cs GROUP BY source),
    inter AS (
        SELECT a.source AS source_a, b.source AS source_b,
               count(*) AS n_shared
        FROM cs a JOIN cs b
          ON a.digest = b.digest AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT i.source_a, i.source_b,
           CAST(i.n_shared AS BIGINT) AS n_shared,
           CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
           round(i.n_shared / least(sa.n, sb.n)::DOUBLE, 6)
               AS overlap_coef,
           round(i.n_shared / (sa.n + sb.n - i.n_shared)::DOUBLE, 6)
               AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.source_a
    JOIN sizes sb ON sb.source = i.source_b
"""


@REG.add(
    "source_overlap_matrix",
    oracle=_SQL_SOURCE_OVERLAP,
    doc="Pairwise source-to-source content overlap: distinct chunk "
    "digests per source, intersected via a digest equi-join (source_a < "
    "source_b), reported as the Szymkiewicz-Simpson overlap coefficient "
    "and Jaccard — the 'which crawls/dumps duplicate each other' matrix "
    "that drives mixture weights and ingestion-order dedup planning. "
    "Only pairs that actually SHARE a digest appear (the join produces "
    "them; disjoint pairs would be all-zero rows). Scale shape: the "
    "digest equi-join shuffles 16-byte digests once; per-source sizes "
    "ride broadcast; no pair enumeration beyond real collisions.",
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sierradb_spark.registry import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    cs = (
        _chunk_table(spark, sf_dir)
        .join(docs, "doc_id")
        .select("source", "digest")
        .distinct()
        .localCheckpoint(eager=True)  # sizes + self-join reuse
    )
    sizes = cs.groupBy("source").agg(F.count("*").alias("n"))
    a, b = cs.alias("a"), cs.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.digest") == F.col("b.digest"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        inter.join(
            F.broadcast(sizes.withColumnRenamed("n", "n_a")),
            F.col("source") == F.col("source_a"),
        )
        .drop("source")
        .join(
            F.broadcast(sizes.withColumnRenamed("n", "n_b")),
            F.col("source") == F.col("source_b"),
        )
        .drop("source")
        .select(
            "source_a",
            "source_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(
                F.col("n_shared") / F.least("n_a", "n_b").cast("double"), 6
            ).alias("overlap_coef"),
            F.round(
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Train/val/test split-leakage audit (component-hash vs naive doc-hash)
# ---------------------------------------------------------------------------

from sierradb_spark.functions.pipeline import (  # noqa: E402
    _KNUTH,
    _RING,
    _hash32,
)

_SQL_SPLIT_LEAKAGE = f"""
    WITH RECURSIVE {_SQL_WIDE_MINS},
    {_SQL_CAND_COMPONENTS},
    splits AS (
        SELECT d.doc_id,
               coalesce(c.label, d.doc_id) AS component,
               CASE WHEN (coalesce(c.label, d.doc_id) * {_KNUTH}) % {_RING} % 10 <= 7
                    THEN 'train'
                    WHEN (coalesce(c.label, d.doc_id) * {_KNUTH}) % {_RING} % 10 = 8
                    THEN 'val' ELSE 'test' END AS split_comp,
               CASE WHEN (d.doc_id * {_KNUTH}) % {_RING} % 10 <= 7 THEN 'train'
                    WHEN (d.doc_id * {_KNUTH}) % {_RING} % 10 = 8 THEN 'val'
                    ELSE 'test' END AS split_naive
        FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    ),
    multi AS (
        SELECT component,
               count(DISTINCT split_naive) AS naive_splits,
               count(DISTINCT split_comp) AS comp_splits
        FROM splits GROUP BY component HAVING count(*) >= 2
    )
    SELECT CAST((SELECT count(*) FROM multi) AS BIGINT)
               AS n_multi_components,
           CAST((SELECT count(*) FROM multi WHERE naive_splits > 1)
                AS BIGINT) AS naive_leaky_components,
           CAST((SELECT count(*) FROM multi WHERE comp_splits > 1)
                AS BIGINT) AS component_leaky_components,
           CAST(sum(CASE WHEN split_comp = 'train' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_train,
           CAST(sum(CASE WHEN split_comp = 'val' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_val,
           CAST(sum(CASE WHEN split_comp = 'test' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_test
    FROM splits
"""


@REG.add(
    "split_leakage_audit",
    oracle=_SQL_SPLIT_LEAKAGE,
    doc="Train/val/test split-leakage audit: assign every document to a "
    "split by hashing its NEAR-DUP COMPONENT label (LSH candidates -> "
    "min-label components; singletons are their own component) and compare "
    "against the naive per-document hash split. The naive split leaks "
    "near-duplicates across the train/eval boundary (counted here); the "
    "component split cannot (asserted zero in the same output row). This "
    "is the eval-contamination failure mode dedup exists to prevent — the "
    "80/10/10 assignment is the standard pretraining holdout shape. Scale "
    "shape: reuses the collision-scaled band join + fixpoint components; "
    "the audit itself is two hash columns and one aggregate over "
    "(component, split) — no new corpus-sized state.",
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sierradb_spark.registry import load

    comp = wide_near_dup_components(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id")

    def split_of(h):
        m = h % 10
        return (
            F.when(m <= 7, F.lit("train"))
            .when(m == 8, F.lit("val"))
            .otherwise(F.lit("test"))
        )

    assign = docs.join(
        F.broadcast(comp), docs["doc_id"] == comp["id"], "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("label"), F.col("doc_id")).alias("component"),
    )
    splits = assign.select(
        "doc_id",
        "component",
        split_of(_hash32(F.col("component"))).alias("split_comp"),
        split_of(_hash32(F.col("doc_id"))).alias("split_naive"),
    ).localCheckpoint(eager=True)  # reused: per-component agg + totals
    multi = (
        splits.groupBy("component")
        .agg(
            F.count("*").alias("n_members"),
            F.countDistinct("split_naive").alias("naive_splits"),
            F.countDistinct("split_comp").alias("comp_splits"),
        )
        .filter(F.col("n_members") >= 2)
    )
    multi_stats = multi.agg(
        F.count("*").alias("n_multi_components"),
        # coalesce: F.sum over ZERO rows (no multi-doc components at
        # all) is NULL, but the oracle's scalar count subqueries say 0.
        F.coalesce(
            F.sum(F.when(F.col("naive_splits") > 1, 1).otherwise(0)),
            F.lit(0),
        ).alias("naive_leaky_components"),
        F.coalesce(
            F.sum(F.when(F.col("comp_splits") > 1, 1).otherwise(0)),
            F.lit(0),
        ).alias("component_leaky_components"),
    )
    totals = splits.agg(
        F.sum(F.when(F.col("split_comp") == "train", 1).otherwise(0)).alias(
            "n_train"
        ),
        F.sum(F.when(F.col("split_comp") == "val", 1).otherwise(0)).alias("n_val"),
        F.sum(F.when(F.col("split_comp") == "test", 1).otherwise(0)).alias(
            "n_test"
        ),
    )
    return multi_stats.crossJoin(totals).select(
        F.col("n_multi_components").cast("long").alias("n_multi_components"),
        F.col("naive_leaky_components").cast("long").alias(
            "naive_leaky_components"
        ),
        F.col("component_leaky_components")
        .cast("long")
        .alias("component_leaky_components"),
        F.col("n_train").cast("long").alias("n_train"),
        F.col("n_val").cast("long").alias("n_val"),
        F.col("n_test").cast("long").alias("n_test"),
    )


# ---------------------------------------------------------------------------
# Dedup attribution: which sources carry the duplication
# ---------------------------------------------------------------------------

_SQL_DEDUP_ATTRIBUTION = f"""
    WITH RECURSIVE {_SQL_WIDE_MINS},
    {_SQL_CAND_COMPONENTS},
    near_drops AS (
        SELECT d.source, count(*) AS near_dup_drops
        FROM comp c JOIN documents d ON d.doc_id = c.id
        WHERE c.id <> c.label
        GROUP BY d.source
    ),
    exact_dups AS (
        SELECT source, count(*) AS exact_dup_docs FROM (
            SELECT d.source,
                   row_number() OVER (PARTITION BY md5(d.text)
                                      ORDER BY d.doc_id) AS rn
            FROM documents d
        ) WHERE rn > 1 GROUP BY source
    ),
    chunks AS MATERIALIZED ({_SQL_CHUNK_TABLE}),
    dcounts AS (SELECT digest, count(*) AS c FROM chunks GROUP BY digest),
    chunk_rates AS (
        SELECT d.source,
               count(*) AS n_chunks,
               sum(CASE WHEN dc.c > 1 THEN 1 ELSE 0 END) AS dup_chunks
        FROM chunks ch
        JOIN documents d ON d.doc_id = ch.doc_id
        JOIN dcounts dc ON dc.digest = ch.digest
        GROUP BY d.source
    ),
    base AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
    SELECT b.source,
           CAST(b.n_docs AS BIGINT) AS n_docs,
           CAST(coalesce(x.exact_dup_docs, 0) AS BIGINT) AS exact_dup_docs,
           CAST(coalesce(nd.near_dup_drops, 0) AS BIGINT) AS near_dup_drops,
           CAST(cr.n_chunks AS BIGINT) AS n_chunks,
           round(cr.dup_chunks / cr.n_chunks::DOUBLE, 6) AS chunk_dup_rate
    FROM base b
    LEFT JOIN exact_dups x ON x.source = b.source
    LEFT JOIN near_drops nd ON nd.source = b.source
    JOIN chunk_rates cr ON cr.source = b.source
"""


@REG.add(
    "dedup_attribution_by_source",
    oracle=_SQL_DEDUP_ATTRIBUTION,
    doc="Dedup attribution: per source, the exact-duplicate documents a "
    "keep-first pass would drop, the near-duplicate documents the LSH "
    "component keep-min policy drops, and the share of 8-word chunks that "
    "are duplicated ANYWHERE in the corpus — the report that tells a "
    "curation team which crawls/dumps to deprioritize before paying for "
    "full dedup at 100 TB. Scale shape: reuses the collision-scaled band "
    "join + fixpoint components and the digest-count aggregate; "
    "everything joins back on source (tiny) or digest (16 bytes).",
)
def dedup_attribution_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from sierradb_spark.registry import load

    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", F.md5("text").alias("text_hash"))
        .localCheckpoint(eager=True)  # reused by all four legs
    )
    base = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    rn = F.row_number().over(
        Window.partitionBy("text_hash").orderBy("doc_id")
    )
    exact = (
        docs.withColumn("rn", rn)
        .filter(F.col("rn") > 1)
        .groupBy("source")
        .agg(F.count("*").alias("exact_dup_docs"))
    )
    comp = wide_near_dup_components(spark, sf_dir)
    near = (
        comp.filter(F.col("id") != F.col("label"))
        .join(docs, F.col("id") == F.col("doc_id"))
        .groupBy("source")
        .agg(F.count("*").alias("near_dup_drops"))
    )
    chunks = (
        _chunk_table(spark, sf_dir)
        .select("doc_id", "digest")
        .localCheckpoint(eager=True)  # digest counts + per-source join
    )
    dcounts = chunks.groupBy("digest").agg(F.count("*").alias("c"))
    chunk_rates = (
        chunks.join(dcounts, "digest")
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("dup_chunks"),
        )
    )
    return (
        base.join(F.broadcast(exact), "source", "left")
        .join(F.broadcast(near), "source", "left")
        .join(F.broadcast(chunk_rates), "source")
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.coalesce(F.col("exact_dup_docs"), F.lit(0))
            .cast("long")
            .alias("exact_dup_docs"),
            F.coalesce(F.col("near_dup_drops"), F.lit(0))
            .cast("long")
            .alias("near_dup_drops"),
            F.col("n_chunks").cast("long").alias("n_chunks"),
            F.round(
                F.col("dup_chunks") / F.col("n_chunks").cast("double"), 6
            ).alias("chunk_dup_rate"),
        )
    )


@REG.add(
    "source_novelty_stats",
    oracle=f"""
        WITH cs AS MATERIALIZED (
            SELECT DISTINCT d.source, c.digest
            FROM ({_SQL_CHUNK_TABLE}) c
            JOIN documents d ON d.doc_id = c.doc_id
        ),
        spread AS (
            SELECT digest, count(*) AS n_src FROM cs GROUP BY digest
        )
        SELECT cs.source,
               CAST(count(*) AS BIGINT) AS n_digests,
               CAST(count(*) FILTER (WHERE sp.n_src = 1) AS BIGINT)
                   AS n_novel,
               round(count(*) FILTER (WHERE sp.n_src = 1)
                     / CAST(count(*) AS DOUBLE), 6) AS novelty_share,
               round(avg(CAST(sp.n_src AS DOUBLE)), 4) AS avg_spread
        FROM cs JOIN spread sp ON sp.digest = cs.digest
        GROUP BY cs.source
    """,
    doc="Per-source content NOVELTY: the share of a source's distinct "
    "chunk digests that appear in NO other source, plus the average "
    "cross-source spread of its content. The complement of "
    "source_overlap_matrix's pairwise view — the number that actually "
    "prices a source into a mixture: a dump whose novelty_share is "
    "near zero adds tokens but no new information, whatever its "
    "pairwise overlaps look like individually. Scale shape: one "
    "distinct (source, digest) projection, one digest-keyed spread "
    "aggregate joined back on the 16-byte digest (map-side combined, "
    "collision-scaled) — per-source output rows only; since cs is "
    "distinct per source, n_src = 1 means globally unique.",
)
def source_novelty_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sierradb_spark.registry import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    cs = (
        _chunk_table(spark, sf_dir)
        .join(docs, "doc_id")
        .select("source", "digest")
        .distinct()
        .localCheckpoint(eager=True)  # spread + per-source agg reuse
    )
    spread = cs.groupBy("digest").agg(F.count("*").alias("n_src"))
    novel = F.count(F.when(F.col("n_src") == 1, 1))
    return (
        cs.join(spread, "digest")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_digests"),
            novel.alias("n_novel"),
            F.round(novel / F.count("*").cast("double"), 6).alias(
                "novelty_share"
            ),
            F.round(F.avg(F.col("n_src").cast("double")), 4).alias(
                "avg_spread"
            ),
        )
    )
