"""Data-selection / mixture diagnostics for pretraining corpora.

Three selection primitives a 100 TB curation pipeline runs before
committing a training mix:

- DSIR importance weights (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling"): hashed-bigram n-gram
  features, importance weight = log p_target(doc)/p_raw(doc) under two
  bag-of-features unigram models. The feature space is a FIXED hash
  range (1024 buckets here), so both model tables are tiny broadcast
  joins no matter how large the corpus is.
- Per-source KL divergence of the unigram distribution vs the corpus
  mixture — the "which domains are outliers" diagnostic behind
  DoReMi-style reweighting.
- Tokenizer vocabulary coverage / OOV rate per language for a
  frequency-derived vocab — the cheap proxy for "does this tokenizer
  fit this language slice".

All three are single corpus scans plus small-side (<= a few thousand
rows) broadcast joins; nothing here shuffles document text.

Reference parity note: the reference engine (sierradb) has no data-
selection surface; these follow the published method descriptions and
the repo-wide oracle conventions (md5-slice portable hashing, identical
float rounding on both engines).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sierradb_spark.registry import Registry, load, spread

REG = Registry()

# ---------------------------------------------------------------------------
# DSIR hashed-bigram importance weights
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 1024
# Additive smoothing mass per bucket. 0.5 (Jeffreys) keeps unseen
# buckets finite without drowning the signal at sf0.001's tiny counts.
_DSIR_ALPHA = 0.5
# Target distribution: the English slice. DSIR scores every RAW
# (non-target) document by how much more likely its features are under
# the target model than under the raw model; resampling by these
# weights shifts the mix toward the target domain.
_DSIR_TARGET = "lang = 'en'"

# word bigrams -> md5 -> first 8 hex chars -> bucket. Same recipe both
# engines (the repo-wide portable-hash convention; see dedup_wide.py);
# the Spark twin is built in _gram_buckets with the split projected
# once (column `toks`) instead of inlined per reference.
_SQL_GRAMS = """
    list_transform(
        range(1, greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1)),
        i -> regexp_split_to_array(trim(text), '\\s+')[i] || ' ' ||
             regexp_split_to_array(trim(text), '\\s+')[i + 1])
"""

_SQL_DSIR = f"""
    WITH grams AS MATERIALIZED (
        SELECT doc_id, ({_DSIR_TARGET}) AS is_target,
               ('0x' || substr(md5(unnest({_SQL_GRAMS})), 1, 8))::UBIGINT
                   % {_DSIR_BUCKETS} AS bucket
        FROM documents
    ),
    model AS (
        SELECT bucket,
               sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS c_t,
               sum(CASE WHEN NOT is_target THEN 1 ELSE 0 END) AS c_r
        FROM grams GROUP BY bucket
    ),
    totals AS (
        SELECT sum(c_t)::DOUBLE AS n_t, sum(c_r)::DOUBLE AS n_r FROM model
    ),
    ratio AS (
        SELECT bucket,
               ln((c_t + {_DSIR_ALPHA}) / (n_t + {_DSIR_ALPHA} * {_DSIR_BUCKETS}))
               - ln((c_r + {_DSIR_ALPHA}) / (n_r + {_DSIR_ALPHA} * {_DSIR_BUCKETS}))
                   AS log_ratio
        FROM model, totals
    )
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           round(sum(r.log_ratio), 6) AS dsir_log_weight
    FROM grams g JOIN ratio r ON g.bucket = r.bucket
    WHERE NOT g.is_target
    GROUP BY g.doc_id
"""


def _gram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # Tokenize ONCE into a projected column (the inline-expr form
    # re-evaluated split(trim(text)) four times per row — Catalyst does
    # not CSE across the size/sequence/element_at references), and
    # spread the rows before the explode+md5 map work: the test files
    # are single-row-group parquet, so the scan is ONE partition and
    # everything upstream of the first exchange would otherwise run on
    # one core (10.5 s -> 1.6 s cold at sf0.1 on local[32]; on a real
    # cluster the scan is already wide and the exchange is a no-op
    # safety net).
    toks = F.split(F.trim("text"), r"\s+")
    grams = F.when(F.size("toks") < 2, F.array()).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.concat(
                F.element_at("toks", i),
                F.lit(" "),
                F.element_at("toks", i + 1),
            ),
        )
    )
    return (
        spread(d, "doc_id")
        .select(
            "doc_id",
            F.expr(_DSIR_TARGET).alias("is_target"),
            toks.alias("toks"),
        )
        .select("doc_id", "is_target", F.explode(grams).alias("gram"))
        .select(
            "doc_id",
            "is_target",
            (
                F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("long")
                % _DSIR_BUCKETS
            ).alias("bucket"),
        )
    )


@REG.add(
    "dsir_importance_weights",
    oracle=_SQL_DSIR,
    doc="DSIR data selection: hashed word-bigram features (md5 -> "
    f"{_DSIR_BUCKETS} buckets), additive-smoothed bag-of-features models for "
    "the target slice (English) and the raw remainder, and per-raw-document "
    "log importance weight sum(log p_t(b) - log p_r(b)) over its bigrams. "
    "Resampling the raw pool by exp(weight) shifts the mixture toward the "
    "target domain (Xie et al. 2023). Scale shape: the two models live in "
    f"ONE {_DSIR_BUCKETS}-row table built in a single pass (conditional "
    "aggregation, map-side combine on a fixed-cardinality key) and broadcast "
    "back over the gram stream; document text never shuffles, and the "
    "feature space is fixed no matter the corpus size.",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    grams = _gram_buckets(spark, sf_dir)
    model = grams.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("c_t"),
        F.sum(F.when(~F.col("is_target"), 1).otherwise(0)).alias("c_r"),
    )
    # Bucket-count totals are one tiny aggregate; cross-join the 1-row
    # totals onto the 1024-row model (both broadcast).
    totals = model.agg(
        F.sum("c_t").cast("double").alias("n_t"),
        F.sum("c_r").cast("double").alias("n_r"),
    )
    ratio = model.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("c_t") + _DSIR_ALPHA) / (F.col("n_t") + _DSIR_ALPHA * _DSIR_BUCKETS))
            - F.log((F.col("c_r") + _DSIR_ALPHA) / (F.col("n_r") + _DSIR_ALPHA * _DSIR_BUCKETS))
        ).alias("log_ratio"),
    )
    return (
        grams.filter(~F.col("is_target"))
        .join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.round(F.sum("log_ratio"), 6).alias("dsir_log_weight"),
        )
    )


# ---------------------------------------------------------------------------
# Per-source unigram KL divergence vs the corpus mixture
# ---------------------------------------------------------------------------

# Bound the vocabulary to the top-V corpus words so the source x vocab
# grid stays O(sources * V) at any corpus size. (At the synthetic SFs
# the whole vocab fits under the cap; the cap is the scale path.)
_KL_TOP_V = 1000
_KL_ALPHA = 0.5

_SQL_KL = f"""
    WITH words AS MATERIALIZED (
        SELECT source,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
        FROM documents WHERE length(trim(text)) > 0
    ),
    vocab AS MATERIALIZED (
        SELECT word, count(*) AS c_corpus FROM words
        GROUP BY word ORDER BY c_corpus DESC, word LIMIT {_KL_TOP_V}
    ),
    src AS (SELECT source, count(*) AS n_src FROM words GROUP BY source),
    corpus_total AS (SELECT sum(c_corpus)::DOUBLE AS n_corpus FROM vocab),
    grid AS (
        SELECT s.source, s.n_src, v.word, v.c_corpus,
               coalesce(c.cnt, 0) AS c_src
        FROM src s CROSS JOIN vocab v
        LEFT JOIN (SELECT source, word, count(*) AS cnt FROM words
                   JOIN vocab USING (word) GROUP BY source, word) c
          ON c.source = s.source AND c.word = v.word
    ),
    nv AS (SELECT count(*)::DOUBLE AS v FROM vocab)
    SELECT source,
           CAST(max(n_src) AS BIGINT) AS n_tokens,
           round(sum(
               ((c_src + {_KL_ALPHA}) / (n_src + {_KL_ALPHA} * v))
               * ln(((c_src + {_KL_ALPHA}) / (n_src + {_KL_ALPHA} * v))
                    / ((c_corpus + {_KL_ALPHA}) / (n_corpus + {_KL_ALPHA} * v)))
           ), 6) AS kl_vs_corpus
    FROM grid, corpus_total, nv
    GROUP BY source
"""


@REG.add(
    "kl_source_divergence",
    oracle=_SQL_KL,
    doc="Per-source KL divergence of the (smoothed) unigram distribution "
    f"against the corpus mixture, over the top-{_KL_TOP_V} corpus vocabulary "
    "— the domain-outlier diagnostic behind DoReMi-style mixture reweighting. "
    "Scale shape: the vocab is capped (top-V by corpus count), so the "
    "source x vocab grid is O(sources * V) rows built by crossing two "
    "broadcast-sized aggregates; the only corpus-sized pass is the word "
    "explode, and the smoothed zero counts come from the grid's left join, "
    "never from materializing absent words per document.",
)
def kl_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    words = (
        d.filter(F.length(F.trim("text")) > 0)
        .select("source", F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
        .localCheckpoint(eager=True)  # pin: read for vocab, totals, grid
    )
    vocab = (
        words.groupBy("word")
        .agg(F.count("*").alias("c_corpus"))
        .orderBy(F.desc("c_corpus"), "word")
        .limit(_KL_TOP_V)
    )
    src = words.groupBy("source").agg(F.count("*").alias("n_src"))
    counts = (
        words.join(F.broadcast(vocab.select("word")), "word")
        .groupBy("source", "word")
        .agg(F.count("*").alias("cnt"))
    )
    n_corpus = vocab.agg(F.sum("c_corpus").cast("double").alias("n_corpus"))
    nv = vocab.agg(F.count("*").cast("double").alias("v"))
    grid = (
        src.crossJoin(F.broadcast(vocab))
        .join(counts, ["source", "word"], "left")
        .withColumn("c_src", F.coalesce(F.col("cnt"), F.lit(0)))
        .crossJoin(F.broadcast(n_corpus))
        .crossJoin(F.broadcast(nv))
    )
    p_s = (F.col("c_src") + _KL_ALPHA) / (F.col("n_src") + _KL_ALPHA * F.col("v"))
    p_c = (F.col("c_corpus") + _KL_ALPHA) / (F.col("n_corpus") + _KL_ALPHA * F.col("v"))
    return grid.groupBy("source").agg(
        F.max("n_src").cast("long").alias("n_tokens"),
        F.round(F.sum(p_s * F.log(p_s / p_c)), 6).alias("kl_vs_corpus"),
    )


# ---------------------------------------------------------------------------
# Tokenizer vocabulary coverage / OOV rate per language
# ---------------------------------------------------------------------------

_VOCAB_SIZE = 100

_SQL_OOV = f"""
    WITH pieces AS MATERIALIZED (
        SELECT lang, unnest(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS piece
        FROM documents
    ),
    vocab AS (
        SELECT piece FROM pieces GROUP BY piece
        ORDER BY count(*) DESC, piece LIMIT {_VOCAB_SIZE}
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_pieces,
           CAST(sum(CASE WHEN v.piece IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           round(sum(CASE WHEN v.piece IS NULL THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE, 6) AS oov_rate
    FROM pieces p LEFT JOIN vocab v ON p.piece = v.piece
    GROUP BY lang
"""


@REG.add(
    "tokenizer_oov_by_lang",
    oracle=_SQL_OOV,
    doc=f"Tokenizer-fit diagnostic: derive a top-{_VOCAB_SIZE} vocabulary "
    "from the corpus's BPE-ish pre-token stream (same regex as "
    "bpe_token_stats), then report per-language piece counts and the "
    "out-of-vocabulary rate — the slice-level signal for 'this tokenizer "
    "under-serves language X'. Scale shape: the vocab is a top-K aggregate "
    "(broadcast back as a left join); one corpus scan.",
)
def tokenizer_oov_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sierradb_spark.functions.text import BPE_PATTERN

    d = load(spark, sf_dir, "documents")
    # spread before the regex tokenize + explode, which otherwise runs
    # on the scan's single input split — and the checkpoint would PIN
    # that single partition for both consumers (see registry.spread)
    pieces = spread(d, "doc_id").select(
        "lang",
        F.explode(F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)).alias("piece"),
    ).localCheckpoint(eager=True)  # pin: vocab pass + coverage pass
    vocab = (
        pieces.groupBy("piece")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "piece")
        .limit(_VOCAB_SIZE)
        .select("piece", F.lit(1).alias("in_vocab"))
    )
    return (
        pieces.join(F.broadcast(vocab), "piece", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_pieces"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
            F.round(
                F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
                / F.count("*").cast("double"),
                6,
            ).alias("oov_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Token-budget allocation (temperature sampling with availability caps)
# ---------------------------------------------------------------------------

# Budget as a fraction of the corpus (scale-free: the same query is
# meaningful at every sf), temperature alpha = 0.5 (sqrt sampling — the
# multilingual-mix standard), ONE redistribution round for capped
# sources (documented approximation of full waterfilling; a second
# round changes allocations only when the redistribution itself
# overflows another source).
_BUDGET_FRAC = 0.6
_SQL_BUDGET_TOKS = (
    "CASE WHEN length(trim(text)) = 0 THEN 0 "
    "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
)


@REG.add(
    "token_budget_allocation",
    oracle=f"""
        WITH per_source AS (
            SELECT source, CAST(sum({_SQL_BUDGET_TOKS}) AS BIGINT) AS avail
            FROM documents GROUP BY source
        ),
        tot AS (
            SELECT sum(sqrt(CAST(avail AS DOUBLE))) AS z,
                   sum(avail)::DOUBLE AS total
            FROM per_source
        ),
        first AS (
            SELECT p.source, p.avail,
                   sqrt(CAST(p.avail AS DOUBLE)) / t.z AS share,
                   {_BUDGET_FRAC} * t.total * sqrt(CAST(p.avail AS DOUBLE)) / t.z
                       AS alloc0
            FROM per_source p, tot t
        ),
        lo AS (
            SELECT coalesce(sum(CASE WHEN alloc0 > avail
                                     THEN alloc0 - avail END), 0) AS leftover,
                   coalesce(sum(CASE WHEN alloc0 <= avail
                                     THEN share END), 0) AS unc_share
            FROM first
        )
        SELECT f.source,
               f.avail AS avail_tokens,
               round(f.share, 6) AS share,
               round(f.alloc0, 4) AS target_alloc,
               round(CASE WHEN f.alloc0 > f.avail THEN CAST(f.avail AS DOUBLE)
                          WHEN l.unc_share > 0 THEN least(
                              CAST(f.avail AS DOUBLE),
                              f.alloc0 + l.leftover * f.share / l.unc_share)
                          ELSE f.alloc0 END, 4) AS final_alloc,
               CAST(CASE WHEN f.alloc0 > f.avail THEN 1 ELSE 0 END AS INT)
                   AS capped
        FROM first f, lo l
    """,
    doc=f"Token-budget allocation across sources: a {_BUDGET_FRAC:.0%}-"
    "of-corpus token budget split by temperature sampling (share ~ "
    "sqrt(available tokens), alpha=0.5), capped at each source's "
    "available tokens, with capped sources' surplus redistributed "
    "proportionally to uncapped sources in one round — the schedule a "
    "mixture loader consumes. Two tiny aggregates (per-source counts, "
    "then the corpus totals / leftovers) broadcast back over the "
    "20-row source table; the corpus is scanned once for token counts.",
)
def token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n_toks = F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    per_source = d.groupBy("source").agg(
        F.sum(n_toks).alias("avail")
    )
    tot = per_source.agg(
        F.sum(F.sqrt(F.col("avail").cast("double"))).alias("z"),
        F.sum("avail").cast("double").alias("total"),
    )
    share = F.sqrt(F.col("avail").cast("double")) / F.col("z")
    first = per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "avail",
        share.alias("share"),
        (F.lit(_BUDGET_FRAC) * F.col("total") * share).alias("alloc0"),
    )
    first = first.localCheckpoint(eager=True)  # read by lo AND the final map
    lo = first.agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("alloc0") > F.col("avail"),
                    F.col("alloc0") - F.col("avail"),
                )
            ),
            F.lit(0.0),
        ).alias("leftover"),
        F.coalesce(
            F.sum(F.when(F.col("alloc0") <= F.col("avail"), F.col("share"))),
            F.lit(0.0),
        ).alias("unc_share"),
    )
    final = (
        F.when(F.col("alloc0") > F.col("avail"), F.col("avail").cast("double"))
        .when(
            F.col("unc_share") > 0,
            F.least(
                F.col("avail").cast("double"),
                F.col("alloc0")
                + F.col("leftover") * F.col("share") / F.col("unc_share"),
            ),
        )
        .otherwise(F.col("alloc0"))
    )
    return first.crossJoin(F.broadcast(lo)).select(
        "source",
        F.col("avail").alias("avail_tokens"),
        F.round("share", 6).alias("share"),
        F.round("alloc0", 4).alias("target_alloc"),
        F.round(final, 4).alias("final_alloc"),
        (F.col("alloc0") > F.col("avail")).cast("int").alias("capped"),
    )


# ---------------------------------------------------------------------------
# UniMax allocation: uniform sampling under per-source epoch caps
# ---------------------------------------------------------------------------

# Budget fraction of the corpus and the max epochs any source may be
# repeated (UniMax, Chung et al. 2023): allocate the budget as evenly
# as possible across sources, never taking more than EPOCH_CAP passes
# over any source. Exact waterfilling, not an approximation.
_UNIMAX_BUDGET_FRAC = 0.5
_UNIMAX_EPOCH_CAP = 2


@REG.add(
    "unimax_allocation",
    oracle=f"""
        WITH per_source AS MATERIALIZED (
            SELECT source, CAST(sum({_SQL_BUDGET_TOKS}) AS BIGINT) AS avail,
                   CAST({_UNIMAX_EPOCH_CAP} * sum({_SQL_BUDGET_TOKS})
                        AS BIGINT) AS cap
            FROM documents GROUP BY source
        ),
        tot AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   {_UNIMAX_BUDGET_FRAC} * sum(avail) AS budget
            FROM per_source
        ),
        ranked AS (
            SELECT p.source, p.avail, p.cap, t.n, t.budget,
                   row_number() OVER (ORDER BY p.cap, p.source) AS k,
                   coalesce(sum(p.cap) OVER (
                       ORDER BY p.cap, p.source
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum_prev
            FROM per_source p CROSS JOIN tot t
        ),
        marked AS MATERIALIZED (
            SELECT *,
                   CASE WHEN cap * (n - k + 1) + cum_prev <= budget
                        THEN 1 ELSE 0 END AS capped
            FROM ranked
        ),
        lvl AS (
            SELECT coalesce(sum(CASE WHEN capped = 1 THEN cap END), 0)
                       AS capped_sum,
                   count(*) FILTER (WHERE capped = 0) AS n_unc
            FROM marked
        )
        SELECT m.source, m.avail AS avail_tokens,
               m.cap AS cap_tokens,
               CAST(m.capped AS INT) AS capped,
               round(CASE WHEN m.capped = 1 THEN CAST(m.cap AS DOUBLE)
                          ELSE (m.budget - l.capped_sum)
                               / nullif(l.n_unc, 0) END, 4) AS alloc_tokens,
               round(CASE WHEN m.capped = 1 THEN CAST(m.cap AS DOUBLE)
                          ELSE (m.budget - l.capped_sum)
                               / nullif(l.n_unc, 0) END
                     / m.avail, 6) AS epochs_used,
               round(CASE WHEN m.capped = 1 THEN CAST(m.cap AS DOUBLE)
                          ELSE (m.budget - l.capped_sum)
                               / nullif(l.n_unc, 0) END
                     / m.budget, 6) AS budget_share
        FROM marked m CROSS JOIN lvl l
    """,
    doc=f"UniMax allocation: a {_UNIMAX_BUDGET_FRAC:.0%}-of-corpus "
    f"token budget spread as UNIFORMLY as possible across sources with "
    f"no source repeated beyond {_UNIMAX_EPOCH_CAP} epochs — exact "
    "waterfilling (sources whose cap sits below the water level take "
    "their cap; the rest split the remainder evenly), the "
    "language-sampling scheme that avoids temperature sampling's "
    "over-repetition of tiny sources. Complements "
    "token_budget_allocation (temperature + one redistribution round): "
    "same input table, competing policy, both exact. Scale shape: the "
    "corpus is scanned once for per-source token counts; the "
    "waterfilling runs on the #sources-row table via a bounded "
    "self-join for the running cap prefix (no window over the corpus, "
    "no unpartitioned window at all), with the two scalar aggregates "
    "broadcast back.",
)
def unimax_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n_toks = F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    ps = (
        d.groupBy("source")
        .agg(F.sum(n_toks).cast("long").alias("avail"))
        .withColumn("cap", (F.lit(_UNIMAX_EPOCH_CAP) * F.col("avail")).cast("long"))
        .localCheckpoint(eager=True)  # tiny; reused by every stage below
    )
    tot = ps.agg(
        F.count(F.lit(1)).alias("n"),
        (F.lit(_UNIMAX_BUDGET_FRAC) * F.sum("avail")).alias("budget"),
    )
    right = ps.select(
        F.col("cap").alias("r_cap"), F.col("source").alias("r_source")
    )
    # Bounded self-join on the #sources-row table: rank + running cap
    # prefix without an unpartitioned window.
    before = (F.col("r_cap") < F.col("cap")) | (
        (F.col("r_cap") == F.col("cap")) & (F.col("r_source") < F.col("source"))
    )
    ranked = (
        ps.join(F.broadcast(right), before, "left")
        .groupBy("source", "avail", "cap")
        .agg(
            (F.count("r_cap") + 1).alias("k"),
            F.coalesce(F.sum("r_cap"), F.lit(0)).alias("cum_prev"),
        )
        .crossJoin(F.broadcast(tot))
    )
    marked = ranked.withColumn(
        "capped",
        F.when(
            F.col("cap") * (F.col("n") - F.col("k") + 1) + F.col("cum_prev")
            <= F.col("budget"),
            1,
        ).otherwise(0),
    ).localCheckpoint(eager=True)
    lvl = marked.agg(
        F.coalesce(
            F.sum(F.when(F.col("capped") == 1, F.col("cap"))), F.lit(0)
        ).alias("capped_sum"),
        F.count(F.when(F.col("capped") == 0, 1)).alias("n_unc"),
    )
    alloc = F.when(
        F.col("capped") == 1, F.col("cap").cast("double")
    ).otherwise(
        (F.col("budget") - F.col("capped_sum"))
        / F.nullif(F.col("n_unc"), F.lit(0)).cast("double")
    )
    return marked.crossJoin(F.broadcast(lvl)).select(
        "source",
        F.col("avail").alias("avail_tokens"),
        F.col("cap").alias("cap_tokens"),
        F.col("capped").cast("int").alias("capped"),
        F.round(alloc, 4).alias("alloc_tokens"),
        F.round(alloc / F.col("avail"), 6).alias("epochs_used"),
        F.round(alloc / F.col("budget"), 6).alias("budget_share"),
    )


# ---------------------------------------------------------------------------
# Greedy k-center coreset selection (farthest-point traversal)
# ---------------------------------------------------------------------------

_KC_K = 8  # coreset size (2-approximation of the optimal k-center cover)


def _kc_dist_sql(c: str) -> str:
    return (
        f"round(list_dot_product(v.emb, v.emb)"
        f" - 2 * list_dot_product(v.emb, {c}.emb)"
        f" + list_dot_product({c}.emb, {c}.emb), 9)"
    )


def _kc_sql() -> str:
    parts = [
        "v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)",
        "s0 AS (SELECT vec_id, emb FROM v WHERE vec_id = 0)",
    ]
    for j in range(1, _KC_K):
        prev = ", ".join(f"s{i} c{i}" for i in range(j))
        dists = [_kc_dist_sql(f"c{i}") for i in range(j)]
        md = dists[0] if j == 1 else f"least({', '.join(dists)})"
        notin = " AND ".join(f"v.vec_id <> c{i}.vec_id" for i in range(j))
        parts.append(
            f"s{j} AS (SELECT v.vec_id, v.emb, {md} AS md "
            f"FROM v, {prev} WHERE {notin} "
            f"ORDER BY md DESC, v.vec_id ASC LIMIT 1)"
        )
    allprev = ", ".join(f"s{i} c{i}" for i in range(_KC_K))
    alldists = ", ".join(_kc_dist_sql(f"c{i}") for i in range(_KC_K))
    parts.append(
        f"fin AS (SELECT max(least({alldists})) AS cover "
        f"FROM v, {allprev})"
    )
    sel = [
        "SELECT 0 AS sel_order, CAST(vec_id AS BIGINT) AS vec_id,"
        " CAST(NULL AS DOUBLE) AS sq_radius FROM s0"
    ]
    for j in range(1, _KC_K):
        sel.append(
            f"SELECT {j}, CAST(vec_id AS BIGINT), round(md, 6) FROM s{j}"
        )
    sel.append(
        f"SELECT {_KC_K}, CAST(NULL AS BIGINT), round(cover, 6) FROM fin"
    )
    return "WITH " + ",\n".join(parts) + "\n" + " UNION ALL ".join(sel)


@REG.add(
    "kcenter_coreset_selection",
    oracle=_kc_sql(),
    doc="Greedy k-center coreset (farthest-point traversal, the classic "
    "2-approximation): start from vec_id 0, then 7 rounds of 'pick the "
    "point farthest from everything chosen' — the diversity-maximizing "
    "selection pass used to seed diverse fine-tuning subsets. Each round "
    "is ONE distributed scan (squared-distance to <=8 broadcast literal "
    "centers, rounded to 9 dp so both engines pick identical argmaxes, "
    "min-of-struct tiebreak by vec_id); the driver receives one row per "
    "round (O(k) traffic). The final row reports the achieved cover "
    "radius — max-over-corpus min-distance — computed distributedly. "
    "Oracle: the same rounds unrolled as chained 1-row CTEs.",
)
def kcenter_coreset_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sierradb_spark.functions.memo import release_checkpoint

    e = load(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )

    # r11: incremental farthest-point traversal. Round j used to
    # re-evaluate ALL j center distances per row (each one TWO
    # interpreted zip_with/aggregate folds — the self dot product was
    # recomputed per center), so per-round work grew linearly and the
    # suite paid ~sum(j) = O(k^2) folds per row. Now the self dot
    # product is computed once into a pinned ``vv`` column and the
    # running min-distance ``mind`` rides a per-round lazy
    # localCheckpoint: each round evaluates exactly ONE new-center fold
    # per row and folds it into the min. Exactness: every per-center
    # distance is rounded to 9 dp BEFORE the min exactly as before, and
    # least(least(d1..dj-1), dj) == least(d1..dj) — the same doubles in
    # the same grid, so argmax picks (and the vec_id tiebreak) are
    # identical; verified by oracle hash at 3 SFs. The scan stays
    # distributed (corpus-scale embeddings are never collected); driver
    # traffic is unchanged at one row per round. The previous round's
    # checkpoint blocks are released deterministically once the next
    # generation materializes (the r10 staging-release discipline), so
    # peak pinned storage is 2 generations of (id, emb, vv, mind), not
    # k.

    def dist_to(center_vec: list[float]):
        # SQL-text form (r11): the 64 center literals + fold cost ~75
        # py4j round-trips per ROUND as Columns; sql_dot/sql_arr compile
        # to the identical Catalyst fold and literal bits via one F.expr
        # (see similarity.sql_dlit). Same arithmetic order:
        # (vv - 2.0*dot) + cc, rounded to 9 dp before the min.
        from sierradb_spark.functions.similarity import (
            sql_arr,
            sql_dlit,
            sql_dot,
        )

        dot_vc = sql_dot("emb", sql_arr(center_vec))
        cc = sql_dlit(sum(x * x for x in center_vec))
        return F.expr(f"round(vv - 2.0D * {dot_vc} + {cc}, 9)")

    dot_vv = F.aggregate(
        F.zip_with("emb", F.col("emb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    first = v.where(F.col("vec_id") == 0).select("vec_id", "emb").head()
    chosen = [(int(first[0]), list(first[1]), None)]
    state = v.withColumn("vv", dot_vv)
    prev = None
    for j in range(1, _KC_K):
        dnew = dist_to(chosen[-1][1])
        mind = dnew if j == 1 else F.least(F.col("mind"), dnew)
        state = state.withColumn("mind", mind).localCheckpoint(eager=False)
        ids = [cid for cid, _, _ in chosen]
        pick = (
            state.where(~F.col("vec_id").isin(ids))
            .select(
                F.struct(
                    (-F.col("mind")).alias("nd"), "vec_id", "emb"
                ).alias("s")
            )
            .agg(F.min("s").alias("s"))
            .select("s.nd", "s.vec_id", "s.emb")
            .head()
        )
        chosen.append((int(pick[1]), list(pick[2]), -float(pick[0])))
        if prev is not None:
            release_checkpoint(prev)
        prev = state

    # Cover radius = max over the corpus of the min distance to ALL k
    # centers: the running mind plus the last pick's distance. Computed
    # eagerly (one more distributed scan of the pinned state, rounding
    # still Spark-side) so the final checkpoint generation can be
    # released too — a completed query leaves zero pinned blocks.
    cover_md = F.least(F.col("mind"), dist_to(chosen[-1][1]))
    cov_row = state.agg(F.round(F.max(cover_md), 6).alias("sq_radius")).head()
    cover = None if cov_row[0] is None else float(cov_row[0])
    release_checkpoint(state)

    def _round6(x: float) -> float:
        # Half-away-from-zero, matching Spark/DuckDB round(); Python's
        # round() is half-even and would diverge at exact .5e-6 ties.
        return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6

    return spark.createDataFrame(
        [
            (j, cid, None if r is None else _round6(r))
            for j, (cid, _, r) in enumerate(chosen)
        ]
        + [(_KC_K, None, cover)],
        "sel_order int, vec_id bigint, sq_radius double",
    )
