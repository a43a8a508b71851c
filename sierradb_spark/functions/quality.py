"""Corpus quality filtering and dataset-curation diagnostics.

The quality gates a pretraining pipeline applies between dedup and
export: length/token funnels (Gopher-style), word-distribution entropy,
repetition ratios, stratified language sampling, and the recall
evaluation that justifies an ANN index. All tokenization is a single
ASCII-space split shared verbatim with the DuckDB oracle so both
engines see identical word multisets; all entropies/ratios are computed
in DOUBLE and rounded before comparison.

Scale notes (100 TB): every per-document metric here is a projection or
a two-level aggregate (doc-local partial agg, then a tiny per-lang /
per-source final agg), so the shuffle carries one row per document at
most — never the token stream. The explode-based word analyses bound
shuffle width by `groupBy(doc_id, word)` partial aggregation: map-side
combine collapses each document's repeated words before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sierradb_spark.functions.pipeline import _KNUTH, _RING, _NEAR_DUP_PAIRS_SQL
from sierradb_spark.registry import Registry, load

REG = Registry()


def _words(text: F.Column) -> F.Column:
    """Split into words on runs of spaces; empty tokens filtered."""
    return F.filter(F.split(F.trim(text), " +"), lambda w: w != "")


_SQL_WORDS = "list_filter(string_split_regex(trim(text), ' +'), w -> w <> '')"


@REG.add(
    "quality_filter_funnel",
    oracle=f"""
        WITH t AS (
            SELECT source,
                   n_chars,
                   CAST(len({_SQL_WORDS}) AS BIGINT) AS n_tokens
            FROM documents
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_total,
               CAST(count(*) FILTER (WHERE n_chars BETWEEN 80 AND 400)
                    AS BIGINT) AS pass_len,
               CAST(count(*) FILTER (WHERE n_chars BETWEEN 80 AND 400
                                       AND n_tokens BETWEEN 15 AND 80)
                    AS BIGINT) AS pass_tokens,
               CAST(count(*) FILTER (WHERE n_chars BETWEEN 80 AND 400
                                       AND n_tokens BETWEEN 15 AND 80
                                       AND (n_chars - n_tokens + 1.0) / n_tokens
                                           BETWEEN 3 AND 8)
                    AS BIGINT) AS pass_all
        FROM t GROUP BY source
    """,
    doc="Gopher-style quality funnel: per source, how many documents survive "
    "successive gates (char length, token count, mean word length). One scan, "
    "doc-local predicates, per-source final agg of ~|sources| rows — the shape "
    "that lets a 100 TB corpus be triaged in a single pass.",
)
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(_words(F.col("text"))).cast("long")
    t = d.select("source", "n_chars", n_tokens.alias("n_tokens"))
    pass_len = F.col("n_chars").between(80, 400)
    pass_tok = pass_len & F.col("n_tokens").between(15, 80)
    mean_wl = (F.col("n_chars") - F.col("n_tokens") + 1.0) / F.col("n_tokens")
    pass_all = pass_tok & mean_wl.between(3, 8)
    return t.groupBy("source").agg(
        F.count("*").alias("n_total"),
        F.count(F.when(pass_len, 1)).alias("pass_len"),
        F.count(F.when(pass_tok, 1)).alias("pass_tokens"),
        F.count(F.when(pass_all, 1)).alias("pass_all"),
    )


@REG.add(
    "word_entropy_by_lang",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, lang, unnest({_SQL_WORDS}) AS word
            FROM documents
        ),
        wc AS (
            SELECT doc_id, lang, word, count(*)::DOUBLE AS c
            FROM w GROUP BY doc_id, lang, word
        ),
        doc_tot AS (SELECT doc_id, sum(c) AS tot FROM wc GROUP BY doc_id),
        doc_h AS (
            SELECT wc.doc_id, lang,
                   -sum((c / tot) * log2(c / tot)) AS entropy
            FROM wc JOIN doc_tot USING (doc_id)
            GROUP BY wc.doc_id, lang
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(entropy), 4) AS avg_entropy,
               round(min(entropy), 4) AS min_entropy,
               round(max(entropy), 4) AS max_entropy
        FROM doc_h GROUP BY lang
    """,
    doc="Unigram Shannon entropy per document, summarized per language — the "
    "classic gibberish/boilerplate detector (low entropy = repetitive text). "
    "Two-level aggregate: groupBy(doc_id, word) partial-aggregates the token "
    "stream map-side, so the shuffle carries distinct (doc, word) pairs, then a "
    "per-doc entropy and a per-lang rollup.",
)
def word_entropy_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = d.select("doc_id", "lang", F.explode(_words(F.col("text"))).alias("word"))
    wc = w.groupBy("doc_id", "lang", "word").agg(
        F.count("*").cast("double").alias("c")
    )
    p = F.col("c") / F.sum("c").over(Window.partitionBy("doc_id"))
    doc_h = (
        wc.withColumn("term", -p * F.log2(p))
        .groupBy("doc_id", "lang")
        .agg(F.sum("term").alias("entropy"))
    )
    return doc_h.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("entropy"), 4).alias("avg_entropy"),
        F.round(F.min("entropy"), 4).alias("min_entropy"),
        F.round(F.max("entropy"), 4).alias("max_entropy"),
    )


@REG.add(
    "repetition_ratio_stats",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, source, unnest({_SQL_WORDS}) AS word
            FROM documents
        ),
        wc AS (
            SELECT doc_id, source, word, count(*) AS c
            FROM w GROUP BY doc_id, source, word
        ),
        per_doc AS (
            SELECT doc_id, source,
                   max(c)::DOUBLE / sum(c) AS top_word_frac,
                   count(*)::DOUBLE / sum(c) AS distinct_frac
            FROM wc GROUP BY doc_id, source
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(*) FILTER (WHERE top_word_frac > 0.20) AS BIGINT)
                   AS n_repetitive,
               round(avg(top_word_frac), 4) AS avg_top_word_frac,
               round(avg(distinct_frac), 4) AS avg_distinct_frac
        FROM per_doc GROUP BY source
    """,
    doc="Repetition filters: top-word fraction and distinct-word fraction per "
    "document (Gopher's repetition signals), rolled up per source with a count of "
    "documents over the repetition threshold. Same bounded-shuffle shape as the "
    "entropy query.",
)
def repetition_ratio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = d.select("doc_id", "source", F.explode(_words(F.col("text"))).alias("word"))
    wc = w.groupBy("doc_id", "source", "word").agg(F.count("*").alias("c"))
    per_doc = wc.groupBy("doc_id", "source").agg(
        (F.max("c").cast("double") / F.sum("c")).alias("top_word_frac"),
        (F.count("*").cast("double") / F.sum("c")).alias("distinct_frac"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count(F.when(F.col("top_word_frac") > 0.20, 1)).alias("n_repetitive"),
        F.round(F.avg("top_word_frac"), 4).alias("avg_top_word_frac"),
        F.round(F.avg("distinct_frac"), 4).alias("avg_distinct_frac"),
    )


# Per-language keep rates for stratified sampling: downsample the
# dominant language, keep the tails whole.
_STRATA = {"en": 0.25, "de": 0.5, "es": 0.5, "fr": 0.5, "zh": 1.0}


@REG.add(
    "stratified_sample_by_lang",
    oracle=f"""
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_total,
               CAST(count(*) FILTER (
                   WHERE (doc_id * {_KNUTH}) % {_RING} <
                         CAST({_RING} * (CASE lang
                             WHEN 'en' THEN 0.25 WHEN 'zh' THEN 1.0
                             ELSE 0.5 END) AS BIGINT)
               ) AS BIGINT) AS n_sampled,
               CAST(sum(n_chars) FILTER (
                   WHERE (doc_id * {_KNUTH}) % {_RING} <
                         CAST({_RING} * (CASE lang
                             WHEN 'en' THEN 0.25 WHEN 'zh' THEN 1.0
                             ELSE 0.5 END) AS BIGINT)
               ) AS BIGINT) AS sampled_chars
        FROM documents GROUP BY lang
    """,
    doc="Stratified sampling with per-language keep rates (downsample the head "
    "language, keep the tail) via the same deterministic multiplicative hash as "
    "deterministic_doc_sample: a scan-side filter, no RNG state, reproducible "
    "and re-runnable — language rebalancing of a 100 TB corpus as one cheap pass.",
)
def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", 0.25).when(
        F.col("lang") == "zh", 1.0
    ).otherwise(0.5)
    keep = ((F.col("doc_id") * _KNUTH) % _RING) < (
        F.lit(float(_RING)) * rate
    ).cast("long")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.count(F.when(keep, 1)).alias("n_sampled"),
        F.sum(F.when(keep, F.col("n_chars"))).cast("long").alias("sampled_chars"),
    )


@REG.add(
    "token_bucket_histogram",
    oracle=f"""
        WITH t AS (
            SELECT CAST(len({_SQL_WORDS}) AS BIGINT) AS n_tokens, n_chars
            FROM documents
        )
        SELECT (n_tokens // 10) * 10 AS bucket,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS bucket_chars
        FROM t GROUP BY 1
    """,
    doc="Token-count histogram (bucket width 10) with per-bucket byte totals — "
    "the length-distribution audit that sizes packing/truncation for a training "
    "run. Integer bucket arithmetic agrees across engines (floor division on "
    "non-negative counts).",
)
def token_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(_words(F.col("text"))).cast("long")
    return (
        d.select(n_tokens.alias("n_tokens"), "n_chars")
        .groupBy(((F.col("n_tokens") / 10).cast("long") * 10).alias("bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("bucket_chars"),
        )
    )


@REG.add(
    "ann_recall_probe1",
    oracle="""
        WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        scored AS (
            SELECT e.vec_id, e.label,
                   round(list_dot_product(e.embedding::DOUBLE[], q.qv)
                         / nullif(sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                        e.embedding::DOUBLE[]))
                                  * sqrt(list_dot_product(q.qv, q.qv)), 0), 4)
                       AS cosine
            FROM embeddings e, q WHERE e.vec_id <> 0
        ),
        brute AS (
            SELECT vec_id FROM scored ORDER BY cosine DESC, vec_id ASC LIMIT 10
        ),
        comp AS (
            SELECT e.label, t.i, avg(e.embedding[t.i]::DOUBLE) AS c
            FROM embeddings e, range(1, 65) t(i) GROUP BY e.label, t.i
        ),
        cent AS (SELECT label, list(c ORDER BY i) AS cv FROM comp GROUP BY label),
        best AS (
            SELECT cent.label FROM cent, q
            ORDER BY list_dot_product(cent.cv, q.qv)
                     / nullif(sqrt(list_dot_product(cent.cv, cent.cv))
                              * sqrt(list_dot_product(q.qv, q.qv)), 0) DESC,
                     cent.label ASC
            LIMIT 1
        ),
        ivf AS (
            SELECT s.vec_id FROM scored s, best
            WHERE s.label = best.label
            ORDER BY s.cosine DESC, s.vec_id ASC LIMIT 10
        )
        SELECT CAST((SELECT count(*) FROM brute JOIN ivf USING (vec_id)) AS BIGINT)
                   AS n_overlap,
               round((SELECT count(*) FROM brute JOIN ivf USING (vec_id)) / 10.0, 2)
                   AS recall_at_10
    """,
    doc="Recall@10 of IVF nprobe=1 against the brute-force exact top-10 — the "
    "evaluation loop that decides nprobe/cell-count for an ANN index before "
    "trusting it at scale. Both candidate sets are tiny (10 rows) so the overlap "
    "join is driver-trivial; the cost is the two independent scoring scans "
    "(brute force + IVF), the price of an honest recall measurement.",
)
def ann_recall_probe1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sierradb_spark.functions.similarity import (
        ivf_probe1_topk,
        similarity_topk_cosine,
    )

    brute = similarity_topk_cosine(spark, sf_dir).select("vec_id")
    ivf = ivf_probe1_topk(spark, sf_dir).select("vec_id")
    overlap = brute.join(ivf, "vec_id").agg(F.count("*").alias("n_overlap"))
    return overlap.select(
        "n_overlap", F.round(F.col("n_overlap") / 10.0, 2).alias("recall_at_10")
    )


@REG.add(
    "dedup_survivor_corpus",
    oracle=f"""
        WITH RECURSIVE base_pairs AS ({_NEAR_DUP_PAIRS_SQL}),
        edges AS (
            SELECT doc_a AS u, doc_b AS v FROM base_pairs
            UNION
            SELECT doc_b, doc_a FROM base_pairs
        ),
        nodes AS (SELECT DISTINCT u AS id FROM edges),
        walk (id, label) AS (
            SELECT id, id FROM nodes
            UNION
            SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.id
        ),
        members AS (SELECT id, min(label) AS label FROM walk GROUP BY id),
        dropped AS (
            SELECT id FROM members m
            WHERE id <> (SELECT min(id) FROM members m2 WHERE m2.label = m.label)
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs_kept,
               CAST(sum(n_chars) AS BIGINT) AS kept_chars
        FROM documents
        WHERE doc_id NOT IN (SELECT id FROM dropped)
        GROUP BY lang
    """,
    doc="The dedup pipeline end-to-end: embedding near-dup graph -> connected "
    "components -> keep the minimum id per component -> anti-join the dropped "
    "set against the corpus -> per-language surviving stats. The anti-join "
    "broadcasts the dropped-id set (tiny relative to the corpus), so the final "
    "pass over 100 TB is a scan with a broadcast hash filter.",
)
def dedup_survivor_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sierradb_spark.functions.pipeline import _near_dup_labels_pinned

    d = load(spark, sf_dir, "documents")
    labels = _near_dup_labels_pinned(spark, sf_dir)
    keep = F.min("id").over(Window.partitionBy("label"))
    dropped = (
        labels.withColumn("keep", keep)
        .where(F.col("id") != F.col("keep"))
        .select("id")
    )
    return (
        d.join(F.broadcast(dropped), d.doc_id == dropped.id, "left_anti")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs_kept"),
            F.sum("n_chars").cast("long").alias("kept_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Heavy-tail diagnostics of the length distribution
# ---------------------------------------------------------------------------

_HILL_K = 20  # order statistics the tail index is estimated from


@REG.add(
    "length_tail_index",
    oracle=f"""
        WITH ranked AS (
            SELECT source, n_chars,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY n_chars DESC, doc_id ASC) AS rk
            FROM documents
        ),
        topk AS (
            SELECT source,
                   list(CAST(n_chars AS DOUBLE) ORDER BY rk) AS xs
            FROM ranked WHERE rk <= {_HILL_K} + 1
            GROUP BY source
        ),
        stats AS (
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   round(avg(CAST(n_chars AS DOUBLE)), 4) AS mean_chars,
                   round(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 3)
                       AS p50_chars,
                   round(quantile_cont(CAST(n_chars AS DOUBLE), 0.95), 3)
                       AS p95_chars
            FROM documents GROUP BY source
        )
        SELECT s.source, s.n_docs, s.mean_chars, s.p50_chars, s.p95_chars,
               round(list_reduce(
                   list_prepend(0.0,
                       list_transform(t.xs[:{_HILL_K}],
                                      x -> ln(x / t.xs[{_HILL_K} + 1]))),
                   (acc, v) -> acc + v) / {_HILL_K}, 6) AS hill_tail_index
        FROM stats s
        JOIN topk t ON t.source = s.source
        WHERE len(t.xs) = {_HILL_K} + 1
    """,
    doc=f"Heavy-tail diagnostic of the per-source document-length "
    f"distribution: exact p50/p95 plus the Hill tail-index estimator "
    f"over the top {_HILL_K} order statistics (mean of ln(x_i/x_(k+1)); "
    "small alpha-reciprocal = heavy tail). A heavy length tail is what "
    "breaks fixed-window sequence packing and skews shard sizes, so "
    "this is the number to check BEFORE choosing packing/shard "
    "parameters. The per-source top-(k+1) comes from a source-"
    "partitioned window; the log-ratio sum folds an ORDERED list "
    "(F.aggregate / list_reduce), so both engines add identical "
    "doubles in identical order. Sources with fewer than k+1 docs are "
    "excluded (the estimator is undefined).",
)
def length_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.col("n_chars").desc(), F.col("doc_id").asc()
        )
    )
    ranked = (
        d.select("source", "doc_id", "n_chars")
        .withColumn("rk", rk)
        .where(F.col("rk") <= _HILL_K + 1)
        .select("source", F.col("n_chars").cast("double").alias("x"), "rk")
    )
    topk = ranked.groupBy("source").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rk", "x"))),
            lambda s: s["x"],
        ).alias("xs"),
        F.count("*").alias("k1"),
    ).where(F.col("k1") == _HILL_K + 1)
    xs = F.col("xs")
    tail = F.element_at(xs, _HILL_K + 1)
    hill = (
        F.aggregate(
            F.transform(
                F.slice(xs, 1, _HILL_K), lambda x: F.log(x / tail)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        / _HILL_K
    )
    stats = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(F.col("n_chars").cast("double")), 4).alias(
            "mean_chars"
        ),
        F.round(F.expr("percentile(CAST(n_chars AS DOUBLE), 0.5)"), 3).alias(
            "p50_chars"
        ),
        F.round(F.expr("percentile(CAST(n_chars AS DOUBLE), 0.95)"), 3).alias(
            "p95_chars"
        ),
    )
    return stats.join(
        topk.select("source", F.round(hill, 6).alias("hill_tail_index")),
        "source",
    ).select(
        "source",
        "n_docs",
        "mean_chars",
        "p50_chars",
        "p95_chars",
        "hill_tail_index",
    )
