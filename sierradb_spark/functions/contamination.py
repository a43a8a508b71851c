"""Decontamination, blocklist filtering, and domain-mixture planning.

The three curation stages between dedup and export that round out the
pipeline surface (BASELINE.json north star):

- benchmark decontamination: drop training documents sharing long
  word n-grams with an evaluation set (the n-gram-overlap protocol
  used for public benchmark hygiene);
- blocklist filtering: cheap term-level content gating;
- mixture planning: per-domain sampling rates to hit target corpus
  proportions under a token budget.

Scale shapes: contamination is a semi join on hashed 8-gram keys —
the benchmark side is tiny (the eval set), so the join broadcasts and
the corpus side streams through one scan. Blocklist and mixture are
scan-side projections with per-source final aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sierradb_spark.registry import Registry, _shuffle_width, load

REG = Registry()

# Words per contamination n-gram. Real pipelines use 8-13; the synthetic
# corpus' vocabulary is small enough that 4 already gives the selective
# overlap profile (a handful of flagged docs) an 8-gram gives real text.
_GRAM_N = 4

_SQL_WS = "list_filter(string_split_regex(trim(text), ' +'), x -> x <> '')"

_BLOCKLIST = ("slow", "error", "crash")


def _words_col() -> F.Column:
    return F.filter(F.split(F.trim(F.col("text")), " +"), lambda w: w != "")


@REG.add(
    "benchmark_contamination",
    headline=True,
    oracle=f"""
        WITH w AS (
            SELECT doc_id, source, {_SQL_WS} AS ws FROM documents
        ),
        g AS (
            SELECT doc_id, source, array_to_string(ws[i:i+{_GRAM_N - 1}], ' ') AS gram
            FROM w, unnest(generate_series(1, len(ws) - {_GRAM_N - 1})) t(i)
            WHERE len(ws) >= {_GRAM_N}
        ),
        bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
        hits AS (
            SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gram)
            WHERE g.doc_id % 97 <> 0
        )
        SELECT d.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(h.doc_id) AS BIGINT) AS n_contaminated,
               round(count(h.doc_id)::DOUBLE / count(*), 4) AS contamination_rate
        FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        WHERE d.doc_id % 97 <> 0
        GROUP BY d.source
    """,
    doc=f"Benchmark decontamination: flag training docs sharing any {_GRAM_N}-word "
    "n-gram with the held-out set (doc_id %% 97 == 0 stands in for the eval "
    "corpus). The eval side's distinct grams are small by construction -> "
    "broadcast semi join; the corpus side generates grams in one scan "
    "(transform over the word array, no per-word explode before the join key "
    "is formed).",
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # Materialize the word arrays first: the gram lambda below slices
    # the words per position, and an inline split expression would be
    # re-evaluated per gram (O(len^2) per doc). repartition: single
    # input split. r11: the exploded gram table is NOT materialized any
    # more — the bench side filters to the 1/97 eval docs BEFORE gram
    # generation (so its second gram pass is ~free), and the corpus
    # side streams its grams straight into the broadcast semi join
    # instead of writing the full gram explode to storage memory and
    # reading it back (the old eager checkpoint materialized every gram
    # string once just to consume the two disjoint halves separately:
    # strictly more bytes moved than the recompute it saved).
    n_slices = _shuffle_width(d.sparkSession)
    w = (
        d.select("doc_id", "source", _words_col().alias("ws"))
        .repartition(n_slices)
        .localCheckpoint(eager=True)
    )
    ws = F.col("ws")
    grams = F.when(
        F.size(ws) >= _GRAM_N,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - _GRAM_N),
            lambda i: F.concat_ws(" ", F.slice(ws, i + 1, _GRAM_N)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bench = (
        w.where(F.col("doc_id") % 97 == 0)
        .select(F.explode(grams).alias("gram"))
        .distinct()
    )
    hits = (
        w.where(F.col("doc_id") % 97 != 0)
        .select("doc_id", F.explode(grams).alias("gram"))
        .join(F.broadcast(bench), "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus = d.where(F.col("doc_id") % 97 != 0)
    return (
        corpus.join(F.broadcast(hits), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count("hit").alias("n_contaminated"),
            F.round(F.count("hit") / F.count("*"), 4).alias("contamination_rate"),
        )
    )


@REG.add(
    "blocklist_filter_stats",
    oracle=f"""
        WITH t AS (
            SELECT source,
                   len(list_filter({_SQL_WS},
                       w -> list_contains({list(_BLOCKLIST)}, w))) AS n_hits
            FROM documents
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(*) FILTER (WHERE n_hits > 0) AS BIGINT) AS n_flagged,
               CAST(sum(n_hits) AS BIGINT) AS total_hits
        FROM t GROUP BY source
    """,
    doc="Blocklist filtering: per-source counts of documents containing any "
    "blocklisted term, plus total occurrences. A doc-local array filter (no "
    "explode, no shuffle of tokens); the per-source rollup moves one row per "
    "document.",
)
def blocklist_filter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    block = F.array(*[F.lit(w) for w in _BLOCKLIST])
    n_hits = F.size(
        F.filter(_words_col(), lambda w: F.array_contains(block, w))
    )
    t = d.select("source", n_hits.alias("n_hits"))
    return t.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count(F.when(F.col("n_hits") > 0, 1)).alias("n_flagged"),
        F.sum("n_hits").cast("long").alias("total_hits"),
    )


@REG.add(
    "domain_mixture_plan",
    oracle="""
        WITH per_src AS (
            SELECT source,
                   CAST(substr(source, 4) AS BIGINT) AS src_n,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS n_chars
            FROM documents GROUP BY source
        ),
        total AS (SELECT sum(n_chars)::DOUBLE AS budget FROM per_src)
        SELECT source, n_docs, n_chars,
               round((20 - src_n) / 210.0, 4) AS target_weight,
               round(least(1.0,
                     ((20 - src_n) / 210.0) * budget / n_chars), 4) AS keep_rate
        FROM per_src, total
    """,
    doc="Domain-mixture planning: given target per-domain weights (here a "
    "deterministic rank-derived weighting over the 20 sources) and the corpus "
    "char budget, compute each domain's sampling keep-rate. Pure arithmetic "
    "over the per-source aggregate (20 rows) — the planner that turns mixture "
    "specs (e.g. 40%% web / 30%% books...) into scan-side sample predicates.",
)
def domain_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )
    src_n = F.substring("source", 4, 10).cast("long")
    budget = per_src.agg(F.sum("n_chars").cast("double").alias("budget"))
    weight = (20 - src_n) / 210.0
    return (
        per_src.crossJoin(F.broadcast(budget))
        .select(
            "source",
            "n_docs",
            "n_chars",
            F.round(weight, 4).alias("target_weight"),
            F.round(
                F.least(F.lit(1.0), weight * F.col("budget") / F.col("n_chars")),
                4,
            ).alias("keep_rate"),
        )
    )
