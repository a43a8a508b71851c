"""Pattern mining and training-data curation additions: market-basket
association rules, contrastive hard-negative mining, sequence
predictability (conditional entropy), and tokenizer vocabulary-coverage
sizing.

These extend the LLM-data-pipeline surface (SURVEY §2 notes the
reference ships no analytics language at all — its scope stops at
event storage; everything here is the Spark-native analytics layer a
user runs *on top of* that store/corpus).

Scale shapes, stated up front:

- ``basket_association_rules``: pair candidates explode map-side from
  per-basket sorted item sets (one basket-keyed collect_set aggregate;
  (parts[i], parts[j]) for i < j is exactly the part_a < part_b
  self-join output with zero join), so the pair count is bounded by
  sum(basket_size^2) — never |items|^2. An apriori prefilter drops
  pairs whose members cannot reach the pair-support floor BEFORE the
  pair exchange (broadcast key-set joins: a pair seen >= MIN_PAIR
  times needs each member seen >= MIN_PAIR times), so only plausible
  pairs shuffle. Top-k by lift is TakeOrderedAndProject.
- ``hard_negative_mining``: the query batch (a deterministic id
  sample) is the broadcast side of a BroadcastNestedLoopJoin; the
  corpus streams past it once. This is the exact mining pass for a
  bounded query batch — at 100 TB the candidate set per query comes
  from the IVF index (similarity.py) first, and this operator scores
  the candidates; the plumbing (broadcast queries, rounded-score
  window top-k) is identical either way.
- ``event_conditional_entropy``: one user-partitioned ordered window
  (lead), one pair aggregate, one |types|-sized equi-join. The event
  table is touched once.
- ``vocab_coverage_curve``: the cumulative "smallest vocab covering
  X% of tokens" is computed WITHOUT a global window: word counts fold
  to a count-of-counts histogram (distinct frequency values — at most
  O(sqrt(total_tokens)) rows), the cumulative-above is a
  nested-loop join over that tiny aggregate, and the within-class
  remainder is exact integer arithmetic (pct * total stays integral),
  so Spark and DuckDB agree bit-for-bit. The DuckDB oracle computes
  the same answer the direct way (global ranked cumsum), so the
  histogram algebra is value-checked against the definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sierradb_spark.functions.similarity import _sql_cos, cosine_col, _dvec
from sierradb_spark.registry import Registry, load

REG = Registry()

# A pair must co-occur in at least this many baskets to become a rule.
MIN_PAIR = 2
# Rules reported: top-k by lift (rounded; part-key tiebreak).
TOP_RULES = 100


@REG.add(
    "basket_association_rules",
    oracle=f"""
        WITH baskets AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        item AS (
            SELECT l_partkey, count(*) AS c FROM baskets GROUP BY l_partkey
        ),
        n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM baskets),
        pair AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   count(*) AS c_ab
            FROM baskets a
            JOIN baskets b ON a.l_orderkey = b.l_orderkey
                          AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING count(*) >= {MIN_PAIR}
        )
        SELECT part_a, part_b,
               CAST(c_ab AS BIGINT) AS pair_count,
               round(c_ab::DOUBLE / n_orders, 6) AS support,
               round(c_ab::DOUBLE / ia.c, 4) AS confidence_a_to_b,
               round((c_ab::DOUBLE * n_orders) / (ia.c::DOUBLE * ib.c), 4)
                   AS lift
        FROM pair
        JOIN item ia ON pair.part_a = ia.l_partkey
        JOIN item ib ON pair.part_b = ib.l_partkey
        CROSS JOIN n
        ORDER BY lift DESC, part_a ASC, part_b ASC
        LIMIT {TOP_RULES}
    """,
    doc="Market-basket association rules over order baskets (distinct "
    "parts per order): pair support, directional confidence, and lift, "
    "top-k by lift. Candidates explode map-side from per-basket sorted "
    "item sets (bounded by basket sizes, never |parts|^2 — no "
    "self-join) with an apriori prefilter — pairs whose members cannot "
    "reach the pair-support floor are dropped by broadcast key-set "
    "joins before the pair exchange, so only plausible pairs shuffle.",
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # ONE basket-keyed aggregate serves everything: collect_set is the
    # DISTINCT (per-basket dedup happens map-side, inside the partial
    # aggregate), sort_array makes ascending in-array order the pair
    # order, and the same relation feeds item counts, pair generation,
    # and the basket count — the old shape recomputed the basket
    # distinct under five subtrees and generated pairs by broadcasting
    # the whole filtered basket table against itself.
    arr = (
        li.where(F.col("l_orderkey").isNotNull())
        .select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
    )
    item = (
        arr.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count("*").alias("c"))
    )
    n = arr.agg(F.count("*").cast("double").alias("n_orders"))
    # Pairs explode map-side from the sorted set: (parts[i], parts[j])
    # for i < j is exactly the a.l_partkey < b.l_partkey self-join
    # output, with zero join. The apriori prune (a pair reaching
    # MIN_PAIR needs both members in >= MIN_PAIR baskets) applies as
    # broadcast key-set joins BEFORE the pair exchange, so only
    # plausible pairs shuffle; carrying c through also saves re-joining
    # item counts after the pair aggregate.
    keep = item.where(F.col("c") >= MIN_PAIR)
    pairs = arr.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (x, i) -> "
                "transform(slice(parts, i + 2, size(parts)), "
                "y -> struct(x AS pa, y AS pb))))"
            )
        ).alias("p")
    ).select(F.col("p.pa").alias("part_a"), F.col("p.pb").alias("part_b"))
    ka = keep.select(
        F.col("l_partkey").alias("part_a"), F.col("c").alias("c_a")
    )
    kb = keep.select(
        F.col("l_partkey").alias("part_b"), F.col("c").alias("c_b")
    )
    pair = (
        pairs.join(F.broadcast(ka), "part_a")
        .join(F.broadcast(kb), "part_b")
        .groupBy("part_a", "part_b", "c_a", "c_b")
        .agg(F.count("*").alias("c_ab"))
        .where(F.col("c_ab") >= MIN_PAIR)
    )
    c_ab = F.col("c_ab").cast("double")
    return (
        pair.crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            F.col("c_ab").cast("bigint").alias("pair_count"),
            F.round(c_ab / F.col("n_orders"), 6).alias("support"),
            F.round(c_ab / F.col("c_a"), 4).alias("confidence_a_to_b"),
            F.round(
                (c_ab * F.col("n_orders"))
                / (F.col("c_a").cast("double") * F.col("c_b")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(TOP_RULES)
    )


# Every NEG_MODULUS-th vector is a mining query; top-k negatives each.
NEG_MODULUS = 100
NEG_TOPK = 3


@REG.add(
    "hard_negative_mining",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS q_id, label AS q_label, embedding AS qv
            FROM embeddings WHERE vec_id % {NEG_MODULUS} = 0
        )
        SELECT q_id, q_label, e.vec_id AS neg_id, e.label AS neg_label,
               round({_sql_cos('e.embedding', 'q.qv')}, 4) AS cosine
        FROM embeddings e JOIN q ON e.label <> q.q_label
        QUALIFY row_number() OVER (
            PARTITION BY q_id ORDER BY cosine DESC, e.vec_id ASC
        ) <= {NEG_TOPK}
        ORDER BY q_id, cosine DESC, neg_id
    """,
    doc="Contrastive hard-negative mining: for each query vector (a "
    "deterministic id sample), the top-k most-cosine-similar vectors "
    "carrying a DIFFERENT label — the negatives that teach an embedding "
    "model the most. The query batch broadcasts (BroadcastNestedLoopJoin "
    "with the label-mismatch predicate); per-query top-k runs under a "
    "q_id-partitioned window on the ROUNDED score with id tiebreak. At "
    "100 TB the per-query candidates come from the IVF index first; "
    "this is the exact scoring pass over a bounded query batch.",
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % NEG_MODULUS == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("qv"),
    )
    scored = (
        e.join(F.broadcast(q), F.col("label") != F.col("q_label"))
        .select(
            "q_id",
            "q_label",
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            F.round(cosine_col(_dvec("embedding"), _dvec("qv")), 4).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("neg_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= NEG_TOPK)
        .drop("rn")
    )


@REG.add(
    "event_conditional_entropy",
    oracle="""
        WITH seq AS (
            SELECT event_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS next_type
            FROM events
        ),
        pairs AS (
            SELECT event_type, next_type, count(*) AS c
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY event_type, next_type
        ),
        tot AS (
            SELECT event_type, sum(c) AS t, count(*) AS n_next
            FROM pairs GROUP BY event_type
        )
        SELECT p.event_type,
               CAST(min(t) AS BIGINT) AS n_transitions,
               CAST(min(n_next) AS BIGINT) AS n_next_types,
               round(-sum((c::DOUBLE / t) * log2(c::DOUBLE / t)), 6)
                   AS entropy_bits,
               round(pow(2, -sum((c::DOUBLE / t) * log2(c::DOUBLE / t))), 4)
                   AS perplexity
        FROM pairs p JOIN tot USING (event_type)
        GROUP BY p.event_type
    """,
    doc="Conditional entropy of the next event type given the current one, "
    "per current type — H(next|cur) in bits plus the equivalent "
    "perplexity (branching factor). The predictability counterpart of "
    "event_transition_matrix: low entropy = deterministic flows "
    "(funnels), high = exploratory behavior. One user-partitioned "
    "ordered window, one pair aggregate, one |types|-sized equi-join; "
    "the event table is touched once.",
)
def event_conditional_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "event_type", F.lead("event_type").over(w).alias("next_type")
        )
        .where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("c"))
    )
    tot = pairs.groupBy("event_type").agg(
        F.sum("c").alias("t"), F.count("*").alias("n_next")
    )
    p = F.col("c").cast("double") / F.col("t")
    ent = -F.sum(p * F.log2(p))
    return (
        pairs.join(tot, "event_type")
        .groupBy("event_type")
        .agg(
            F.min("t").cast("bigint").alias("n_transitions"),
            F.min("n_next").cast("bigint").alias("n_next_types"),
            F.round(ent, 6).alias("entropy_bits"),
            F.round(F.pow(F.lit(2.0), ent), 4).alias("perplexity"),
        )
    )


_COVERAGE_PCTS = (90, 95, 99)


@REG.add(
    "vocab_coverage_curve",
    oracle=f"""
        WITH tok AS (
            SELECT unnest(CASE WHEN length(trim(text)) = 0 THEN ['']
                 ELSE regexp_split_to_array(trim(text), '\\s+') END) AS t
            FROM documents
        ),
        cnt AS (
            SELECT lower(t) AS tk, count(*) AS c FROM tok GROUP BY lower(t)
        ),
        rk AS (
            SELECT c,
                   row_number() OVER (ORDER BY c DESC, tk ASC) AS r,
                   sum(c) OVER (ORDER BY c DESC, tk ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
            FROM cnt
        ),
        tot AS (
            SELECT sum(c) AS total_tokens, count(*) AS vocab_total FROM cnt
        )
        SELECT pct,
               CAST(min(r) AS BIGINT) AS vocab_size,
               CAST(min(vocab_total) AS BIGINT) AS vocab_total,
               round(min(r)::DOUBLE / min(vocab_total), 6) AS vocab_frac,
               round(min_by(cum, r)::DOUBLE / min(total_tokens), 6)
                   AS covered_share
        FROM rk CROSS JOIN tot
        CROSS JOIN (VALUES (90), (95), (99)) AS th(pct)
        WHERE cum * 100 >= pct * total_tokens
        GROUP BY pct
    """,
    doc="Smallest vocabulary covering 90/95/99% of token occurrences — the "
    "sizing curve tokenizer design reads off. Computed WITHOUT a global "
    "window: word counts fold to a count-of-counts histogram (distinct "
    "frequency values, at most O(sqrt(total_tokens)) rows), the "
    "cumulative-above is a nested-loop join over that tiny aggregate, "
    "and the within-frequency-class remainder is exact integer "
    "arithmetic, so the histogram algebra hash-matches the oracle's "
    "direct ranked-cumsum definition.",
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.when(
        F.length(F.trim("text")) == 0, F.array(F.lit(""))
    ).otherwise(F.split(F.trim(F.col("text")), r"\s+"))
    cnt = (
        d.select(F.explode(toks).alias("t"))
        .groupBy(F.lower("t").alias("tk"))
        .agg(F.count("*").alias("c"))
    )
    hist = (
        cnt.groupBy("c")
        .agg(F.count("*").alias("nw"))
        .withColumn("mass", F.col("c") * F.col("nw"))
    )
    tot = hist.agg(
        F.sum("mass").alias("total_tokens"),
        F.sum("nw").alias("vocab_total"),
    )
    h1, h2 = hist.alias("h1"), hist.alias("h2")
    above = (
        h1.join(h2, F.col("h2.c") > F.col("h1.c"), "left")
        .groupBy(
            F.col("h1.c").alias("c"),
            F.col("h1.nw").alias("nw"),
            F.col("h1.mass").alias("mass"),
        )
        .agg(
            F.coalesce(F.sum("h2.nw"), F.lit(0)).alias("words_above"),
            F.coalesce(F.sum("h2.mass"), F.lit(0)).alias("mass_above"),
        )
    )
    pct = F.explode(
        F.array(*[F.lit(int(p)) for p in _COVERAGE_PCTS])
    ).alias("pct")
    rows = above.crossJoin(F.broadcast(tot)).select("*", pct)
    # The pct boundary falls inside frequency class c iff the mass
    # strictly above c misses the target and including c reaches it.
    target = F.col("pct") * F.col("total_tokens")
    hit = rows.where(
        (F.col("mass_above") * 100 < target)
        & ((F.col("mass_above") + F.col("mass")) * 100 >= target)
    )
    # Words needed inside the class: ceil((target/100 - mass_above)/c)
    # in exact integer form (all operands bigint; magnitudes < 2^53 so
    # the double floor() is exact and engine-identical).
    k = F.floor(
        (target - 100 * F.col("mass_above") + 100 * F.col("c") - 1)
        / (100 * F.col("c"))
    )
    vocab_size = (F.col("words_above") + k).cast("bigint")
    covered = F.col("mass_above") + k * F.col("c")
    return hit.select(
        "pct",
        vocab_size.alias("vocab_size"),
        F.col("vocab_total").cast("bigint").alias("vocab_total"),
        F.round(
            vocab_size.cast("double") / F.col("vocab_total"), 6
        ).alias("vocab_frac"),
        F.round(
            covered.cast("double") / F.col("total_tokens"), 6
        ).alias("covered_share"),
    )
