"""End-to-end training-data pipeline over the engine's operators.

Chains the curation stages a pretraining run needs — quality gates,
exact + near dedup, decontamination, stratified mixture sampling, and
sharded export — into one runnable script over the driver's testdata.
Every stage is the same registry operator the correctness gate checks;
this file shows how they compose.

Run:  PYTHONPATH=/root/repo python examples/pretrain_pipeline.py [sf_dir] [out_dir]

The analogous reference artifact is ``crates/sierradb/examples/``
(runnable invariant checkers); ours composes the extension surface.
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sierradb_spark.registry import load  # noqa: E402
from sierradb_spark.session import get_spark  # noqa: E402


def run_pipeline(spark, sf_dir: str, out_dir: str) -> dict:
    """documents.parquet -> curated, sharded training corpus. Returns
    per-stage row counts (the funnel report)."""
    d = load(spark, sf_dir, "documents")
    n0 = d.count()

    # 1. Quality gate (Gopher-style): length + token-count + mean word len.
    words = F.filter(F.split(F.trim(F.col("text")), " +"), lambda w: w != "")
    d = d.withColumn("n_tokens", F.size(words).cast("long"))
    mean_wl = (F.col("n_chars") - F.col("n_tokens") + 1.0) / F.col("n_tokens")
    quality = d.where(
        F.col("n_chars").between(80, 400)
        & F.col("n_tokens").between(15, 80)
        & mean_wl.between(3, 8)
    )
    n1 = quality.count()

    # 1b. PII redaction (RefinedWeb-style): same portable regex stages as
    #     the registry's pii_redacted_corpus operator. Rewrites text in
    #     place — no rows drop, so it sits outside the funnel counts.
    from sierradb_spark.functions.scrub import redact_col

    quality = quality.withColumn("text", redact_col(F.col("text")))

    # 1c. Gopher repetition filter: drop docs where >30% of their 8-word
    #     chunks repeat within the doc (pure array algebra, no shuffle).
    from sierradb_spark.functions.scrub import _SPARK_CHUNKS

    chunks = F.expr(_SPARK_CHUNKS)
    rep = quality.withColumn("_chunks", chunks).withColumn(
        "_rep",
        (F.size("_chunks") - F.size(F.array_distinct("_chunks")))
        / F.greatest(F.size("_chunks"), F.lit(1)),
    )
    quality = rep.where(F.col("_rep") <= 0.3).drop("_chunks", "_rep")
    n1c = quality.count()

    # 2. Exact dedup on normalized text hash (keep lowest doc_id).
    norm = F.md5(F.lower(F.trim(F.col("text"))))
    from pyspark.sql import Window

    rn = F.row_number().over(Window.partitionBy(norm).orderBy("doc_id"))
    exact = quality.withColumn("rn", rn).where(F.col("rn") == 1).drop("rn")
    n2 = exact.count()

    # 2b. NEAR dedup at production width: 64-hash MinHash LSH candidates
    #     (never N^2) -> exact-jaccard VERIFICATION of the colliding
    #     pairs (>= 0.8 kept — false-positive collisions must not merge
    #     unrelated docs into one component) -> connected components ->
    #     keep the min doc_id per component, drop the rest. Both stages
    #     are the same registry operators the correctness gate
    #     hash-checks (minhash_wide_candidates, minhash_verified_pairs).
    from sierradb_spark.functions.dedup_wide import minhash_verified_pairs
    from sierradb_spark.functions.pipeline import min_label_components

    cand = minhash_verified_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = cand.union(
        cand.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).localCheckpoint(eager=True)
    labels = min_label_components(edges)
    near_dropped = (
        labels.withColumn(
            "keep", F.min("id").over(Window.partitionBy("label"))
        )
        .where(F.col("id") != F.col("keep"))
        .select(F.col("id").alias("doc_id"))
    )
    exact = exact.join(F.broadcast(near_dropped), "doc_id", "left_anti")
    n2b = exact.count()

    # 3. Decontamination: drop docs sharing a 4-gram with the eval split
    #    (doc_id % 97 == 0 stands in; the eval side broadcasts).
    grams = F.when(
        F.size(words) >= 4,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - 4),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, 4)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(grams).alias("gram")
    )
    bench_grams = g.where(F.col("doc_id") % 97 == 0).select("gram").distinct()
    contaminated = (
        g.where(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench_grams), "gram", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean = exact.where(F.col("doc_id") % 97 != 0).join(
        F.broadcast(contaminated), "doc_id", "left_anti"
    )
    n3 = clean.count()

    # 3b. Template downweighting: PageRank over the near-dup candidate
    #     graph surfaces boilerplate hubs; surviving docs whose rank is
    #     above the graph mean sample at half rate (downweighted, not
    #     dropped — they carry signal, just over-represented).
    from sierradb_spark.functions.graphs import pagerank_near_dup

    pr = pagerank_near_dup(spark, sf_dir)
    mean_pr = float(pr.agg(F.avg("pagerank")).collect()[0][0] or 0.0)
    hubs = pr.where(F.col("pagerank") > mean_pr).select("doc_id")
    clean = clean.join(
        F.broadcast(hubs.withColumn("_hub", F.lit(True))), "doc_id", "left"
    )
    n3b = clean.where(F.col("_hub")).count()

    # 4. Stratified mixture sampling (deterministic multiplicative hash),
    #    halved for template hubs.
    rate = (
        F.when(F.col("lang") == "en", 0.5).when(F.col("lang") == "zh", 1.0).otherwise(0.75)
    ) * F.when(F.col("_hub"), 0.5).otherwise(1.0)
    keep = ((F.col("doc_id") * 2654435761) % (1 << 32)) < (
        F.lit(float(1 << 32)) * rate
    ).cast("long")
    sampled = clean.where(keep).drop("_hub")
    n4 = sampled.count()

    # 5. Sharded export: 8-way deterministic shard, one directory per shard.
    sharded = sampled.withColumn(
        "shard", ((F.col("doc_id") * 2654435761) % (1 << 32) % 8).cast("int")
    )
    (
        sharded.repartition(8, "shard")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )

    # 6. Holdout assignment + leakage audit (the registry's
    #    split_leakage_audit operator, composed inline). Splits hash the
    #    near-dup COMPONENT label (labels computed in 2b; singleton docs
    #    hash their own doc_id), so no component can span train/eval.
    #    The "what naive splitting would leak" number is measured on the
    #    PRE-near-dedup corpus — after 2b every component has one
    #    survivor and nothing can leak, which is exactly the point: the
    #    audit shows the risk that near-dedup + component-hash splitting
    #    jointly remove.
    comp = F.coalesce(F.col("label"), F.col("doc_id"))
    with_comp = quality.select("doc_id").join(
        F.broadcast(labels.withColumnRenamed("id", "doc_id")), "doc_id", "left"
    ).withColumn("component", comp)

    def split_of(h):
        m = (h * 2654435761) % (1 << 32) % 10
        return (
            F.when(m <= 7, F.lit("train"))
            .when(m == 8, F.lit("val"))
            .otherwise(F.lit("test"))
        )

    audited = with_comp.select(
        "doc_id",
        "component",
        split_of(F.col("component")).alias("split_comp"),
        split_of(F.col("doc_id")).alias("split_naive"),
    )
    leak = (
        audited.groupBy("component")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("split_naive").alias("naive_splits"),
            F.countDistinct("split_comp").alias("comp_splits"),
        )
        .where(F.col("n") >= 2)
        .agg(
            F.sum(F.when(F.col("naive_splits") > 1, 1).otherwise(0)).alias("naive"),
            F.sum(F.when(F.col("comp_splits") > 1, 1).otherwise(0)).alias("comp"),
        )
        .collect()[0]
    )
    n_naive_leaky = int(leak["naive"] or 0)
    n_comp_leaky = int(leak["comp"] or 0)
    assert n_comp_leaky == 0, "component-hash split leaked a near-dup pair"

    return {
        "input": n0,
        "quality_pass": n1,
        "after_repetition_filter": n1c,
        "after_exact_dedup": n2,
        "after_near_dedup": n2b,
        "after_decontamination": n3,
        # '#'-prefixed keys are informational (not funnel stages — this
        # one counts docs whose sampling rate was halved, not dropped).
        "#template_hubs_downweighted": n3b,
        "after_mixture_sampling": n4,
        "#naive_split_leaky_components": n_naive_leaky,
        "#component_split_leaky_components": n_comp_leaky,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(tempfile.gettempdir(), "pretrain_corpus")
    )
    spark = get_spark(app_name="pretrain-pipeline", shuffle_partitions=8)
    funnel = run_pipeline(spark, sf_dir, out_dir)
    for stage, n in funnel.items():
        print(f"{stage:>24}: {n}")
    print(f"corpus written to {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
