"""Production-width sketch quality: the LSH candidate sets must contain
every true near-dup the exact baselines find (VERDICT r2 done-criterion)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sierradb_spark.operators import REGISTRY


def test_minhash_wide_lsh_covers_exact_near_dups(spark, sf_dir):
    row = REGISTRY.queries["minhash_wide_recall"].spark(spark, sf_dir).collect()[0]
    assert row["n_true"] > 0  # the audit is vacuous on a dup-free corpus
    assert row["n_true_covered"] == row["n_true"], (
        f"LSH missed {row['n_true'] - row['n_true_covered']} of "
        f"{row['n_true']} true near-dup pairs"
    )


def test_simhash64_bands_cover_hamming_radius(spark, sf_dir):
    """Pigeonhole check, empirically: every pair within Hamming distance 3
    of the full signature set appears in the band-join candidates."""
    sims = REGISTRY.queries["simhash64_signatures"].spark(spark, sf_dir)
    a, b = sims.alias("a"), sims.alias("b")
    chunk = lambda c, t: F.conv(  # noqa: E731
        F.substring(c, 1 + 4 * t, 4), 16, 10
    ).cast("long")
    ham = F.bit_count(chunk("a.simhash64", 0).bitwiseXOR(chunk("b.simhash64", 0)))
    for t in range(1, 4):
        ham = ham + F.bit_count(
            chunk("a.simhash64", t).bitwiseXOR(chunk("b.simhash64", t))
        )
    truth = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn("hamming", ham.cast("long"))
        .where(F.col("hamming") <= 3)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            "hamming",
        )
    )
    cand = REGISTRY.queries["simhash64_hamming_candidates"].spark(spark, sf_dir)
    t_rows = {(r["doc_a"], r["doc_b"], r["hamming"]) for r in truth.collect()}
    c_rows = {(r["doc_a"], r["doc_b"], r["hamming"]) for r in cand.collect()}
    assert t_rows, "no pairs within radius on this corpus — audit vacuous"
    assert t_rows == c_rows  # bands lose nothing and add nothing
