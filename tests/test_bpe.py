"""BPE merge-learning: greedy-fuse equivalence + output invariants.

The registry query's value hash already pins Spark == DuckDB end to
end; these tests pin the fuse kernel itself against a pure-Python
greedy reference on the adversarial shapes (repeated-symbol runs,
alternating pairs, fused-symbol collisions) where a wrong
non-overlapping rule diverges.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sierradb_spark.functions.bpe import bpe_learn_merges, merge_step


def py_greedy_fuse(syms: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


CASES = [
    (["a", "a", "a"], "a", "a"),          # odd run: every other match
    (["a", "a", "a", "a"], "a", "a"),     # even run
    (["a", "b", "a", "b"], "a", "b"),     # alternating, both fuse
    (["x", "a", "b", "b"], "b", "b"),     # match after non-match
    (["ab", "b", "b"], "ab", "b"),        # multi-char left symbol
    (["a", "b", "b", "a", "b"], "a", "b"),
    (["b", "a", "a", "b", "a"], "a", "a"),
    (["a"], "a", "a"),                    # too short to match
    ([], "a", "b"),                       # empty word
]


def test_fold_matches_python_greedy_reference(spark):
    rows = [(i, syms) for i, (syms, _, _) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "i int, syms array<string>")
    cols = [
        F.aggregate(
            F.col("syms"), F.array().cast("array<string>"), merge_step(a, b)
        ).alias(f"c{i}")
        for i, (_, a, b) in enumerate(CASES)
    ]
    got = df.orderBy("i").select("i", *cols).collect()
    for row in got:
        syms, a, b = CASES[row["i"]]
        assert row[f"c{row['i']}"] == py_greedy_fuse(syms, a, b), (
            syms,
            a,
            b,
        )


def test_learned_merge_counts_nonincreasing(spark, sf_dir):
    """The best-pair count can never rise round over round: any pair
    present before the fuse keeps its count (<= old best, else it
    would have won), and newly created pairs are bounded by the fused
    pair's occurrence count."""
    rows = bpe_learn_merges(spark, sf_dir).orderBy("merge_rank").collect()
    assert len(rows) == 10
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(c > 0 for c in counts)
    # ranks are 1..10 and merges are distinct pairs
    assert [r["merge_rank"] for r in rows] == list(range(1, 11))
    assert len({(r["left_sym"], r["right_sym"]) for r in rows}) == 10


def test_py_fuse_matches_greedy_reference():
    """The r11 driver-side fuse twin must agree with the index-scan
    greedy reference on the same adversarial shapes that pin the Spark
    fold (runs, alternations, fused-symbol collisions)."""
    from sierradb_spark.functions.bpe import _py_fuse

    for syms, a, b in CASES:
        assert _py_fuse(syms, a, b) == py_greedy_fuse(syms, a, b), (syms, a, b)
