"""Column-expression version semantics must equal the pure-Python truth
table on every (expected, current) combination — one Spark job, all cases."""

from __future__ import annotations

from sierradb_spark import versions as V
from pyspark.sql import functions as F


def test_gap_columns_match_python(spark):
    expecteds = ["any", "exists", "empty"] + [str(n) for n in (0, 1, 3, 7, 2**40)]
    currents = [None, 0, 1, 3, 7, 2**40, 2**41]
    cases = [(e, c) for e in expecteds for c in currents]
    df = spark.createDataFrame(cases, "expected string, current long")
    out = df.select(
        "expected",
        "current",
        V.gap_ok_col(F.col("expected"), F.col("current")).alias("ok"),
        V.gap_kind_col(F.col("expected"), F.col("current")).alias("kind"),
    ).collect()
    assert len(out) == len(cases)
    for row in out:
        gap = V.gap_from(V.parse_expected_version(row["expected"]), row["current"])
        assert row["ok"] == gap.ok, (row["expected"], row["current"])
        assert row["kind"] == gap.kind, (row["expected"], row["current"])
