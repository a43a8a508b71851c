"""Whole-registry anti-pattern sweep: every declared query's physical
plan, every round.

Individual plan tests (test_plans.py) pin the designed shape of
specific flagships; this sweep pins the FLOOR for all of them at once —
the three plan smells that silently kill a query at 100 TB even though
sf0.01 correctness still passes:

- ``CartesianProduct``: an intended equi-join degraded to N x M;
- an unpartitioned ``Window`` (empty partition spec): the whole table
  through one task;
- ``BatchEvalPython``: a row-at-a-time Python UDF in the hot path
  (Arrow-batched MapInPandas/ArrowEvalPython are fine).

Any new registry entry is covered automatically the moment it is
registered — no opt-in, so a regression cannot hide in a query nobody
wrote a dedicated plan test for.
"""

from __future__ import annotations

import re

from sierradb_spark.operators import REGISTRY
from sierradb_spark.plans import plan_features

# The one deliberate exception: the Python-UDTF boundary DEMO exists to
# document the row-eval cost, not to be a production operator.
ROW_EVAL_ALLOWED = {"udtf_sentence_split"}

_GLOBAL_WINDOW = re.compile(r"Window \[[^\]]*\], \[([^\]]*)\]")


def test_no_query_plans_cartesian_global_window_or_row_udf(spark, sf_dir):
    violations: list[str] = []
    for name, q in REGISTRY.queries.items():
        f = plan_features(q.spark(spark, sf_dir))
        if f["cartesian_products"]:
            violations.append(f"{name}: CartesianProduct")
        for m in _GLOBAL_WINDOW.findall(f["plan"]):
            if not m.strip():
                violations.append(f"{name}: unpartitioned Window")
                break
        if "BatchEvalPython" in f["plan"] and name not in ROW_EVAL_ALLOWED:
            violations.append(f"{name}: BatchEvalPython (row-at-a-time UDF)")
    assert not violations, "\n".join(violations)
