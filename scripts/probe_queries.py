"""Isolate specific queries: k reps each with GEMM/load probes.

    python scripts/probe_queries.py name [name ...]

Per query: runs $SPARK_GRAFT_BENCH_K (default 3) reps (collect) in a
fresh-session one-pass context, printing per-rep seconds plus a
pre-rep 1-min load sample and a GEMM probe before/after the block, so
an external host burst is attributable instead of silently inflating
a recording (docs/SCALE.md methodology).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sierradb_spark.operators import REGISTRY  # noqa: E402
from sierradb_spark.session import get_spark  # noqa: E402


def _gemm() -> float:
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.standard_normal((512, 512))
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        (a @ a).sum()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 4)


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    k = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_K", "3")))
    spark = get_spark(app_name="probe")
    from sierradb_spark.registry import load as load_table

    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    load_table(spark, sf_dir, "events").limit(1).count()
    load_table(spark, sf_dir, "documents").limit(1).count()
    print(f"# session gemm={_gemm()} load1={os.getloadavg()[0]:.2f}")
    for name in names:
        q = REGISTRY.queries[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        runs = []
        for _ in range(k):
            l1 = round(os.getloadavg()[0], 2)
            t0 = time.perf_counter()
            n = len(q.spark(spark, sf_dir).collect())
            runs.append((round(time.perf_counter() - t0, 3), l1))
        print(
            f"{name}: reps={runs} rows={n} gemm_after={_gemm()}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
