"""Engine-only one-pass registry sweep: time every declared query.

Runs each REGISTRY query's Spark side once (collect, same action the
bench and the driver use) at $SPARK_GRAFT_SF_DIR, in registry order,
and writes a JSON report sorted by seconds descending.

    python scripts/sweep_engine.py [out.json] [name ...]

Methodology notes (docs/SCALE.md): always sweep through
``session.get_spark`` (tuned confs); one-pass numbers carry first-
consumer memo-build costs and ±15-30% host noise — use them to RANK
hotspots, then isolate each candidate with repeated reps before/after.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sierradb_spark.operators import REGISTRY  # noqa: E402
from sierradb_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    out_path = args[0] if args and args[0].endswith(".json") else None
    names = args[1:] if out_path else args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="sweep")
    try:
        load1_pre = round(os.getloadavg()[0], 2)
    except OSError:
        load1_pre = None
    # session warm-up mirroring bench.py so query 1 isn't charged for it
    from sierradb_spark.registry import load as load_table

    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    load_table(spark, sf_dir, "events").limit(1).count()
    load_table(spark, sf_dir, "documents").limit(1).count()

    todo = names or list(REGISTRY.queries)
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    t_all = time.perf_counter()
    for name in todo:
        q = REGISTRY.queries[name]
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        t0 = time.perf_counter()
        n = len(q.spark(spark, sf_dir).collect())
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        rows[name] = n
        print(f"# {name}: {dt:.3f}s rows={n}", file=sys.stderr)
    total = round(time.perf_counter() - t_all, 3)
    try:
        load1_post = round(os.getloadavg()[0], 2)
    except OSError:
        load1_post = None
    report = {
        "sf_dir": sf_dir,
        "total_seconds": total,
        "load1": {"pre": load1_pre, "post": load1_post},
        "median_seconds": round(statistics.median(timings.values()), 3),
        "queries_desc": dict(
            sorted(timings.items(), key=lambda kv: -kv[1])
        ),
    }
    line = json.dumps(report)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
