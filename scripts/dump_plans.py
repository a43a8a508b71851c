"""Dump .explain("formatted") for registry queries to files.

    python scripts/dump_plans.py plans/r11 _before q1_pricing_summary ...
    python scripts/dump_plans.py plans/r11 _after  --headline

Writes <outdir>/<query><suffix>.txt with the formatted physical plan
(untruncated metadata so PushedFilters/ReadSchema are checkable).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sierradb_spark.operators import REGISTRY  # noqa: E402
from sierradb_spark.session import get_spark  # noqa: E402


def main() -> int:
    outdir, suffix, *names = sys.argv[1:]
    if names == ["--headline"]:
        names = [n for n, q in REGISTRY.queries.items() if q.headline]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dump_plans")
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    for name in names:
        q = REGISTRY.queries[name]
        df = q.spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
