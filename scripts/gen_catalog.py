"""Regenerate docs/QUERIES.md from the live registry."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sierradb_spark.operators import REGISTRY

lines = [
    "# Query catalog",
    "",
    "Generated from the registry (`python scripts/gen_catalog.py`). Every entry is a",
    "`queries()` callable with a DuckDB value oracle, hash-checked by `tests/run_parity.py`",
    "and the driver's correctness gate. The first 50 entries are the gate's sampled window.",
    "",
    f"**{len(REGISTRY.queries)} queries.**",
    "",
    "| # | query | headline | doc |",
    "|---|-------|----------|-----|",
]
for i, (name, q) in enumerate(REGISTRY.queries.items()):
    doc = " ".join((q.doc or "").split())
    if len(doc) > 220:
        doc = doc[:217] + "..."
    hl = "yes" if q.headline else ""
    lines.append(f"| {i} | `{name}` | {hl} | {doc} |")

out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "QUERIES.md")
with open(out, "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {len(REGISTRY.queries)} entries to {out}")
