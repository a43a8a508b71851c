"""Store dumper — the analogue of the reference's
``crates/sierradb/examples/dump.rs`` (walk the segment files and print
every record). Here the units are the manifest chain and the files it
references: print each commit's manifest summary, then the committed
rows in (partition_id, partition_sequence) order.

Run: PYTHONPATH=/root/repo python examples/dump_store.py <store_path> [--limit N]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sierradb_spark.eventstore import EventStore  # noqa: E402
from sierradb_spark.session import get_spark  # noqa: E402


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    path = sys.argv[1]
    limit = 50
    if "--limit" in sys.argv:
        i = sys.argv.index("--limit")
        try:
            limit = int(sys.argv[i + 1])
        except (IndexError, ValueError):
            print("usage: dump_store.py <store_path> [--limit N]")
            return 2
    spark = get_spark(app_name="dump-store", shuffle_partitions=8)
    store = EventStore(spark, path)

    print("== manifest chain ==")
    for n in sorted(os.listdir(store.commits_path)):
        if not n.endswith(".json"):
            continue
        with open(os.path.join(store.commits_path, n)) as f:
            m = json.load(f)
        kind = "BASE" if m.get("base") else "incr"
        print(
            f"commit {m['commit']:>6} [{kind}] "
            f"+{len(m.get('events_add', []))} event file(s) "
            f"+{len(m.get('heads_add', []))} heads file(s) "
            f"watermarks={m.get('watermarks')}"
        )

    print("\n== stats ==")
    for k, v in store.stats().items():
        print(f"{k}: {v}")

    print(f"\n== first {limit} committed rows ==")
    rows = (
        store.events()
        .orderBy("partition_id", "partition_sequence")
        .limit(limit)
        .collect()
    )
    for r in rows:
        print(
            f"p{r['partition_id']:>3} seq {r['partition_sequence']:>6} "
            f"{r['stream_id']}@v{r['stream_version']} {r['event_name']} "
            f"txn {r['transaction_id'][:8]} payload {len(bytes(r['payload'] or b''))}B"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
