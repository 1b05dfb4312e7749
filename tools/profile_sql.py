"""Dump SQL-execution node metrics for one registry query (profiling aid).

Usage: python tools/profile_sql.py <query_name> [sf_dir]
Prints every SQL execution's node tree with runtime metrics (rows, data
size, partition counts) from the UI REST API.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dedup.session import get_spark


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "near_dup_clusters"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "profile-sql", master=f"local[{cpus}]",
        extra_conf={"spark.ui.enabled": "true"},
    )
    from dedup.queries import QUERIES

    QUERIES[name](spark, sf_dir).count()
    base = "http://localhost:4040/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    execs = json.load(
        urllib.request.urlopen(
            f"{base}/applications/{app_id}/sql?details=true&length=200"
        )
    )
    for ex in execs:
        print(f"\n##### SQL exec {ex['id']} dur={ex['duration']}ms "
              f"desc={ex['description'][:80]}")
        for node in ex.get("nodes", []):
            mets = {
                m["name"]: m["value"] for m in node.get("metrics", [])
            }
            keep = {
                k: v for k, v in mets.items()
                if any(s in k for s in (
                    "number of output rows", "partitions", "data size",
                    "shuffle bytes written", "time to collect",
                    "number of files", "task commit",
                ))
            }
            print(f"  [{node['nodeId']:>3}] {node['nodeName'][:50]:50s} "
                  f"{json.dumps(keep)[:160]}")
    spark.stop()


if __name__ == "__main__":
    main()
