"""Stage-level profile of one registry query via the Spark UI REST API.

Usage: python tools/profile_flagship.py <query_name> [sf_dir]

Runs the query once untimed (warm-up), once timed, then dumps per-stage
wall/run-time/shuffle metrics from http://localhost:4040 so the wave
structure of a monolithic job is visible without the (disabled) UI.
Profiling aid only — not part of the frozen bench protocol.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dedup.session import get_spark


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "near_dup_clusters"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "profile", master=f"local[{cpus}]",
        extra_conf={"spark.ui.enabled": "true"},
    )
    from dedup.queries import QUERIES

    QUERIES[name](spark, sf_dir).count()  # warm-up
    base = "http://localhost:4040/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    stages_before = {
        s["stageId"]
        for s in json.load(
            urllib.request.urlopen(f"{base}/applications/{app_id}/stages")
        )
    }
    t0 = time.time()
    QUERIES[name](spark, sf_dir).count()
    wall = time.time() - t0
    stages = json.load(
        urllib.request.urlopen(f"{base}/applications/{app_id}/stages")
    )
    fresh = [s for s in stages if s["stageId"] not in stages_before]
    fresh.sort(key=lambda s: s.get("firstTaskLaunchedTime") or "")
    print(f"\n=== {name} wall {wall:.3f}s — {len(fresh)} stages ===")
    rows = []
    for s in fresh:
        sub = s.get("firstTaskLaunchedTime")
        done = s.get("completionTime")
        def ts(x):
            if not x:
                return None
            # 2026-08-22T06:10:11.123GMT
            from datetime import datetime
            return datetime.strptime(
                x.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f"
            ).timestamp()
        t_sub, t_done = ts(sub), ts(done)
        dur = (t_done - t_sub) if t_sub and t_done else -1
        rows.append(
            dict(
                id=s["stageId"],
                status=s["status"],
                dur_s=round(dur, 2),
                tasks=s["numCompleteTasks"],
                run_s=round(s["executorRunTime"] / 1000.0, 2),
                cpu_s=round(s.get("executorCpuTime", 0) / 1e9, 2),
                sh_read_mb=round(s["shuffleReadBytes"] / 1e6, 1),
                sh_write_mb=round(s["shuffleWriteBytes"] / 1e6, 1),
                in_mb=round(s["inputBytes"] / 1e6, 1),
                start=round(t_sub - t0, 2) if t_sub else None,
                name=s["name"][:60],
            )
        )
    for r in rows:
        print(
            f"stage {r['id']:>4} {r['status'][:4]} start={r['start']}"
            f" dur={r['dur_s']:>6} tasks={r['tasks']:>4}"
            f" run={r['run_s']:>7} cpu={r['cpu_s']:>7}"
            f" shR={r['sh_read_mb']:>7} shW={r['sh_write_mb']:>6}"
            f" in={r['in_mb']:>7}  {r['name']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
