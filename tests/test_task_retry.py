"""Task-failure resilience: injected attempt-0 failures must not change
results.

The north star requires surviving executor loss mid-stage. In local mode a
lost executor surfaces as a failed task attempt, so this drives the
flagship pipeline with a corpus source whose partition-0 task RAISES on
its first attempt in every job (TaskContext.attemptNumber() == 0) under a
master with task retries enabled (local[4,2]) and asserts the final
clusters are identical to a clean run — i.e. every kernel stage is
deterministic and idempotent under Spark's recomputation, which is the
property a 1000-executor run leans on constantly. A separate interpreter
is required because the suite's shared session pins maxFailures=1 (one
SparkContext per JVM).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import os, sys
sys.path.insert(0, __REPO__)
from pyspark import TaskContext
from dedup.config import DedupConfig
from dedup.fixtures import make_corpus
from dedup.pipeline import run_dedup
from dedup.session import get_spark

marker = sys.argv[1]
spark = get_spark("retry", master="local[4,2]")
spark.sparkContext.setLogLevel("ERROR")
pdf, _ = make_corpus(n_base=40, seed=13)
df = spark.createDataFrame(pdf).repartition(8)

def flaky(batches):
    tc = TaskContext.get()
    if tc is not None and tc.partitionId() == 0 and tc.attemptNumber() == 0:
        open(marker, "a").write("fired\n")
        raise RuntimeError("injected executor loss (attempt 0, partition 0)")
    yield from batches

flaky_df = df.mapInPandas(flaky, df.schema)
cfg = DedupConfig()
got = {(r["doc_key"], r["cluster_id"])
       for r in run_dedup(spark, flaky_df, cfg).collect()}
want = {(r["doc_key"], r["cluster_id"])
        for r in run_dedup(spark, df, cfg).collect()}
assert os.path.exists(marker), "failure injection never fired"
assert got == want, f"clusters diverged under retries: {len(got ^ want)} diffs"
print(f"RETRYOK docs={len(want)} injected={sum(1 for _ in open(marker))}")
spark.stop()
"""


def test_clusters_identical_under_task_retries(tmp_path):
    marker = str(tmp_path / "fired")
    res = subprocess.run(
        [sys.executable, "-c", _SCRIPT.replace("__REPO__", repr(REPO)), marker],
        capture_output=True,
        text=True,
        timeout=570,
    )
    assert res.returncode == 0, res.stderr[-4000:]
    ok = [l for l in res.stdout.splitlines() if l.startswith("RETRYOK")]
    assert ok, res.stdout[-2000:]
    # the injection fired at least once per job that scanned the corpus
    assert int(ok[0].split("injected=")[1]) >= 1
