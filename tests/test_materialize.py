"""materialize(): reliable checkpoint when a checkpoint dir is configured,
localCheckpoint fallback otherwise — the executor-loss-safety policy behind
every multi-consumer intermediate in the engine."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import os, sys
sys.path.insert(0, __REPO__)
from pyspark.sql import functions as F
from dedup.session import get_spark, materialize

ckpt_dir = sys.argv[1]
spark = get_spark("mat", master="local[2]")
spark.sparkContext.setLogLevel("ERROR")
spark.sparkContext.setCheckpointDir(ckpt_dir)
df = spark.range(1000).withColumn("x", F.xxhash64("id"))
m = materialize(df, eager=True)
assert m.count() == 1000
# reliable checkpoint writes RDD blocks under the configured dir
found = [
    os.path.join(r, f) for r, _, fs in os.walk(ckpt_dir) for f in fs
]
assert found, "no reliable-checkpoint files written"
print("RELIABLEOK", len(found))
spark.stop()
"""


def test_reliable_checkpoint_when_dir_configured(tmp_path):
    res = subprocess.run(
        [sys.executable, "-c", _SCRIPT.replace("__REPO__", repr(REPO)),
         str(tmp_path / "ckpt")],
        capture_output=True, text=True, timeout=570,
    )
    assert res.returncode == 0, res.stderr[-4000:]
    assert "RELIABLEOK" in res.stdout, res.stdout[-2000:]


def test_local_checkpoint_without_dir(spark):
    from pyspark.sql import functions as F

    from dedup.session import materialize

    assert spark.sparkContext.getCheckpointDir() is None
    df = spark.range(100).withColumn("x", F.xxhash64("id"))
    m = materialize(df, eager=True)
    assert m.count() == 100
    # lineage is cut: the materialized plan reads an RDD scan, not range()
    assert "Range" not in m._jdf.queryExecution().executedPlan().toString()
