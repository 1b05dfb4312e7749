"""Custom PySpark worker daemon: preload heavy modules before forking.

Each Python worker normally imports numpy/pandas/pyarrow (plus our kernels)
on first use — ~1s apiece, and at local[32] the 32 simultaneous first-task
imports add ~25s of warm-up to the first Python stage. Importing them in the
daemon BEFORE it forks gives every worker the modules via copy-on-write for
free.

Enabled by session.py via spark.python.daemon.module=dedup.worker_daemon.
"""

import os

os.environ["DEDUP_DAEMON_PRELOADED"] = "1"  # worker-visible marker

# preloads (order: cheap deps first) — shared copy-on-write across all workers
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

try:  # our kernel modules (skip silently if PYTHONPATH lacks the repo)
    import dedup.config  # noqa: F401
    import dedup.shingle  # noqa: F401
    import dedup.sketches  # noqa: F401
except Exception:  # pragma: no cover
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
