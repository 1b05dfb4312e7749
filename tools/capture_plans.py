"""Capture .explain('formatted') for every benched query into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [query ...]
Writes plans/<tag>/<query>_<suffix>.txt where suffix is the 2nd arg
(default 'before').
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dedup.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r08"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans", master=f"local[{cpus}]")
    from bench import BENCH_QUERIES
    from dedup.queries import QUERIES

    for name in names or BENCH_QUERIES:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({buf.getvalue().count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
