"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``dedup`` package (SURVEY.md §7):
oracle-checked queries cover the SQL-expressible stages (exact dedup,
text quality/language/token ops, shingle counts, exact n-gram Jaccard,
embedding kNN, KMV distinct audit, relational agg/multi-way-join/window
layers) plus the invariant oracles that pin the kernel pipelines from the SQL side
(planted-copy cluster containment, canonical min-member labels,
substring share-64 exact pair parity, union-find components vs a
recursive-CTE reachability recompute over the exact-Jaccard pair set,
exhaustive-probe IVF == brute
force, the FrequentDirections Frobenius and projection-norm
identities, planted-recall checks for the LSH candidate / verify /
SimHash / vector-LSH / perceptual-asset stages, band-table row parity
and per-language sketch-count parity); rows-only queries cover the
remaining kernel stages (MinHash bands, LSH candidates, verified
pairs, clusters, SimHash pairs, fingerprints, LSH/IVF-ANN,
FrequentDirections spectrum/projection, multimodal features and
perceptual near-dups, compensative dedup audit).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full near-duplicate
    clustering of the documents corpus."""
    from dedup.queries import q_near_dup_clusters

    return q_near_dup_clusters(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from dedup.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents for the SQL-expressible subset."""
    from dedup.queries import ORACLES

    return dict(ORACLES)
