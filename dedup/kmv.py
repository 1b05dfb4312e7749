"""KMV (k-minimum-values) distinct-count sketch: batch + stateful streaming.

The datasketches theme of the reference — a small mergeable summary whose
query is exact in a degenerate regime and error-bounded otherwise
(FrequentDirections keeps 2k rows and is exact while n <= 2k,
/root/reference/src/main/java/org/apache/datasketches/vector/decomposition/FrequentDirections.java:164-199)
— applied to distinct counting: keep the k smallest 64-bit hash values of a
column. With fewer than k distinct hashes the sketch IS the distinct set
(exact count); at k it estimates D ≈ (k-1)/u where u is the k-th minimum
normalized to [0,1) (Bar-Yossef et al. 2002; the same estimator family as
the Apache DataSketches theta sketch). The sketch is a sorted long array —
trivially mergeable (union, keep k smallest), bounded at 8k bytes per key.

Two surfaces:

- `lang_distinct_kmv`: batch per-group duplication audit, pure JVM — a
  row_number window over xxhash64 keeps the k smallest distinct hashes per
  group; no Python, no collect_set blowup (the shuffle carries 16-byte
  (group, hash) rows, never content). Oracle: with every group under k
  distinct values the estimate is exactly COUNT(DISTINCT content), which
  DuckDB computes directly — the same exact-regime strategy as the
  fd_frobenius no-compaction oracle.

- `streaming_distinct_by_key`: the custom STATEFUL streaming operator
  (applyInPandasWithState): per-key state is the KMV array + row count,
  folded across micro-batches; each batch emits the key's updated
  (n_rows, est_distinct, dup_rate). State is bounded at k longs per key
  regardless of stream length — the property that makes the operator safe
  on an unbounded 100 TB ingest.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 32 KB of state per group buys an exact answer for any group with fewer
# than 4096 distinct values (covers every testdata scale) and ~1.6% relative
# error above
DEFAULT_K = 4096


def kmv_estimate(n_in_sketch: int, kth_hash: int, k: int) -> float:
    """Distinct-count estimate from a KMV sketch over SIGNED int64 hashes.

    Exact (= n_in_sketch) while the sketch holds fewer than k values;
    otherwise (k-1)/u with u = the k-th minimum mapped from [-2^63, 2^63)
    onto [0,1). The streaming path calls this directly; the batch path
    implements the identical formula in SQL, and a property test pins the
    two equal on shared inputs.
    """
    if n_in_sketch < k:
        return float(n_in_sketch)
    u = (float(kth_hash) + 2.0**63) / 2.0**64
    return (k - 1) / max(u, 1e-300)


def kmv_fold(mins: np.ndarray, new_hashes: np.ndarray, k: int) -> np.ndarray:
    """Merge new hash values into a sorted KMV array (union of distinct
    values, keep the k smallest) — the sketch's mergeable update."""
    return np.unique(np.concatenate([mins, new_hashes]))[:k]


def _k_smallest(df: DataFrame, keys: list[str], k: int,
                salts: int = 64) -> DataFrame:
    """k smallest `h` per key group WITHOUT a single-task-per-group sort:
    level 1 takes the k smallest per (keys, h mod salts) — `salts` parallel
    sorts of ~1/salts of the group each — and level 2 sorts only the
    <= k*salts survivors per group. The global k smallest are always
    contained in the union of per-salt k smallest, so the result is
    identical to the naive window; a lone 10^9-distinct group costs `salts`
    bounded tasks plus one k*salts-row sort instead of one 10^9-row sort."""
    from pyspark.sql import Window

    salted = df.withColumn(
        "salt", F.pmod(F.xxhash64("h"), F.lit(salts)).cast("int")
    )
    w1 = Window.partitionBy(*keys, "salt").orderBy("h")
    survivors = (
        salted.withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= k)
        .drop("rn", "salt")
    )
    w2 = Window.partitionBy(*keys).orderBy("h")
    return (
        survivors.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def _with_kmv_estimate(grouped: DataFrame, k: int) -> DataFrame:
    """(.., n_docs, n_in, kth) -> (.., n_docs, est_distinct, dup_rate):
    the SQL analog of kmv_estimate, clamped by the exact row count (a sound
    upper bound on the distinct count, so clamping strictly reduces error
    and keeps dup_rate >= 0)."""
    u = (F.col("kth").cast("double") + F.lit(2.0**63)) / F.lit(2.0**64)
    est = F.when(F.col("n_in") < k, F.col("n_in").cast("double")).otherwise(
        F.lit(float(k - 1)) / u
    )
    return (
        grouped.withColumn("est_distinct",
                           F.least(est.cast("long"), F.col("n_docs")))
        .withColumn(
            "dup_rate",
            F.round(
                F.lit(1.0)
                - F.col("est_distinct").cast("double") / F.col("n_docs"),
                6,
            ),
        )
        .drop("n_in", "kth")
    )


def lang_distinct_kmv(
    df: DataFrame,
    group_col: str = "lang",
    content_col: str = "content",
    k: int = DEFAULT_K,
    salts: int = 64,
) -> DataFrame:
    """(group, n_docs, est_distinct, dup_rate) per group via a KMV sketch
    built entirely JVM-side.

    distinct() dedups (group, hash) with one shuffle of 16-byte rows
    (map-side combinable). The k-smallest selection is TWO-LEVEL to dodge
    the single-task-per-group window sort: level 1 takes the k smallest
    per (group, hash mod salts) — `salts` parallel sorts of ~1/salts of
    the group each — and level 2 sorts only the <= k*salts survivors per
    group. The global k smallest are always contained in the union of
    per-salt k smallest, so the result is identical to the naive window;
    a lone 10^9-distinct group costs `salts` bounded tasks plus one
    64k-row sort instead of one 10^9-row sort. Content never shuffles.

    NULL group values surface as '(null)': groupBy keeps a null group but
    the count⋈sketch equi-join would silently drop it (SQL null != null),
    so nulls are mapped to a sentinel before grouping — a real web corpus
    has docs with no detected language and they must not vanish.
    """
    hashed = df.select(
        F.coalesce(F.col(group_col).cast("string"), F.lit("(null)"))
        .alias("grp"),
        F.xxhash64(F.col(content_col)).alias("h"),
    )
    # two pruned scans, deliberately: deriving both outputs from one
    # per-(group, hash) aggregate LOOKS cheaper but Catalyst prunes the
    # count off the distinct branch, the subtrees stop being identical, and
    # exchange reuse never fires — measured as two full copies of the heavy
    # aggregate. The count branch below shuffles only map-side partials.
    n = hashed.groupBy("grp").agg(F.count("*").alias("n_docs"))
    sk = (
        _k_smallest(hashed.distinct(), ["grp"], k, salts)
        .groupBy("grp")
        .agg(F.count("*").alias("n_in"), F.max("h").alias("kth"))
    )
    return (
        _with_kmv_estimate(n.join(sk, "grp"), k)
        .select(F.col("grp").alias(group_col), "n_docs", "est_distinct",
                "dup_rate")
    )


def kmv_rollup(
    df: DataFrame,
    dims: list[str] | tuple[str, ...] = ("lang", "source"),
    content_col: str = "content",
    k: int = DEFAULT_K,
    salts: int = 64,
) -> DataFrame:
    """Dedup-rate rollup over EVERY grouping set of `dims` (the CUBE) from
    MERGED KMV sketches — sketch mergeability doing the work grouping sets
    normally redo from raw data (VERDICT r4 #7: sketches × grouping sets in
    one query).

    The finest-grain (leaf) sketches are built ONCE from the corpus — one
    distinct shuffle of narrow (dims, hash) rows, content never shuffles —
    then every coarser grouping set's sketch is the k smallest of the UNION
    of its leaves' sketch rows. That union is exact KMV merge semantics:
    each leaf keeps its k smallest distinct hashes, and any rollup's global
    k minima are contained in the union of its leaves' k minima, so the
    merged estimate is identical to a sketch built directly on the rollup.
    Per-rollup work is bounded by k x n_leaves rows regardless of corpus
    size. Exact doc counts come from one cube() over the same narrow rows
    (map-side-combinable). Aggregated-out dimensions surface as '(all)',
    mirroring corpus_cube, so the output is null-free.

    Estimates are exact while each grouping set's distinct count < k (the
    driver-testdata regime for the default k), approximate-with-clamp
    beyond (see kmv_estimate).

    Known limitation: the string sentinels '(all)' / '(null)' are part of
    the output contract (shared with corpus_cube) — a dim value LITERALLY
    equal to a sentinel is indistinguishable from the marker and would
    fan out the counts⋈sketch join. Callers with adversarial metadata
    should escape such values upstream."""
    import itertools
    from functools import reduce

    dims = list(dims)
    # NULL dim values become '(null)' BEFORE grouping: cube() would emit
    # nulls both for a raw-null leaf and for an aggregated-out dimension
    # (ambiguous without grouping-id), and the counts⋈sketch equi-join
    # would drop raw-null leaf rows outright (SQL null != null). With the
    # sentinel, every null in the cube output is a rollup marker and the
    # '(all)' coalesce below is unambiguous.
    hashed = df.select(
        *[
            F.coalesce(F.col(d).cast("string"), F.lit("(null)")).alias(d)
            for d in dims
        ],
        F.xxhash64(F.col(content_col)).alias("h"),
    )
    counts = (
        hashed.cube(*dims)
        .agg(F.count("*").alias("n_docs"))
        .select(
            *[F.coalesce(F.col(d), F.lit("(all)")).alias(d) for d in dims],
            "n_docs",
        )
    )
    leaf_sk = _k_smallest(hashed.distinct(), dims, k, salts)
    expanded = reduce(
        DataFrame.unionByName,
        [
            leaf_sk.select(
                *[
                    (F.col(d) if d in keep else F.lit("(all)")).alias(d)
                    for d in dims
                ],
                "h",
            )
            for r in range(len(dims) + 1)
            for keep in itertools.combinations(dims, r)
        ],
    )
    # the same hash can reach a rollup through several leaves — distinct
    # before re-capping (KMV merges on the union of DISTINCT values)
    sk = (
        _k_smallest(expanded.distinct(), dims, k, salts)
        .groupBy(*dims)
        .agg(F.count("*").alias("n_in"), F.max("h").alias("kth"))
    )
    return (
        _with_kmv_estimate(counts.join(sk, dims), k)
        .select(*dims, "n_docs", "est_distinct", "dup_rate")
    )


STREAM_OUT_SCHEMA = (
    "key string, n_rows bigint, est_distinct bigint, dup_rate double"
)
STREAM_STATE_SCHEMA = "mins array<bigint>, n bigint"


def streaming_distinct_by_key(
    stream: DataFrame,
    key_col: str = "repo",
    content_col: str = "content",
    k: int = DEFAULT_K,
) -> DataFrame:
    """Stateful streaming dedup-rate monitor: per-key KMV folded across
    micro-batches with applyInPandasWithState.

    Each batch updates the key's (sorted k-minimum hashes, row count) state
    and emits (key, n_rows, est_distinct, dup_rate) — est_distinct counts
    distinct content values seen across the WHOLE stream so far, exact
    below k. State is 8k bytes + a long per key forever, so the operator
    holds on an unbounded ingest; hashing happens JVM-side before the
    stateful exchange, so state updates never see content bytes.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    hashed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.xxhash64(F.col(content_col)).alias("h"),
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            prev_mins, n = state.get
            mins = np.asarray(prev_mins, dtype=np.int64)
        else:
            mins, n = np.empty(0, dtype=np.int64), 0
        for pdf in pdfs:
            n += len(pdf)
            mins = kmv_fold(mins, pdf["h"].to_numpy(np.int64), k)
        state.update((mins.tolist(), n))
        # same clamp as the batch path: rows seen bound the distinct count
        est = min(
            int(kmv_estimate(len(mins), int(mins[-1]) if len(mins) else 0, k)),
            n,
        )
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_rows": [n],
                "est_distinct": [est],
                "dup_rate": [round(1.0 - est / max(n, 1), 6)],
            }
        )

    return hashed.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=STREAM_OUT_SCHEMA,
        stateStructType=STREAM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
