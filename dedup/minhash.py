"""Signature stage: content → (sha256, MinHash-128, SimHash-64, n_shingles).

One `mapInPandas` pass computes every per-document signature; sha256 is
computed JVM-side with the built-in `sha2` BEFORE the UDF so the Python worker
never hashes bytes row-at-a-time. The UDF body is entirely batch-vectorized
numpy (BASELINE.json input_hint: no per-row Python).

This is the pipeline analog of the reference's point-update path
(FrequentDirections.java:187-205): a whole Arrow batch is "streamed" through
the kernel at once — the amortized-compaction idea (§2.3-4: operate per
capacity-trigger, never per row).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from dedup.config import DedupConfig
from dedup.shingle import batch_shingles
from dedup.sketches import (
    band_hashes,
    minhash_from_segments,
    perm_seeds,
    simhash_from_segments,
)

SIGNATURE_FIELDS = [
    StructField("doc_key", StringType(), False),
    StructField("content_sha", StringType(), False),
    StructField("minhash", ArrayType(LongType(), False), False),
    StructField("simhash", LongType(), False),
    StructField("n_shingles", IntegerType(), False),
]
SIGNATURE_SCHEMA = StructType(SIGNATURE_FIELDS)


def with_doc_key(df: DataFrame, key_cols: list[str], content_col: str = "content") -> DataFrame:
    """doc_key = sha2 over NUL-joined identity columns (FIXTURES.md F1),
    content_sha = sha2(content) — both JVM-side, whole-stage-codegen'd.
    content_sha is the per-row invariant vs the reference corpus
    (BASELINE.json input_hint)."""
    key = F.sha2(F.concat_ws("\x00", *[F.col(c) for c in key_cols]), 256)
    return df.withColumn("doc_key", key).withColumn(
        "content_sha", F.sha2(F.coalesce(F.col(content_col), F.lit("")), 256)
    )


def compute_signatures(
    df: DataFrame,
    cfg: DedupConfig,
    key_col: str = "doc_key",
    content_col: str = "content",
    sha_col: str = "content_sha",
    repartition: int | str | None = "auto",
) -> DataFrame:
    """(key, sha, content) → SIGNATURE_SCHEMA rows via one mapInPandas pass.

    Column pruning: only the three needed columns reach the Python worker —
    select first so the Arrow transfer never ships anything else (SURVEY §4:
    only `content` reaches the shingler).

    repartition="auto" hash-partitions by doc_key to 2x the cluster's default
    parallelism before the Python stage. Without it, a scan of small files (or
    an AQE-coalesced shuffle) can feed the CPU-bound kernel with fewer
    partitions than cores and serialize the whole stage; partitioning by
    doc_key also makes checkpoint block contents deterministic for a fixed
    partition count. Pass None to keep the upstream partitioning (e.g. when
    the scan already yields well-sized splits at cluster scale).
    """
    cfg_k, cfg_perm, cfg_seed = cfg.shingle_k, cfg.num_perm, cfg.seed
    src = df.select(
        F.col(key_col).alias("doc_key"),
        F.col(sha_col).alias("content_sha"),
        F.col(content_col).alias("content"),
    )
    if repartition == "auto":
        repartition = df.sparkSession.sparkContext.defaultParallelism * 2
    if repartition:
        src = src.repartition(int(repartition), "doc_key")

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seeds = perm_seeds(cfg_perm, cfg_seed)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            sh, starts, counts, n_distinct = batch_shingles(pdf["content"], cfg_k)
            sig = minhash_from_segments(sh, starts, seeds)
            sim = simhash_from_segments(sh, starts, counts)
            yield pd.DataFrame(
                {
                    "doc_key": pdf["doc_key"].to_numpy(),
                    "content_sha": pdf["content_sha"].to_numpy(),
                    "minhash": list(sig.astype(np.int64)),
                    "simhash": sim.astype(np.int64),
                    "n_shingles": n_distinct.astype(np.int32),
                }
            )

    return src.mapInPandas(compute, SIGNATURE_SCHEMA)


BANDS_SCHEMA = StructType(
    [
        StructField("doc_key", StringType(), False),
        StructField("band_id", IntegerType(), False),
        StructField("band_hash", LongType(), False),
    ]
)


def compute_bands(sig_df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Signatures → exploded (doc_key, band_id, band_hash) rows.

    The band hash folds rows_per_band signature components per band
    (sketches.band_hashes) — the analog of the reference's shape-aware
    algorithm choice (§4-2): compare 16 hashes, not 128 components.
    """
    bands, rows, seed = cfg.bands, cfg.rows_per_band, cfg.seed

    def to_bands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            sig = np.vstack(pdf["minhash"].to_numpy()).astype(np.uint64)
            bh = band_hashes(sig, bands, rows, seed).astype(np.int64)  # (n, bands)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "doc_key": np.repeat(pdf["doc_key"].to_numpy(), bands),
                    "band_id": np.tile(np.arange(bands, dtype=np.int32), n),
                    "band_hash": bh.reshape(-1),
                }
            )

    return sig_df.select("doc_key", "minhash").mapInPandas(to_bands, BANDS_SCHEMA)
