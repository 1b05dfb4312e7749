"""Candidate-pair verification: estimated Jaccard from MinHash signatures.

Entirely built-in expressions — `zip_with` compares the two 128-long signature
arrays component-wise and `aggregate` sums the matches, all inside whole-stage
codegen; no Python in this stage at all. At 100 TB the signatures table is the
big side; the candidate-pair table joins it twice on doc_key (sort-merge,
AQE-skew-split). Small runs broadcast automatically via AQE size estimation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dedup.config import DedupConfig


def verified_pairs(
    pairs: DataFrame, sig_df: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """(key_a, key_b, n_bands_hit) + signatures →
    (key_a, key_b, est_jaccard, hamming, n_bands_hit) filtered at threshold.

    est_jaccard = fraction of equal MinHash components — the unbiased MinHash
    estimator; hamming = SimHash distance, kept as an auxiliary signal.
    """
    num_perm = cfg.num_perm
    sa = sig_df.select(
        F.col("doc_key").alias("key_a"),
        F.col("minhash").alias("mh_a"),
        F.col("simhash").alias("sh_a"),
    )
    sb = sig_df.select(
        F.col("doc_key").alias("key_b"),
        F.col("minhash").alias("mh_b"),
        F.col("simhash").alias("sh_b"),
    )
    matches = F.aggregate(
        F.zip_with("mh_a", "mh_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        pairs.join(sa, "key_a")
        .join(sb, "key_b")
        .withColumn("est_jaccard", matches / F.lit(float(num_perm)))
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .where(F.col("est_jaccard") >= F.lit(cfg.jaccard_threshold))
        .select("key_a", "key_b", "est_jaccard", "hamming", "n_bands_hit")
    )
