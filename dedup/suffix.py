"""Exact long-substring duplicate pass: content-sampled fingerprints for
candidate generation + per-pair suffix-array verification.

Near-dup MinHash misses documents that share one long verbatim block inside
otherwise-different content (FIXTURES.md: substring dups). This pass finds
pairs sharing a verbatim block of >= cfg.substring_min_len chars:

1. **Fingerprints** (mapInPandas, vectorized): rolling 64-char hashes over the
   utf-8 stream of each doc (batch-concatenated, boundary-masked — same layout
   as shingle.batch_shingles), content-only sampled by ``hash % p == 0`` with
   p sized so a shared block of min_len chars escapes selection with
   probability e^-8 ≈ 3e-4 (the bound is recorded in the module constants;
   compensative accounting in the spirit of SURVEY §2.3-5 — the recall loss is
   quantified, not silent). Selection depends only on content, so both copies
   of a shared block select identical fingerprints regardless of position.
2. **Candidates**: equi-join docs on fingerprint hash (bucket-capped like
   lsh.py) — the shuffle co-locates docs sharing content.
3. **Verification** (applyInPandas per pair): exact longest-common-substring
   via a Manber–Myers doubling suffix array (numpy lexsort rounds) + Kasai
   LCP over the concatenated pair — no false positives survive.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from dedup.config import DedupConfig
from dedup.sketches import combine_windows

GRAM = 64          # rolling-hash gram size (chars)
SAMPLE_DIVISOR = 8  # p = (min_len - GRAM + 1) // SAMPLE_DIVISOR → P(miss) ≈ e^-8


def _sample_p(min_len: int) -> int:
    return max((min_len - GRAM + 1) // SAMPLE_DIVISOR, 1)


FP_SCHEMA = StructType(
    [
        StructField("doc_key", StringType(), False),
        StructField("fp_hash", LongType(), False),
    ]
)


def fingerprints(df: DataFrame, cfg: DedupConfig,
                 key_col: str = "doc_key", content_col: str = "content") -> DataFrame:
    """(doc_key, fp_hash) — sampled rolling-hash fingerprints, distinct."""
    p = _sample_p(cfg.substring_min_len)

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            raw = [t.encode("utf-8") for t in pdf[content_col].fillna("")]
            lens = np.array([len(b) for b in raw], dtype=np.int64)
            blob = np.frombuffer(b"".join(raw), dtype=np.uint8).astype(np.uint64)
            win = combine_windows(blob, GRAM)
            if len(win) == 0:
                continue
            doc_of = np.repeat(np.arange(len(pdf), dtype=np.int64), lens)
            valid = doc_of[: len(win)] == doc_of[GRAM - 1 :]
            sel = valid & (win % np.uint64(p) == 0)
            if not sel.any():
                continue
            d = pd.DataFrame(
                {
                    "doc_key": pdf[key_col].to_numpy()[doc_of[: len(win)][sel]],
                    "fp_hash": win[sel].view(np.int64),
                }
            ).drop_duplicates()
            yield d

    return df.select(key_col, content_col).mapInPandas(fp, FP_SCHEMA)


def substring_candidates(fp_df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Distinct (key_a, key_b) sharing >= 1 sampled fingerprint; buckets
    larger than band_bucket_cap are dropped (same compensative discipline
    as lsh.candidate_pairs)."""
    sizes = fp_df.groupBy("fp_hash").agg(F.count("*").alias("sz"))
    eligible = sizes.where((F.col("sz") >= 2) & (F.col("sz") <= cfg.band_bucket_cap))
    b = fp_df.join(eligible.select("fp_hash"), "fp_hash")
    a2, b2 = b.alias("a"), b.alias("b")
    return (
        a2.join(
            b2,
            on=[
                F.col("a.fp_hash") == F.col("b.fp_hash"),
                F.col("a.doc_key") < F.col("b.doc_key"),
            ],
        )
        .select(F.col("a.doc_key").alias("key_a"), F.col("b.doc_key").alias("key_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# exact verification: suffix array + Kasai LCP
# ---------------------------------------------------------------------------

def suffix_array(s: np.ndarray) -> np.ndarray:
    """Manber–Myers doubling SA over an int array; O(n log n) lexsort rounds,
    fully vectorized."""
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.asarray(s, dtype=np.int64)
    k = 1
    order = np.argsort(rank, kind="stable")
    while True:
        key2 = np.zeros(n, dtype=np.int64)
        if k < n:
            key2[: n - k] = rank[k:] + 1
        order = np.lexsort((key2, rank))
        r1, r2 = rank[order], key2[order]
        new = np.empty(n, dtype=np.int64)
        new[0] = 0
        new[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        nr = np.cumsum(new)
        rank = np.empty(n, dtype=np.int64)
        rank[order] = nr
        if nr[-1] == n - 1 or k >= n:
            return order
        k *= 2


def kasai_lcp(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """LCP[i] = longest common prefix of suffixes sa[i], sa[i+1]."""
    n = len(s)
    if n < 2:
        return np.zeros(max(n - 1, 0), dtype=np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n - 1, dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r == n - 1:
            h = 0
            continue
        j = sa[r + 1]
        m = n - max(i, j)
        while h < m and s[i + h] == s[j + h]:
            h += 1
        lcp[r] = h
        if h > 0:
            h -= 1
    return lcp


def longest_common_block(a: bytes, b: bytes) -> int:
    """Exact longest common substring length between two byte strings."""
    if not a or not b:
        return 0
    sa_arr = np.frombuffer(a, dtype=np.uint8).astype(np.int64)
    sb_arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
    s = np.concatenate([sa_arr, np.array([256], dtype=np.int64), sb_arr])
    sa = suffix_array(s)
    lcp = kasai_lcp(s, sa)
    side = sa < len(sa_arr)  # True = suffix from a (sentinel counts as b side)
    diff = side[:-1] != side[1:]
    if not diff.any():
        return 0
    return int(lcp[diff].max())


VERIFIED_SCHEMA = StructType(
    [
        StructField("key_a", StringType(), False),
        StructField("key_b", StringType(), False),
        StructField("lcs_len", IntegerType(), False),
    ]
)


def substring_pairs(
    df: DataFrame, cfg: DedupConfig,
    key_col: str = "doc_key", content_col: str = "content",
) -> DataFrame:
    """Full pass: (key_a, key_b, lcs_len) with lcs_len >= substring_min_len."""
    fps = fingerprints(df, cfg, key_col, content_col)
    cand = substring_candidates(fps, cfg)
    docs = df.select(
        F.col(key_col).alias("doc_key"), F.col(content_col).alias("content")
    )
    joined = (
        cand.join(docs.withColumnRenamed("doc_key", "key_a")
                  .withColumnRenamed("content", "content_a"), "key_a")
        .join(docs.withColumnRenamed("doc_key", "key_b")
              .withColumnRenamed("content", "content_b"), "key_b")
    )
    min_len = cfg.substring_min_len

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for ka, kb, ca, cb in zip(
                pdf["key_a"], pdf["key_b"], pdf["content_a"], pdf["content_b"]
            ):
                l = longest_common_block(
                    (ca or "").encode("utf-8"), (cb or "").encode("utf-8")
                )
                if l >= min_len:
                    rows.append((ka, kb, l))
            if rows:
                yield pd.DataFrame(rows, columns=["key_a", "key_b", "lcs_len"]).astype(
                    {"lcs_len": np.int32}
                )

    return joined.mapInPandas(verify, VERIFIED_SCHEMA)
