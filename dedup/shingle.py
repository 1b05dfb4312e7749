"""Normalization + token k-gram shingling, batch-vectorized.

One function matters: `batch_shingles` takes a whole batch of texts (a pandas
Series arriving through Arrow) and returns the flat shingle-hash stream plus
per-document segment offsets — the layout every downstream kernel
(minhash_from_segments, simhash_from_segments) consumes directly. There is no
per-row Python hashing: token hashing is one vectorized SipHash call over the
concatenated token stream, window combination is uint64 slice arithmetic
(BASELINE.json input_hint: vectorized pandas/Arrow UDFs, no per-row Python).

Documents with fewer than k tokens (including empty content) fall back to a
single whole-text shingle so every document gets a signature — the analog of
the reference's null-update no-op tolerance (FrequentDirections.java:188-190):
degenerate input never crashes the stream.
"""

from __future__ import annotations

from itertools import chain

import numpy as np
import pandas as pd

from dedup.sketches import combine_windows, hash_strings, splitmix64

_FALLBACK_SALT = np.uint64(0xA0761D6478BD642F)


def normalize(texts: pd.Series) -> pd.Series:
    """Canonical text normalization applied before shingling.

    Kept deliberately minimal and FROZEN: lowercasing + whitespace collapse.
    Any change alters every signature (SURVEY §7.4-3: tokenization must match
    the reference numpy impl bit-exactly — this module IS that single source).
    """
    return texts.fillna("").str.lower()


def batch_shingles(texts: pd.Series, k: int):
    """Shingle a batch of documents.

    Returns (shingles, starts, counts, n_distinct):
      shingles   flat uint64 array, all docs' shingle hashes concatenated
      starts     int64 (n_docs,) segment start offsets into `shingles`
      counts     int64 (n_docs,) segment lengths (>= 1 for every doc)
      n_distinct int64 (n_docs,) number of DISTINCT shingles per doc
    """
    norm = normalize(texts)
    token_lists = norm.str.split()
    n_docs = len(norm)
    tok_counts = np.fromiter((len(t) for t in token_lists), dtype=np.int64, count=n_docs)
    total = int(tok_counts.sum())
    all_tokens = np.fromiter(chain.from_iterable(token_lists), dtype=object, count=total)
    tok_hashes = hash_strings(all_tokens)

    # window combine over the concatenated stream, then mask windows that
    # cross document boundaries
    win = combine_windows(tok_hashes, k)  # len total-k+1 (or 0)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), tok_counts)
    if len(win) > 0:
        valid = doc_of[: len(win)] == doc_of[k - 1 :]
    else:
        valid = np.empty(0, dtype=bool)

    seg_counts = np.maximum(tok_counts - (k - 1), 0)
    fallback = seg_counts == 0
    out_counts = np.where(fallback, 1, seg_counts)
    out_starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(out_counts[:-1], out=out_starts[1:])

    shingles = np.empty(int(out_counts.sum()), dtype=np.uint64)
    # normal docs: copy their valid windows (already in doc order)
    normal_positions = np.repeat(out_starts[~fallback], out_counts[~fallback]) + _ramp(
        out_counts[~fallback]
    )
    shingles[normal_positions] = win[valid]
    # fallback docs: single whole-text shingle
    if fallback.any():
        fb_hash = splitmix64(
            hash_strings(norm.to_numpy(dtype=object)[fallback]) ^ _FALLBACK_SALT
        )
        shingles[out_starts[fallback]] = fb_hash

    n_distinct = _distinct_per_segment(shingles, out_starts, out_counts)
    return shingles, out_starts, out_counts, n_distinct


def _ramp(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] for segment-local indices, vectorized."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    idx = np.arange(total, dtype=np.int64)
    seg_start = np.repeat(np.cumsum(counts) - counts, counts)
    return idx - seg_start


def _distinct_per_segment(values: np.ndarray, starts: np.ndarray,
                          counts: np.ndarray) -> np.ndarray:
    """Distinct count per contiguous segment of a flat array."""
    n_docs = len(starts)
    if len(values) == 0:
        return np.zeros(n_docs, dtype=np.int64)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    order = np.lexsort((values, doc_of))
    dv, vv = doc_of[order], values[order]
    new = np.ones(len(vv), dtype=bool)
    new[1:] = (dv[1:] != dv[:-1]) | (vv[1:] != vv[:-1])
    return np.bincount(dv[new], minlength=n_docs).astype(np.int64)
