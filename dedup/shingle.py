"""Normalization + token k-gram shingling, batch-vectorized at the BYTE level.

One function matters: `batch_shingles` takes a whole batch of texts (a pandas
Series arriving through Arrow) and returns the flat shingle-hash stream plus
per-document segment offsets — the layout every downstream kernel
(minhash_from_segments, simhash_from_segments) consumes directly.

The tokenizer never materializes Python string objects: the batch's utf-8
bytes are taken straight from the Arrow buffer (one C pass), lowercased and
whitespace-split with byte masks, and every token is hashed with a
position-normalized prefix polynomial — token_hash depends only on the token's
bytes, computed for ALL tokens of the batch with a handful of cumulative
uint64 ops. Wrapping mod-2^64 arithmetic with an ODD multiplier P makes P
invertible, so (prefix[e] - prefix[s]) * P^-s recovers a position-independent
hash per token (same trick as modular rolling hashes, in the 2^64 ring).
Contiguous streaming replaces pointer-chasing over 10^6 string objects — this
is what lets 32 cores actually scale (BASELINE.md scaling protocol).

Tokenization contract (FROZEN — SURVEY §7.4-3, kernels must stay bit-stable):
ASCII lowercase; separators are ASCII whitespace [ \\t\\n\\x0b\\f\\r] — the
same class as the SQL oracles' `\\s+` (Java regex and RE2 both default to
ASCII \\s), so the kernel and the DuckDB parity queries agree.

Documents with fewer than k tokens (including empty content) fall back to a
single whole-content shingle so every document gets a signature — degenerate
input never crashes the stream (the reference's null-update no-op,
FrequentDirections.java:188-190).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from dedup.sketches import combine_windows, splitmix64

U64 = np.uint64
_P = U64(0x9E3779B97F4A7C16 | 1)  # odd → invertible mod 2^64
_PINV = U64(pow(int(_P), -1, 1 << 64))
_LEN_SALT = U64(0xC2B2AE3D27D4EB4F)
_FALLBACK_SALT = U64(0xA0761D6478BD642F)
_CHUNK_CHARS = 4 << 20  # sub-chunk bound on transient uint64 arrays (~32MB each)


def normalize(texts: pd.Series) -> pd.Series:
    """Pandas-level view of the kernel normalization (tests/utilities only;
    the kernel itself works on bytes)."""
    return texts.fillna("").str.lower()


def _utf8_blob(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(bytes, per-doc char offsets incl. end) via the Arrow buffer — one C
    pass, no Python bytes objects."""
    arr = pa.array(texts.fillna(""), type=pa.large_string())
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                            count=len(arr) + 1).copy()
    data_buf = arr.buffers()[2]
    blob = (
        np.frombuffer(data_buf, dtype=np.uint8, count=int(offsets[-1])).copy()
        if data_buf is not None and offsets[-1] > 0
        else np.empty(0, dtype=np.uint8)
    )
    return blob, offsets


_MAX_POW = 4096  # precomputed powers of P (token length cap for the fast path)
_PW_TABLE = np.empty(_MAX_POW, dtype=np.uint64)
_PW_TABLE[0] = U64(1)
np.multiply.accumulate(np.full(_MAX_POW, _P, dtype=np.uint64)[: _MAX_POW - 1],
                       out=_PW_TABLE[1:])


def _token_hashes(blob: np.ndarray, doc_offsets: np.ndarray):
    """Vectorized tokenizer+hasher for one byte chunk.

    Returns (tok_hashes uint64, tok_doc int64) — one position-independent
    polynomial hash per token plus its document index. Tokens are hashed in
    LENGTH GROUPS: for each distinct token length L, one fancy-gather builds
    an (n_L, L) byte matrix and one multiply-sum against the precomputed
    power table hashes the whole group — every char is touched once, there
    are no sequential accumulates, so the kernel stays cache-friendly and
    scales across cores.
    """
    n = len(blob)
    n_docs = len(doc_offsets) - 1
    empty = (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64))
    if n == 0:
        return empty
    b = blob.copy()
    upper = (b >= 65) & (b <= 90)
    b[upper] += 32  # ASCII lowercase
    ws = (b == 32) | ((b >= 9) & (b <= 13))

    prev_ws = np.empty(n, dtype=bool)
    prev_ws[0] = True
    prev_ws[1:] = ws[:-1]
    next_ws = np.empty(n, dtype=bool)
    next_ws[-1] = True
    next_ws[:-1] = ws[1:]
    bounds = doc_offsets[:-1][(doc_offsets[:-1] < n)]
    new_doc = np.zeros(n, dtype=bool)
    new_doc[bounds] = True
    last_char = np.zeros(n, dtype=bool)
    ends_of_docs = doc_offsets[1:] - 1
    last_char[ends_of_docs[ends_of_docs >= 0]] = True

    is_start = ~ws & (prev_ws | new_doc)
    is_end = ~ws & (next_ws | last_char)
    starts = np.flatnonzero(is_start)
    ends = np.flatnonzero(is_end)
    if len(starts) == 0:
        return empty
    # token crossing a doc boundary is impossible (first char of a doc is a
    # start, last char an end), so starts/ends pair 1:1 — but a char can be
    # both (1-char token) and a doc's last char can start a token; re-pair by
    # position: for each start, its end is the first end >= start
    idx = np.searchsorted(ends, starts, side="left")
    ends = ends[idx]
    lengths = ends - starts + 1

    bu = b  # uint8; cast happens after the gather (cheaper)
    tok_hashes = np.empty(len(starts), dtype=np.uint64)
    for L in np.unique(lengths):
        sel = lengths == L
        s = starts[sel]
        if L <= _MAX_POW:
            mat = bu[s[:, None] + np.arange(L, dtype=np.int64)[None, :]].astype(
                np.uint64
            )
            h = (mat * _PW_TABLE[None, :L]).sum(axis=1, dtype=np.uint64)
        else:  # pathological mega-token: loop in 4096-char strides
            h = np.zeros(len(s), dtype=np.uint64)
            mult = U64(1)
            with np.errstate(over="ignore"):
                for off in range(0, int(L), _MAX_POW):
                    w = min(_MAX_POW, int(L) - off)
                    mat = bu[(s + off)[:, None]
                             + np.arange(w, dtype=np.int64)[None, :]].astype(np.uint64)
                    h += mult * (mat * _PW_TABLE[None, :w]).sum(
                        axis=1, dtype=np.uint64
                    )
                    mult = U64(mult * _PW_TABLE[w - 1] * _P)
        with np.errstate(over="ignore"):
            tok_hashes[sel] = h ^ (U64(L) * _LEN_SALT)
    tok_hashes = splitmix64(tok_hashes)

    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(doc_offsets))
    tok_doc = doc_of[starts]
    return tok_hashes, tok_doc


def batch_shingles(texts: pd.Series, k: int):
    """Shingle a batch of documents.

    Returns (shingles, starts, counts, n_distinct):
      shingles   flat uint64 array, all docs' shingle hashes concatenated
      starts     int64 (n_docs,) segment start offsets into `shingles`
      counts     int64 (n_docs,) segment lengths (>= 1 for every doc)
      n_distinct int64 (n_docs,) number of DISTINCT shingles per doc
    """
    n_docs = len(texts)
    blob, offsets = _utf8_blob(texts)

    # sub-chunk by bytes to bound transient array memory
    tok_parts, doc_parts = [], []
    lo_doc = 0
    while lo_doc < n_docs:
        hi_doc = lo_doc + 1
        while (hi_doc < n_docs
               and offsets[hi_doc + 1] - offsets[lo_doc] <= _CHUNK_CHARS):
            hi_doc += 1
        chunk = blob[offsets[lo_doc] : offsets[hi_doc]]
        th, td = _token_hashes(chunk, offsets[lo_doc : hi_doc + 1] - offsets[lo_doc])
        tok_parts.append(th)
        doc_parts.append(td + lo_doc)
        lo_doc = hi_doc
    tok_hashes = (np.concatenate(tok_parts) if tok_parts
                  else np.empty(0, dtype=np.uint64))
    tok_doc = (np.concatenate(doc_parts) if doc_parts
               else np.empty(0, dtype=np.int64))
    tok_counts = np.bincount(tok_doc, minlength=n_docs).astype(np.int64)

    # window combine over the concatenated token-hash stream, masking windows
    # that cross document boundaries
    win = combine_windows(tok_hashes, k)
    if len(win) > 0:
        valid = tok_doc[: len(win)] == tok_doc[k - 1 :]
    else:
        valid = np.empty(0, dtype=bool)

    seg_counts = np.maximum(tok_counts - (k - 1), 0)
    fallback = seg_counts == 0
    out_counts = np.where(fallback, 1, seg_counts)
    out_starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(out_counts[:-1], out=out_starts[1:])

    shingles = np.empty(int(out_counts.sum()), dtype=np.uint64)
    normal_positions = (
        np.repeat(out_starts[~fallback], out_counts[~fallback])
        + _ramp(out_counts[~fallback])
    )
    shingles[normal_positions] = win[valid]
    if fallback.any():
        # whole-content fallback: polynomial over the doc's full (raw) bytes
        fb = np.flatnonzero(fallback)
        fb_hash = np.empty(len(fb), dtype=np.uint64)
        with np.errstate(over="ignore"):  # scalar uint64 wrap is intended
            for i, d in enumerate(fb):  # rare path: empty/short docs only
                seg = blob[offsets[d] : offsets[d + 1]].astype(np.uint64)
                acc = U64(0)
                if len(seg):
                    pw = np.empty(len(seg), dtype=np.uint64)
                    pw[0] = U64(1)
                    if len(seg) > 1:
                        np.multiply.accumulate(
                            np.full(len(seg), _P, dtype=np.uint64)[: len(seg) - 1],
                            out=pw[1:],
                        )
                    acc = U64((seg * pw).sum(dtype=np.uint64))
                fb_hash[i] = acc ^ (U64(len(seg)) * _LEN_SALT)
        shingles[out_starts[fallback]] = splitmix64(fb_hash ^ _FALLBACK_SALT)

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
