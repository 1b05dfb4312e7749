"""Single-node numpy reference pipeline — the recall/cluster oracle.

The Spark pipeline must reproduce this implementation's dup pairs with recall
>= 0.99 and its canonical cluster IDs exactly (BASELINE.json north_rule). It
shares the frozen kernels in sketches.py/shingle.py, so any disagreement
isolates a bug in the DISTRIBUTED plumbing (shuffles, joins, dedupe), not in
hashing — the cross-implementation-agreement strategy the reference uses
between its three SVD algorithms (MatrixOpsTest.java:35-65).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np
import pandas as pd

from dedup.cluster import numpy_connected_components
from dedup.config import DedupConfig
from dedup.shingle import batch_shingles
from dedup.sketches import (
    band_hashes,
    estimate_jaccard,
    minhash_from_segments,
    perm_seeds,
    simhash_from_segments,
)


def reference_pipeline(corpus: pd.DataFrame, cfg: DedupConfig) -> dict:
    """corpus: (repo, path, commit, lang, content) pandas frame.

    Returns dict with doc_keys, content_sha, signatures, candidate pairs,
    verified pairs (est_jaccard >= threshold), exact pairs, and canonical
    clusters {doc_key: min-member cluster id}.
    """
    keys = [
        hashlib.sha256(f"{r}\x00{p}\x00{c}".encode()).hexdigest()
        for r, p, c in zip(corpus["repo"], corpus["path"], corpus["commit"])
    ]
    shas = [
        hashlib.sha256((t if t is not None else "").encode()).hexdigest()
        for t in corpus["content"]
    ]

    # exact-dup grouping by content sha; one representative proceeds to LSH
    by_sha: dict[str, list[str]] = defaultdict(list)
    for k, s in zip(keys, shas):
        by_sha[s].append(k)
    exact_pairs = set()
    rep_of = {}
    rep_keys, rep_idx = [], []
    key_to_idx = {k: i for i, k in enumerate(keys)}
    for s, ks in by_sha.items():
        ks_sorted = sorted(ks)
        rep = ks_sorted[0]
        for other in ks_sorted[1:]:
            exact_pairs.add((rep, other))
        rep_of[s] = rep
        idx = key_to_idx[rep]
        text = corpus["content"].iloc[idx]
        if len(text if text is not None else "") < cfg.min_content_len:
            continue  # short content skips signatures (mirrors pipeline)
        rep_keys.append(rep)
        rep_idx.append(idx)

    # signatures for representatives
    texts = corpus["content"].iloc[rep_idx].reset_index(drop=True)
    sh, starts, counts, n_distinct = batch_shingles(texts, cfg.shingle_k)
    seeds = perm_seeds(cfg.num_perm, cfg.seed)
    sig = minhash_from_segments(sh, starts, seeds)
    sim = simhash_from_segments(sh, starts, counts)
    bh = band_hashes(sig, cfg.bands, cfg.rows_per_band, cfg.seed)

    # LSH buckets → candidate pairs (same cap discipline as lsh.py)
    buckets: dict[tuple, list[int]] = defaultdict(list)
    for i in range(len(rep_keys)):
        for b in range(cfg.bands):
            buckets[(b, int(bh[i, b]))].append(i)
    cand = set()
    dropped_buckets = 0
    for members in buckets.values():
        if len(members) < 2:
            continue
        if len(members) > cfg.band_bucket_cap:
            dropped_buckets += 1
            continue
        ms = sorted(members, key=lambda i: rep_keys[i])
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                cand.add((ms[x], ms[y]))

    # verification
    verified = {}
    if cand:
        ai = np.array([a for a, _ in cand])
        bi = np.array([b for _, b in cand])
        est = estimate_jaccard(sig[ai], sig[bi])
        for (a, b), e in zip(cand, est):
            if e >= cfg.jaccard_threshold:
                verified[(rep_keys[a], rep_keys[b])] = float(e)

    # clustering over exact + verified edges
    edges = list(exact_pairs) + list(verified.keys())
    labels = numpy_connected_components(edges)
    clusters = {k: labels.get(k, k) for k in keys}
    # non-representative exact dups inherit through their rep edge (already in
    # edges), chains resolve transitively via union-find

    return dict(
        doc_keys=keys,
        content_sha=shas,
        rep_keys=rep_keys,
        signatures=sig,
        simhash=sim,
        band_hashes=bh,
        exact_pairs=exact_pairs,
        candidate_pairs={(rep_keys[a], rep_keys[b]) for a, b in cand},
        verified_pairs=verified,
        clusters=clusters,
        dropped_buckets=dropped_buckets,
    )
