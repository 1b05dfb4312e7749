"""Mergeable sketch aggregation: partial+final contract in Spark
(the reference's update/merge semantics, FrequentDirectionsTest.java:139-179)."""

import numpy as np
import pandas as pd
import pytest

from dedup.config import DedupConfig
from dedup.fixtures import make_corpus
from dedup.minhash import compute_signatures, minhash_sketch_by_group
from dedup.pipeline import key_docs
from dedup.sketches import MinHashSketch

CFG = DedupConfig()


class TestSketchAggregation:
    @pytest.fixture(scope="class")
    def sigs_with_lang(self, spark):
        pdf, _ = make_corpus(n_base=40, seed=11)
        keyed = key_docs(spark.createDataFrame(pdf).repartition(5))
        sigs = compute_signatures(keyed, CFG)
        return sigs.join(keyed.select("doc_key", "lang"), "doc_key")

    def test_matches_single_node_sketch(self, spark, sigs_with_lang):
        """Distributed partial+final merge == one sketch built from all rows
        (merge associativity, order-insensitive)."""
        got = {
            r["group_key"]: (r["n_docs"], r["est_distinct_shingles"])
            for r in minhash_sketch_by_group(sigs_with_lang, "lang", CFG).collect()
        }
        rows = sigs_with_lang.select("lang", "minhash").collect()
        by_lang: dict = {}
        for r in rows:
            by_lang.setdefault(r["lang"], []).append(
                np.array(r["minhash"], dtype=np.int64).view(np.uint64)
            )
        for lang, sig_rows in by_lang.items():
            sk = MinHashSketch(CFG.num_perm, CFG.seed)
            sk.update(np.vstack(sig_rows))
            u = sk.mins.astype(np.float64) / float(2**64)
            est = int((CFG.num_perm - 1) / max(u.sum(), 1e-300))
            assert got[lang] == (sk.n, est), lang

    def test_partitioning_invariance(self, spark, sigs_with_lang):
        """Same result at different partition counts (merge order varies)."""
        a = sorted(
            map(tuple, minhash_sketch_by_group(
                sigs_with_lang.repartition(2), "lang", CFG).collect())
        )
        b = sorted(
            map(tuple, minhash_sketch_by_group(
                sigs_with_lang.repartition(13), "lang", CFG).collect())
        )
        assert a == b

    def test_estimate_sanity(self, spark):
        """KMV estimate tracks a KNOWN distinct count: n docs sharing one
        common shingle universe of size U → estimate within ~4σ of U
        (k=128 → σ/U ≈ 1/sqrt(126) ≈ 9%)."""
        from dedup.sketches import minhash_from_segments, perm_seeds, splitmix64

        U = 20000
        rng = np.random.default_rng(5)
        universe = splitmix64(np.arange(U, dtype=np.uint64))
        # 10 "docs", each a random subset — union = universe exactly
        sk = MinHashSketch(CFG.num_perm, CFG.seed)
        seeds = perm_seeds(CFG.num_perm, CFG.seed)
        starts = np.arange(0, U, U // 10, dtype=np.int64)
        sig = minhash_from_segments(universe, starts, seeds)
        sk.update(sig)
        u = sk.mins.astype(np.float64) / float(2**64)
        est = (CFG.num_perm - 1) / u.sum()
        assert abs(est - U) / U < 0.36, est
