"""Skew defenses: bucket caps with compensative accounting, salted hot-bucket
path (SURVEY §7.4-2, north rule: skew handled explicitly)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dedup.config import DedupConfig
from dedup.lsh import HOT_BUCKET_MIN, candidate_pairs
from dedup.minhash import compute_bands, compute_signatures
from dedup.pipeline import key_docs


def _boilerplate_corpus(spark, n_copies: int):
    """n_copies near-identical docs (1 token mutated each) — they do NOT fold
    in the exact stage but land in the same LSH buckets: a hot band."""
    base = " ".join(f"tok{i}" for i in range(300))
    rows = []
    for i in range(n_copies):
        toks = base.split()
        toks[i % len(toks)] = f"mut{i}"
        rows.append(
            dict(repo="r", path=f"f{i}", commit=str(i), lang="python",
                 content=" ".join(toks))
        )
    return key_docs(spark.createDataFrame(pd.DataFrame(rows)).repartition(4))


class TestBucketCap:
    def test_over_cap_buckets_dropped_and_recorded(self, spark):
        cfg = DedupConfig(band_bucket_cap=8)
        keyed = _boilerplate_corpus(spark, 24)  # buckets of ~24 > cap 8
        sigs = compute_signatures(keyed, cfg)
        pairs, dropped = candidate_pairs(compute_bands(sigs, cfg), cfg)
        d = dropped.collect()
        assert len(d) > 0, "over-cap buckets must be recorded, not silent"
        assert all(r["bucket_size"] > cfg.band_bucket_cap for r in d)

    def test_degenerate_bucket_never_buffered(self, spark):
        """A planted over-cap bucket (10^7-member analog) must be dropped by
        the COUNT pass before any member list is collected: every collect_set
        in the optimized plan sits above the bucket_size join/filter, so task
        memory is bounded by HOT_BUCKET_MIN regardless of input skew
        (VERDICT r1 'what's wrong' #1)."""
        cfg = DedupConfig(band_bucket_cap=100)
        n_degen, n_cold = 5000, 5
        pdf = pd.DataFrame(
            {
                "doc_key": [f"d{i:06d}" for i in range(n_degen)]
                + [f"c{i}" for i in range(n_cold)],
                "band_id": np.int32(0),
                "band_hash": [np.int64(1)] * n_degen + [np.int64(2)] * n_cold,
            }
        )
        bands = spark.createDataFrame(pdf).repartition(8)
        pairs, dropped = candidate_pairs(bands, cfg)

        got = {(r["key_a"], r["key_b"]) for r in pairs.collect()}
        assert got == {
            (f"c{i}", f"c{j}") for i in range(n_cold) for j in range(i + 1, n_cold)
        }, "cold bucket pairs intact, degenerate bucket contributes none"
        d = dropped.collect()
        assert len(d) == 1 and d[0]["bucket_size"] == n_degen

        def walk(node):
            yield node
            ch = node.children()
            for i in range(ch.size()):
                yield from walk(ch.apply(i))

        plan = pairs._jdf.queryExecution().optimizedPlan()
        collect_nodes = [
            n for n in walk(plan) if "collect_set" in n.simpleString(500)
        ]
        assert collect_nodes, "cold path must still use in-place pair explosion"
        for n in collect_nodes:
            assert "bucket_size" in n.toString(), (
                "collect_set runs on unfiltered buckets — OOM hazard at scale"
            )

    def test_hot_bucket_salted_path_finds_pairs(self, spark):
        """Buckets between HOT_BUCKET_MIN and the cap route through the
        salted self-join and still produce every pair exactly once."""
        n = HOT_BUCKET_MIN + 10
        cfg = DedupConfig(band_bucket_cap=n + 50)
        keyed = _boilerplate_corpus(spark, n)
        sigs = compute_signatures(keyed, cfg)
        pairs, dropped = candidate_pairs(compute_bands(sigs, cfg), cfg)
        rows = pairs.collect()
        assert dropped.count() == 0
        # near-identical docs: essentially every pair is a candidate
        seen = {(r["key_a"], r["key_b"]) for r in rows}
        assert len(seen) == len(rows), "pair produced more than once"
        assert len(seen) >= 0.95 * (n * (n - 1) / 2)
        assert all(r["key_a"] < r["key_b"] for r in rows)
