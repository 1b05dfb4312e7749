"""Property-based kernel tests (hypothesis): invariants that must hold for
ANY input, not just fixtures — batch independence, merge associativity,
suffix-array correctness."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from dedup.shingle import batch_shingles
from dedup.sketches import (
    MinHashSketch,
    minhash_from_segments,
    perm_seeds,
    simhash_from_segments,
)
from dedup.suffix import kasai_lcp, suffix_array

# text strategy: words over a small alphabet incl. unicode + odd whitespace
_word = st.text(
    alphabet=st.sampled_from("abcXYZ0_ä日"), min_size=1, max_size=8
)
_doc = st.lists(_word, min_size=0, max_size=40).map(" ".join)
_docs = st.lists(_doc, min_size=1, max_size=12)


class TestShingleProperties:
    @settings(max_examples=40, deadline=None)
    @given(_docs)
    def test_batch_independence(self, docs):
        """Shingling docs together == shingling each doc alone: batching and
        document-boundary masking never leak across rows."""
        sh, st_, ct, nd = batch_shingles(pd.Series(docs), 5)
        for i, d in enumerate(docs):
            sh1, st1, ct1, nd1 = batch_shingles(pd.Series([d]), 5)
            seg = sh[st_[i] : st_[i] + ct[i]]
            assert np.array_equal(seg, sh1), f"doc {i!r} differs in batch"
            assert nd[i] == nd1[0]

    @settings(max_examples=40, deadline=None)
    @given(_docs)
    def test_every_doc_has_signature(self, docs):
        sh, st_, ct, nd = batch_shingles(pd.Series(docs), 5)
        assert (ct >= 1).all()
        sig = minhash_from_segments(sh, st_, perm_seeds(16, 42))
        sim = simhash_from_segments(sh, st_, ct)
        assert sig.shape == (len(docs), 16)
        assert len(sim) == len(docs)
        # identical docs get identical signatures
        for i, a in enumerate(docs):
            for j in range(i + 1, len(docs)):
                if docs[j] == a:
                    assert np.array_equal(sig[i], sig[j])
                    assert sim[i] == sim[j]


class TestSketchProperties:
    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.integers(0, 2**60), min_size=1, max_size=60),
           st.integers(2, 5))
    def test_merge_associativity(self, values, n_parts):
        rows = np.array(values, dtype=np.uint64)[:, None].repeat(16, axis=1)
        whole = MinHashSketch(16, 1)
        whole.update(rows)
        parts = np.array_split(rows, n_parts)
        merged = MinHashSketch(16, 1)
        for p in parts[::-1]:  # reverse order on purpose
            blk = MinHashSketch(16, 1)
            blk.update(p if len(p) else None)
            merged.merge(blk)
        assert np.array_equal(whole.mins, merged.mins)
        assert whole.n == merged.n
        # serialize → heapify → merge gives the same result
        rt = MinHashSketch.from_bytes(merged.to_bytes())
        assert np.array_equal(rt.mins, whole.mins)


class TestSuffixArrayProperties:
    @settings(max_examples=30, deadline=None)
    @given(st.binary(min_size=1, max_size=120))
    def test_sa_is_sorted_permutation(self, data):
        s = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
        sa = suffix_array(s)
        assert sorted(sa) == list(range(len(s)))
        suf = [data[i:] for i in sa]
        assert suf == sorted(suf)

    @settings(max_examples=30, deadline=None)
    @given(st.binary(min_size=2, max_size=80))
    def test_lcp_definition(self, data):
        s = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
        sa = suffix_array(s)
        lcp = kasai_lcp(s, sa)
        for i in range(len(sa) - 1):
            a, b = data[sa[i]:], data[sa[i + 1]:]
            k = 0
            while k < min(len(a), len(b)) and a[k] == b[k]:
                k += 1
            assert lcp[i] == k
