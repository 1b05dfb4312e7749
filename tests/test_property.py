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


class TestLcsHashSearchProperties:
    @settings(max_examples=40, deadline=None)
    @given(st.binary(min_size=0, max_size=70), st.binary(min_size=0, max_size=70))
    def test_lcb_matches_naive(self, a, b):
        """The rolling-hash binary-search LCS equals the O(n^2 m) naive
        answer for arbitrary byte strings (incl. repeats and empties)."""
        from dedup.suffix import longest_common_block

        def naive(x, y):
            best = 0
            for i in range(len(x)):
                for j in range(len(y)):
                    k = 0
                    while i + k < len(x) and j + k < len(y) and x[i + k] == y[j + k]:
                        k += 1
                    best = max(best, k)
            return best

        assert longest_common_block(a, b) == naive(a, b)


class TestKmvProperties:
    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(st.integers(-(2**63), 2**63 - 1), max_size=200),
        st.lists(st.integers(-(2**63), 2**63 - 1), max_size=200),
        st.integers(1, 64),
    )
    def test_fold_merge_laws(self, a, b, k):
        """kmv_fold is order-insensitive and mergeable: fold(a)+fold(b)
        == fold(a+b) == fold(b+a) after the k-min cut, and the exact
        regime reports the true distinct count."""
        from dedup.kmv import kmv_estimate, kmv_fold

        aa = np.array(a, dtype=np.int64)
        bb = np.array(b, dtype=np.int64)
        empty = np.empty(0, np.int64)
        ab = kmv_fold(kmv_fold(empty, aa, k), bb, k)
        ba = kmv_fold(kmv_fold(empty, bb, k), aa, k)
        once = kmv_fold(empty, np.concatenate([aa, bb]), k)
        assert np.array_equal(ab, once) and np.array_equal(ba, once)
        distinct = len(set(a) | set(b))
        if distinct < k:
            kth = int(once[-1]) if len(once) else 0
            assert kmv_estimate(len(once), kth, k) == float(distinct)


class TestFrequentDirectionsProperties:
    """FD invariants for ANY stream (hypothesis): serialization roundtrip,
    counter accounting under merge, the raw<=compensative ordering, and the
    KDD'13 spectral bound."""

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(min_value=1, max_value=5),
        st.integers(min_value=0, max_value=30),
        st.randoms(use_true_random=False),
    )
    def test_roundtrip_and_accounting(self, k, n_rows, rnd):
        from dedup.fd import FrequentDirections

        d = 2 * k + rnd.randint(0, 6)
        rng = np.random.default_rng(rnd.randint(0, 2**31))
        fd = FrequentDirections(k, d)
        rows = rng.normal(size=(n_rows, d)) * rng.uniform(0.1, 50)
        fd.update(rows if n_rows else None)
        assert fd.n == n_rows
        assert 0 <= fd.num_rows <= 2 * k
        assert fd.sv_adjustment >= 0.0

        back = FrequentDirections.from_bytes(fd.to_bytes())
        assert back.n == fd.n and back.num_rows == fd.num_rows
        assert np.allclose(back.B, fd.B)
        assert len(fd.to_bytes()) == fd.compact_size_bytes()

        if n_rows:
            raw = fd.get_singular_values(False)
            comp = fd.get_singular_values(True)
            assert np.all(comp + 1e-9 >= raw)
            # KDD'13: ||A^T A - B^T B||_2 <= ||A||_F^2 / k
            b = fd.get_result(False)
            err = np.linalg.norm(rows.T @ rows - b.T @ b, ord=2)
            bound = np.linalg.norm(rows, "fro") ** 2 / k
            assert err <= bound * (1 + 1e-9) + 1e-9

    @settings(max_examples=20, deadline=None)
    @given(
        st.integers(min_value=2, max_value=4),
        st.integers(min_value=1, max_value=20),
        st.integers(min_value=1, max_value=20),
        st.randoms(use_true_random=False),
    )
    def test_merge_accounting_and_bound(self, k, n_a, n_b, rnd):
        from dedup.fd import FrequentDirections

        d = 2 * k + 2
        rng = np.random.default_rng(rnd.randint(0, 2**31))
        ra = rng.normal(size=(n_a, d))
        rb = rng.normal(size=(n_b, d))
        a = FrequentDirections(k, d)
        b = FrequentDirections(k, d)
        a.update(ra)
        b.update(rb)
        adj_sum = a.sv_adjustment + b.sv_adjustment
        a.merge(b)
        assert a.n == n_a + n_b
        assert a.sv_adjustment >= adj_sum - 1e-12
        # merged sketch still satisfies the bound over the FULL stream
        allr = np.vstack([ra, rb])
        m = a.get_result(False)
        err = np.linalg.norm(allr.T @ allr - m.T @ m, ord=2)
        assert err <= np.linalg.norm(allr, "fro") ** 2 / k * (1 + 1e-9) + 1e-9
