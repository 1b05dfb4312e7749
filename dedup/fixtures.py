"""Deterministic synthetic corpus with planted duplicate structure.

The analog of the reference's `generateIncreasingEye` fixture
(MatrixOpsTest.java:119-125): inputs whose ground truth is known BY
CONSTRUCTION, generated from a seed with no wall-clock and no external data
(FIXTURES.md F1). Produces the north-rule input table
(repo, path, commit, lang, content) plus truth_pairs.

Planted structure:
  - exact dups (~8%): verbatim copies across repos
  - near dups (~15%): r% of lines mutated, r ∈ {1,3,5,10,20}
  - long-substring dups (~5%): shared >=512-char verbatim block inside
    otherwise-different content (only the suffix-array pass finds these)
  - cluster chains A≈B≈C with sim(A,C) below threshold (transitivity)
  - degenerates: empty files, single-line files, a license header duplicated
    many times (hot-band skew), non-ASCII content
  - one giant repo holding ~30% of rows (repartition-skew test)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_KEYWORDS = (
    "def class return import if else for while try except lambda yield "
    "public static void int double string final new struct fn let mut impl "
    "func var package interface map chan go defer select case switch break"
).split()

_LICENSE = (
    "licensed under the apache license version 2 0 the license you may not "
    "use this file except in compliance with the license you may obtain a "
    "copy of the license at http www apache org licenses license 2 0"
)


def _doc_key(repo: str, path: str, commit: str) -> str:
    return hashlib.sha256(f"{repo}\x00{path}\x00{commit}".encode()).hexdigest()


class CorpusBuilder:
    def __init__(self, seed: int = 42):
        self.rng = np.random.default_rng(seed)
        self.seed = seed
        self.vocab = _KEYWORDS + [f"ident_{i}" for i in range(400)] + [
            f"val_{i}" for i in range(100)
        ]
        self.rows: list[dict] = []
        self.truth: list[dict] = []
        self._i = 0

    def _line(self) -> str:
        n = int(self.rng.integers(4, 11))
        return " ".join(self.rng.choice(self.vocab, size=n))

    def _content(self, n_lines: int) -> str:
        return "\n".join(self._line() for _ in range(n_lines))

    def _add(self, content: str, repo: str | None = None, lang: str | None = None) -> str:
        i = self._i
        self._i += 1
        if repo is None:
            # ~30% of rows land in one giant repo (skew)
            repo = "org0/giant" if self.rng.random() < 0.3 else f"org{i % 7}/repo{i % 23}"
        lang = lang or str(self.rng.choice(["python", "java", "c", "go", "js"]))
        commit = hashlib.sha256(f"commit-{self.seed}-{i}".encode()).hexdigest()[:40]
        path = f"src/{lang}/mod{i % 13}/file{i}.{lang[:2]}"
        self.rows.append(
            dict(repo=repo, path=path, commit=commit, lang=lang, content=content)
        )
        return _doc_key(repo, path, commit)

    def _pair(self, a: str, b: str, kind: str, jaccard: float) -> None:
        lo, hi = (a, b) if a < b else (b, a)
        self.truth.append(dict(key_a=lo, key_b=hi, kind=kind, jaccard_exact=jaccard))

    def _mutate(self, content: str, frac: float) -> str:
        lines = content.split("\n")
        n_mut = max(1, int(len(lines) * frac))
        idx = self.rng.choice(len(lines), size=min(n_mut, len(lines)), replace=False)
        for j in idx:
            lines[j] = self._line()
        return "\n".join(lines)

    def build(self, n_base: int = 120) -> tuple[pd.DataFrame, pd.DataFrame]:
        from dedup.shingle import batch_shingles

        def jac(a: str, b: str) -> float:
            sh, st, ct, _ = batch_shingles(pd.Series([a, b]), 5)
            sa = set(sh[st[0] : st[0] + ct[0]].tolist())
            sb = set(sh[st[1] : st[1] + ct[1]].tolist())
            return len(sa & sb) / max(len(sa | sb), 1)

        base_keys, base_contents = [], []
        for _ in range(n_base):
            c = self._content(int(self.rng.integers(20, 120)))
            base_keys.append(self._add(c))
            base_contents.append(c)

        # exact dups
        for j in range(0, n_base, 12):
            k2 = self._add(base_contents[j])
            self._pair(base_keys[j], k2, "exact", 1.0)

        # near dups at graded mutation rates
        rates = [0.01, 0.03, 0.05, 0.10, 0.20]
        for idx, j in enumerate(range(1, n_base, 7)):
            r = rates[idx % len(rates)]
            c2 = self._mutate(base_contents[j], r)
            k2 = self._add(c2)
            self._pair(base_keys[j], k2, "near", jac(base_contents[j], c2))

        # long-substring dups: shared verbatim block >= 512 chars
        block = self._content(12)
        assert len(block) >= 512
        for j in range(2, n_base, 25):
            c2 = self._content(30) + "\n" + block + "\n" + self._content(30)
            k2 = self._add(c2)
            c3 = self._content(30) + "\n" + block + "\n" + self._content(30)
            k3 = self._add(c3)
            self._pair(k2, k3, "substring", jac(c2, c3))

        # chains: A ≈ B ≈ C, sim(A,C) below threshold
        for j in range(3, n_base, 30):
            a = base_contents[j]
            b = self._mutate(a, 0.10)
            c = self._mutate(b, 0.10)
            kb, kc = self._add(b), self._add(c)
            self._pair(base_keys[j], kb, "near", jac(a, b))
            self._pair(kb, kc, "near", jac(b, c))

        # degenerates
        self._add("")
        self._add("x")
        self._add("päivää ünïcode 日本語 контент " * 10)
        lic_keys = [self._add(_LICENSE) for _ in range(40)]  # hot bucket
        for k2 in lic_keys[1:]:
            self._pair(lic_keys[0], k2, "exact", 1.0)

        corpus = pd.DataFrame(self.rows)
        truth = pd.DataFrame(self.truth)
        return corpus, truth


def make_corpus(n_base: int = 120, seed: int = 42) -> tuple[pd.DataFrame, pd.DataFrame]:
    return CorpusBuilder(seed).build(n_base)


def make_corpus_fast(n_docs: int = 60000, seed: int = 42) -> pd.DataFrame:
    """Bulk vectorized corpus for throughput benchmarks (no truth tables).

    ~70% unique base docs, ~10% exact dups, ~20% near dups (5% of tokens
    mutated), one giant repo holding ~30% of rows. Deterministic from seed.
    """
    rng = np.random.default_rng(seed)
    vocab = np.array(
        _KEYWORDS + [f"ident_{i}" for i in range(800)] + [f"val_{i}" for i in range(200)],
        dtype=object,
    )
    n_base = int(n_docs * 0.7)
    n_exact = int(n_docs * 0.1)
    n_near = n_docs - n_base - n_exact

    lens = rng.integers(100, 400, size=n_base)
    total = int(lens.sum())
    tok_idx = rng.integers(0, len(vocab), size=total)
    offsets = np.zeros(n_base + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    toks = vocab[tok_idx]
    base = [
        " ".join(toks[offsets[i] : offsets[i + 1]]) for i in range(n_base)
    ]

    exact_src = rng.integers(0, n_base, size=n_exact)
    exact = [base[j] for j in exact_src]

    near_src = rng.integers(0, n_base, size=n_near)
    near = []
    for j in near_src:
        a, b = offsets[j], offsets[j + 1]
        t = toks[a:b].copy()
        n_mut = max(1, int(len(t) * 0.05))
        pos = rng.integers(0, len(t), size=n_mut)
        t[pos] = vocab[rng.integers(0, len(vocab), size=n_mut)]
        near.append(" ".join(t))

    contents = base + exact + near
    n = len(contents)
    giant = rng.random(n) < 0.3
    repos = np.where(
        giant,
        "org0/giant",
        np.char.add("org1/repo", (np.arange(n) % 97).astype(str)),
    )
    langs = np.array(["python", "java", "c", "go", "js"], dtype=object)[
        np.arange(n) % 5
    ]
    return pd.DataFrame(
        {
            "repo": repos,
            "path": [f"src/mod{i % 13}/file{i}.x" for i in range(n)],
            "commit": [f"{seed:08x}{i:032x}" for i in range(n)],
            "lang": langs,
            "content": contents,
        }
    )
