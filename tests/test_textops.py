"""Text-analysis operators: fingerprints, token counts, language guess."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dedup.textops import fingerprint_docs, language_guess, token_count


class TestFingerprints:
    def test_identical_content_identical_fingerprint(self, spark):
        long = "alpha beta gamma " * 40  # > 64 chars
        df = spark.createDataFrame(
            pd.DataFrame(
                {"doc_key": ["a", "b", "c"], "content": [long, long, "short"]}
            )
        )
        fps = {r["doc_key"]: r["fingerprint"] for r in fingerprint_docs(df).collect()}
        assert fps["a"] == fps["b"]
        assert fps["a"] != fps["c"]

    def test_shared_long_block_shares_fingerprint_sometimes(self, spark):
        """Min rolling hash over a shared 600-char block: if the global min
        window of doc a lies inside the block, doc b's min <= it; we assert
        determinism + valid schema rather than collision (min-of-all is a
        whole-doc fingerprint)."""
        rng = np.random.default_rng(4)
        block = " ".join(f"tok{i}" for i in rng.integers(0, 50, 120))
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_key": ["a", "b"],
                    "content": ["X " * 30 + block, "Y " * 99 + block],
                }
            )
        )
        rows = fingerprint_docs(df).collect()
        assert len(rows) == 2
        again = fingerprint_docs(df).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    def test_empty_and_null(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"doc_key": ["e", "n"], "content": ["", None]})
        )
        rows = fingerprint_docs(df).collect()
        assert len(rows) == 2  # short-doc fallback covers empty/null


class TestTokenOps:
    def test_token_count_edges(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"text": ["a b  c", " x ", "", None]})
        )
        got = [r[0] for r in df.select(token_count(F.col("text"))).collect()]
        assert got == [3, 1, 1, 1]

    def test_language_guess(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                {"text": ["the cat and the dog of a house", "el perro y la casa de es"]}
            )
        )
        got = [r[0] for r in df.select(language_guess(F.col("text"))).collect()]
        assert got == ["en", "es"]
