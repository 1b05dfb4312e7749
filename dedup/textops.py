"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language guessing, rolling-hash fingerprinting.

The SQL-expressible ops (token counts, quality ratios, language guess) are
pure built-in Column expressions — JVM-side, whole-stage-codegen, and exactly
mirrored by the DuckDB oracle SQL in queries.py. Fingerprinting is a
vectorized kernel (mapInPandas) because SQL has no rolling hash.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from dedup.shingle import _utf8_blob
from dedup.sketches import combine_windows, splitmix64

EN_MARKERS = r"\b(the|of|and|to|in|is|a)\b"
ES_MARKERS = r"\b(el|la|de|los|las|y|en|es)\b"


def token_count(text: Column) -> Column:
    """Whitespace token count; '' counts as 1 (both engines agree)."""
    return F.size(F.split(F.trim(F.coalesce(text, F.lit(""))), r"\s+"))


# BPE-ish pre-tokenizer (the GPT-2 pattern's ASCII core): letter runs,
# digit runs, and single non-alphanumeric marks each become one piece —
# the standard subword-budget estimator when no tokenizer model is loaded.
# The whitespace class is spelled out explicitly because \s itself is NOT
# dialect-neutral: Java includes \x0B (vertical tab), RE2 does not — an
# explicit class gives identical semantics in Spark and the DuckDB oracle.
BPE_PIECE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\t\n\x0B\f\r ]"


def subword_count(text: Column) -> Column:
    """BPE-ish piece count over the text — JVM regexp, codegen'd."""
    return F.size(
        F.regexp_extract_all(
            F.coalesce(text, F.lit("")), F.lit(BPE_PIECE_PATTERN), F.lit(0)
        )
    )


def punct_count(text: Column) -> Column:
    return F.length(
        F.regexp_replace(F.coalesce(text, F.lit("")), r"[^.,;:!?]", "")
    )


def language_guess(text: Column) -> Column:
    """Marker-stopword n-gram heuristic: majority of EN vs ES marker hits."""
    en = F.size(F.regexp_extract_all(text, F.lit(EN_MARKERS), F.lit(0)))
    es = F.size(F.regexp_extract_all(text, F.lit(ES_MARKERS), F.lit(0)))
    return F.when(en >= es, F.lit("en")).otherwise(F.lit("es"))


FINGERPRINT_SCHEMA = StructType(
    [
        StructField("doc_key", StringType(), False),
        StructField("fingerprint", LongType(), False),
    ]
)


def fingerprint_docs(
    df: DataFrame,
    key_col: str = "doc_key",
    content_col: str = "content",
    window: int = 64,
) -> DataFrame:
    """Winnowing-style document fingerprint: the minimum rolling polynomial
    hash over all `window`-byte windows of the utf-8 content (whole text hash
    for shorter documents). One vectorized pass per Arrow batch — byte streams
    of the whole batch are concatenated and windowed with boundary masking,
    the same layout trick as shingle.batch_shingles."""

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            texts = pdf[content_col].fillna("").astype(str)
            blob8, offsets = _utf8_blob(texts)
            lens = np.diff(offsets)
            blob = blob8.astype(np.uint64)
            win = combine_windows(blob, window)
            doc_of = np.repeat(np.arange(len(pdf), dtype=np.int64), lens)
            out = np.empty(len(pdf), dtype=np.uint64)
            out[:] = np.iinfo(np.uint64).max
            if len(win) > 0:
                valid = doc_of[: len(win)] == doc_of[window - 1 :]
                vdoc = doc_of[: len(win)][valid]
                vwin = win[valid]
                if len(vdoc):
                    # vdoc is sorted (windows stream in doc order), so the
                    # per-doc minimum is a segmented reduceat — measured 2x
                    # the unbuffered np.minimum.at at 20M windows
                    seg = np.flatnonzero(
                        np.r_[True, vdoc[1:] != vdoc[:-1]]
                    )
                    out[vdoc[seg]] = np.minimum.reduceat(vwin, seg)
            # short docs: whole-text hash
            short = lens < window
            if short.any():
                import pandas as pd_

                out[short] = splitmix64(
                    pd_.util.hash_array(texts.to_numpy(dtype=object)[short])
                )
            yield pd.DataFrame(
                {
                    "doc_key": pdf[key_col].to_numpy(),
                    "fingerprint": out.view(np.int64),
                }
            )

    from dedup.session import kernel_partitions

    src = df.select(key_col, content_col)
    # rolling 64-byte windows are CPU-dense per input byte: parallelize a
    # small scan-fed input to an even task count (no-op once the scan is
    # already at least core-wide — see session.kernel_partitions)
    parts = kernel_partitions(src)
    if parts:
        src = src.repartition(parts, key_col)
    return src.mapInPandas(fp, FINGERPRINT_SCHEMA)
