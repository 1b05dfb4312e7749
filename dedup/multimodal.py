"""Multimodal columns: opaque binary payloads with typed metadata.

Image/audio/video content rides through the engine as `binary` columns plus a
typed metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched kernels over mapInPandas. The DECODERS ARE STUBS — the sandbox
has no image/audio libraries — but everything Spark-side is real and tested:
schemas, partitioning, batch shapes, the UDF contract, and a deterministic
fake feature extractor (content-hash-seeded) so downstream similarity search
and dedup over the feature vectors are exercisable end to end.

Swapping in real decoders = replacing `_decode_stub` with PIL/ffmpeg calls;
no plan shape changes.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("kind", StringType(), False),       # image | audio | video
        StructField("payload", BinaryType(), False),
        StructField("media_meta", StructType(
            [
                StructField("width", IntegerType(), True),
                StructField("height", IntegerType(), True),
                StructField("duration_ms", IntegerType(), True),
                StructField("codec", StringType(), True),
            ]
        ), True),
    ]
)

FEATURE_DIM = 64

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("payload_crc", LongType(), False),
        StructField("embedding", ArrayType(FloatType(), False), False),
    ]
)


def _decode_stub(payloads: list[bytes], kind: str) -> np.ndarray:
    """STUB decoder (no media libs in this container): deterministic fake
    pixel/sample tensors seeded by payload bytes. Replace with PIL / soundfile
    / ffmpeg frame sampling in production — the batch contract (list[bytes] ->
    (n, FEATURE_DIM) float32) is the real interface."""
    out = np.empty((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, buf in enumerate(payloads):  # batch-level loop over opaque blobs
        seed = zlib.crc32(buf or b"")
        rng = np.random.default_rng(seed)
        out[i] = rng.standard_normal(FEATURE_DIM, dtype=np.float32)
    norms = np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-12)
    return out / norms


def extract_features(assets: DataFrame) -> DataFrame:
    """binary payloads → unit-norm feature vectors (Arrow-batched).

    Only (asset_id, kind, payload) cross the Arrow boundary — metadata stays
    JVM-side and rejoins by asset_id if needed (column pruning on binary
    columns matters: payloads dominate the bytes)."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = [bytes(b) if b is not None else b"" for b in pdf["payload"]]
            feats = _decode_stub(payloads, "any")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": np.array([len(b) for b in payloads], dtype=np.int64),
                    "payload_crc": np.array(
                        [zlib.crc32(b) for b in payloads], dtype=np.int64
                    ),
                    "embedding": list(feats),
                }
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        go, FEATURE_SCHEMA
    )


def exact_asset_dups(assets: DataFrame) -> DataFrame:
    """Exact binary dedup: sha2 over the payload, JVM-side."""
    return (
        assets.withColumn("payload_sha", F.sha2(F.col("payload"), 256))
        .groupBy("payload_sha")
        .agg(F.count("*").alias("dup_count"),
             F.min("asset_id").alias("rep_asset"))
    )


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Adapter: materialize a binary asset table from the documents corpus
    (utf-8 payloads) so the multimodal plumbing is exercisable on the driver
    testdata — the payload column is genuinely BinaryType end to end."""
    return docs.select(
        F.format_string("asset%06d", "doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8").alias("payload"),
        F.struct(
            F.lit(64).alias("width"), F.lit(64).alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("stub").alias("codec"),
        ).alias("media_meta"),
    )
