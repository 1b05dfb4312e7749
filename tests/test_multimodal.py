"""Multimodal binary-column plumbing: schema, batching, determinism."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dedup.multimodal import (
    FEATURE_DIM,
    assets_from_documents,
    exact_asset_dups,
    extract_features,
)


@pytest.fixture(scope="module")
def assets(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return assets_from_documents(docs.limit(60))


class TestMultimodal:
    def test_payload_is_binary_and_roundtrips(self, spark, assets):
        assert dict(assets.dtypes)["payload"] == "binary"
        row = assets.orderBy("asset_id").first()
        assert isinstance(row["payload"], (bytes, bytearray))

    def test_features_shape_and_norm(self, spark, assets):
        rows = extract_features(assets).collect()
        assert len(rows) == 60
        for r in rows[:5]:
            v = np.array(r["embedding"], dtype=np.float32)
            assert v.shape == (FEATURE_DIM,)
            assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-3

    def test_features_deterministic_and_content_keyed(self, spark, assets):
        a = {r["asset_id"]: r["embedding"] for r in extract_features(assets).collect()}
        b = {
            r["asset_id"]: r["embedding"]
            for r in extract_features(assets.repartition(7)).collect()
        }
        assert a == b  # partitioning-invariant
        # same payload bytes -> same embedding regardless of asset id
        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "asset_id": ["x", "y"],
                    "kind": ["image", "audio"],
                    "payload": [b"same-bytes", b"same-bytes"],
                }
            )
        )
        f = {r["asset_id"]: r["embedding"] for r in extract_features(docs).collect()}
        assert f["x"] == f["y"]

    def test_exact_binary_dedup(self, spark):
        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "asset_id": ["a1", "a2", "a3"],
                    "kind": ["image"] * 3,
                    "payload": [b"blob-A", b"blob-A", b"blob-B"],
                }
            )
        )
        got = {r["rep_asset"]: r["dup_count"] for r in exact_asset_dups(docs).collect()}
        assert got == {"a1": 2, "a3": 1}
