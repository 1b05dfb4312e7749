"""Structured Streaming ingest: incremental, idempotent signature state."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dedup.config import DedupConfig
from dedup.fixtures import make_corpus
from dedup.minhash import compute_signatures
from dedup.pipeline import (
    decode_signature_blocks,
    exact_stage,
    key_docs,
    signature_input,
)
from dedup.streaming import ingest_stream
from dedup.warehouse import Warehouse

CFG = DedupConfig()


class TestStreamingIngest:
    def test_incremental_ingest_matches_batch(self, spark, tmp_path):
        """Two arrival rounds through the stream == one batch run: same
        signature rows for every doc (exactly-once per doc_key)."""
        pdf, _ = make_corpus(n_base=30, seed=21)
        half = len(pdf) // 2
        in_dir = str(tmp_path / "incoming")
        os.makedirs(in_dir)
        wh = Warehouse(spark, str(tmp_path / "wh"))
        ckpt = str(tmp_path / "stream_ckpt")

        # round 1: first half arrives
        spark.createDataFrame(pdf.iloc[:half]).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        ingest_stream(spark, in_dir, wh, CFG, ckpt)
        n1 = decode_signature_blocks(
            wh.read("checkpoint_signatures"), CFG
        ).count()
        assert n1 > 0

        # round 2: rest arrives; only new docs are processed
        spark.createDataFrame(pdf.iloc[half:]).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        ingest_stream(spark, in_dir, wh, CFG, ckpt)

        streamed = decode_signature_blocks(
            wh.read("checkpoint_signatures"), CFG
        ).dropDuplicates(["doc_key"])

        # batch reference over the full corpus
        keyed = key_docs(spark.createDataFrame(pdf))
        rep_docs, _ = exact_stage(keyed)
        rep_docs = signature_input(rep_docs, CFG)
        batch = compute_signatures(rep_docs, CFG)

        a = {r["doc_key"]: (r["minhash"], r["simhash"]) for r in streamed.collect()}
        b = {r["doc_key"]: (r["minhash"], r["simhash"]) for r in batch.collect()}
        assert a == b

        # replay: re-running with no new files is a no-op
        before = wh.read("checkpoint_signatures").count()
        ingest_stream(spark, in_dir, wh, CFG, ckpt)
        assert decode_signature_blocks(
            wh.read("checkpoint_signatures"), CFG
        ).dropDuplicates(["doc_key"]).count() == len(b)
