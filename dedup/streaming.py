"""Structured Streaming ingest: incremental near-dup state maintenance.

The batch pipeline's sketch state is mergeable (update/merge associative,
SURVEY §2.1 #2-3), so incremental ingest is just: for every micro-batch,
fold exact dups, compute signatures for doc_keys not already checkpointed
(signatures_with_resume's anti-join makes this idempotent), and append the
per-partition SignatureBlock rows. A late or replayed file cannot corrupt
state — recomputed signatures are identical (deterministic kernels) and the
block decode dedupes by doc_key.

`ingest_stream` uses a file source + foreachBatch + Trigger.AvailableNow, the
recommended incremental-batch pattern; LSH/cluster stages run on the
accumulated signature state after each ingest round (they are cheap relative
to signatures and not incrementally maintainable without approximation —
documented trade-off).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from dedup.config import DedupConfig
from dedup.minhash import with_doc_key
from dedup.pipeline import exact_stage, signature_input, signatures_with_resume
from dedup.warehouse import Warehouse

CORPUS_SCHEMA = (
    "repo string, path string, commit string, lang string, content string"
)


def ingest_stream(
    spark: SparkSession,
    input_dir: str,
    wh: Warehouse,
    cfg: DedupConfig,
    checkpoint_dir: str,
    key_cols: list[str] | None = None,
) -> None:
    """Process all currently-available corpus files into the signature
    checkpoint tables, exactly once per doc_key, then stop (AvailableNow).

    Re-running after new files arrive ingests only the new documents
    (streaming-source offset tracking + the resume anti-join)."""
    key_cols = key_cols or ["repo", "path", "commit"]
    stream = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        keyed = with_doc_key(batch_df, key_cols)
        rep_docs, exact_pairs = exact_stage(keyed)
        rep_docs = signature_input(rep_docs, cfg)

        # cross-batch exact fold (ADVICE r1): a verbatim copy of a doc from
        # an EARLIER batch must not be re-signed — its sha is already
        # checkpointed. Fold it into an exact pair against the prior
        # representative and keep only genuinely-new shas for signatures.
        if wh.exists("checkpoint_signatures"):
            from dedup.pipeline import SIG_STAGE, decode_signature_blocks

            prior = decode_signature_blocks(
                wh.read("checkpoint_signatures").where(
                    (F.col("stage") == SIG_STAGE)
                    & (F.col("config_hash") == cfg.config_hash())
                ),
                cfg,
            ).groupBy("content_sha").agg(F.min("doc_key").alias("prior_key"))
            hit = rep_docs.join(prior, "content_sha")
            # canonical orientation key_a < key_b (ADVICE r2): a new doc_key
            # can sort below the checkpointed prior_key, and an unordered
            # pair would survive read_stream_exact_pairs' distinct() in both
            # orientations across epochs
            cross = hit.where(F.col("doc_key") != F.col("prior_key")).select(
                F.least("prior_key", "doc_key").alias("key_a"),
                F.greatest("prior_key", "doc_key").alias("key_b"),
            )
            exact_pairs = exact_pairs.unionByName(cross)
            rep_docs = rep_docs.join(prior, "content_sha", "left_anti")

        # restrict_to_input=False: the accumulated checkpoint is the state;
        # consumers read it whole (batch semantics don't apply per micro-batch)
        signatures_with_resume(
            rep_docs, cfg, wh, restrict_to_input=False
        ).count()  # materialize append
        wh.append(
            exact_pairs.withColumn("epoch", F.lit(int(epoch_id))),
            "stream_exact_pairs",
        )
        wh.record_lineage(
            "stream_ingest", cfg.config_hash(), f"epoch-{epoch_id}",
            rows=batch_df.count(), table="checkpoint_signatures",
        )

    q = (
        keyed_writer(stream)
        .foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def keyed_writer(stream: DataFrame):
    return stream.writeStream.outputMode("append")


def read_stream_exact_pairs(wh: Warehouse) -> DataFrame:
    """Exact-duplicate pairs accumulated by ingest_stream, deduped on read.

    The underlying table is AT-LEAST-ONCE: foreachBatch retries may append
    the same pair rows again (only the signature path is idempotent by
    anti-join), so consumers must read through this distinct() — the same
    dedupe-on-read discipline as decode_signature_blocks' dropDuplicates.
    """
    return (
        wh.read("stream_exact_pairs").select("key_a", "key_b").distinct()
    )


def streaming_lang_counts(
    spark: SparkSession, input_dir: str, checkpoint_dir: str, out_dir: str
) -> None:
    """Watermarked event-time windowed counts per language — the streaming
    aggregation surface (ingest-time event clock; corpus rows carry no
    event time of their own)."""
    stream = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .parquet(input_dir)
        .withColumn("ingest_ts", F.current_timestamp())
        .withWatermark("ingest_ts", "10 seconds")
    )
    agg = stream.groupBy(
        F.window("ingest_ts", "10 seconds"), F.col("lang")
    ).agg(F.count("*").alias("n_docs"))
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
