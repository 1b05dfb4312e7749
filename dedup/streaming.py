"""Structured Streaming ingest: incremental near-dup state maintenance.

The batch pipeline's sketch state is mergeable (update/merge associative,
SURVEY §2.1 #2-3), so incremental ingest is just: for every micro-batch,
fold exact dups, compute signatures for doc_keys not already checkpointed
(signatures_with_resume's anti-join makes this idempotent), and append the
per-partition SignatureBlock rows. A late or replayed file cannot corrupt
state — recomputed signatures are identical (deterministic kernels) and the
block decode dedupes by doc_key.

`ingest_stream` uses a file source + foreachBatch + Trigger.AvailableNow, the
recommended incremental-batch pattern. LSH candidate generation is
INCREMENTAL (VERDICT r2 #7): each round bands only the NEW signatures, finds
new-vs-new pairs through the capped generator and new-vs-old pairs through an
equi-join against the accumulated band table, then appends the new bands —
per-round pair-generation work scales with the batch, not the corpus. The
combined (old + new) bucket size gates both paths: a bucket that grows over
the cap stops emitting NEW pairs; pairs emitted while it was under the cap
are retained (a batch run over the final corpus would drop the whole bucket
— documented divergence, see stream_clusters). Clustering folds the
accumulated pair tables (cheap: pairs only).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from dedup.ann import HOT_BUCKET_MIN, _cosine
from dedup.config import DedupConfig
from dedup.lsh import candidate_pairs
from dedup.minhash import compute_bands, with_doc_key
from dedup.pipeline import exact_stage, signature_input, signatures_with_resume
from dedup.session import materialize
from dedup.verify import verified_pairs
from dedup.warehouse import Warehouse

CORPUS_SCHEMA = (
    "repo string, path string, commit string, lang string, content string"
)

BAND_TABLE = "checkpoint_bands"
# accumulated (content_sha -> representative doc_key), one append per batch:
# the cross-batch exact fold joins against THIS table, not the signature
# checkpoint, because docs below min_content_len never reach the signature
# stage yet must still fold verbatim copies across batches (an empty file
# arriving in two batches is still one exact-dup pair — batch parity)
SHA_REP_TABLE = "stream_sha_reps"
# incremental substring pass state: accumulated per-doc sampled fingerprints
# (the later-member work-list anchor) and the verified long-substring pairs
FP_TABLE = "stream_fingerprints"
SUBSTR_TABLE = "stream_substring_pairs"


def _incremental_candidates(
    new_sigs: DataFrame, wh: Warehouse, cfg: DedupConfig, epoch_id: int
) -> DataFrame:
    """Band the NEW signatures and return this round's candidate pairs plus
    the band rows to commit: new-vs-new via the capped/salted generator plus
    new-vs-old via one equi-join against the accumulated band table — each
    pair is discovered in the round its LATER member is banded. The CALLER
    appends the returned bands after persisting the pairs (crash-ordering).
    Returns ((key_a, key_b, n_bands_hit), band_rows)."""
    cfg_hash = cfg.config_hash()
    new_bands = materialize(compute_bands(new_sigs, cfg), eager=True)
    return_bands = new_bands.withColumn(
        "config_hash", F.lit(cfg_hash)
    ).withColumn("epoch", F.lit(int(epoch_id)))
    old = None
    if wh.exists(BAND_TABLE):
        old = wh.read(BAND_TABLE).where(F.col("config_hash") == cfg_hash).select(
            "band_id", "band_hash", "doc_key"
        )
    if old is not None:
        # at-least-once appends: a foreachBatch retry may have written the
        # same band rows twice — dedupe on read, like stream_exact_pairs
        old = old.dropDuplicates(["band_id", "band_hash", "doc_key"])
        # combined-size cap: a bucket's total population (old + new) gates
        # pair emission, matching the batch path's drop semantics
        old_sz = old.groupBy("band_id", "band_hash").agg(
            F.count("*").alias("sz_old")
        )
        new_sz = new_bands.groupBy("band_id", "band_hash").agg(
            F.count("*").alias("sz_new")
        )
        eligible = (
            new_sz.join(old_sz, ["band_id", "band_hash"], "left")
            .where(
                F.col("sz_new") + F.coalesce(F.col("sz_old"), F.lit(0))
                <= cfg.band_bucket_cap
            )
            .select("band_id", "band_hash")
        )
        gated = new_bands.join(eligible, ["band_id", "band_hash"])
        pairs_new, _ = candidate_pairs(gated, cfg)
        cross = (
            gated.alias("n")
            .join(old.alias("o"), ["band_id", "band_hash"])
            .where(F.col("n.doc_key") != F.col("o.doc_key"))
            .select(
                F.least("n.doc_key", "o.doc_key").alias("key_a"),
                F.greatest("n.doc_key", "o.doc_key").alias("key_b"),
            )
            .groupBy("key_a", "key_b")
            .agg(F.count("*").alias("n_bands_hit"))
        )
        pairs = pairs_new.unionByName(cross)
    else:
        pairs, _ = candidate_pairs(new_bands, cfg)
    # materialize the pair set BEFORE this round's bands land in the table:
    # `old` was listed pre-append, and the caller appends the verified pairs
    # before committing the bands (crash-ordering: see ingest_stream)
    pairs = materialize(pairs, eager=True)
    return pairs, return_bands


def _corpus_stream(spark: SparkSession, input_dir: str,
                   input_format: str) -> DataFrame:
    """Streaming corpus source: file-source parquet listing, or an Iceberg
    catalog table (readStream.table — incremental snapshot scan; the table
    provides its own schema). Split out so the dispatch is contract-testable
    without the runtime jar (same approach as tests/test_warehouse_iceberg)."""
    if input_format == "iceberg":
        # same per-micro-batch discipline as the parquet branch's
        # maxFilesPerTrigger: without it, the first run over a pre-populated
        # lake table hands AvailableNow the ENTIRE backlog as one giant
        # foreachBatch call (Iceberg read options; ignored by other sources)
        return (
            spark.readStream
            .option("streaming-max-files-per-micro-batch", 64)
            .table(input_dir)
        )
    if input_format != "parquet":
        raise ValueError(f"unknown input_format {input_format!r}")
    return (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )


def ingest_stream(
    spark: SparkSession,
    input_dir: str,
    wh: Warehouse,
    cfg: DedupConfig,
    checkpoint_dir: str,
    key_cols: list[str] | None = None,
    input_format: str = "parquet",
) -> None:
    """Process all currently-available corpus files into the signature
    checkpoint tables, exactly once per doc_key, then stop (AvailableNow).

    Re-running after new files arrive ingests only the new documents
    (streaming-source offset tracking + the resume anti-join).

    input_format="iceberg" treats input_dir as a catalog table name and
    reads it through readStream.table — Iceberg's incremental snapshot
    scan replaces the file-source listing, offsets are snapshot ids in the
    same checkpoint location, and everything downstream is identical (the
    north rule's deployment: the corpus IS the lake table)."""
    key_cols = key_cols or ["repo", "path", "commit"]
    stream = _corpus_stream(spark, input_dir, input_format)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        t0 = time.time()
        keyed = with_doc_key(batch_df, key_cols)
        rep_docs, exact_pairs = exact_stage(keyed)

        # cross-batch exact fold (ADVICE r1): a verbatim copy of a doc from
        # an EARLIER batch must not be re-signed — and must fold into an
        # exact pair against the prior representative. The fold runs BEFORE
        # the min_content_len filter and joins the accumulated sha-rep table
        # (not the signature checkpoint): short/empty docs never sign, but
        # their verbatim copies across batches are still exact dups exactly
        # as the batch pipeline sees them.
        if wh.exists(SHA_REP_TABLE):
            prior_reps = (
                wh.read(SHA_REP_TABLE)
                .where(F.col("config_hash") == cfg.config_hash())
                .select("content_sha", "doc_key")
            )
        elif wh.exists("checkpoint_signatures"):
            # legacy warehouse built before the sha-rep table existed: fall
            # back to the signature checkpoint as the fold source (the
            # pre-upgrade behavior — it misses sub-min_content_len docs,
            # which the sha-rep appends cover from this batch onward), so
            # verbatim copies of already-ingested docs still fold instead of
            # being silently re-signed
            from dedup.pipeline import SIG_STAGE, decode_signature_blocks

            prior_reps = decode_signature_blocks(
                wh.read("checkpoint_signatures").where(
                    (F.col("stage") == SIG_STAGE)
                    & (F.col("config_hash") == cfg.config_hash())
                ),
                cfg,
            ).select("content_sha", "doc_key")
        else:
            prior_reps = None
        if prior_reps is not None:
            prior = prior_reps.groupBy("content_sha").agg(
                F.min("doc_key").alias("prior_key")
            )
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
        new_sha_reps = rep_docs.select("content_sha", "doc_key").withColumn(
            "config_hash", F.lit(cfg.config_hash())
        )
        rep_docs = signature_input(rep_docs, cfg)

        # restrict_to_input=False: the accumulated checkpoint is the state;
        # consumers read it whole (batch semantics don't apply per micro-batch).
        # The append runs inside; the returned frame is a lazy decode of the
        # checkpoint table — no O(corpus) copy per micro-batch.
        all_sigs = signatures_with_resume(
            rep_docs, cfg, wh, restrict_to_input=False
        )

        # incremental LSH (VERDICT r2 #7): band every SIGNED doc not yet in
        # the accumulated band table. Deriving the work-list from the
        # signature checkpoint (not from this batch's rep_docs) makes crash
        # recovery self-healing: if a previous epoch died between the
        # signature append and the band append, its docs are signed but
        # unbanded, the cross-batch sha fold hides them from rep_docs on
        # replay, and ONLY this anti-join still picks them up.
        new_keys = all_sigs.select("doc_key")
        if wh.exists(BAND_TABLE):
            banded = (
                wh.read(BAND_TABLE)
                .where(F.col("config_hash") == cfg.config_hash())
                .select("doc_key")
                .distinct()
            )
            new_keys = new_keys.join(banded, "doc_key", "left_anti")
        new_sigs = all_sigs.join(new_keys, "doc_key", "left_semi")
        pairs, new_bands = _incremental_candidates(new_sigs, wh, cfg, epoch_id)
        # crash-ordering: pairs FIRST, bands LAST. The band append is the
        # commit point — a crash in between leaves the docs unbanded, so the
        # next epoch recomputes their pairs (duplicates are deduped on read,
        # the same at-least-once discipline as stream_exact_pairs).
        wh.append(
            verified_pairs(pairs, all_sigs, cfg)
            .withColumn("epoch", F.lit(int(epoch_id))),
            "stream_verified_pairs",
        )
        wh.append(
            exact_pairs.withColumn("epoch", F.lit(int(epoch_id))),
            "stream_exact_pairs",
        )
        # every ingested doc_key (pre exact-fold, pre length filter) so
        # cluster readers can attach singletons exactly like the batch path
        wh.append(keyed.select("doc_key"), "stream_doc_keys")
        wh.append(new_bands, BAND_TABLE)
        # sha-rep append LAST: a crash anywhere above leaves this batch's
        # shas out of the fold table, so the replay re-runs the full fold
        # (re-emitted pairs dedupe on read; re-signing is stopped by the
        # signature resume anti-join). Appending earlier could let a replay
        # see its own shas as "prior" and skip a cross-batch pair.
        wh.append(new_sha_reps.withColumn("epoch", F.lit(int(epoch_id))),
                  SHA_REP_TABLE)
        n_in = batch_df.count()
        wh.record_lineage(
            "stream_ingest", cfg.config_hash(), f"epoch-{epoch_id}",
            rows=n_in, table="checkpoint_signatures",
        )
        # same observability as the batch pipeline's per-stage metrics: one
        # row per epoch with the ingest wall and row count, so a stalled or
        # regressing stream is visible from the warehouse alone
        wh.record_metrics(
            "stream_ingest", cfg.config_hash(),
            int((time.time() - t0) * 1000), rows_in=n_in,
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


def read_stream_verified_pairs(wh: Warehouse) -> DataFrame:
    """Verified near-dup pairs accumulated by the incremental LSH rounds,
    deduped on read (at-least-once appends, same discipline as
    read_stream_exact_pairs)."""
    return wh.read("stream_verified_pairs").select("key_a", "key_b").distinct()


LABEL_TABLE = "stream_cluster_labels"
# fold the label delta log back into one generation after this many appends:
# bounds read-side reconciliation work while keeping per-call writes
# proportional to the batch (full rewrites are 1-in-16, not 1-per-call)
LABEL_COMPACT_EVERY = 16


def _reconciled_labels(stored: DataFrame) -> DataFrame:
    """Merge-on-read view of the label delta log: latest generation wins
    per doc_key. Pre-delta-log tables (no `ver` column) read as gen 0 —
    and so do ROWS with a null ver inside a mixed-schema table (a legacy
    no-ver table that later generations were appended onto: parquet schema
    merge surfaces the legacy rows with ver=NULL, and max_by skips rows
    whose ordering key is null, which would silently reconcile every
    untouched legacy doc to a NULL cluster_id)."""
    if "ver" not in stored.columns:
        stored = stored.withColumn("ver", F.lit(0))
    stored = stored.withColumn("ver", F.coalesce(F.col("ver"), F.lit(0)))
    return (
        stored.groupBy("doc_key")
        .agg(F.max_by("cluster_id", "ver").alias("cluster_id"))
    )


def _effective_edges(edges: DataFrame, prior: DataFrame) -> DataFrame:
    """Accumulated pair rows CONTRACTED against the prior label table: an
    edge whose endpoints already share a cluster label is a no-op and is
    dropped; the rest map each endpoint to its prior label (supernode) or
    itself when unlabeled. Union-find then runs over this quotient graph —
    its size is proportional to the NEW work (new edges + the labels they
    touch), not the accumulated pair history (VERDICT r3 #4)."""
    lab_u = prior.select(F.col("doc_key").alias("u"), F.col("cluster_id").alias("lu"))
    lab_v = prior.select(F.col("doc_key").alias("v"), F.col("cluster_id").alias("lv"))
    e = (
        edges.select(F.col("key_a").alias("u"), F.col("key_b").alias("v"))
        .join(lab_u, "u", "left")
        .join(lab_v, "v", "left")
    )
    return (
        e.where(
            F.col("lu").isNull() | F.col("lv").isNull()
            | (F.col("lu") != F.col("lv"))
        )
        .select(
            F.coalesce("lu", "u").alias("key_a"),
            F.coalesce("lv", "v").alias("key_b"),
        )
        .where(F.col("key_a") != F.col("key_b"))
        .distinct()
    )


def stream_clusters(spark: SparkSession, wh: Warehouse, cfg: DedupConfig
                    ) -> DataFrame:
    """(doc_key, cluster_id) over everything ingested so far — labels are
    maintained INCREMENTALLY (VERDICT r3 #4): the previous call's label
    table is persisted (stream_cluster_labels) and each call union-finds
    only the QUOTIENT graph — edges not already folded into one cluster,
    contracted to their prior labels — so per-call clustering work is
    proportional to the new batch, not the accumulated pair history.
    WRITE work is batch-proportional too (VERDICT r4 #2): the table is a
    merge-on-read delta log — each call appends one generation holding only
    the labels that changed (new docs + merged components), readers take
    latest-generation-wins per doc_key, and the log is folded into a single
    overwrite every LABEL_COMPACT_EVERY calls. The label table is gated on
    the config hash it was written under (ADVICE r4): a table left by a
    different config is dropped and labels rebuild from the pair tables. The
    contraction pass itself is one join of the pair tables against the
    label table (no fixpoint iterations over history). Labels equal a
    from-scratch union-find because prior labels are component minima:
    merging supernodes by min label yields the global component minimum.

    Crash-safe without epoch bookkeeping (at-least-once appends make epoch
    watermarks unsound): already-folded edges contract to self-loops and
    vanish, replayed rows are deduped on read, and a missing/partial label
    row simply re-enters the quotient graph through its surviving edges,
    so the maintenance is idempotent given the pair tables.

    Singletons are attached from the full ingested doc_key log
    (stream_doc_keys), so every ingested doc is labeled exactly like
    run_dedup's attach_singletons — including docs below min_content_len
    that never reach the signature stage.

    Label parity with the batch pipeline holds when no band bucket crosses
    band_bucket_cap BETWEEN rounds: a bucket that grows over the cap stops
    emitting NEW pairs (combined-size gate), but pairs it emitted while
    under the cap are retained, whereas a batch run over the final corpus
    drops that bucket entirely. This is the documented at-least-once
    divergence of incremental maintenance; the retained pairs are real
    verified near-dups, so recall never regresses — only the cap's
    pair-suppression is weaker than batch."""
    from dedup.cluster import attach_singletons, connected_components

    if not wh.exists("stream_doc_keys"):
        # No non-empty batch was ever ingested (fresh/empty input dir):
        # return the same empty (doc_key, cluster_id) frame the batch path
        # yields on an empty corpus instead of raising on a missing table.
        return wh.spark.createDataFrame([], "doc_key string, cluster_id string")
    edges = wh.spark.createDataFrame([], "key_a string, key_b string")
    if wh.exists("stream_exact_pairs"):
        edges = edges.unionByName(read_stream_exact_pairs(wh))
    if wh.exists("stream_verified_pairs"):
        edges = edges.unionByName(read_stream_verified_pairs(wh))
    members = wh.read("stream_doc_keys").select("doc_key").distinct()
    cfg_hash = cfg.config_hash()
    have_prior = wh.exists(LABEL_TABLE)
    if have_prior and not wh.is_complete(LABEL_TABLE, cfg_hash):
        # a label table written under a DIFFERENT config (or surviving a
        # pair-table reset) must not seed the quotient graph: folding it in
        # would bake stale merges into every future label and silently
        # break batch parity (ADVICE r4). Drop it and rebuild from the
        # pair tables, which are themselves config-gated on read.
        wh.drop(LABEL_TABLE)
        have_prior = False
    gen = 0
    if have_prior:
        stored = wh.read(LABEL_TABLE)
        if "ver" not in stored.columns:
            # one-time migration of a pre-delta-log table: appending
            # ver-stamped deltas onto it would create a MIXED-schema
            # parquet dir — legacy rows then surface ver=NULL under schema
            # merge (max_by would reconcile them to NULL cluster_ids), or
            # the ver column vanishes entirely depending on which footer
            # the reader samples. Rewrite once as generation 0 instead;
            # eager materialize first because overwrite deletes the files
            # the lazy plan reads.
            migrated = materialize(
                stored.select("doc_key", "cluster_id").withColumn(
                    "ver", F.lit(0)
                ),
                eager=True,
            )
            wh.write(migrated, LABEL_TABLE, cfg_hash)
            stored = wh.read(LABEL_TABLE)
        gen = int(
            stored.agg(F.coalesce(F.max("ver"), F.lit(0))).collect()[0][0]
        )
        prior = _reconciled_labels(stored)
        quotient = _effective_edges(edges, prior)
        comp = connected_components(quotient)
        # relabel prior members whose (super)label merged; keep the rest
        remap = comp.select(
            F.col("doc_key").alias("cluster_id"),
            F.col("cluster_id").alias("new_label"),
        )
        relabeled = (
            prior.join(remap, "cluster_id", "left")
            .select(
                "doc_key",
                F.coalesce("new_label", "cluster_id").alias("cluster_id"),
            )
        )
        # nodes first seen in this quotient graph (new docs with edges)
        fresh = comp.join(prior.select("doc_key"), "doc_key", "left_anti")
        labels = attach_singletons(relabeled.unionByName(fresh), members)
    else:
        labels = attach_singletons(connected_components(edges), members)
    # lineage cut before writing to the table the plan may be reading from
    labels = materialize(labels.select("doc_key", "cluster_id"), eager=True)
    if not have_prior or gen + 1 >= LABEL_COMPACT_EVERY:
        # first generation, or periodic compaction: fold the delta log into
        # one overwrite (rare — 1 in LABEL_COMPACT_EVERY calls)
        wh.write(labels.withColumn("ver", F.lit(0)), LABEL_TABLE, cfg_hash)
    else:
        # changed-component upsert (VERDICT r4 #2): append ONLY rows whose
        # label changed this call (new docs, or docs whose component
        # merged) as the next delta generation — per-call write work is
        # proportional to the batch, not the corpus. Readers reconcile via
        # latest-generation-wins (_reconciled_labels); a crash mid-append
        # leaves a partial generation whose missing labels re-enter the
        # quotient graph through their persisted edges next call, the same
        # idempotence argument as the pair tables.
        delta = labels.join(prior, ["doc_key", "cluster_id"], "left_anti")
        wh.append(delta.withColumn("ver", F.lit(gen + 1)), LABEL_TABLE)
    return labels


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


def stream_substring_pairs(
    spark: SparkSession,
    wh: Warehouse,
    cfg: DedupConfig,
    corpus: DataFrame,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Incremental exact long-substring pass — the suffix-array stage joins
    the streaming story (the north rule's third dedup mode, previously
    batch-only): fingerprint ONLY the sha-representative docs not yet in the
    accumulated fingerprint table, generate candidates whose later member is
    new (new-vs-new + one equi-join against the accumulated table, combined
    bucket cap — suffix.incremental_anchored_candidates), verify with the
    SAME offset-anchored exact kernel as the batch pass, and append. Per-call
    work is proportional to the new docs, not the corpus.

    `corpus` must cover every doc in the sha-rep table — the same
    input-retention contract as stream-mode --write-cleaned (content is NOT
    persisted in the warehouse; at 10^12-file scale the corpus is the lake
    table itself and this parameter is one `spark.read.table(...)`).

    Crash-ordering: pairs append FIRST, fingerprints LAST (the commit
    point) — a crash in between leaves this round's docs unfingerprinted,
    so the next call regenerates and re-verifies their pairs; the re-appends
    dedupe on read (read_stream_substring_pairs), the same at-least-once
    discipline as every pair table here.

    Returns the ACCUMULATED deduped pair set (key_a, key_b, lcs_len)."""
    from dedup.suffix import (
        fingerprints,
        incremental_anchored_candidates,
        verified_substring_pairs,
    )

    key_cols = key_cols or ["repo", "path", "commit"]
    cfg_hash = cfg.config_hash()
    t0 = time.time()
    if not wh.exists(SHA_REP_TABLE):
        return spark.createDataFrame(
            [], "key_a string, key_b string, lcs_len int"
        )
    keyed = with_doc_key(corpus, key_cols)
    reps = (
        wh.read(SHA_REP_TABLE)
        .where(F.col("config_hash") == cfg_hash)
        .select("doc_key")
        .distinct()
    )
    work = keyed.join(reps, "doc_key", "left_semi")
    old_fps = None
    if wh.exists(FP_TABLE):
        stored = (
            wh.read(FP_TABLE)
            .where(F.col("config_hash") == cfg_hash)
            .select("doc_key", "fp_hash", "fp_off")
            # at-least-once appends dedupe on read, like the band table
            .dropDuplicates(["doc_key", "fp_hash", "fp_off"])
        )
        work = work.join(
            stored.select("doc_key").distinct(), "doc_key", "left_anti"
        )
        # sentinel rows (fp_off = -1, below) mark processed docs with zero
        # sampled fingerprints — they gate the work-list above but must
        # never enter candidate generation
        old_fps = stored.where(F.col("fp_off") >= 0)
    # eager: the fingerprint kernel output feeds the size pass, the join and
    # the final append — localCheckpoint runs it exactly once
    new_fps = materialize(fingerprints(work, cfg), eager=True)
    cand = incremental_anchored_candidates(new_fps, old_fps, cfg)
    docs = keyed.select("doc_key", "content")
    pairs = verified_substring_pairs(cand, docs, cfg)
    n_new = work.select("doc_key").distinct().count()
    # docs the kernel sampled NO fingerprints from (shorter than the gram,
    # or every window unsampled) still need a row, or every later call
    # re-reads and re-hashes their content forever — per-call work would
    # silently become O(corpus), not O(new docs)
    sentinels = (
        work.select("doc_key")
        .distinct()
        .join(new_fps.select("doc_key").distinct(), "doc_key", "left_anti")
        .select(
            "doc_key",
            F.lit(0).cast("long").alias("fp_hash"),
            F.lit(-1).cast("long").alias("fp_off"),
        )
    )
    wh.append(
        pairs.withColumn("config_hash", F.lit(cfg_hash)), SUBSTR_TABLE
    )
    wh.append(
        new_fps.unionByName(sentinels).withColumn(
            "config_hash", F.lit(cfg_hash)
        ),
        FP_TABLE,
    )
    wh.record_metrics(
        "stream_substring", cfg_hash,
        int((time.time() - t0) * 1000), rows_in=n_new,
    )
    return read_stream_substring_pairs(wh, cfg)


def read_stream_substring_pairs(wh: Warehouse, cfg: DedupConfig) -> DataFrame:
    """Accumulated verified long-substring pairs, deduped on read (a replayed
    round re-verifies the same pair with the same deterministic kernel, so
    max == the unique value; max also upgrades a pair first seen through a
    saturated window if a later replay measured deeper)."""
    if not wh.exists(SUBSTR_TABLE):
        return wh.spark.createDataFrame(
            [], "key_a string, key_b string, lcs_len int"
        )
    return (
        wh.read(SUBSTR_TABLE)
        .where(F.col("config_hash") == cfg.config_hash())
        .groupBy("key_a", "key_b")
        .agg(F.max("lcs_len").alias("lcs_len"))
    )


ASSET_FEAT_TABLE = "stream_asset_features"
ASSET_PAIR_TABLE = "stream_asset_pairs"


def salted_new_vs_all_pairs(
    new_f: DataFrame,
    both: DataFrame,
    bucket_cap: int,
    salts: int,
    threshold: float,
    id_col: str = "asset_id",
) -> DataFrame:
    """Capped+salted new-vs-(new+stored) bucket join for incremental vector
    dedup — capped_bucket_self_join's discipline (dedup/ann.py:196) in the
    asymmetric shape: bucket sizes are counted over the COMBINED old+new
    population first (members never buffer for over-cap buckets); hot
    eligible buckets (≥ HOT_BUCKET_MIN) assign the stored+new side one salt
    by id hash while the new side replicates to all `salts` replicas, so a
    single hot bucket spans `salts` tasks instead of relying on AQE to
    split one join key; cold buckets join plain at salt 0. Exactly one
    replica matches each stored row, so no pair duplicates from salting.

    `new_f` is (id_col, bucket, v); `both` is the same plus `is_new`
    (new rows pair a<b once, old rows pair against every new id). Returns
    (id_a, id_b, cosine) with cosine ≥ threshold, deduped; ids keep the
    caller's type (string asset ids, numeric vec ids)."""
    sz = both.groupBy("bucket").agg(F.count("*").alias("sz"))
    eligible = sz.where((F.col("sz") >= 2) & (F.col("sz") <= bucket_cap))
    hot = F.col("sz") >= HOT_BUCKET_MIN
    gated_new = (
        new_f.join(eligible, "bucket")
        .withColumn(
            "salt",
            F.explode(
                F.when(hot, F.sequence(F.lit(0), F.lit(salts - 1)))
                .otherwise(F.array(F.lit(0)))
            ),
        )
        .drop("sz")
    )
    gated_all = (
        both.join(eligible, "bucket")
        .withColumn(
            "salt",
            F.when(hot, F.pmod(F.xxhash64(id_col), F.lit(salts)).cast("int"))
            .otherwise(F.lit(0)),
        )
        .drop("sz")
    )
    a_first = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    return (
        gated_new.alias("a")
        .join(
            gated_all.alias("b"),
            on=[
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.salt") == F.col("b.salt"),
                F.when(F.col("b.is_new"), a_first).otherwise(
                    F.col(f"a.{id_col}") != F.col(f"b.{id_col}")
                ),
            ],
        )
        .select(
            F.least(f"a.{id_col}", f"b.{id_col}").alias("id_a"),
            F.greatest(f"a.{id_col}", f"b.{id_col}").alias("id_b"),
            F.round(_cosine(F.col("a.v"), F.col("b.v")), 4).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


def stream_asset_pairs(
    spark: SparkSession,
    wh: Warehouse,
    assets: DataFrame,
    n_bits: int = 12,
    seed: int = 42,
    threshold: float = 0.92,
    bucket_cap: int = 2000,
    salts: int = 8,
) -> DataFrame:
    """Incremental perceptual asset dedup — the multimodal surface joins the
    streaming story: decode features ONLY for assets not yet in the
    accumulated state (the decode kernel is the expensive part — payload
    bytes never re-cross the Arrow boundary for known assets), bucket the
    new vectors with the SAME seeded hyperplanes as the batch path, pair
    new-vs-new plus new-vs-old against the stored (asset_id, bucket,
    embedding) state under a COMBINED bucket cap, cosine-verify with the
    identical rounded threshold, and append.

    The state rows are compact (FEATURE_DIM floats + a bucket int per
    asset) — unlike the substring pass there is NO input-retention contract:
    old payloads are never re-read, the stored embedding is the verify-side
    operand. Buckets are persisted WITH the features so no kernel ever
    reruns over old assets.

    Crash-ordering: pairs append FIRST, features LAST (the commit point);
    a replay re-pairs the round's assets and dedupes on read
    (read_stream_asset_pairs), the same at-least-once discipline as every
    pair table. param_hash gates state reuse exactly like config_hash on
    the document tables — changing hyperplanes/threshold/cap starts a
    fresh state lineage instead of mixing geometries.

    Cap semantics match suffix.incremental_anchored_candidates: a bucket is
    gated on its old+new population at the time its later member arrives,
    so incremental recall under caps is a superset of batch, never a
    subset. Hot-but-eligible buckets follow capped_bucket_self_join's
    salt discipline (ann.py:196): the stored+new side keeps one salt
    (pmod of its id hash), the new side replicates across `salts` replicas,
    so one hot bucket spans `salts` tasks instead of betting on AQE
    skew-splitting a single join key; cold buckets join plain at salt 0.

    Returns the ACCUMULATED deduped pair set (asset_a, asset_b, cosine)."""
    from dedup.ann import as_double, hyperplane_buckets
    from dedup.multimodal import FEATURE_DIM, extract_features

    params = f"hp{n_bits}:s{seed}:t{threshold}:c{bucket_cap}"
    t0 = time.time()
    work = assets
    old_state = None
    if wh.exists(ASSET_FEAT_TABLE):
        stored = (
            wh.read(ASSET_FEAT_TABLE)
            .where(F.col("param_hash") == params)
            .select("asset_id", "bucket", "embedding")
            .dropDuplicates(["asset_id"])
        )
        work = assets.join(
            stored.select("asset_id"), "asset_id", "left_anti"
        )
        old_state = stored
    new_feats = materialize(
        extract_features(work).select("asset_id", "embedding"), eager=True
    )
    new_state = new_feats.join(
        hyperplane_buckets(new_feats, n_bits=n_bits, dim=FEATURE_DIM,
                           seed=seed, id_col="asset_id"),
        "asset_id",
    )
    new_f = new_state.select(
        "asset_id", "bucket", as_double(F.col("embedding")).alias("v")
    )
    if old_state is None:
        both = new_f.withColumn("is_new", F.lit(True))
    else:
        old_f = old_state.select(
            "asset_id", "bucket", as_double(F.col("embedding")).alias("v")
        )
        both = new_f.withColumn("is_new", F.lit(True)).unionByName(
            old_f.withColumn("is_new", F.lit(False))
        )
    raw = salted_new_vs_all_pairs(
        new_f, both, bucket_cap, salts, threshold
    ).select(
        F.col("id_a").alias("asset_a"),
        F.col("id_b").alias("asset_b"),
        "cosine",
    )
    n_new = new_feats.select("asset_id").distinct().count()
    wh.append(raw.withColumn("param_hash", F.lit(params)), ASSET_PAIR_TABLE)
    wh.append(
        new_state.withColumn("param_hash", F.lit(params)), ASSET_FEAT_TABLE
    )
    wh.record_metrics(
        "stream_assets", params, int((time.time() - t0) * 1000), rows_in=n_new,
    )
    return read_stream_asset_pairs(wh, n_bits=n_bits, seed=seed,
                                   threshold=threshold, bucket_cap=bucket_cap)


def read_stream_asset_pairs(
    wh: Warehouse, n_bits: int = 12, seed: int = 42, threshold: float = 0.92,
    bucket_cap: int = 2000,
) -> DataFrame:
    """Accumulated perceptual pairs, deduped on read (replays re-emit
    identical rows — the cosine is deterministic)."""
    params = f"hp{n_bits}:s{seed}:t{threshold}:c{bucket_cap}"
    if not wh.exists(ASSET_PAIR_TABLE):
        return wh.spark.createDataFrame(
            [], "asset_a string, asset_b string, cosine double"
        )
    return (
        wh.read(ASSET_PAIR_TABLE)
        .where(F.col("param_hash") == params)
        .select("asset_a", "asset_b", "cosine")
        .dropDuplicates(["asset_a", "asset_b"])
    )


VEC_STATE_TABLE = "stream_vector_state"
VEC_PAIR_TABLE = "stream_vector_pairs"


def stream_vector_pairs(
    spark: SparkSession,
    wh: Warehouse,
    vectors: DataFrame,
    dim: int = 64,
    n_bits: int = 12,
    seed: int = 42,
    threshold: float = 0.9,
    bucket_cap: int = 2000,
    salts: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental ANN over streaming embeddings (VERDICT r6 #6) — the
    stream_asset_pairs shape minus the decode kernel: bucket ONLY vectors
    not yet in the accumulated state with the SAME seeded hyperplanes as
    the batch path (ann.vector_near_dup_pairs), join new-vs-(new+stored)
    through salted_new_vs_all_pairs' count-cap-salt discipline, cosine-
    verify at the identical rounded threshold, append.

    State rows are (id, bucket, vector) — bounded per vector, param-hash
    gated exactly like the asset path: changing hyperplanes / threshold /
    cap starts a fresh lineage instead of mixing geometries. Crash
    ordering: pairs append FIRST, state LAST (the commit point); a replay
    re-pairs the round's vectors and dedupes on read. Cap semantics are
    incremental (a bucket is gated on its old+new population when its later
    member arrives), so incremental recall under caps is a superset of
    batch, never a subset.

    Returns the ACCUMULATED deduped pair set (vec_a, vec_b, cosine)."""
    from dedup.ann import as_double, hyperplane_buckets

    params = f"vhp{n_bits}:d{dim}:s{seed}:t{threshold}:c{bucket_cap}"
    t0 = time.time()
    work = vectors
    old_state = None
    if wh.exists(VEC_STATE_TABLE):
        stored = (
            wh.read(VEC_STATE_TABLE)
            .where(F.col("param_hash") == params)
            .select(id_col, "bucket", vec_col)
            .dropDuplicates([id_col])
        )
        work = vectors.join(stored.select(id_col), id_col, "left_anti")
        old_state = stored
    new_vecs = materialize(work.select(id_col, vec_col), eager=True)
    new_state = new_vecs.join(
        hyperplane_buckets(new_vecs, n_bits=n_bits, dim=dim, seed=seed,
                           id_col=id_col, vec_col=vec_col),
        id_col,
    )
    new_f = new_state.select(
        id_col, "bucket", as_double(F.col(vec_col)).alias("v")
    )
    if old_state is None:
        both = new_f.withColumn("is_new", F.lit(True))
    else:
        old_f = old_state.select(
            id_col, "bucket", as_double(F.col(vec_col)).alias("v")
        )
        both = new_f.withColumn("is_new", F.lit(True)).unionByName(
            old_f.withColumn("is_new", F.lit(False))
        )
    raw = salted_new_vs_all_pairs(
        new_f, both, bucket_cap, salts, threshold, id_col=id_col
    ).select(
        F.col("id_a").alias("vec_a"), F.col("id_b").alias("vec_b"), "cosine"
    )
    n_new = new_vecs.select(id_col).distinct().count()
    wh.append(raw.withColumn("param_hash", F.lit(params)), VEC_PAIR_TABLE)
    wh.append(
        new_state.withColumn("param_hash", F.lit(params)), VEC_STATE_TABLE
    )
    wh.record_metrics(
        "stream_vectors", params, int((time.time() - t0) * 1000), rows_in=n_new,
    )
    return read_stream_vector_pairs(
        wh, dim=dim, n_bits=n_bits, seed=seed, threshold=threshold,
        bucket_cap=bucket_cap,
    )


def read_stream_vector_pairs(
    wh: Warehouse, dim: int = 64, n_bits: int = 12, seed: int = 42,
    threshold: float = 0.9, bucket_cap: int = 2000,
) -> DataFrame:
    """Accumulated vector pairs, deduped on read (replays re-emit identical
    rows — the cosine is deterministic)."""
    params = f"vhp{n_bits}:d{dim}:s{seed}:t{threshold}:c{bucket_cap}"
    if not wh.exists(VEC_PAIR_TABLE):
        return wh.spark.createDataFrame(
            [], "vec_a bigint, vec_b bigint, cosine double"
        )
    return (
        wh.read(VEC_PAIR_TABLE)
        .where(F.col("param_hash") == params)
        .select("vec_a", "vec_b", "cosine")
        .dropDuplicates(["vec_a", "vec_b"])
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
