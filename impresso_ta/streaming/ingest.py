"""Incremental ingest as Structured Streaming (SURVEY §2.9 extension).

The reference's "incremental" mode is an offline anti-join against the
already-imported set (F3/J1, ref: generic_importer.py:240-249) — re-run
the whole CLI, skip known issues. The streaming-native equivalent: a file
source over the canonical drop zone with ``availableNow`` trigger —
checkpointing replaces the anti-join (each file processed exactly once
across restarts), and the same code runs continuously on a live feed.

Batch semantics remain the correctness target: with ``availableNow`` the
stream drains everything currently present and stops, equivalent to the
reference's batch re-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from impresso_ta.schemas import ISSUE_SCHEMA


def _read_store_before(sess: SparkSession, path: str, batch_id: int):
    """Read a ``batch=N``-partitioned store, restricted to batches
    before ``batch_id``; returns None when the store doesn't exist yet
    (first batch — PATH_NOT_FOUND / empty-dir schema inference).

    ONLY two conditions are treated as "no prior state": the path does
    not exist (PATH_NOT_FOUND), or schema inference failed on a store
    directory verified to contain no data files (a created-but-empty
    store). Any other read failure (FS hiccup, corrupt footer,
    permissions — including UNABLE_TO_INFER_SCHEMA on a directory that
    DOES hold files) re-raises so the micro-batch fails and the
    checkpoint retries it — silently treating a transient error as
    "first batch" would bypass the cross-batch gate and admit
    duplicates.
    """
    from pyspark.errors import AnalysisException

    try:
        df = sess.read.parquet(path)
    except AnalysisException as e:
        cond = (
            e.getCondition()
            if hasattr(e, "getCondition")
            else e.getErrorClass()
        ) or ""
        if "PATH_NOT_FOUND" in cond or "PATH_NOT_FOUND" in str(e):
            return None
        if "UNABLE_TO_INFER_SCHEMA" in cond or "UNABLE_TO_INFER_SCHEMA" in str(e):
            # empty store dir (no data files anywhere below) = no prior
            # state; files present = a real read failure, re-raise.
            # The check lists through Spark's OWN file index (binaryFile
            # source, recursive): it applies the same hidden-path rules
            # as the parquet reader — files under `_`/`.` directories
            # are invisible to BOTH, so they can't flip the verdict —
            # and it works under Spark Connect (no _jvm/_jsc private
            # APIs). The branch only runs when schema inference already
            # failed, i.e. the store is believed empty, so the listing
            # is O(metadata of an empty dir), not a crawl of real data.
            listed = (
                sess.read.format("binaryFile")
                .option("recursiveFileLookup", "true")
                .load(path)
                .select("path")
            )
            if listed.take(1):
                raise
            return None
        raise
    return df.filter(F.col("batch") < batch_id)


def stream_canonical_issues(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Watch a drop directory of canonical issue jsonl files, append new
    ones to the parquet store. Exactly-once per input file via checkpoint.

    Returns the StreamingQuery (call ``awaitTermination()``; with
    ``available_now`` it stops when the backlog is drained).
    """
    stream = (
        spark.readStream.schema(ISSUE_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .json(in_path)
    )
    writer = (
        stream.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_corpus_quality_gate(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
    max_files_per_trigger: int = 32,
    quality_model=None,
    quality_threshold: float = 0.5,
    quality_dim: int = 64,
    quality_tf: bool = True,
):
    """Streaming corpus-quality gate: watch a drop directory of document
    parquet files, keep only rows passing the C4 + Gopher-lite quality
    predicates, append survivors (with the audit columns) to the clean
    store. Exactly-once per input file via checkpoint — the streaming
    twin of the batch ``prepare_corpus`` filter stages for a live crawl
    feed.

    ``quality_model`` additionally applies the trained hashed-LR filter
    (the batch pipeline's learned-quality stage) to each micro-batch
    via the ROW-LOCAL scorer: the batch form's explode→groupBy margin
    would be a streaming aggregation (state store + watermark), so the
    ≤dim-row weight table folds into a one-row map that crossJoins on
    as a stream-static broadcast and the margin is computed per row
    with array expressions — zero shuffles, zero state (see
    ``lr_hashed_score_rowlocal``, batch-parity-tested). ``quality_tf``
    must match how the model was TRAINED (the pipeline's default is tf
    features — raw counts saturate the sigmoid, see ``lr_hashed_train``
    — but a raw-count model scored with tf features would silently
    produce wrong probabilities, so the flag mirrors prepare_corpus /
    the CLI's --quality-raw-counts).

    Corpus-WIDE stages (line dedup, Jaccard dedup) stay batch — they
    need the full corpus; the row-local gates here are exactly the ones
    that can run on a stream without state. (First-seen exact dedup is
    the stateful streaming complement: ``sessions.stream_dedup_first_seen``.)
    """
    from impresso_ta.operators.text_analysis import c4_signals

    doc_schema = (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    stream = (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_path)
    )
    # the C4 predicates come from the SAME builder as the batch
    # c4_filters stage (c4_signals) — streams filter at scan speed, no
    # state, no stream-stream join, and the thresholds (incl. the upper
    # word-count bound) cannot drift from batch.
    survivors = stream.filter(c4_signals(F.col("text"))["keep"])
    if quality_model is not None:
        from impresso_ta.operators.classifier import lr_hashed_score_rowlocal

        survivors = lr_hashed_score_rowlocal(
            survivors, quality_model, dim=quality_dim, tf=quality_tf
        ).filter(F.col("lr_prob") >= quality_threshold).drop("lr_prob")
    writer = (
        survivors.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_incremental_dedup(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    threshold: float = 0.8,
    available_now: bool = True,
    max_files_per_trigger: int = 32,
    state_path: str | None = None,
):
    """Continuous crawl dedup: every micro-batch of documents is
    (1) near-dup-deduped WITHIN the batch (MinHash-LSH + survivor
    pass), then (2) gated against EVERYTHING previously accepted.

    The cross-batch gate probes PERSISTED banded state: each accepted
    batch's band table (doc_id, band, bh) and shingle sizes are written
    once to ``state_path`` (default ``out_path + "_state"``), and later
    triggers probe them via :func:`impresso_ta.operators.dedup.
    incremental_minhash_dedup_banded` — per-trigger work is
    batch-proportional (narrow columnar scan of the band state, the
    batch side broadcast into the candidate join, accepted TEXT read
    only for the exact-Jaccard verify of colliding candidates). The
    store is never re-shingled or re-banded, so per-trigger COMPUTE
    stays flat as the corpus grows.

    Exactly-once across crashes: survivors AND their state land in
    ``batch=N`` partitions written with mode=overwrite, so a replayed
    micro-batch rewrites its own partitions idempotently; the gate
    reads only ``batch < N`` partitions, so a half-written
    own-partition from a crashed attempt can never make the batch's
    docs look like dups of themselves (the state commit happens after
    the output commit — both are replay-overwritten together). The
    streaming composition of F3/J1 incremental skip (exact ids) with
    near-dup semantics.
    """
    from impresso_ta.operators.dedup import (
        _minhash_parts,
        dedup_survivors,
        incremental_minhash_dedup_banded,
        minhash_lsh_pairs,
    )

    doc_schema = (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    state = state_path if state_path is not None else out_path + "_state"

    def _gate(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sess = batch.sparkSession
        # ONE shingle/signature pass per trigger, shared by all three
        # minhash consumers (within-batch pairs, cross-batch probe,
        # band-state write) via the `parts` hook
        sh, sigs, banded = _minhash_parts(
            batch, "doc_id", "text", 3, 24, 8
        )
        pairs = minhash_lsh_pairs(
            batch, threshold=threshold, parts=(sh, sigs, banded)
        )
        survivors = dedup_survivors(batch, pairs)
        st_bands = _read_store_before(sess, f"{state}/bands", batch_id)
        has_seen = st_bands is not None and bool(st_bands.take(1))
        if has_seen:
            st_sizes = _read_store_before(sess, f"{state}/sizes", batch_id)
            seen_text = _read_store_before(sess, out_path, batch_id)
            surv_banded = banded.join(
                survivors.select("doc_id"), "doc_id", "left_semi"
            )
            survivors = incremental_minhash_dedup_banded(
                survivors,
                st_bands.drop("batch"),
                st_sizes.drop("batch"),
                seen_text.drop("batch"),
                threshold=threshold,
                parts=(sh, sigs, surv_banded),
            )
        survivors.write.mode("overwrite").parquet(
            f"{out_path}/batch={batch_id}"
        )
        # band/size state of the FINAL accepted set, sliced from the
        # shared parts instead of re-minhashing the survivors
        final_ids = survivors.select("doc_id")
        banded.join(final_ids, "doc_id", "left_semi").write.mode(
            "overwrite"
        ).parquet(f"{state}/bands/batch={batch_id}")
        sigs.select("doc_id", "n_shingles").join(
            final_ids, "doc_id", "left_semi"
        ).write.mode("overwrite").parquet(f"{state}/sizes/batch={batch_id}")
        # _minhash_parts persists the signature frame for its in-trigger
        # consumers; release it so a long-running stream doesn't
        # accumulate one cached frame per micro-batch
        sigs.unpersist()

    stream = (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_path)
    )
    writer = (
        stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_windowed_event_counts(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Event-time windowed counts with late-data watermark — the
    streaming twin of the batch ``events_hourly_window`` /
    ``events_sliding_window`` queries (same result on a drained
    stream). ``slide=None`` is a tumbling window; a ``slide`` shorter
    than ``window`` makes it SLIDING — each event contributes to
    window/slide overlapping windows, so state rows (and emitted rows)
    multiply by that factor while eviction still follows the watermark."""
    w = (
        F.window("ts", window)
        if slide is None
        else F.window("ts", window, slide)
    )
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(w.alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
        )
    )


def stream_rebuild_solr(
    spark: SparkSession,
    issues_path: str,
    pages_df: DataFrame,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Continuous rebuild: watch the canonical issue drop zone, rebuild
    each micro-batch of new issues against the (static) pages store, and
    append the rebuilt rows — exactly once per issue via checkpoint.

    The batch rebuild is re-driven per micro-batch through
    ``foreachBatch`` — the standard pattern for composing a
    batch-verified pipeline (joins + UDTF) with streaming arrival
    semantics; the stream carries only ISSUES (small rows), the heavy
    pages side stays a static table the join probes per batch. Replaces
    the reference's re-run-everything + anti-join incremental mode
    (ref: generic_importer.py:240-249) with arrival-driven processing.

    Exactly-once across crashes: rebuilt rows land in a ``batch=N``
    partition written with mode=overwrite (the same layout as the dedup
    gates), so a micro-batch replayed after a crash between the sink
    write and the checkpoint commit REWRITES its own partition instead
    of appending a duplicate copy of every rebuilt CI.
    """
    from impresso_ta.rebuild import rebuild_issues_solr
    from impresso_ta.schemas import ISSUE_SCHEMA

    def _rebuild_batch(issues_batch: DataFrame, batch_id: int) -> None:
        if not issues_batch.isEmpty():
            rebuilt = rebuild_issues_solr(issues_batch, pages_df)
            rebuilt.write.mode("overwrite").parquet(
                f"{out_path}/batch={batch_id}"
            )

    stream = (
        spark.readStream.schema(ISSUE_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .json(issues_path)
    )
    writer = (
        stream.writeStream.foreachBatch(_rebuild_batch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_media_phash_gate(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    max_hamming: int = 3,
    bands: int = 4,
    available_now: bool = True,
    max_files_per_trigger: int = 32,
    state_path: str | None = None,
):
    """Continuous IMAGE dedup: each micro-batch of media payloads is
    perceptual-hashed (:func:`impresso_ta.operators.multimodal.
    image_phash`), near-dup-deduped within the batch by banded Hamming
    distance, then gated against every previously-accepted image — the
    multimodal twin of :func:`stream_incremental_dedup`, sharing its
    exactly-once layout (``batch=N`` overwrite partitions; the gate
    reads only ``batch < N``) and its banded-state design: each
    accepted batch's band table (mid, ph, band, bv —
    :func:`impresso_ta.operators.multimodal.phash_bands`) is written
    once to ``state_path`` (default ``out_path + "_state"``) and later
    triggers probe it via :func:`impresso_ta.operators.multimodal.
    phash_probe_pairs`. The accepted store itself is never read by the
    gate at all: the band state carries the 8-byte hash alongside each
    band value, so the cross probe joins hashes without re-decoding or
    re-banding anything — per-trigger compute is batch-proportional at
    any store size.

    Crawl semantics this buys at scale: a re-delivered media_id is
    dropped by an exact-id anti-join against the state's id column (the
    F3 incremental skip), and a re-hosted/recompressed image whose
    pixels survive (dHash within ``max_hamming``) is dropped by the
    banded cross probe. Candidate volume is the banded equi-join's,
    never all-pairs.
    """
    from impresso_ta.operators.multimodal import (
        MEDIA_SCHEMA,
        image_phash,
        phash_bands,
        phash_dedup_pairs,
        phash_probe_pairs,
    )

    state = state_path if state_path is not None else out_path + "_state"

    def _gate(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sess = batch.sparkSession
        hashed = image_phash(batch).join(
            batch.select("media_id", "content"), "media_id"
        )
        # within-batch: keep the min-id member of every near-dup pair
        pairs = phash_dedup_pairs(
            hashed, max_hamming=max_hamming, bands=bands
        )
        drops = pairs.select(F.col("media_b").alias("media_id")).distinct()
        survivors = hashed.join(drops, "media_id", "left_anti")
        st_bands = _read_store_before(sess, f"{state}/bands", batch_id)
        has_seen = st_bands is not None and bool(st_bands.take(1))
        if has_seen:
            st_bands = st_bands.drop("batch")
            # exact-id skip first: a re-delivered media_id is dropped
            # regardless of hash distance (left_anti ignores the band
            # fan-out duplication of the state rows)
            survivors = survivors.join(
                st_bands.select(F.col("mid").alias("media_id")),
                "media_id",
                "left_anti",
            )
            # cross-batch probe on hashes only: any accepted image
            # within max_hamming kills the incoming one
            hit = (
                phash_probe_pairs(
                    survivors.select("media_id", "phash"),
                    st_bands,
                    max_hamming=max_hamming,
                    bands=bands,
                )
                .select(F.col("media_new").alias("media_id"))
                .distinct()
            )
            survivors = survivors.join(hit, "media_id", "left_anti")
        survivors.write.mode("overwrite").parquet(
            f"{out_path}/batch={batch_id}"
        )
        phash_bands(
            survivors.select("media_id", "phash"), bands=bands
        ).write.mode("overwrite").parquet(f"{state}/bands/batch={batch_id}")

    stream = (
        spark.readStream.schema(MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_path)
    )
    writer = (
        stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
