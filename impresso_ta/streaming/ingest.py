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

    ONLY the path-missing AnalysisException is swallowed: any other
    read failure (FS hiccup, corrupt footer, permissions) must
    propagate so the micro-batch fails and the checkpoint retries it —
    silently treating a transient error as "first batch" would bypass
    the cross-batch gate and admit duplicates.
    """
    from pyspark.errors import AnalysisException

    try:
        df = sess.read.parquet(path)
    except AnalysisException:
        return None
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
):
    """Streaming corpus-quality gate: watch a drop directory of document
    parquet files, keep only rows passing the C4 + Gopher-lite quality
    predicates, append survivors (with the audit columns) to the clean
    store. Exactly-once per input file via checkpoint — the streaming
    twin of the batch ``prepare_corpus`` filter stages for a live crawl
    feed.

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
):
    """Continuous crawl dedup: every micro-batch of documents is
    (1) near-dup-deduped WITHIN the batch (MinHash-LSH + survivor
    pass), then (2) gated against EVERYTHING previously accepted via
    :func:`impresso_ta.operators.dedup.incremental_minhash_dedup` —
    the accepted store doubles as the band-table state, so state never
    diverges from output.

    Exactly-once across crashes: survivors land in a ``batch=N``
    partition written with mode=overwrite, so a replayed micro-batch
    rewrites its own partition idempotently; the gate reads only
    ``batch < N`` partitions, so a half-written own-partition from a
    crashed attempt can never make the batch's docs look like dups of
    themselves. The streaming composition of F3/J1 incremental skip
    (exact ids) with near-dup semantics.
    """
    from impresso_ta.operators.dedup import (
        dedup_survivors,
        incremental_minhash_dedup,
        minhash_lsh_pairs,
    )

    doc_schema = (
        "doc_id long, text string, lang string, source string, n_chars long"
    )

    def _gate(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sess = batch.sparkSession
        pairs = minhash_lsh_pairs(batch, threshold=threshold)
        survivors = dedup_survivors(batch, pairs)
        seen = _read_store_before(sess, out_path, batch_id)
        has_seen = seen is not None and bool(seen.take(1))
        if has_seen:
            seen = seen.drop("batch")
            survivors = incremental_minhash_dedup(
                survivors, seen, threshold=threshold
            )
        survivors.write.mode("overwrite").parquet(
            f"{out_path}/batch={batch_id}"
        )

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
) -> DataFrame:
    """Event-time tumbling window counts with late-data watermark — the
    streaming twin of the batch ``events_hourly_window`` query (same
    result on a drained stream)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
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
    """
    from impresso_ta.rebuild import rebuild_issues_solr
    from impresso_ta.schemas import ISSUE_SCHEMA

    def _rebuild_batch(issues_batch: DataFrame, batch_id: int) -> None:
        if not issues_batch.isEmpty():
            rebuilt = rebuild_issues_solr(issues_batch, pages_df)
            rebuilt.write.mode("append").parquet(out_path)

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
):
    """Continuous IMAGE dedup: each micro-batch of media payloads is
    perceptual-hashed (:func:`impresso_ta.operators.multimodal.
    image_phash`), near-dup-deduped within the batch by banded Hamming
    distance, then gated against every previously-accepted image — the
    multimodal twin of :func:`stream_incremental_dedup`, sharing its
    exactly-once layout (``batch=N`` overwrite partitions; the gate
    reads only ``batch < N``) and its state design: the accepted store
    IS the state, carrying media_id + phash so the cross-batch probe
    joins 8-byte hashes and never re-decodes stored images.

    Crawl semantics this buys at scale: a re-delivered media_id is
    dropped by an exact-id anti-join first (the F3 incremental skip —
    the Hamming pair join's ``id_a < id_b`` cannot see a self-pair), and
    a re-hosted/recompressed image whose pixels survive (dHash within
    ``max_hamming``) is dropped by the cross probe. Candidate volume is
    the banded equi-join's, never all-pairs. Cost honesty: this demo
    re-reads and re-bands the accepted store every micro-batch —
    O(|accepted|·bands) per trigger — which is fine for the moderate
    stores the tests and local crawls exercise; a production deployment
    stores the BAND table once, bucketed by (band, bv), and probes it
    incrementally, exactly as ``incremental_minhash_dedup``'s docstring
    prescribes for the text gate.
    """
    from impresso_ta.operators.multimodal import (
        MEDIA_SCHEMA,
        image_phash,
        phash_dedup_pairs,
    )

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
        seen = _read_store_before(sess, out_path, batch_id)
        has_seen = seen is not None and bool(seen.take(1))
        if has_seen:
            seen = seen.select("media_id", "phash", "decoded")
            # exact-id skip first: the pair join's id_a < id_b cannot
            # pair a re-delivered media_id with its stored self
            survivors = survivors.join(
                seen.select("media_id"), "media_id", "left_anti"
            )
            # cross-batch probe on hashes only: any accepted image
            # within max_hamming kills the incoming one
            both = survivors.select("media_id", "phash", "decoded").unionByName(
                seen
            )
            cross = phash_dedup_pairs(
                both, max_hamming=max_hamming, bands=bands
            )
            new_ids = survivors.select("media_id")
            hit = (
                cross.join(
                    seen.select(F.col("media_id").alias("media_a")),
                    "media_a",
                    "left_semi",
                )
                .join(
                    new_ids.withColumnRenamed("media_id", "media_b"),
                    "media_b",
                    "left_semi",
                )
                .select(F.col("media_b").alias("media_id"))
                .union(
                    cross.join(
                        seen.select(F.col("media_id").alias("media_b")),
                        "media_b",
                        "left_semi",
                    )
                    .join(
                        new_ids.withColumnRenamed("media_id", "media_a"),
                        "media_a",
                        "left_semi",
                    )
                    .select(F.col("media_a").alias("media_id"))
                )
                .distinct()
            )
            survivors = survivors.join(hit, "media_id", "left_anti")
        survivors.write.mode("overwrite").parquet(
            f"{out_path}/batch={batch_id}"
        )

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
