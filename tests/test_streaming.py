"""Structured Streaming incremental ingest: availableNow drains the drop
zone exactly once; re-running with the same checkpoint imports nothing new
(the streaming replacement for the F3 anti-join)."""

import json

from impresso_ta.streaming import stream_canonical_issues
from tests.fixtures import issue, content_item


def _write_issue_jsonl(path, issue_id):
    doc = issue(issue_id, [content_item(f"{issue_id}-i0001", pp=[1])],
                pp=[f"{issue_id}-p0001"])
    with open(path, "w") as f:
        f.write(json.dumps(doc) + "\n")


def test_available_now_exactly_once(spark, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    out = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    _write_issue_jsonl(drop / "a.jsonl", "GDL-1900-01-02-a")
    q = stream_canonical_issues(spark, str(drop), out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 1

    # second batch: only the new file is processed
    _write_issue_jsonl(drop / "b.jsonl", "GDL-1900-01-03-a")
    q = stream_canonical_issues(spark, str(drop), out, ckpt)
    q.awaitTermination(120)
    df = spark.read.parquet(out)
    assert df.count() == 2
    assert {r["id"] for r in df.select("id").collect()} == {
        "GDL-1900-01-02-a",
        "GDL-1900-01-03-a",
    }

    # idempotent re-run: checkpoint prevents re-import
    q = stream_canonical_issues(spark, str(drop), out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 2


def test_stream_rebuild_solr_incremental(spark, tmp_path):
    """New canonical issues arriving in the drop zone are rebuilt exactly
    once; the rebuilt store grows incrementally."""
    from impresso_ta.schemas import PAGE_SCHEMA
    from impresso_ta.streaming.ingest import stream_rebuild_solr
    from tests.fixtures import simple_issue_and_pages

    drop = tmp_path / "issues"
    drop.mkdir()
    out = str(tmp_path / "rebuilt")
    ckpt = str(tmp_path / "ckpt")

    issue, pages = simple_issue_and_pages()
    pages_df = spark.createDataFrame(pages, PAGE_SCHEMA)

    with open(drop / "a.jsonl", "w") as f:
        f.write(json.dumps(issue) + "\n")
    q = stream_rebuild_solr(spark, str(drop), pages_df, out, ckpt)
    q.awaitTermination(180)
    assert q.exception() is None
    first = spark.read.parquet(out)
    n_first = first.count()
    assert n_first > 0
    ids = {r["id"] for r in first.select("id").collect()}

    # re-run with nothing new: no duplicates
    q = stream_rebuild_solr(spark, str(drop), pages_df, out, ckpt)
    q.awaitTermination(180)
    assert spark.read.parquet(out).count() == n_first

    # a second issue arrives (same pages store, different edition)
    issue2 = dict(issue)
    issue2["id"] = issue["id"][:-1] + "b"
    with open(drop / "b.jsonl", "w") as f:
        f.write(json.dumps(issue2) + "\n")
    q = stream_rebuild_solr(spark, str(drop), pages_df, out, ckpt)
    q.awaitTermination(180)
    after = spark.read.parquet(out)
    # issue2 carries the same CI payload → same row count again
    assert after.count() == 2 * n_first
    assert {r["id"] for r in after.select("id").collect()} == ids


def test_stream_rebuild_solr_replay_overwrites_partial_batch(
    spark, tmp_path
):
    """Crash-replay idempotency: a half-written batch=N partition from a
    crashed attempt (sink write succeeded, checkpoint commit didn't) is
    REWRITTEN by the replay, never appended to — emulated by pre-seeding
    batch=0 with garbage rows before the first run."""
    from impresso_ta.schemas import PAGE_SCHEMA
    from impresso_ta.streaming.ingest import stream_rebuild_solr
    from tests.fixtures import simple_issue_and_pages

    drop = tmp_path / "issues"
    drop.mkdir()
    out = str(tmp_path / "rebuilt")
    ckpt = str(tmp_path / "ckpt")
    issue, pages = simple_issue_and_pages()
    pages_df = spark.createDataFrame(pages, PAGE_SCHEMA)
    with open(drop / "a.jsonl", "w") as f:
        f.write(json.dumps(issue) + "\n")

    # the "crashed attempt": leftover rows in the partition batch 0
    # will claim; an append-mode sink would retain them as duplicates
    from pyspark.sql import functions as F

    garbage = spark.range(3).select(
        F.concat(F.lit("stale-"), F.col("id").cast("string")).alias("id")
    )
    garbage.write.parquet(f"{out}/batch=0")

    q = stream_rebuild_solr(spark, str(drop), pages_df, out, ckpt)
    q.awaitTermination(180)
    assert q.exception() is None
    got = spark.read.option("mergeSchema", "true").parquet(out)
    ids = {r["id"] for r in got.select("id").collect()}
    assert not any(i.startswith("stale-") for i in ids)
    assert all(i.startswith(issue["id"]) for i in ids)


def test_stream_corpus_quality_gate_kill_resume_exactly_once(spark, tmp_path):
    """Crash-recovery guarantee (VERDICT r2 item 8): stop the gate mid-
    backlog, restart from the same checkpoint, and the sink holds every
    passing doc exactly once — no duplicates (sink commit log is
    batch-id idempotent), no losses (offset log replays the in-flight
    batch). Matches the exactly-once the batch pipeline gets from its
    commit protocol."""
    import shutil
    import time

    from impresso_ta.streaming.ingest import stream_corpus_quality_gate

    drop = tmp_path / "drop"
    drop.mkdir()
    out = str(tmp_path / "clean")
    ckpt = str(tmp_path / "ckpt")
    good = " ".join(f"word{i}" for i in range(40))
    n_files, per_file = 24, 2

    doc_schema = (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    expected = set()
    for f in range(n_files):
        rows = []
        for j in range(per_file):
            doc_id = f * per_file + j
            if j == 0:  # one passing doc per file
                rows.append((doc_id, f"{good} file{f}", "en", "s", 1))
                expected.add(doc_id)
            else:  # one failing doc per file (too short)
                rows.append((doc_id, "too short", "en", "s", 1))
        spark.createDataFrame(rows, doc_schema).coalesce(1).write.parquet(
            str(drop / f"batch{f:03d}")
        )

    # one file per micro-batch → the backlog needs n_files commits
    q = stream_corpus_quality_gate(
        spark, str(drop) + "/*", out, ckpt, max_files_per_trigger=1
    )
    # kill mid-drain: as soon as a few batches committed, stop the query
    deadline = time.time() + 120
    while time.time() < deadline:
        try:
            n_now = spark.read.parquet(out).count()
        except Exception:  # sink not created yet
            n_now = 0
        if n_now >= 3:
            break
        if not q.isActive:
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)
    mid = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert mid, "stream stopped before any batch committed"
    assert len(mid) < n_files, "backlog fully drained before the kill"

    # restart from the SAME checkpoint: drains the rest exactly once
    q = stream_corpus_quality_gate(
        spark, str(drop) + "/*", out, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination(180)
    assert q.exception() is None
    got = [r["doc_id"] for r in spark.read.parquet(out).collect()]
    assert sorted(got) == sorted(expected)  # no loss
    assert len(got) == len(set(got))  # no duplicate

    # third run: nothing new → sink unchanged (idempotent)
    q = stream_corpus_quality_gate(
        spark, str(drop) + "/*", out, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == len(expected)
    shutil.rmtree(str(drop))


def test_stream_corpus_quality_gate_incremental(spark, tmp_path):
    from pyspark.sql import functions as F

    from impresso_ta.streaming.ingest import stream_corpus_quality_gate

    drop = tmp_path / "drop"
    drop.mkdir()
    out = str(tmp_path / "clean")
    ckpt = str(tmp_path / "ckpt")
    good = " ".join(f"word{i}" for i in range(40))
    bad_short = "too short"
    bad_blk = good + " enable javascript please"

    spark.createDataFrame(
        [(1, good, "en", "s", len(good)), (2, bad_short, "en", "s", 9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(drop / "batch1"))
    q = stream_corpus_quality_gate(spark, str(drop) + "/*", out, ckpt)
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {1}

    # second drop: checkpoint means batch1 is not reprocessed
    spark.createDataFrame(
        [(3, good + " more", "en", "s", 1), (4, bad_blk, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(drop / "batch2"))
    q = stream_corpus_quality_gate(spark, str(drop) + "/*", out, ckpt)
    q.awaitTermination(120)
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 3]


def test_stream_incremental_dedup_within_and_across_batches(spark, tmp_path):
    """Continuous crawl dedup: within-batch near-dups collapse to one
    survivor, cross-batch dups are gated by the accepted store, and a
    checkpointed re-run leaves the store unchanged."""
    import time as _time

    from impresso_ta.streaming.ingest import stream_incremental_dedup

    drop = tmp_path / "crawl"
    drop.mkdir()
    out = str(tmp_path / "accepted")
    ckpt = str(tmp_path / "ckpt")
    doc_schema = (
        "doc_id long, text string, lang string, source string, n_chars long"
    )

    def text(tag, n=40):
        return " ".join(f"{tag}{i}" for i in range(n))

    # batch 1: two distinct docs + an exact twin of the first
    spark.createDataFrame(
        [
            (1, text("alpha"), "en", "s", 1),
            (2, text("alpha"), "en", "s", 1),  # within-batch twin
            (3, text("beta"), "en", "s", 1),
        ],
        doc_schema,
    ).coalesce(1).write.parquet(str(drop / "f1"))
    _time.sleep(1.1)  # file-source batches follow modification time
    # batch 2: one twin of an accepted doc + one genuinely new doc
    spark.createDataFrame(
        [
            (10, text("beta"), "en", "s", 1),  # cross-batch twin
            (11, text("gamma"), "en", "s", 1),
        ],
        doc_schema,
    ).coalesce(1).write.parquet(str(drop / "f2"))

    q = stream_incremental_dedup(
        spark, str(drop) + "/*", out, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination(240)
    assert q.exception() is None
    accepted = spark.read.parquet(out)
    texts = [r["text"] for r in accepted.collect()]
    # one survivor per distinct text, none lost
    assert sorted(t.split()[0] for t in texts) == ["alpha0", "beta0", "gamma0"]
    assert len(texts) == len(set(texts))

    # idempotent re-run from the same checkpoint: nothing reprocessed
    q = stream_incremental_dedup(
        spark, str(drop) + "/*", out, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 3


def test_stream_media_phash_gate(spark, tmp_path):
    """Continuous image dedup: a near-identical image is dropped within
    its batch, a re-crawled (near-)duplicate of an accepted image is
    gated out cross-batch, and visually different images all survive."""
    import time as _time

    from impresso_ta.operators.multimodal import png_encode
    from impresso_ta.streaming.ingest import stream_media_phash_gate

    def grad_png(shift=0, blotch=None):
        w = h = 32
        pix = bytearray()
        for y in range(h):
            for x in range(w):
                v = min(255, (x * 8 + shift) % 256)
                if blotch and x < blotch and y < blotch:
                    v = 255 - v
                pix.append(v)
        return bytearray(png_encode(w, h, 0, bytes(pix)))

    def media_row(mid, content):
        import hashlib as _hl

        return (mid, "image/png", len(content), _hl.sha1(bytes(content)).hexdigest(), content)

    drop = tmp_path / "media"
    drop.mkdir()
    out = str(tmp_path / "accepted")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "media_id string, mime string, n_bytes long, sha1 string, "
        "content binary"
    )
    # batch 1: a gradient, its near-twin (pixel shift), a distinct blotch
    spark.createDataFrame(
        [
            media_row("a", grad_png()),
            media_row("a2", grad_png(shift=2)),   # within-batch near-dup
            media_row("c", grad_png(blotch=16)),  # distinct
        ],
        schema,
    ).coalesce(1).write.parquet(str(drop / "f1"))
    _time.sleep(1.1)
    # batch 2: re-crawl of the gradient + a genuinely new image
    spark.createDataFrame(
        [
            media_row("a3", grad_png(shift=1)),   # cross-batch near-dup
            media_row("d", grad_png(blotch=24)),  # new
        ],
        schema,
    ).coalesce(1).write.parquet(str(drop / "f2"))

    q = stream_media_phash_gate(
        spark, str(drop) + "/*", out, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination(240)
    assert q.exception() is None
    accepted = sorted(
        r["media_id"] for r in spark.read.parquet(out).collect()
    )
    assert accepted == ["a", "c", "d"]

    # checkpointed re-run: idempotent
    q = stream_media_phash_gate(
        spark, str(drop) + "/*", out, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 3


def test_stream_media_phash_gate_same_id_redelivery(spark, tmp_path):
    """A re-delivered media_id (same bytes, new file) must be gated by
    the exact-id skip — the Hamming pair join alone cannot pair a row
    with its stored self."""
    import time as _time

    from impresso_ta.operators.multimodal import png_encode
    from impresso_ta.streaming.ingest import stream_media_phash_gate

    png = bytearray(png_encode(8, 8, 0, bytes(range(64))))
    drop = tmp_path / "media"
    drop.mkdir()
    out = str(tmp_path / "accepted")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "media_id string, mime string, n_bytes long, sha1 string, "
        "content binary"
    )
    spark.createDataFrame(
        [("same", "image/png", len(png), "h", png)], schema
    ).coalesce(1).write.parquet(str(drop / "f1"))
    _time.sleep(1.1)
    spark.createDataFrame(
        [("same", "image/png", len(png), "h", png)], schema
    ).coalesce(1).write.parquet(str(drop / "f2"))

    q = stream_media_phash_gate(
        spark, str(drop) + "/*", out, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination(240)
    assert q.exception() is None
    assert spark.read.parquet(out).count() == 1


def test_read_store_before_error_discrimination(spark, tmp_path):
    """Only 'no prior state' conditions may return None: a missing
    path, or a store directory verified to hold no data files. A
    directory that DOES hold (unreadable) data must re-raise so the
    micro-batch retries instead of silently admitting duplicates past
    the cross-batch gate."""
    import os

    import pytest

    from impresso_ta.streaming.ingest import _read_store_before

    # missing path -> first batch
    assert _read_store_before(spark, str(tmp_path / "absent"), 1) is None
    # existing but empty store dir (only marker files) -> first batch
    empty = tmp_path / "empty_store"
    empty.mkdir()
    (empty / "_SUCCESS").touch()
    assert _read_store_before(spark, str(empty), 1) is None
    # dir with a data file that defeats schema inference -> re-raise
    bad = tmp_path / "bad_store"
    bad.mkdir()
    with open(bad / "part-00000.parquet", "wb") as f:
        f.write(b"not a parquet footer")
    with pytest.raises(Exception):
        _read_store_before(spark, str(bad), 1)
    # a data file hidden from Spark's reader (under a `_`-prefixed
    # directory) must NOT count as data: the parquet reader would never
    # see it, so treating it as real state would wedge the batch in a
    # re-raise loop over a store Spark considers empty
    shadow = tmp_path / "shadow_store"
    (shadow / "_staging").mkdir(parents=True)
    with open(shadow / "_staging" / "leftover.parquet", "wb") as f:
        f.write(b"not a parquet footer")
    assert _read_store_before(spark, str(shadow), 1) is None
    # healthy store still reads and filters
    good = tmp_path / "good_store"
    spark.createDataFrame(
        [(1, 0), (2, 1)], "x long, batch long"
    ).write.partitionBy("batch").parquet(str(good))
    got = _read_store_before(spark, str(good), 1)
    assert [r["x"] for r in got.collect()] == [1]
    assert os.path.isdir(good)


def test_stream_quality_gate_with_learned_model(spark, tmp_path):
    """quality_model on the streaming gate: the drained survivors equal
    the batch pipeline's (C4 + LR-threshold) survivors on the same
    docs — same model, same threshold, stateless row-local scoring."""
    from pyspark.sql import functions as F

    from impresso_ta.operators.classifier import lr_hashed_train
    from impresso_ta.operators.pipeline import prepare_corpus
    from impresso_ta.streaming.ingest import stream_corpus_quality_gate

    doc_schema = (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    base = " ".join(f"word{i}" for i in range(40))
    rows = [
        (i, f"{base} paris museum art gallery exhibition n{i}", "en", "s", 1)
        for i in range(8)
    ] + [
        (100 + i, f"{base} zebra xylophone quux blorp gnarl n{i}", "en", "s", 1)
        for i in range(8)
    ]
    docs = spark.createDataFrame(rows, doc_schema)
    model = lr_hashed_train(
        docs.withColumn("y", (F.col("doc_id") < 100).cast("double")),
        "y", tf=True, learn_rate=100.0,
    )

    # batch truth: the pipeline's quality stage on the same inputs
    batch = prepare_corpus(
        docs, c4=True, gopher=False, line_spans=None, doc_dedup=False,
        quality_model=model, quality_threshold=0.5,
    )
    want = sorted(r["doc_id"] for r in batch.docs.collect())
    batch.unpersist()
    assert want and len(want) < len(rows)  # a real split

    drop = tmp_path / "drop"
    drop.mkdir()
    docs.coalesce(2).write.parquet(str(drop / "b0"))
    out, ckpt = str(tmp_path / "clean"), str(tmp_path / "ckpt")
    q = stream_corpus_quality_gate(
        spark, str(drop) + "/*", out, ckpt,
        quality_model=model, quality_threshold=0.5,
    )
    q.awaitTermination(120)
    assert q.exception() is None
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == want


def test_stream_sliding_window_drain_matches_batch(spark, tmp_path):
    """stream_windowed_event_counts with a slide: the drained stream
    equals the batch twin (every event in window/slide = 4 overlapping
    windows), and the tumbling form stays a strict subset shape."""
    import datetime

    from pyspark.sql import functions as F

    from impresso_ta.streaming.ingest import stream_windowed_event_counts

    t0 = datetime.datetime(2024, 1, 1, 8, 0, 0)
    rows = [
        (i, t0 + datetime.timedelta(minutes=7 * i), "view" if i % 2 else "click")
        for i in range(40)
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    # append mode only emits windows the WATERMARK has closed: a
    # far-future sentinel closes every real window; its own 4 windows
    # stay open (never emitted) and are excluded from the batch twin
    sentinel = spark.createDataFrame(
        [(999, t0 + datetime.timedelta(hours=10), "sentinel")],
        "event_id long, ts timestamp, event_type string",
    )
    src = str(tmp_path / "events")
    events.union(sentinel).write.parquet(src)

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string"
    ).parquet(src)
    q = (
        stream_windowed_event_counts(
            stream, window="1 hour", watermark="2 hours", slide="15 minutes"
        )
        .writeStream.format("memory")
        .queryName("slide_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = {
        (r["window_start"], r["event_type"], r["n"])
        for r in spark.sql("SELECT * FROM slide_test").collect()
    }
    want = {
        (r["window_start"], r["event_type"], r["n"])
        for r in (
            events.groupBy(
                F.window("ts", "1 hour", "15 minutes").alias("w"),
                "event_type",
            )
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n")
            .collect()
        )
    }
    assert got == want and got
    # overlap factor: total contribution = 4x the event count
    assert sum(n for _, _, n in got) == 4 * events.count()
