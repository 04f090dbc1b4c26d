"""Stateful streaming sessionization (applyInPandasWithState): sessions
survive across micro-batches in the state store and close exactly once."""

import json

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from impresso_ta.streaming.sessions import stream_sessionize

EVENT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", StringType()),
    ]
)


def _write_events(path, rows):
    with open(path, "w") as f:
        for user_id, ts in rows:
            f.write(json.dumps({"user_id": user_id, "ts": ts}) + "\n")


def _run(spark, drop, ckpt, out):
    """Drain the drop dir once (availableNow); the checkpoint carries the
    session state into the next call, so calling this again after adding
    a file exercises genuine cross-batch state. File sink (memory sink
    can't recover from a checkpoint)."""
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .json(str(drop))
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    )
    sessions = stream_sessionize(stream, gap="30 minutes")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", str(out))
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    return spark.read.parquet(str(out)).collect()


def test_sessions_close_across_batches(spark, tmp_path):
    drop = tmp_path / "events"
    drop.mkdir()
    ckpt = tmp_path / "ckpt"

    # run 1 (file a): open sessions for users 1 and 2 — nothing closes
    _write_events(
        drop / "a.jsonl",
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 10:10:00"),
            (2, "2024-01-01 10:05:00"),
        ],
    )
    rows = _run(spark, drop, ckpt, tmp_path / "out")
    assert [r for r in rows if r["closed_by"] == "gap"] == []

    # run 2 (file b, same checkpoint): events past the 30-min gap close
    # the sessions held in the state store since run 1
    _write_events(
        drop / "b.jsonl",
        [
            (1, "2024-01-01 12:00:00"),
            (2, "2024-01-01 12:05:00"),
        ],
    )
    rows = _run(spark, drop, ckpt, tmp_path / "out")

    gap_closed = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in rows
        if r["closed_by"] == "gap"
    }
    assert gap_closed == {
        (1, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2),
        (2, "2024-01-01 10:05:00", "2024-01-01 10:05:00", 1),
    }
    # any timeout-closed rows must be the batch-2 singleton sessions
    timeout_closed = {
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in rows
        if r["closed_by"] == "timeout"
    }
    assert timeout_closed <= {
        (1, "2024-01-01 12:00:00", 1),
        (2, "2024-01-01 12:05:00", 1),
    }


def test_in_batch_gap_split_matches_batch_session_window(spark, tmp_path):
    """A single batch containing a gap yields the same closed session the
    batch session_window operator computes."""
    drop = tmp_path / "events"
    drop.mkdir()
    ckpt = tmp_path / "ckpt"
    rows_in = [
        (7, "2024-01-01 09:00:00"),
        (7, "2024-01-01 09:20:00"),
        (7, "2024-01-01 11:00:00"),
    ]
    _write_events(drop / "a.jsonl", rows_in)
    rows = _run(spark, drop, ckpt, tmp_path / "out")
    gap_closed = [r for r in rows if r["closed_by"] == "gap"]
    assert len(gap_closed) == 1
    got = gap_closed[0]

    batch = spark.createDataFrame(
        [(u, t) for u, t in rows_in], EVENT_SCHEMA
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    want = (
        batch.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"), F.min("ts").alias("start"))
        .orderBy("start")
        .collect()[0]
    )
    assert got["session_start"] == want["start"]
    assert got["n_events"] == want["n"]


def test_stream_dedup_first_seen_across_batches(spark, tmp_path):
    import json as _json

    from impresso_ta.streaming.sessions import stream_dedup_first_seen
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("fingerprint", StringType())]
    )
    drop = tmp_path / "docs"
    drop.mkdir()
    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"

    def run():
        stream = spark.readStream.schema(schema).json(str(drop))
        q = (
            stream_dedup_first_seen(stream)
            .writeStream.format("parquet")
            .option("path", str(out))
            .outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert q.exception() is None
        return {
            (r["fingerprint"], r["doc_id"])
            for r in spark.read.parquet(str(out)).collect()
        }

    with open(drop / "a.jsonl", "w") as f:
        for doc_id, fp in [(2, "fp1"), (1, "fp1"), (3, "fp2")]:
            f.write(_json.dumps({"doc_id": doc_id, "fingerprint": fp}) + "\n")
    assert run() == {("fp1", 1), ("fp2", 3)}

    # second batch: fp1 is a cross-batch duplicate, fp3 is new
    with open(drop / "b.jsonl", "w") as f:
        for doc_id, fp in [(4, "fp1"), (5, "fp3")]:
            f.write(_json.dumps({"doc_id": doc_id, "fingerprint": fp}) + "\n")
    assert run() == {("fp1", 1), ("fp2", 3), ("fp3", 5)}

    # idempotent re-run: nothing new
    assert run() == {("fp1", 1), ("fp2", 3), ("fp3", 5)}


def test_stream_debounce_chained_across_batches(spark, tmp_path):
    import json as _json

    from impresso_ta.streaming.sessions import stream_debounce

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("event_id", LongType()),
            StructField("ts", StringType()),
        ]
    )
    drop = tmp_path / "ev"
    drop.mkdir()
    ckpt = tmp_path / "ck"

    def write(name, rows):
        with open(drop / name, "w") as f:
            for uid, eid, ts in rows:
                f.write(
                    _json.dumps(
                        {"user_id": uid, "event_id": eid, "ts": ts}
                    )
                    + "\n"
                )

    def run():
        stream = (
            spark.readStream.schema(schema)
            .json(str(drop))
            .select(
                "user_id",
                "event_id",
                F.col("ts").cast("timestamp").alias("ts"),
            )
        )
        kept = stream_debounce(stream, gap="1 hour")
        q = (
            kept.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert q.exception() is None
        return sorted(
            r.event_id
            for r in spark.read.parquet(str(tmp_path / "out")).collect()
        )

    # batch 1: chained suppression WITHIN a batch — 1 kept; 2 (+30m)
    # dropped; 3 (+50m from e1, only 20m after the DROPPED e2) also
    # dropped because the anchor is the last KEPT event (lag-based batch
    # debounce would keep judging against e2 here)
    write(
        "a.jsonl",
        [
            (1, 1, "2024-01-01 10:00:00"),
            (1, 2, "2024-01-01 10:30:00"),
            (1, 3, "2024-01-01 10:50:00"),
        ],
    )
    assert run() == [1]

    # batch 2 (same checkpoint): anchor for user 1 is still e1@10:00 in
    # the state store — 11:30 clears the 1h gap and is kept; 11:45 is
    # re-suppressed against the NEW anchor
    write(
        "b.jsonl",
        [
            (1, 4, "2024-01-01 11:30:00"),
            (1, 5, "2024-01-01 11:45:00"),
            (2, 6, "2024-01-01 11:00:00"),
        ],
    )
    assert run() == [1, 4, 6]


def test_gap_parse_rejects_unknown_units(spark):
    import pytest

    from impresso_ta.streaming.sessions import _parse_gap_us

    assert _parse_gap_us("30 seconds") == 30_000_000
    assert _parse_gap_us("1 hour") == 3_600_000_000
    assert _parse_gap_us(" 1  hour ") == 3_600_000_000  # whitespace ok
    for bad in ("1 day", "90 sec", "hour", "1.5 hours"):
        with pytest.raises(ValueError, match="second"):
            _parse_gap_us(bad)
