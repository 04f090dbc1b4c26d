"""Streaming latest-wins CDC materialization (streaming/cdc.py): the
emitted upsert changelog, replayed, must equal the batch
``latest_snapshot`` of the full log — across micro-batches, with
tombstones, out-of-order late rows, and idempotent re-runs."""

import json

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from impresso_ta.operators.cdc import latest_snapshot
from impresso_ta.streaming.cdc import stream_latest_wins

SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("seq", LongType()),
        StructField("payload", StringType()),
        StructField("op", StringType()),
    ]
)

BATCH_1 = [
    (1, 1, "a", "upsert"),
    (1, 3, "c", "upsert"),  # same-batch winner
    (2, 1, "x", "upsert"),
    (3, 5, "only", "upsert"),
]
BATCH_2 = [
    (1, 2, "b-late", "upsert"),  # LATE: lower seq than stored 3 — no emit
    (2, 2, None, "delete"),      # tombstone wins key 2
    (4, 1, "new", "upsert"),
]


def _write(drop, name, rows):
    with open(drop / name, "w") as f:
        for k, seq, payload, op in rows:
            f.write(
                json.dumps(
                    {"k": k, "seq": seq, "payload": payload, "op": op}
                )
                + "\n"
            )


def _replay(upserts):
    # apply the changelog: last emission per key wins, tombstones drop
    snap = {}
    for r in sorted(upserts, key=lambda r: r["seq"]):
        if r["deleted"]:
            snap.pop(r["key"], None)
        else:
            snap[r["key"]] = (r["seq"], r["payload"])
    return snap


def test_stream_latest_wins_matches_batch_snapshot(spark, tmp_path):
    drop = tmp_path / "log"
    drop.mkdir()
    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"

    def run():
        stream = spark.readStream.schema(SCHEMA).json(str(drop))
        q = (
            stream_latest_wins(
                stream, key_col="k", seq_col="seq",
                payload_col="payload", op_col="op",
            )
            .writeStream.format("parquet")
            .option("path", str(out))
            .outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert q.exception() is None
        return [r.asDict() for r in spark.read.parquet(str(out)).collect()]

    _write(drop, "b1.jsonl", BATCH_1)
    ups = run()
    # key 1 emitted ONCE per batch with the batch winner, not per row
    assert {(r["key"], r["seq"]) for r in ups} == {(1, 3), (2, 1), (3, 5)}

    _write(drop, "b2.jsonl", BATCH_2)
    ups = run()
    # late (1,2) emitted nothing; tombstone emitted with deleted=True
    emitted = {(r["key"], r["seq"], r["deleted"]) for r in ups}
    assert (1, 3, False) in emitted and (2, 2, True) in emitted
    assert (4, 1, False) in emitted and (1, 2, False) not in emitted

    # idempotent re-run: no new emissions
    assert len(run()) == len(ups)

    # replayed changelog == batch latest_snapshot over the full log
    full = spark.createDataFrame(BATCH_1 + BATCH_2, SCHEMA)
    batch = {
        r.k: (r.seq, r.payload)
        for r in latest_snapshot(
            full, ["k"], ["seq"], op_col="op"
        ).collect()
    }
    assert _replay(ups) == batch == {1: (3, "c"), 3: (5, "only"), 4: (1, "new")}


def test_stream_latest_wins_drops_null_seq_rows(spark, tmp_path):
    """A malformed row (null/non-castable seq) must be dropped, not
    become a checkpoint-replayed poison pill."""
    drop = tmp_path / "log2"
    drop.mkdir()
    ckpt = tmp_path / "ckpt2"
    out = tmp_path / "out2"
    _write(drop, "b.jsonl", [(1, None, "bad", "upsert"), (1, 7, "ok", "upsert"),
                             (None, 3, "nokey", "upsert")])
    stream = spark.readStream.schema(SCHEMA).json(str(drop))
    q = (
        stream_latest_wins(stream, key_col="k", seq_col="seq",
                           payload_col="payload", op_col="op")
        .writeStream.format("parquet")
        .option("path", str(out))
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    rows = spark.read.parquet(str(out)).collect()
    assert [(r.key, r.seq, r.payload) for r in rows] == [(1, 7, "ok")]


TS_SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("seq", LongType()),
        StructField("payload", StringType()),
        StructField("op", StringType()),
        StructField("ts", StringType()),
    ]
)


def _write_ts(drop, name, rows):
    with open(drop / name, "w") as f:
        for k, seq, payload, op, ts in rows:
            f.write(
                json.dumps(
                    {"k": k, "seq": seq, "payload": payload, "op": op,
                     "ts": ts}
                )
                + "\n"
            )


def test_stream_latest_wins_tombstone_ttl_ages_out(spark, tmp_path):
    """Opt-in tombstone TTL: a tombstone past the retention horizon is
    GC'd from state, after which a late lower-seq row is ACCEPTED as a
    fresh winner (the documented resurrection trade); within the
    horizon the tombstone still suppresses late rows."""
    drop = tmp_path / "ttl_log"
    drop.mkdir()
    ckpt = tmp_path / "ttl_ckpt"
    out = tmp_path / "ttl_out"

    def run():
        stream = spark.readStream.schema(TS_SCHEMA).json(str(drop))
        q = (
            stream_latest_wins(
                stream, key_col="k", seq_col="seq",
                payload_col="payload", op_col="op",
                ts_col="ts", tombstone_ttl="10 seconds",
            )
            .writeStream.format("parquet")
            .option("path", str(out))
            .outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert q.exception() is None
        return [r.asDict() for r in spark.read.parquet(str(out)).collect()]

    # batch A: key 2 lives then dies (tombstone at 10:00:05)
    _write_ts(drop, "a.jsonl", [
        (2, 1, "x", "upsert", "2024-01-01 10:00:00"),
        (2, 2, None, "delete", "2024-01-01 10:00:05"),
        (9, 1, "keep", "upsert", "2024-01-01 10:00:00"),
    ])
    ups = run()
    assert (2, 2, True) in {(r["key"], r["seq"], r["deleted"]) for r in ups}

    # batch B: within the horizon a late lower-seq row is SUPPRESSED
    # (watermark after A = 10:00:05 - 10s; the tombstone still holds);
    # also advances the watermark past 10:00:05 + ttl = 10:00:15
    _write_ts(drop, "b.jsonl", [
        (2, 1, "late-suppressed", "upsert", "2024-01-01 10:00:04"),
        (9, 2, "tick", "upsert", "2024-01-01 10:01:00"),
    ])
    ups = run()
    assert (2, 1) not in {(r["key"], r["seq"]) for r in ups}

    # batch C: the timeout fires (watermark 10:01:00 - 10s > 10:00:15)
    # -> tombstone state removed; GC emits nothing for key 2
    _write_ts(drop, "c.jsonl", [
        (9, 3, "tick2", "upsert", "2024-01-01 10:02:00"),
    ])
    n_after_b = len(run())

    # batch D: past the horizon a lower-seq row RESURRECTS the key —
    # the documented trade of bounding tombstone state
    _write_ts(drop, "d.jsonl", [
        (2, 1, "resurrected", "upsert", "2024-01-01 10:02:30"),
    ])
    ups = run()
    assert len(ups) == n_after_b + 1
    last_key2 = max(
        (r for r in ups if r["key"] == 2), key=lambda r: not r["deleted"]
    )
    assert (last_key2["seq"], last_key2["payload"], last_key2["deleted"]) == (
        1, "resurrected", False,
    )


def test_stream_latest_wins_ttl_non_utc_session(spark, tmp_path):
    """The TTL horizon must be timezone-immune: the anchor is computed
    in the PLAN (unix_millis — true epoch), not from the
    session-localized timestamp the pandas worker receives. Under a
    non-UTC session the old worker-side conversion shifted every
    horizon by the UTC offset (tombstones aged 5h late under
    America/New_York), so this replays the ageing scenario with the
    session timezone moved off UTC."""
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        drop = tmp_path / "tz_log"
        drop.mkdir()
        ckpt = tmp_path / "tz_ckpt"
        out = tmp_path / "tz_out"

        def run():
            stream = spark.readStream.schema(TS_SCHEMA).json(str(drop))
            q = (
                stream_latest_wins(
                    stream, key_col="k", seq_col="seq",
                    payload_col="payload", op_col="op",
                    ts_col="ts", tombstone_ttl="10 seconds",
                )
                .writeStream.format("parquet")
                .option("path", str(out))
                .outputMode("append")
                .option("checkpointLocation", str(ckpt))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            assert q.exception() is None
            return [
                r.asDict() for r in spark.read.parquet(str(out)).collect()
            ]

        _write_ts(drop, "a.jsonl", [
            (2, 2, None, "delete", "2024-01-01 10:00:05"),
            (9, 1, "keep", "upsert", "2024-01-01 10:00:00"),
        ])
        ups = run()
        assert (2, 2, True) in {
            (r["key"], r["seq"], r["deleted"]) for r in ups
        }

        # advance the watermark far past 10:00:05 + ttl, then fire GC
        _write_ts(drop, "b.jsonl", [
            (9, 2, "tick", "upsert", "2024-01-01 10:01:00"),
        ])
        run()
        _write_ts(drop, "c.jsonl", [
            (9, 3, "tick2", "upsert", "2024-01-01 10:02:00"),
        ])
        run()

        # past the horizon the tombstone is gone: a lower-seq row
        # resurrects the key — under the buggy worker-side conversion
        # the horizon sat 5h out and this row stayed suppressed
        _write_ts(drop, "d.jsonl", [
            (2, 1, "resurrected", "upsert", "2024-01-01 10:02:30"),
        ])
        ups = run()
        key2_live = [
            r for r in ups if r["key"] == 2 and not r["deleted"]
        ]
        assert [(r["seq"], r["payload"]) for r in key2_live] == [
            (1, "resurrected")
        ]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_stream_latest_wins_ttl_requires_ts_col(spark, tmp_path):
    import pytest

    d = tmp_path / "empty_log"
    d.mkdir()
    df = spark.readStream.schema(TS_SCHEMA).json(str(d))
    with pytest.raises(ValueError, match="ts_col"):
        stream_latest_wins(df, key_col="k", seq_col="seq",
                           payload_col="payload", tombstone_ttl="10 seconds")
