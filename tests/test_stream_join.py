"""Stream-stream watermarked interval join: the streaming run drains to
exactly the batch twin's rows (same function, watermark on), the
physical plan is a StreamingSymmetricHashJoin with watermark state
eviction, and the batch plan is a key-equi join (never a BNLJ)."""

import datetime

from impresso_ta.streaming.joins import attribution_join

SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string"
T0 = datetime.datetime(2024, 1, 1, 8, 0, 0)


def _rows():
    m = datetime.timedelta(minutes=1)
    return [
        # user 1: view at 8:00 and 8:10; clicks at 8:05 (joins both
        # windows' causes: the 8:00 view), 8:35 (joins only the 8:10
        # view — 35min after the first) and 9:30 (joins nothing)
        (1, T0, 1, "view"),
        (2, T0 + 10 * m, 1, "view"),
        (3, T0 + 5 * m, 1, "click"),
        (4, T0 + 35 * m, 1, "click"),
        (5, T0 + 90 * m, 1, "click"),
        # user 2: click before any view — no match
        (6, T0 + 1 * m, 2, "click"),
        (7, T0 + 2 * m, 2, "view"),
    ]





def test_batch_twin_pairs_and_plan(spark):
    events = spark.createDataFrame(_rows(), SCHEMA)
    out = attribution_join(
        events.filter("event_type = 'view'"),
        events.filter("event_type = 'click'"),
        max_lag="30 minutes",
    )
    pairs = {(r["cause_id"], r["effect_id"]) for r in out.collect()}
    assert pairs == {(1, 3), (2, 4)}
    lag = {r["effect_id"]: r["lag_us"] for r in out.collect()}
    assert lag[3] == 5 * 60 * 1_000_000
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_streaming_drain_matches_batch_twin(spark, tmp_path):
    events = spark.createDataFrame(_rows(), SCHEMA)
    src = str(tmp_path / "events")
    events.repartition(2).write.parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    joined = attribution_join(
        stream.filter("event_type = 'view'"),
        stream.filter("event_type = 'click'"),
        max_lag="30 minutes",
        watermark="2 hours",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["cause_id"], r["effect_id"], r["lag_us"])
        for r in spark.sql("SELECT * FROM attrib_test").collect()
    }
    batch = attribution_join(
        events.filter("event_type = 'view'"),
        events.filter("event_type = 'click'"),
        max_lag="30 minutes",
    )
    want = {
        (r["cause_id"], r["effect_id"], r["lag_us"])
        for r in batch.collect()
    }
    assert got == want

    # the executed streaming plan is the symmetric hash join with
    # watermark-driven state eviction — not a batch join in disguise
    splan = q._jsq.explainInternal(True)
    assert "StreamingSymmetricHashJoin" in splan
    q.stop()


def test_streaming_left_outer_unmatched_emit_on_state_expiry(spark, tmp_path):
    """Outer rows are a state-expiry product: a never-matched cause may
    only emit its null verdict once the event-time watermark passes
    cause_ts + lag — so it appears in the trigger AFTER one whose data
    advanced the watermark, never alongside its own batch."""
    import json as _json

    src = tmp_path / "events"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def _write(name, rows):
        with open(src / name, "w") as f:
            for eid, ts, uid, et in rows:
                f.write(
                    _json.dumps(
                        {"event_id": eid, "ts": ts, "user_id": uid,
                         "event_type": et}
                    )
                    + "\n"
                )

    out = str(tmp_path / "out")

    def _drain():
        # file sink, not memory: outer-join emission spans restarts, and
        # only the file sink supports checkpoint recovery
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string"
        ).json(str(src))
        joined = attribution_join(
            stream.filter("event_type = 'view'"),
            stream.filter("event_type = 'click'"),
            max_lag="30 minutes",
            watermark="5 minutes",
            how="left_outer",
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        return spark.read.parquet(out).collect()

    # batch 1: user 1 converts, user 2 never does
    _write("a.json", [
        (1, "2024-01-01T08:00:00", 1, "view"),
        (2, "2024-01-01T08:05:00", 1, "click"),
        (3, "2024-01-01T08:01:00", 2, "view"),
    ])
    got1 = {(r["cause_id"], r["effect_id"]) for r in _drain()}
    # the match emits immediately; the unmatched view CANNOT yet (its
    # state is live — a click could still arrive)
    assert got1 == {(1, 2)}

    # batch 2: far-future events on BOTH sides push the watermark past
    # every expiry. The global watermark is the MIN across the two
    # withWatermark columns — advancing only the view side would leave
    # it pinned at the last click's time and view 3's state would never
    # expire. Eviction runs against the watermark computed at the END
    # of the previous batch, but availableNow (Spark 3.4+) appends one
    # final no-data batch that re-runs eviction with the advanced
    # watermark — so the null verdict flushes within this drain.
    _write("b.json", [
        (99, "2024-01-01T14:00:00", 9, "view"),
        (98, "2024-01-01T14:00:00", 9, "click"),
    ])
    got2 = [(r["cause_id"], r["effect_id"]) for r in _drain()]
    assert (3, None) in got2
    assert sum(1 for ce in got2 if ce == (1, 2)) == 1

    # batch 3 (checkpoint recovery): a further restart + data-bearing
    # trigger must NOT re-emit either the old match or the already
    # flushed null row.
    _write("c.json", [(100, "2024-01-01T14:01:00", 9, "view")])
    got3 = [(r["cause_id"], r["effect_id"]) for r in _drain()]
    assert sum(1 for ce in got3 if ce == (1, 2)) == 1
    assert sum(1 for ce in got3 if ce == (3, None)) == 1
