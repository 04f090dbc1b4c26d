"""CDC materialization (operators/cdc.py): latest-wins snapshot and
SCD2 history."""

from pyspark.sql import functions as F

from impresso_ta.operators.cdc import latest_snapshot, scd2_history


def _log(spark):
    rows = [
        # key, seq, op, payload
        (1, 1, "upsert", "a"),
        (1, 2, "upsert", "b"),
        (1, 3, "upsert", "c"),
        (2, 1, "upsert", "x"),
        (2, 2, "delete", None),
        (3, 5, "upsert", "only"),
    ]
    return spark.createDataFrame(
        rows, "k long, seq long, op string, payload string"
    )


def test_latest_snapshot_picks_highest_version(spark):
    got = {
        r.k: (r.seq, r.payload)
        for r in latest_snapshot(_log(spark), ["k"], ["seq"]).collect()
    }
    assert got == {1: (3, "c"), 2: (2, None), 3: (5, "only")}


def test_latest_snapshot_applies_tombstones(spark):
    got = {
        r.k: r.payload
        for r in latest_snapshot(
            _log(spark), ["k"], ["seq"], op_col="op"
        ).collect()
    }
    # key 2's winning row is a delete → key gone entirely
    assert got == {1: "c", 3: "only"}


def test_latest_snapshot_tie_break_deterministic(spark):
    rows = [(1, 10, 7, "low"), (1, 10, 9, "high")]
    df = spark.createDataFrame(rows, "k long, ts long, seq long, v string")
    a = latest_snapshot(df, ["k"], ["ts", "seq"]).collect()
    b = latest_snapshot(df.repartition(5), ["k"], ["ts", "seq"]).collect()
    assert a == b and a[0].v == "high"


def test_scd2_history_intervals_chain(spark):
    hist = scd2_history(_log(spark), ["k"], ["seq"]).orderBy("k", "seq")
    rows = hist.collect()
    k1 = [r for r in rows if r.k == 1]
    assert [(r.valid_from, r.valid_to, r.is_current) for r in k1] == [
        (1, 2, False),
        (2, 3, False),
        (3, None, True),
    ]
    # exactly one current row per key
    cur = hist.where("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)
    # intervals are contiguous: valid_to of version i == valid_from of i+1
    assert [r.valid_to for r in k1[:-1]] == [r.valid_from for r in k1[1:]]
