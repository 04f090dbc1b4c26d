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


def test_scd2_history_refuses_reserved_output_names(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, 1, "x")], "k long, seq long, valid_from string"
    )
    with pytest.raises(ValueError, match="valid_from"):
        scd2_history(df, ["k"], ["seq"])


def test_scd2_history_first_column_ties_zero_width(spark):
    # two versions tying on the first version column: the earlier
    # (by tiebreaker) gets a ZERO-WIDTH interval; a half-open
    # containment probe at ts=10 matches only the last of the tied run
    rows = [(1, 10, 7, "low"), (1, 10, 9, "high"), (1, 20, 1, "later")]
    df = spark.createDataFrame(rows, "k long, ts long, seq long, v string")
    hist = scd2_history(df, ["k"], ["ts", "seq"])
    by_seq = {r.seq: (r.valid_from, r.valid_to) for r in hist.collect()}
    assert by_seq == {7: (10, 10), 9: (10, 20), 1: (20, None)}
    probe = hist.where("valid_from <= 10 AND (valid_to IS NULL OR 10 < valid_to)")
    assert [r.v for r in probe.collect()] == ["high"]
