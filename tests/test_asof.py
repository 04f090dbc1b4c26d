"""As-of join edge cases: equal timestamps (same-instant state visible),
no prior right row (null), state carried across multiple left rows."""

import datetime

from impresso_ta.operators.asof import asof_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 09:00:00")),   # before any right → null
            (2, 10, _ts("2024-01-01 10:00:00")),   # equal ts → sees 5.0
            (3, 10, _ts("2024-01-01 10:30:00")),   # carries 5.0
            (4, 10, _ts("2024-01-01 11:30:00")),   # after update → 7.0
            (5, 20, _ts("2024-01-01 12:00:00")),   # other key → null
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 10:00:00"), 5.0),
            (10, _ts("2024-01-01 11:00:00"), 7.0),
            (30, _ts("2024-01-01 08:00:00"), 9.0),  # key with no lefts
        ],
        "user_id long, ts timestamp, value double",
    )
    got = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(left, right, key="user_id").collect()
    }
    assert got == {1: None, 2: 5.0, 3: 5.0, 4: 7.0, 5: None}


def test_asof_join_null_right_value(spark):
    """A right row with a NULL value is still the match (native ASOF JOIN
    returns that row's NULL) — it must not be skipped in favor of the
    previous non-null state."""
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:30:00")),  # after 5.0 → 5.0
            (2, 10, _ts("2024-01-01 11:30:00")),  # after NULL row → None
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 10:00:00"), 5.0),
            (10, _ts("2024-01-01 11:00:00"), None),
        ],
        "user_id long, ts timestamp, value double",
    )
    got = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(left, right, key="user_id").collect()
    }
    assert got == {1: 5.0, 2: None}


def test_asof_forward_edges(spark):
    from impresso_ta.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 35, "c"), (2, 5, "d")],
        "user_id long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 20, 200.0), (1, 30, 300.0)],
        "user_id long, ts long, value double",
    )
    out = {
        r["tag"]: r["asof_value"]
        for r in asof_join_forward(
            left, right, key="user_id", value_col="value"
        ).collect()
    }
    assert out["a"] == 200.0       # earliest later row
    assert out["b"] == 200.0       # same-instant right row matches
    assert out["c"] is None        # nothing later
    assert out["d"] is None        # key has no right rows


def test_asof_forward_backward_duality(spark):
    """forward(ts) == backward(-ts): the two directions are mirrors."""
    from impresso_ta.operators.asof import asof_join, asof_join_forward

    left = spark.createDataFrame(
        [(1, t, f"L{t}") for t in (5, 10, 15, 25)],
        "user_id long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 8, 80.0), (1, 15, 150.0), (1, 30, 300.0)],
        "user_id long, ts long, value double",
    )
    fwd = {
        r["tag"]: r["asof_value"]
        for r in asof_join_forward(
            left, right, key="user_id", value_col="value"
        ).collect()
    }
    from pyspark.sql import functions as F

    neg = lambda df: df.withColumn("ts", -F.col("ts"))
    bwd_mirror = {
        r["tag"]: r["asof_value"]
        for r in asof_join(
            neg(left), neg(right), key="user_id", value_col="value"
        ).collect()
    }
    assert fwd == bwd_mirror
    assert fwd == {"L5": 80.0, "L10": 150.0, "L15": 150.0, "L25": 300.0}
