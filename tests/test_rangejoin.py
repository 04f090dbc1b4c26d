"""Binned range join: agrees with the naive theta join and avoids the
nested-loop plan."""

from pyspark.sql import functions as F

from impresso_ta.operators.rangejoin import point_in_interval_join


def _frames(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    intervals = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    points = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    return intervals, points


def test_binned_matches_theta_join(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    intervals, points = _frames(spark)
    binned = {
        (r["event_id"], r["user_id"], r["ts"])
        for r in point_in_interval_join(
            intervals, points, key="user_id", bin_seconds=1800
        ).collect()
    }
    naive = {
        (r["event_id"], r["user_id"], r["ts"])
        for r in intervals.alias("i")
        .join(
            points.alias("p"),
            (F.col("i.user_id") == F.col("p.user_id"))
            & (F.col("p.ts") >= F.col("i.start_ts"))
            & (F.col("p.ts") < F.col("i.end_ts")),
        )
        .select("i.event_id", "i.user_id", "p.ts")
        .collect()
    }
    assert binned == naive


def test_binned_plan_is_equi_join(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    intervals, points = _frames(spark)
    out = point_in_interval_join(intervals, points, key="user_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
