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


def test_interval_overlap_matches_theta_join(spark):
    from impresso_ta.operators.rangejoin import interval_overlap_join

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    left = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("l_id"), "user_id",
        F.col("ts").alias("l_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("l_end"),
    )
    right = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("r_id"), "user_id",
        F.col("ts").alias("r_start"),
        (F.col("ts") + F.expr("INTERVAL 45 MINUTES")).alias("r_end"),
    )
    binned = {
        (r["l_id"], r["r_id"])
        for r in interval_overlap_join(
            left, right, key="user_id", bin_seconds=1800
        ).collect()
    }
    naive = {
        (r["l_id"], r["r_id"])
        for r in left.alias("a")
        .join(
            right.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.l_start") < F.col("b.r_end"))
            & (F.col("b.r_start") < F.col("a.l_end")),
        )
        .select("a.l_id", "b.r_id")
        .collect()
    }
    assert binned == naive and len(binned) > 0
    # exactly-once: no pair duplicated across shared bins
    rows = interval_overlap_join(
        left, right, key="user_id", bin_seconds=600
    ).select("l_id", "r_id").collect()
    assert len(rows) == len({(r["l_id"], r["r_id"]) for r in rows})


def test_interval_overlap_plan_is_equi_join(spark):
    from impresso_ta.operators.rangejoin import interval_overlap_join

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    left = ev.limit(10).select(
        "user_id", F.col("ts").alias("l_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("l_end"),
    )
    right = ev.limit(10).select(
        "user_id", F.col("ts").alias("r_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("r_end"),
    )
    out = interval_overlap_join(left, right, key="user_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
