"""Skew mitigation: salted aggregation and replicated skew join must be
semantically invisible (same results as the direct plan) while spreading
hot keys across reducers."""

from pyspark.sql import functions as F

from impresso_ta.operators.skew import (
    replicated_skew_join,
    salt_column,
    salted_agg,
)

SF = "/root/testdata/sf0.001"


def test_salt_is_deterministic_and_bounded(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    s1 = docs.select(salt_column(F.col("doc_id"), 8).alias("s")).collect()
    s2 = docs.select(salt_column(F.col("doc_id"), 8).alias("s")).collect()
    assert s1 == s2
    vals = {r["s"] for r in s1}
    assert vals <= set(range(8))
    assert len(vals) > 1  # actually spreads


def test_salted_agg_matches_direct(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    direct = {
        r["l_returnflag"]: (round(r["sq"], 2), r["n"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("sq"), F.count("l_quantity").alias("n"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (round(r["sum_qty"], 2), r["n"])
        for r in salted_agg(
            li,
            ["l_returnflag"],
            salt_source="l_orderkey",
            n_salts=8,
            sum_qty=("sum", "l_quantity"),
            n=("count", "l_quantity"),
        ).collect()
    }
    assert salted == direct


def test_salted_agg_min_max(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    direct = {
        r["l_returnflag"]: (r["lo"], r["hi"])
        for r in li.groupBy("l_returnflag")
        .agg(F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["lo"], r["hi"])
        for r in salted_agg(
            li,
            ["l_returnflag"],
            salt_source="l_orderkey",
            n_salts=8,
            lo=("min", "l_extendedprice"),
            hi=("max", "l_extendedprice"),
        ).collect()
    }
    assert salted == direct


def test_salted_agg_two_stage_plan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    out = salted_agg(
        li, ["l_returnflag"], salt_source="l_orderkey", n_salts=8,
        n=("count", "l_quantity"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2


def test_replicated_skew_join_matches_plain_join(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    part = spark.read.parquet(f"{SF}/part.parquet").select(
        F.col("p_partkey").alias("l_partkey"), "p_name"
    )
    plain = sorted(
        (r["l_orderkey"], r["l_partkey"], r["p_name"])
        for r in li.join(part, "l_partkey").collect()
    )
    skewed = sorted(
        (r["l_orderkey"], r["l_partkey"], r["p_name"])
        for r in replicated_skew_join(
            li, part, key="l_partkey", salt_source="l_orderkey", n_salts=4
        ).collect()
    )
    assert skewed == plain
