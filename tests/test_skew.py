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


def test_topn_per_key_salted_matches_plain_window(spark):
    """Exact parity with the single-window form on a skewed key
    distribution (one hot key holding most rows), any n/salts."""
    from pyspark.sql.window import Window

    from impresso_ta.operators.skew import topn_per_key_salted

    rows = [("hot", i) for i in range(500)] + [
        (f"k{i % 7}", 1000 + i) for i in range(70)
    ]
    df = spark.createDataFrame(rows, "domain string, doc_id long")
    w = Window.partitionBy("domain").orderBy("doc_id")
    plain = sorted(
        (r["domain"], r["doc_id"], r["rank"])
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .collect()
    )
    for n_salts in (1, 4, 16):
        got = sorted(
            (r["domain"], r["doc_id"], r["rank"])
            for r in topn_per_key_salted(
                df, ["domain"], "doc_id", n=5, n_salts=n_salts
            ).collect()
        )
        assert got == plain
    # descending order too
    got_desc = {
        (r["domain"], r["rank"]): r["doc_id"]
        for r in topn_per_key_salted(
            df, ["domain"], "doc_id", n=1, ascending=False
        ).collect()
    }
    assert got_desc[("hot", 1)] == 499


def test_topn_per_key_salted_plan_spreads_hot_key(spark):
    """Stage 1's window must partition by (key, salt) — the plan proof
    that a hot key never lands on one task before the n*salts-bounded
    final window.

    Counts Window NODES (``"Window ["``), not the substring ``Window``:
    Spark's rank-limit pushdown inserts a ``WindowGroupLimit`` node under
    each window (a per-partition pre-limit — desirable, and orthogonal to
    the salting), which a bare substring count would miscount."""
    import re

    from impresso_ta.operators.skew import topn_per_key_salted

    df = spark.createDataFrame(
        [("a", i) for i in range(10)], "domain string, doc_id long"
    )
    plan = (
        topn_per_key_salted(df, ["domain"], "doc_id", n=3)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # partition specs of the Window nodes, outermost first:
    # Window [<exprs>], [<partition spec>], [<order spec>]
    specs = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\], \[", plan)
    assert len(specs) == 2, plan
    outer, inner = specs
    assert "_salt" in inner and "domain" in inner  # stage 1: (key, salt)
    assert "_salt" not in outer and "domain" in outer  # stage 2: key only
