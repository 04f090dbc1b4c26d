"""Sketch accuracy: approx_count_distinct (HLL++) stays within its
configured relative error of the exact count — the one-pass mergeable
scale path for the exact countDistinct oracles."""

from pyspark.sql import functions as F


def test_hll_within_relative_error(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = d.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
    )
    exact = toks.select(F.countDistinct("w").alias("n")).collect()[0]["n"]
    approx = toks.select(
        F.approx_count_distinct("w", rsd=0.02).alias("n")
    ).collect()[0]["n"]
    assert abs(approx - exact) / exact < 0.06  # 3σ of rsd=0.02


def test_count_min_never_underestimates_and_is_exact_when_wide(spark):
    from impresso_ta.operators.sketches import heavy_hitter_estimates

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = heavy_hitter_estimates(docs, d=4, w=256, top_k=15).collect()
    assert len(rows) == 15
    for r in rows:
        # the CM guarantee
        assert r["cm_estimate"] >= r["tf"], r["word"]
    # a very wide sketch has no collisions on this vocabulary → exact
    wide = heavy_hitter_estimates(docs, d=4, w=65536, top_k=15).collect()
    assert all(r["cm_estimate"] == r["tf"] for r in wide)
