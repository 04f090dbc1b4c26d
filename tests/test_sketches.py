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


def test_heavy_hitters_arrow_matches_expr(spark):
    """Bit-parity of the fused Arrow sketch+counts pass (r12) vs the
    two-scan JVM form, on tokenizer edges (empty text -> one "" word,
    NULL text absent, kept empty tokens) and the sample corpus."""
    from impresso_ta.operators.sketches import heavy_hitter_estimates

    adv = spark.createDataFrame(
        [
            (1, ""),
            (2, "   "),
            (3, None),
            (4, "one"),
            (5, "a b c a b a \t x"),
            (6, "trailing newline\n"),
            (7, " ".join(f"w{i % 7}" for i in range(50))),
        ],
        "doc_id long, text string",
    )
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for frame in (adv, docs):
        a = sorted(
            tuple(r)
            for r in heavy_hitter_estimates(frame, engine="arrow").collect()
        )
        spark.catalog.clearCache()
        e = sorted(
            tuple(r)
            for r in heavy_hitter_estimates(frame, engine="expr").collect()
        )
        spark.catalog.clearCache()
        assert a == e
