"""Scalar embedding quantization: bounds, error ceiling, constant-dim
handling, zero-shuffle codes."""

from pyspark.sql import functions as F

from impresso_ta.operators.linalg import (
    dequantize_expr,
    quantize_embeddings,
    quantize_stats,
)


def _emb(spark):
    rows = [
        (i, [((i * 7 + d * 3) % 23) / 23.0 - 0.5 for d in range(6)] + [0.25])
        for i in range(30)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_quantize_stats_min_max(spark):
    e = _emb(spark)
    stats = quantize_stats(e, dims=7)
    import numpy as np

    x = np.array([r["embedding"] for r in e.collect()], dtype=np.float64)
    for d, (lo, hi) in enumerate(stats):
        assert abs(lo - x[:, d].min()) < 1e-7
        assert abs(hi - x[:, d].max()) < 1e-7


def test_quantize_roundtrip_error_bounded(spark):
    e = _emb(spark)
    stats = quantize_stats(e, dims=7)
    qdf = quantize_embeddings(e, stats=stats, dims=7)
    deq = qdf.select(
        "vec_id",
        "embedding",
        dequantize_expr(F.col("codes"), stats).alias("dv"),
        "codes",
    )
    for r in deq.collect():
        for d in range(7):
            lo, hi = stats[d]
            assert 0 <= r["codes"][d] <= 255
            # half-a-step reconstruction bound
            assert abs(r["embedding"][d] - r["dv"][d]) <= (hi - lo) / 510 + 1e-9


def test_quantize_constant_dim_is_exact(spark):
    e = _emb(spark)  # dim 6 is constant 0.25
    stats = quantize_stats(e, dims=7)
    assert stats[6][0] == stats[6][1]
    qdf = quantize_embeddings(e, stats=stats, dims=7)
    row = qdf.select(
        dequantize_expr(F.col("codes"), stats).alias("dv"), "codes"
    ).first()
    assert row["codes"][6] == 0
    assert abs(row["dv"][6] - 0.25) < 1e-7


def test_quantize_codes_zero_shuffle(spark):
    e = _emb(spark)
    stats = quantize_stats(e, dims=7)
    qdf = quantize_embeddings(e, stats=stats, dims=7)
    plan = qdf._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
