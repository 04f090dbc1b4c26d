"""Distributed dense linear algebra over embedding columns.

The scale pattern is the classic one-pass Gramian (Spark MLlib's
``RowMatrix.computeGramian``): each Arrow batch contributes one
``dims x dims`` partial ``X^T X`` accumulated in numpy, and only those
fixed-size partials shuffle — the reduce volume is
``n_batches * dims^2`` regardless of corpus row count, and the corpus
itself is scanned exactly once with no wide exchange.

PCA rides the Gramian: the (tiny, ``dims x dims``) matrix is collected
and eigendecomposed on the driver — constant work independent of corpus
size — then the top-k components broadcast back as literal expression
trees for a zero-shuffle projection (the same literal-vs-broadcast
trade documented in ``similarity.ivf_assign``).

Extends the reference's per-document numeric aggregations (A7 bbox
aggregation, ref text_preparation/importers/classes.py coords merging)
to the dense-embedding operations a training pipeline needs
(whitening / dimensionality reduction before ANN indexing).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

GRAM_SCHEMA = StructType(
    [
        StructField("i", IntegerType(), False),
        StructField("j", IntegerType(), False),
        StructField("partial", DoubleType(), False),
    ]
)


def gramian(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """``X^T X`` of the embedding column as (i, j, g) rows, 1-indexed —
    one corpus scan, one ``dims^2``-keyed mini-shuffle of per-batch
    partials (never a corpus-sized exchange)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            g = x.T @ x
            acc = g if acc is None else acc + g
        if acc is not None:
            d = acc.shape[0]
            ii, jj = np.meshgrid(
                np.arange(1, d + 1), np.arange(1, d + 1), indexing="ij"
            )
            yield pd.DataFrame(
                {
                    "i": ii.ravel().astype("int32"),
                    "j": jj.ravel().astype("int32"),
                    "partial": acc.ravel(),
                }
            )

    partials = df.select(vec_col).mapInPandas(fn, schema=GRAM_SCHEMA)
    return partials.groupBy("i", "j").agg(F.sum("partial").alias("g"))


def pca_components(
    df: DataFrame, vec_col: str = "embedding", k: int = 2
) -> tuple[list[list[float]], list[float]]:
    """Top-k principal directions + eigenvalues from the distributed
    Gramian (uncentered, the ANN-preprocessing convention). The
    eigendecomposition is driver-side on the ``dims x dims`` collect —
    constant cost at any corpus size. Sign-normalized (largest-|coord|
    component positive) so results are deterministic across BLAS
    builds."""
    import numpy as np

    rows = gramian(df, vec_col).collect()
    if not rows:
        raise ValueError("pca_components: empty corpus (no vectors to scan)")
    d = max(r["i"] for r in rows)
    g = np.zeros((d, d))
    for r in rows:
        g[r["i"] - 1, r["j"] - 1] = r["g"]
    vals, vecs = np.linalg.eigh(g)
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return comps, [float(vals[i]) for i in order]


def quantize_stats(
    df: DataFrame, vec_col: str = "embedding", dims: int = 64
) -> list[tuple[float, float]]:
    """Per-dimension (min, max) of the embedding column in ONE pass —
    2·dims aggregate expressions, map-side combined; the collected
    result is 2·dims floats (constant size at any corpus scale)."""
    row = df.agg(
        *[
            F.min(F.col(vec_col)[d].cast("double")).alias(f"lo{d}")
            for d in range(dims)
        ],
        *[
            F.max(F.col(vec_col)[d].cast("double")).alias(f"hi{d}")
            for d in range(dims)
        ],
    ).collect()[0]
    if row["lo0"] is None:
        raise ValueError("quantize_stats: empty corpus (no vectors to scan)")
    return [(row[f"lo{d}"], row[f"hi{d}"]) for d in range(dims)]


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    stats: Optional[list[tuple[float, float]]] = None,
    dims: int = 64,
    levels: int = 256,
    out_col: str = "codes",
) -> DataFrame:
    """Scalar (per-dimension min/max) quantization to ``levels`` codes —
    the int8 storage path that cuts an embedding store 4x vs float32
    before ANN indexing. Codes are a zero-shuffle literal expression
    (stats baked in as constants); constant dimensions map to code 0.
    Rounding is half-up to match the DuckDB oracle exactly."""
    stats = stats or quantize_stats(df, vec_col, dims)

    def code(d: int):
        lo, hi = stats[d]
        if hi == lo:
            return F.lit(0).cast("smallint")
        scaled = F.round(
            (F.col(vec_col)[d].cast("double") - F.lit(lo))
            / F.lit(hi - lo)
            * (levels - 1),
            0,
        )
        return (
            F.least(F.greatest(scaled, F.lit(0.0)), F.lit(float(levels - 1)))
            .cast("smallint")
        )

    return df.withColumn(out_col, F.array(*[code(d) for d in range(dims)]))


def dequantize_expr(
    codes_col: Column, stats: list[tuple[float, float]], levels: int = 256
) -> Column:
    """Reconstruction ``lo + code * (hi - lo) / (levels - 1)`` as a
    literal array expression over the codes column."""
    return F.array(
        *[
            F.lit(float(lo))
            + codes_col[d].cast("double")
            * F.lit((hi - lo) / (levels - 1))
            for d, (lo, hi) in enumerate(stats)
        ]
    )


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 2,
    components: Optional[list[list[float]]] = None,
) -> DataFrame:
    """Append ``pc1..pck`` projection columns — components either passed
    in (precomputed) or fitted via :func:`pca_components`; the
    projection itself is a zero-shuffle literal dot product in
    whole-stage codegen (no Python in the per-row path)."""
    comps = components or pca_components(df, vec_col, k)[0]
    out = df
    for c_idx, comp in enumerate(comps, start=1):
        expr = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(w)) for w in comp]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        out = out.withColumn(f"pc{c_idx}", F.round(expr, 6))
    return out
