"""Distributed Gramian + PCA: numpy ground truth, partition
invariance, zero-shuffle projection."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from impresso_ta.operators.linalg import gramian, pca_components, pca_project


@pytest.fixture(scope="module")
def vecs(spark):
    rng = [
        [((i * 7 + d * 3) % 19) / 19.0 - 0.5 for d in range(5)]
        for i in range(40)
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rng)],
        "vec_id long, embedding array<float>",
    )
    return df, np.array(rng, dtype=np.float32).astype(np.float64)


def test_gramian_matches_numpy(vecs):
    df, x = vecs
    g = {(r["i"], r["j"]): r["g"] for r in gramian(df).collect()}
    expect = x.T @ x
    assert len(g) == 25
    for (i, j), v in g.items():
        assert abs(v - expect[i - 1, j - 1]) < 1e-9


def test_gramian_partition_invariant(vecs):
    """The per-batch partial accumulation must give the same answer for
    any partitioning of the rows."""
    df, _ = vecs
    a = {(r["i"], r["j"]): round(r["g"], 9) for r in gramian(df).collect()}
    b = {
        (r["i"], r["j"]): round(r["g"], 9)
        for r in gramian(df.repartition(7)).collect()
    }
    assert a == b


def test_pca_components_match_numpy_eigh(vecs):
    df, x = vecs
    comps, vals = pca_components(df, k=2)
    g = x.T @ x
    evals, evecs = np.linalg.eigh(g)
    order = np.argsort(evals)[::-1][:2]
    assert vals[0] >= vals[1] > 0
    for got, idx in zip(comps, order):
        v = evecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        assert np.allclose(got, v, atol=1e-6)
        assert abs(np.linalg.norm(got) - 1.0) < 1e-6


def test_pca_project_zero_shuffle_and_values(vecs):
    df, x = vecs
    comps, _ = pca_components(df, k=2)
    out = pca_project(df, k=2, components=comps)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan  # literal dot product
    rows = {r["vec_id"]: (r["pc1"], r["pc2"]) for r in out.collect()}
    expect = x @ np.array(comps).T
    for i, (p1, p2) in rows.items():
        assert abs(p1 - round(float(expect[i, 0]), 6)) < 1e-4
        assert abs(p2 - round(float(expect[i, 1]), 6)) < 1e-4
