"""Bit-parity tests for the Arrow brute-cosine fast path (round 12):
the scored frame — and every consumer's final output — must equal the
JVM expression form double-for-double, including NULL (zero-norm /
NULL-vector / NULL-element) and NaN propagation and the label
three-valued logic."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from impresso_ta.operators import similarity
from impresso_ta.operators.cosine_arrow import brute_scored_arrow


VECS = [
    # (vec_id, embedding, label)
    (0, [1.0, 0.0, 0.5, -0.25], "a"),
    (1, [0.9, 0.1, 0.4, -0.2], "a"),
    (2, [-1.0, 2.0, 0.0, 3.0], "b"),
    (3, [0.0, 0.0, 0.0, 0.0], "b"),          # zero norm -> NULL cosine
    (4, None, "a"),                           # NULL vector
    (5, [1.0, None, 2.0, 3.0], "b"),          # NULL element
    (6, [float("nan"), 1.0, 1.0, 1.0], "a"),  # NaN propagates
    (7, [0.3333333333333333, 0.1, 0.2, 0.7], None),  # NULL label
    (8, [1e-200, 1e-200, 1e-200, 1e-200], "b"),      # tiny norms
    (9, [1.0, 1.0, 1.0, 1.0], "b"),
    (10, [0.123449999, 0.5, -0.5, 0.25], "a"),
    (11, [1e200, 1e200, 1e200, 1e200], "a"),  # norm product overflows
]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        VECS, "vec_id long, embedding array<double>, label string"
    )


def _rows(df, cols):
    def key(r):
        return tuple(str(r[c]) for c in cols)

    out = []
    for r in df.collect():
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                vals.append(v.hex() if not math.isnan(v) else "nan")
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def test_scored_frame_parity(spark, emb):
    queries = emb.filter(F.col("vec_id") % 3 == 0)
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("_qlabel"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.col("label").alias("_clabel"),
    )
    jvm = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        (F.col("_clabel") == F.col("_qlabel")).alias("_same"),
        F.round(
            similarity.cosine(F.col("qv"), F.col("cv")), 4
        ).alias("cosine"),
    )
    arrow = brute_scored_arrow(
        emb, queries, label_col="label", round_to=4
    )
    cols = ["query_id", "neighbor_id", "_same", "cosine"]
    assert _rows(jvm, cols) == _rows(arrow, cols)


def test_cosine_topk_parity(emb):
    queries = emb.filter(F.col("vec_id") % 3 == 0)
    cols = ["query_id", "neighbor_id", "cosine", "rank"]
    a = similarity.cosine_topk(emb, queries, k=3, engine="expr")
    b = similarity.cosine_topk(emb, queries, k=3, engine="arrow")
    assert _rows(a, cols) == _rows(b, cols)


def test_hard_negatives_parity(emb):
    queries = emb.filter(F.col("vec_id") % 3 == 0)
    cols = ["query_id", "neighbor_id", "cosine", "rank"]
    a = similarity.hard_negatives(emb, queries, k=2, engine="expr")
    b = similarity.hard_negatives(emb, queries, k=2, engine="arrow")
    assert _rows(a, cols) == _rows(b, cols)


@pytest.mark.parametrize("semi", [False, True])
def test_training_triplets_parity(emb, semi):
    queries = emb.filter(F.col("vec_id") % 3 == 0)
    cols = [
        "anchor_id", "positive_id", "negative_id",
        "pos_cos", "neg_cos", "margin",
    ]
    a = similarity.training_triplets(
        emb, queries, k_pos=2, k_neg=2, semi_hard=semi, engine="expr"
    )
    b = similarity.training_triplets(
        emb, queries, k_pos=2, k_neg=2, semi_hard=semi, engine="arrow"
    )
    assert _rows(a, cols) == _rows(b, cols)


def test_sf0001_end_to_end_parity(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    cols = ["query_id", "neighbor_id", "cosine", "rank"]
    a = similarity.cosine_topk(emb, queries, k=5, engine="expr")
    b = similarity.cosine_topk(emb, queries, k=5, engine="arrow")
    assert _rows(a, cols) == _rows(b, cols)
    a = similarity.hard_negatives(emb, queries, k=3, engine="expr")
    b = similarity.hard_negatives(emb, queries, k=3, engine="arrow")
    assert _rows(a, cols) == _rows(b, cols)
