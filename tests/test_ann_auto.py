"""ann_topk_auto tier routing: each forced tier must equal the direct
operator call row-for-row, auto picks brute at test scale, and the
n/dims sizing hints must skip the router's count()/first() driver
actions (the uncached-100TB contract)."""

import math

import pytest
from pyspark.sql import functions as F

from impresso_ta.operators import similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def split(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") >= 5)
    queries = emb.filter(F.col("vec_id") < 5)
    return corpus, queries, corpus.count()


def _rows(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in df.collect()
    )


def test_auto_picks_brute_and_matches(split):
    corpus, queries, _ = split
    assert _rows(similarity.ann_topk_auto(corpus, queries, k=3)) == _rows(
        similarity.cosine_topk(corpus, queries, k=3)
    )


def test_forced_ivf_parity(split):
    corpus, queries, n = split
    direct = similarity.ivf_topk(
        corpus, queries, nlist=max(8, n // 512), nprobe=2, k=3
    )
    routed = similarity.ann_topk_auto(corpus, queries, k=3, strategy="ivf")
    assert _rows(routed) == _rows(direct)


def test_forced_lsh_parity(split):
    corpus, queries, n = split
    bits = max(2, math.ceil(math.log2(max(2.0, n / 512))))
    direct = similarity.multiprobe_lsh_topk(
        corpus, queries, similarity.deterministic_plane_sets(2, bits, 64), k=3
    )
    routed = similarity.ann_topk_auto(corpus, queries, k=3, strategy="lsh")
    assert _rows(routed) == _rows(direct)


def test_auto_threshold_boundaries(split):
    """Tier switchpoints: n just over brute_max routes to ivf, just
    over ivf_max routes to lsh — asserted via the n hint so no data of
    that size is needed."""
    corpus, queries, n = split
    with_hint = similarity.ann_topk_auto(
        corpus, queries, k=3, n=200_000, brute_max=100_000,
        ivf_max=1_000_000, dims=64,
    )
    direct_ivf = similarity.ivf_topk(
        corpus, queries, nlist=max(8, 200_000 // 512), nprobe=2, k=3
    )
    assert _rows(with_hint) == _rows(direct_ivf)


def test_hints_skip_driver_actions(split, monkeypatch):
    """With n and dims supplied, routing must trigger NO count()/first()
    on the input frames — those are full-scan actions at corpus scale."""
    from pyspark.sql import DataFrame

    corpus, queries, n = split

    def _boom(self, *a, **kw):  # pragma: no cover - failure path
        raise AssertionError("router ran a driver action despite hints")

    monkeypatch.setattr(DataFrame, "count", _boom)
    monkeypatch.setattr(DataFrame, "first", _boom)
    routed = similarity.ann_topk_auto(
        corpus, queries, k=3, n=n, dims=64, strategy="auto",
        brute_max=1,  # force past brute so sizing math actually runs
        ivf_max=2,    # ... and past ivf into the lsh tier
    )
    monkeypatch.undo()
    bits = max(2, math.ceil(math.log2(max(2.0, n / 512))))
    direct = similarity.multiprobe_lsh_topk(
        corpus, queries, similarity.deterministic_plane_sets(2, bits, 64), k=3
    )
    assert _rows(routed) == _rows(direct)


def test_unknown_strategy_raises(split):
    corpus, queries, _ = split
    with pytest.raises(ValueError, match="strategy"):
        similarity.ann_topk_auto(corpus, queries, strategy="faiss")
