"""BM25 retrieval: hand-computed scores on a tiny fixture, ranking
semantics (idf beats raw tf), and the no-corpus-shuffle plan claim."""

import math

import pytest

from impresso_ta.operators.retrieval import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25(tf, df, n, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_hand_computed(spark):
    d = _docs(
        spark,
        [
            (1, "cat dog cat"),
            (2, "cat fish"),
            (3, "dog dog dog fish"),
            (4, "bird bird"),
        ],
    )
    out = {r["doc_id"]: r["bm25"] for r in bm25_topk(d, ["cat"], k=10).collect()}
    n, avgdl = 4.0, (3 + 2 + 4 + 2) / 4.0
    assert set(out) == {1, 2}
    assert out[1] == round(_bm25(2, 2, n, 3, avgdl), 4)
    assert out[2] == round(_bm25(1, 2, n, 2, avgdl), 4)
    assert out[1] > out[2]  # higher tf, same df


def test_bm25_rare_term_outweighs_common(spark):
    # doc 1 matches only the common term (with high tf); doc 2 matches
    # only the rare term once — rarity wins at equal length
    rows = [(i, "common word soup here") for i in range(1, 9)]
    rows += [(9, "common common common here"), (10, "rare word soup here")]
    d = _docs(spark, rows)
    out = bm25_topk(d, ["common", "rare"], k=2).collect()
    assert out[0]["doc_id"] == 10
    assert out[0]["bm25"] > out[1]["bm25"]


def test_bm25_multi_term_is_sum(spark):
    d = _docs(spark, [(1, "a b"), (2, "a a"), (3, "c c")])
    both = {r["doc_id"]: r["bm25"] for r in bm25_topk(d, ["a", "b"], k=3).collect()}
    only_a = {r["doc_id"]: r["bm25"] for r in bm25_topk(d, ["a"], k=3).collect()}
    only_b = {r["doc_id"]: r["bm25"] for r in bm25_topk(d, ["b"], k=3).collect()}
    assert both[1] == pytest.approx(only_a[1] + only_b[1], abs=2e-4)
    assert 3 not in both


def test_bm25_corpus_never_shuffled(spark):
    from tests.test_plans import _plan, _shuffles

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = bm25_topk(docs, ["dup", "query"], k=5)
    # the only exchanges allowed: the single-row stats aggregate and the
    # TakeOrdered result — neither hash-partitions the corpus
    assert _shuffles(df) == 0
    assert "BroadcastExchange" in _plan(df)
    assert "TakeOrderedAndProject" in _plan(df)


def test_bm25_empty_terms_raises(spark):
    d = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError):
        bm25_topk(d, [])


def test_hybrid_topk_properties(spark):
    from impresso_ta.operators.retrieval import bm25_topk, hybrid_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    terms = ["dup", "query", "scan"]
    hybrid = hybrid_topk(docs, terms, k_sparse=15, k_final=5).collect()
    assert len(hybrid) == 5
    # hybrid results are a subset of the sparse candidate set
    cand = {r["doc_id"] for r in bm25_topk(docs, terms, k=15).collect()}
    assert {r["doc_id"] for r in hybrid} <= cand
    # rrf is the fusion of two integer ranks → bounded and ordered
    rrfs = [r["rrf"] for r in hybrid]
    assert rrfs == sorted(rrfs, reverse=True)
    assert all(0 < v <= 2 / 61 for v in rrfs)
    # deterministic
    again = hybrid_topk(docs, terms, k_sparse=15, k_final=5).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in hybrid]


def test_mmr_rerank_diversity_and_determinism(spark):
    """On a corpus where the top relevance hits are near-clones, MMR at
    lam=50 must swap in a diverse pick that pure relevance ranks lower;
    results are partitioning-invariant (integer scores only)."""
    from pyspark.sql import functions as F

    from impresso_ta.operators.retrieval import mmr_rerank

    pad = [0.0] * 13
    a = [0.9, 0.10, 0.0] + pad   # cos(q,A)=.9937
    b = [0.9, 0.11, 0.0] + pad   # cos(q,B)=.9925, cos(A,B)=.99998 (clone)
    c = [0.7, 0.00, 0.7] + pad   # cos(q,C)=.7071, cos(A,C)=.7028 (diverse)
    corpus = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "vec_id long, embedding array<float>"
    )
    qs = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0] + pad)], "vec_id long, embedding array<float>"
    )
    out = {
        r.pos: r.neighbor_id
        for r in mmr_rerank(corpus, qs, n_candidates=3, k=3).collect()
    }
    # pure relevance would rank A, B, C; MMR demotes the clone:
    # pos2 score(B)=50*9925-50*10000<0 while score(C)=50*7071-50*7028>0
    assert out == {1: 1, 2: 3, 3: 2}
    # partitioning-invariant
    out2 = {
        r.pos: r.neighbor_id
        for r in mmr_rerank(
            corpus.repartition(7), qs, n_candidates=3, k=3
        ).collect()
    }
    assert out == out2


def test_mmr_rerank_k_exceeds_candidates(spark):
    from pyspark.sql import functions as F

    from impresso_ta.operators.retrieval import mmr_rerank

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") == 0)
    out = mmr_rerank(emb, qs, n_candidates=2, k=5).collect()
    assert sorted(r.pos for r in out) == [1, 2]  # stops when exhausted


def test_mmr_rerank_survives_zero_norm_vectors(spark):
    """Degenerate (zero-norm) embeddings produce NULL cosines by
    contract — they must be dropped, not crash the greedy with
    int(NaN)."""
    from pyspark.sql import functions as F

    from impresso_ta.operators.retrieval import mmr_rerank

    pad = [0.0] * 13
    corpus = spark.createDataFrame(
        [(1, [0.9, 0.1, 0.0] + pad), (2, [0.0] * 16), (3, [0.7, 0.0, 0.7] + pad)],
        "vec_id long, embedding array<float>",
    )
    qs = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0] + pad), (101, [0.0] * 16)],
        "vec_id long, embedding array<float>",
    )
    out = mmr_rerank(corpus, qs, n_candidates=3, k=3).collect()
    # query 100 ranks the two non-degenerate docs; the zero-norm corpus
    # row and the zero-norm query contribute nothing and nothing crashes
    got = {(r.query_id, r.pos): r.neighbor_id for r in out}
    assert got == {(100, 1): 1, (100, 2): 3}
