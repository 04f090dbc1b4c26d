"""Ranked keyword retrieval (BM25) — the sparse sibling of the dense
ANN operators in `similarity.py`.

Generalizes the inverted-index shape (SURVEY SET4, ref
olive/helpers.py:704-724) into scoring: given a handful of query
terms, rank documents by Okapi BM25 (Lucene's idf variant:
ln((N - df + 0.5)/(df + 0.5) + 1), never negative).

Plan shape — built to never shuffle the corpus:

1. per-doc term frequencies and document length are pure array
   projections over the tokenized text (`size(filter(words, = term))`)
   — no explode, no shuffle, whole-stage codegen;
2. corpus stats (N, avgdl, per-term df) are ONE single-row aggregate,
   broadcast back via crossJoin — the only exchange carries partial
   aggregates (bytes per task);
3. scoring is a projection over (tf_i, dl) × the broadcast stats;
4. top-k is orderBy+limit, which Spark executes as TakeOrdered
   (map-side per-partition top-k, k rows per task to the driver) —
   never a global sort.

Scores are ranked on their 4-decimal rounding with doc_id as the final
tie-break, so the top-k set is engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tf(words: Column, term: str) -> Column:
    # factory keeps the lambda's capture explicit (pyspark higher-order
    # lambdas mis-bind loop variables through default args)
    return F.size(F.filter(words, lambda x: x == F.lit(term)))


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under Okapi BM25."""
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    per = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).cast("long").alias("dl"),
        *[
            _tf(words, term).cast("long").alias(f"tf_{i}")
            for i, term in enumerate(terms)
        ],
    )
    stats = per.agg(
        F.count("*").cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long"))
            .cast("double")
            .alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = per.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    matched = F.lit(False)
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        df = F.col(f"df_{i}")
        idf = F.log((F.col("n") - df + 0.5) / (df + 0.5) + 1.0)
        norm = tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        score = score + idf * tf * (k1 + 1.0) / norm
        matched = matched | (F.col(f"tf_{i}") > 0)
    return (
        scored.filter(matched)
        .select("doc_id", "dl", F.round(score, round_to).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )


def hashed_query_vector(terms: list[str], dim: int = 64) -> list[float]:
    """The query's feature-hashed vector, computed driver-side with the
    IDENTICAL md5-bucket + L2 + round(…, 6) arithmetic as
    ``text_analysis.hashed_doc_vectors`` — a tiny literal, so the dense
    leg needs no extra Spark job for the query side."""
    import hashlib
    import math
    from collections import Counter

    if not terms:
        raise ValueError("terms must be non-empty")
    c = Counter(
        int(hashlib.md5(t.encode()).hexdigest()[:12], 16) % dim
        for t in terms
    )
    nrm = math.sqrt(sum(v * v for v in c.values()))
    return [round(c.get(i, 0) / nrm, 6) for i in range(dim)]


def hybrid_topk(
    docs: DataFrame,
    terms: list[str],
    k_sparse: int = 20,
    k_final: int = 10,
    dim: int = 64,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hybrid search: BM25 candidate generation re-ranked by dense
    cosine over feature-hashed vectors, fused with reciprocal-rank
    fusion (RRF, Cormack et al. 2009): score = Σ 1/(rrf_k + rank_leg).
    Rank fusion needs no weight tuning and is integer-deterministic —
    engine-portable by construction.

    Plan: the sparse leg is :func:`bm25_topk` (corpus never shuffled);
    the dense leg computes vectors ONLY for the k_sparse candidates
    (semi-join, then the vocabulary-sized vector build); the query
    vector is a driver-side literal. Everything after candidate
    generation touches k_sparse rows.
    """
    from impresso_ta.operators.similarity import cosine
    from impresso_ta.operators.text_analysis import hashed_doc_vectors
    from pyspark.sql.window import Window

    sparse = bm25_topk(
        docs, terms, k=k_sparse, id_col=id_col, text_col=text_col
    ).select("doc_id", "bm25")
    cand_docs = docs.join(
        sparse.select(F.col("doc_id").alias(id_col)), id_col, "left_semi"
    )
    qv = F.lit(hashed_query_vector(terms, dim))
    dense = hashed_doc_vectors(
        cand_docs, id_col=id_col, text_col=text_col, dim=dim
    ).select(
        "doc_id", F.round(cosine(qv, F.col("vector")), 4).alias("cosine")
    )
    merged = sparse.join(dense, "doc_id")
    w_s = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    w_d = Window.orderBy(F.desc("cosine"), F.asc("doc_id"))
    ranked = merged.select(
        "doc_id",
        "bm25",
        "cosine",
        F.row_number().over(w_s).alias("rank_sparse"),
        F.row_number().over(w_d).alias("rank_dense"),
    )
    rrf = F.round(
        1.0 / (rrf_k + F.col("rank_sparse"))
        + 1.0 / (rrf_k + F.col("rank_dense")),
        9,
    )
    return (
        ranked.select(
            "doc_id", "bm25", "cosine", rrf.alias("rrf"),
        )
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(k_final)
    )
