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
