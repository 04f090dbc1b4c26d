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


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    n_candidates: int = 10,
    k: int = 3,
    lam_pct: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Maximal Marginal Relevance reranking (Carbonell & Goldstein 1998):
    per query, greedily select ``k`` of the top-``n_candidates``
    neighbors maximizing ``lam·relevance − (1−lam)·max-similarity-to-
    already-selected`` — the serve-time diversity pass that keeps a
    RAG/retrieval result list from being k near-copies of one document.

    Greedy selection is inherently sequential in k, which SQL window
    functions cannot express — this is the designed use of a Pandas
    cogroup: ALL float work (query→candidate relevance, candidate↔
    candidate similarity) happens JVM-side with the shared
    round-then-scale discipline, producing 1e4-scaled BIGINTs; the
    Python side does nothing but integer comparisons over a per-query
    group of ≤ n_candidates rows + n_candidates² sims, so results are
    bit-identical across engines (the DuckDB oracle unrolls the same
    greedy recurrence as chained CTEs for fixed k).

    Scale shape: candidate generation is ``cosine_topk`` (corpus
    scanned once, queries broadcast — swap in ``ivf_topk`` upstream at
    scale); the pairwise-sim self-join is per-query n_candidates² on
    the TINY candidate table; the cogroup shuffles only candidates and
    sims, both ∝ |queries|·n_candidates². Returns (query_id,
    neighbor_id, pos 1..k, mmr_score_scaled BIGINT).

    Tie-breaks: max score, then smallest neighbor id — deterministic.
    """
    import pandas as pd

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from impresso_ta.operators.similarity import cosine, cosine_topk

    scale = 10 ** round_to
    # engine pinned to "arrow": MMR rerank's query set is large by
    # contract (every query being reranked), so pair volume is
    # queries×corpus regardless of corpus size — the r13 size-router
    # only sees the corpus estimate and would route small corpora to
    # the interpreted JVM scorer (measured r12: 13.5 s expr vs ~4 s
    # arrow at sf1 for this operator's 200-query shape).
    cands = cosine_topk(
        corpus, queries, k=n_candidates, id_col=id_col, vec_col=vec_col,
        round_to=round_to, engine="arrow",
    )
    # cosine() returns NULL for zero-norm vectors by contract (degenerate
    # rows must not crash the job) and cosine_topk ranks NULLs last —
    # drop them here or int(NaN) would kill the Python greedy
    rels = cands.where(F.col("cosine").isNotNull()).select(
        "query_id",
        "neighbor_id",
        F.round(F.col("cosine") * scale).cast("long").alias("rel_s"),
    )
    withv = rels.join(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v")
        ),
        "neighbor_id",
    )
    la = withv.select(
        "query_id", F.col("neighbor_id").alias("a"), F.col("_v").alias("_va")
    ).alias("la")
    lb = withv.select(
        "query_id", F.col("neighbor_id").alias("b"), F.col("_v").alias("_vb")
    ).alias("lb")
    sims = (
        la.join(
            lb,
            (F.col("la.query_id") == F.col("lb.query_id"))
            & (F.col("la.a") != F.col("lb.b")),
        )
        .select(
            F.col("la.query_id").alias("query_id"),
            "a",
            "b",
            F.round(
                F.round(cosine(F.col("_va"), F.col("_vb")), round_to) * scale
            )
            .cast("long")
            .alias("sim_s"),
        )
        # candidates surviving the rel_s filter all have non-zero norms,
        # so their pairwise sims are non-NULL; the filter is belt-and-
        # braces against future candidate sources
        .where(F.col("sim_s").isNotNull())
    )

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("pos", IntegerType()),
            StructField("mmr_score_scaled", LongType()),
        ]
    )

    def greedy(key, rel_pdf: pd.DataFrame, sim_pdf: pd.DataFrame):
        (qid,) = key
        rel = {
            int(r.neighbor_id): int(r.rel_s)
            for r in rel_pdf.itertuples(index=False)
        }
        sim = {
            (int(r.a), int(r.b)): int(r.sim_s)
            for r in sim_pdf.itertuples(index=False)
        }
        selected: list[int] = []
        rows = []
        for pos in range(1, k + 1):
            best_id, best_sc = None, None
            for c in sorted(rel):  # ascending id = deterministic tie-break
                if c in selected:
                    continue
                if not selected:
                    sc = lam_pct * rel[c]
                else:
                    sc = lam_pct * rel[c] - (100 - lam_pct) * max(
                        sim[(c, s)] for s in selected
                    )
                if best_sc is None or sc > best_sc:
                    best_id, best_sc = c, sc
            if best_id is None:
                break
            selected.append(best_id)
            rows.append(
                {
                    "query_id": qid,
                    "neighbor_id": best_id,
                    "pos": pos,
                    "mmr_score_scaled": best_sc,
                }
            )
        return pd.DataFrame(
            rows, columns=[f.name for f in out_schema.fields]
        )

    return (
        rels.groupBy("query_id")
        .cogroup(sims.groupBy("query_id"))
        .applyInPandas(greedy, schema=out_schema)
    )
