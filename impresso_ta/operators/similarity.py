"""Similarity search over embedding columns (``array<float>``).

Generalizes the reference's fuzzy candidate search (SURVEY X11,
ref: fedgaz/classes.py:242-345) to vector similarity:

- ``cosine_topk``: brute-force exact top-k — broadcast the (small) query
  set against the corpus; dot products stay JVM-side via zip_with +
  aggregate (no Python, no UDF), ranking via window.
- ``lsh_bucketed_topk``: random-hyperplane LSH variant — corpus and
  queries hashed into sign-pattern buckets; only same-bucket pairs are
  scored. The scale path: the corpus side shuffles once on bucket id and
  each query probes its bucket — candidate volume ∝ corpus/2^bits.

At 100 TB the corpus side is the big table: both paths avoid shuffling it
by key (broadcast join / bucket-pruned join) and prune columns to
(id, vector) at the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ left-to-right in double — JVM higher-order fns, no UDF."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Broadcast the query set (must be small); corpus is scanned once, never
    shuffled — only the (n_queries × k) result aggregates.
    Deterministic ordering: (cosine desc, neighbor id asc).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), round_to).alias("cosine"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id for random-hyperplane LSH (deterministic
    planes supplied by the caller)."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket.cast("int")


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Approximate top-k: only same-bucket candidates are scored.

    With ``b`` planes, candidate volume is ~corpus/2^b per query — the
    100 TB path. Recall depends on the angular distribution; callers
    wanting guarantees should multi-probe (hash with several plane sets
    and union) — composition left to the caller to keep this primitive.
    """
    bq = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    bc = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = bc.join(F.broadcast(bq), "bucket").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), round_to).alias("cosine"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
