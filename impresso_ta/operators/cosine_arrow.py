"""Arrow-batch brute-force cosine scoring (guide §4.2) — the shared
fast path under ``cosine_topk`` / ``hard_negatives`` /
``training_triplets``'s broadcast cross joins.

The JVM form evaluates ``cosine(qv, cv)`` per (corpus row, query) pair
through interpreted higher-order-function lambdas: zip_with multiply +
left-to-right aggregate fold for the dot product AND both norms —
~3·dims interpreted ops per pair, the entire cost of the brute mining
family. Here the corpus crosses the Python boundary once per batch and
the scoring is numpy — with the SAME IEEE operation sequence, so the
doubles are bit-identical, not approximately equal:

- the JVM fold adds left-to-right per dimension; numpy accumulates
  per-dimension across the whole batch (``acc += C[:, d] * Q[j, d]``),
  performing the identical multiply-round/add-round sequence for every
  pair (arrowkit module note);
- norms are the same fold (``dot(a, a)`` then one sqrt), the
  denominator one multiply, the division one IEEE op;
- ``try_divide`` semantics: NULL exactly when the denominator is ±0.0;
  NaN/inf propagate through the same float ops;
- a NULL vector, a NULL element, or a length mismatch with the query
  makes the JVM dot NULL (zip_with null padding / null-sticky fold) —
  such rows/queries emit NULL cosine for every pair;
- rounding is Spark's shortest-decimal HALF_UP: vectorized
  multiply-floor with an exact-Decimal re-decision for values within
  1e-7 of a .5 boundary (the binary/shortest-decimal divergence zone
  is ~1e-12 there, so the mask is conservative by 5 orders).

Queries ride the task closure (small by contract — the JVM forms
broadcast them already); the corpus is scanned once, never shuffled.
Ranking/windowing stays JVM-side on the returned scored frame.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def _spark_round_scalar(x: float, r: int) -> float:
    return float(
        Decimal(repr(x)).quantize(Decimal(1).scaleb(-r), ROUND_HALF_UP)
    )


def spark_round_vec(x, r: int):
    """Vectorized Spark round(double, r): nearest-multiple via
    floor(x·10^r + 0.5), exact-Decimal re-decision on the ~.5-boundary
    suspects (and on non-finite passthrough)."""
    import numpy as np

    scale = 10.0**r
    scaled = x * scale
    finite = np.isfinite(scaled)
    k = np.floor(np.where(finite, scaled, 0.0) + 0.5)
    out = np.where(finite, k / scale, x)
    frac = np.where(finite, scaled, 0.0) - np.floor(
        np.where(finite, scaled, 0.0)
    )
    suspect = finite & (np.abs(frac - 0.5) < 1e-7)
    if suspect.any():
        idx = np.nonzero(suspect)
        vals = x[idx] if isinstance(idx, tuple) else x[suspect]
        fixed = [_spark_round_scalar(float(v), r) for v in np.ravel(vals)]
        out[idx] = np.array(fixed).reshape(np.shape(vals))
    return out


def brute_scored_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str | None = None,
    round_to: int = 4,
    exclude_self: bool = False,
    out_query: str = "query_id",
    out_cand: str = "neighbor_id",
    out_cos: str = "cosine",
) -> DataFrame:
    """The scored frame of the brute broadcast-cross-join family:
    one row per (corpus row, query) pair —

        (out_query, out_cand, [_same], out_cos)

    with ``out_cos = round(cosine, round_to)`` bit-identical to the JVM
    expression form (see module docstring). With ``label_col`` the
    boolean ``_same`` column (NULL-propagating label equality) is
    included; ``exclude_self`` drops id-equal pairs before emission.
    """
    import numpy as np
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    from impresso_ta.operators.partitioning import spread_small_input

    q_cols = [F.col(id_col), F.col(vec_col)]
    if label_col is not None:
        q_cols.append(F.col(label_col))
    q_rows = queries.select(*q_cols).collect()
    q_ids = [int(r[id_col]) for r in q_rows]
    q_vecs = [
        None if r[vec_col] is None else list(r[vec_col]) for r in q_rows
    ]
    q_labels = (
        [r[label_col] for r in q_rows] if label_col is not None else None
    )

    # query-side validity + norms (JVM fold order: left-to-right)
    dims = None
    for v in q_vecs:
        if v is not None and all(x is not None for x in v):
            dims = len(v)
            break
    q_valid: list[bool] = []
    for v in q_vecs:
        q_valid.append(
            v is not None
            and all(x is not None for x in v)
            and (dims is None or len(v) == dims)
        )
    m = len(q_ids)

    fields = [
        StructField(out_query, LongType()),
        StructField(out_cand, LongType()),
    ]
    if label_col is not None:
        fields.append(StructField("_same", BooleanType()))
    fields.append(StructField(out_cos, DoubleType()))
    out_schema = StructType(fields)
    arrow_schema = to_arrow_schema(out_schema)

    sel = [F.col(id_col).cast("long").alias("_cid"), F.col(vec_col)]
    if label_col is not None:
        sel.append(F.col(label_col).alias("_clabel"))
    base = spread_small_input(corpus.select(*sel))
    has_label = label_col is not None

    def fn(batches):
        if m == 0 or dims is None:
            # no (valid) queries: the cross join emits rows only for
            # query rows that exist; invalid-only query sets still fan
            # out with NULL cosines — handled by the generic path below
            pass
        Q = None
        nq = None
        if dims is not None:
            valid_idx = [j for j in range(m) if q_valid[j]]
            if valid_idx:
                Q = np.array(
                    [q_vecs[j] for j in valid_idx], dtype=np.float64
                )
                nq = np.zeros(len(valid_idx), dtype=np.float64)
                for d in range(dims):
                    nq += Q[:, d] * Q[:, d]
                nq = np.sqrt(nq)
        for batch in batches:
            cids = batch.column(0).to_pylist()
            vecs = batch.column(1).to_pylist()
            labels = batch.column(2).to_pylist() if has_label else None
            n = len(cids)
            row_ok = np.zeros(n, dtype=bool)
            for i, v in enumerate(vecs):
                row_ok[i] = (
                    v is not None
                    and dims is not None
                    and len(v) == dims
                    and all(x is not None for x in v)
                )
            ok_idx = np.nonzero(row_ok)[0]
            cos_ok = None
            if Q is not None and len(ok_idx):
                C = np.array(
                    [vecs[i] for i in ok_idx], dtype=np.float64
                )
                acc = np.zeros((len(ok_idx), Q.shape[0]), dtype=np.float64)
                nc = np.zeros(len(ok_idx), dtype=np.float64)
                for d in range(dims):
                    cd = C[:, d]
                    acc += cd[:, None] * Q[None, :, d]
                    nc += cd * cd
                nc = np.sqrt(nc)
                denom = nc[:, None] * nq[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    raw = acc / denom
                cos_ok = spark_round_vec(raw, round_to)
                null_mask = denom == 0.0  # try_divide: NULL on /0 only
            # assemble output columns pair-major (corpus-row outer)
            o_q: list[int] = []
            o_c: list[int] = []
            o_s: list[bool | None] = []
            o_v: list[float | None] = []
            pos_of = {}
            if Q is not None:
                pos_of = {
                    j: p
                    for p, j in enumerate(
                        [j for j in range(m) if q_valid[j]]
                    )
                }
            row_pos = {int(i): p for p, i in enumerate(ok_idx)}
            for i in range(n):
                cid = cids[i]
                for j in range(m):
                    qid = q_ids[j]
                    if exclude_self and cid == qid:
                        continue
                    o_q.append(qid)
                    o_c.append(cid)
                    if has_label:
                        cl, ql = labels[i], q_labels[j]
                        o_s.append(
                            None
                            if cl is None or ql is None
                            else cl == ql
                        )
                    if row_ok[i] and q_valid[j]:
                        p, pq = row_pos[i], pos_of[j]
                        if null_mask[p, pq]:
                            o_v.append(None)
                        else:
                            o_v.append(float(cos_ok[p, pq]))
                    else:
                        o_v.append(None)
            arrays = [
                pa.array(o_q, type=pa.int64()),
                pa.array(o_c, type=pa.int64()),
            ]
            if has_label:
                arrays.append(pa.array(o_s, type=pa.bool_()))
            arrays.append(pa.array(o_v, type=pa.float64()))
            yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)

    return base.mapInArrow(fn, schema=out_schema)
