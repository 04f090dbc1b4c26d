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


def _parse_vectors(vcol, n: int, dims: int | None):
    """(row_ok bool[n], C float64[(n_ok, dims)]) for a batch's vector
    column — C rows in ascending batch-row order, values bit-identical
    to the to_pylist path (float64 roundtrips exactly; narrower
    numerics widen exactly as ``np.array(list, float64)`` would).

    Fast path (the catalog shape — no row/element nulls, every row
    exactly ``dims`` long): one flatten + reshape instead of n Python
    list conversions."""
    import numpy as np

    if dims is None:
        return np.zeros(n, dtype=bool), None
    if vcol.null_count == 0:
        flat = vcol.flatten()
        if flat.null_count == 0 and len(flat) == n * dims:
            lengths = vcol.value_lengths().to_numpy(zero_copy_only=False)
            if (lengths == dims).all():
                C = flat.to_numpy(zero_copy_only=False)
                if C.dtype != np.float64:
                    C = C.astype(np.float64)
                return np.ones(n, dtype=bool), C.reshape(n, dims)
    vecs = vcol.to_pylist()
    row_ok = np.zeros(n, dtype=bool)
    for i, v in enumerate(vecs):
        row_ok[i] = (
            v is not None
            and len(v) == dims
            and all(x is not None for x in v)
        )
    ok = np.nonzero(row_ok)[0]
    C = (
        np.array([vecs[i] for i in ok], dtype=np.float64)
        if len(ok)
        else None
    )
    return row_ok, C


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
    max_query_rows: int = 200_000,
) -> DataFrame:
    """The scored frame of the brute broadcast-cross-join family:
    one row per (corpus row, query) pair —

        (out_query, out_cand, [_same], out_cos)

    with ``out_cos = round(cosine, round_to)`` bit-identical to the JVM
    expression form (see module docstring). With ``label_col`` the
    boolean ``_same`` column (NULL-propagating label equality) is
    included; ``exclude_self`` drops id-equal pairs before emission.

    ``max_query_rows`` guards the driver collect (r13): the query side
    rides the task closure — same scale posture as the JVM form's
    broadcast, but a broadcast at least fails at the 8 GB relation cap,
    whereas an unguarded collect would OOM the driver first. A query
    side over the bound fails fast with the scale-route remedies.
    """
    import numpy as np
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    from impresso_ta.operators.partitioning import spread_small_input

    q_cols = [F.col(id_col), F.col(vec_col)]
    if label_col is not None:
        q_cols.append(F.col(label_col))
    # plain parallel collect (a limit() here would become a sequential
    # executeTake ramp — measured slower on selective query filters);
    # the length check still fails fast with the actionable remedy
    # before the rows are baked into every task's closure, and
    # spark.driver.maxResultSize bounds the collect itself.
    q_rows = queries.select(*q_cols).collect()
    if len(q_rows) > max_query_rows:
        raise ValueError(
            "brute_scored_arrow collects the query side to the driver "
            "(the JVM form broadcasts it — both require a small query "
            f"set): got more than {max_query_rows} rows. Route large "
            "query sets through the IVF/LSH scale paths (ivf_topk / "
            "lsh_bucketed_topk / *_ivf miners) or raise max_query_rows "
            "explicitly if the driver truly has the memory."
        )
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
        # r13 (guide §4.2): the pair-assembly below is fully vectorized —
        # the r12 form built the output with a per-PAIR Python loop
        # (append × n·m), which dominated the whole mapInArrow at every
        # scale (no-Spark A/B: 326 → 16 ms per 51,200 pairs, 20×).
        # Emission order (corpus-row outer, query inner), NULL/NaN/label
        # three-valued semantics and every double are bit-identical
        # (tests/test_cosine_arrow.py + the adversarial no-JVM harness).
        valid_j = np.array(
            [j for j in range(m) if q_valid[j]], dtype=np.int64
        )
        Q = nq = None
        if dims is not None and len(valid_j):
            Q = np.array([q_vecs[j] for j in valid_j], dtype=np.float64)
            nq = np.zeros(len(valid_j), dtype=np.float64)
            for d in range(dims):
                nq += Q[:, d] * Q[:, d]
            nq = np.sqrt(nq)
        q_arr = np.asarray(q_ids, dtype=np.int64)
        if has_label:
            ql_arr = np.empty(m, dtype=object)
            for j, x in enumerate(q_labels):
                ql_arr[j] = x
            ql_null = np.array([x is None for x in q_labels], dtype=bool)
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            idc = batch.column(0)
            c_null = idc.is_null().to_numpy(zero_copy_only=False)
            cids = idc.fill_null(0).to_numpy(zero_copy_only=False)
            cids = cids.astype(np.int64, copy=False)
            row_ok, C = _parse_vectors(batch.column(1), n, dims)
            ok_idx = np.nonzero(row_ok)[0]
            cos_ok = null_mask = None
            if Q is not None and len(ok_idx):
                acc = np.zeros((len(ok_idx), Q.shape[0]), dtype=np.float64)
                nc = np.zeros(len(ok_idx), dtype=np.float64)
                for d in range(dims):
                    cd = C[:, d]
                    acc += cd[:, None] * Q[None, :, d]
                    nc += cd * cd
                nc = np.sqrt(nc)
                denom = nc[:, None] * nq[None, :]
                with np.errstate(
                    divide="ignore", invalid="ignore", over="ignore"
                ):
                    raw = acc / denom
                cos_ok = spark_round_vec(raw, round_to)
                null_mask = denom == 0.0  # try_divide: NULL on /0 only
            flat_q = np.tile(q_arr, n)
            flat_c = np.repeat(cids, m)
            flat_cn = np.repeat(c_null, m)
            cos_full = np.zeros((n, m), dtype=np.float64)
            nul_full = np.ones((n, m), dtype=bool)
            if cos_ok is not None:
                sc = np.ix_(ok_idx, valid_j)
                cos_full[sc] = cos_ok
                nul_full[sc] = null_mask
            flat_cos = cos_full.ravel()
            flat_nul = nul_full.ravel()
            if has_label:
                labels = batch.column(2).to_pylist()
                cl_arr = np.empty(n, dtype=object)
                for i, x in enumerate(labels):
                    cl_arr[i] = x
                cl_null = np.array(
                    [x is None for x in labels], dtype=bool
                )
                same = np.asarray(
                    cl_arr[:, None] == ql_arr[None, :], dtype=bool
                )
                flat_same = same.ravel()
                flat_same_nul = (
                    cl_null[:, None] | ql_null[None, :]
                ).ravel()
            if exclude_self:
                # a NULL corpus id never equals a query id (the old
                # loop's `cid == qid` with cid=None) — keep those pairs
                keep = (flat_c != flat_q) | flat_cn
                if not keep.all():
                    flat_q = flat_q[keep]
                    flat_c = flat_c[keep]
                    flat_cn = flat_cn[keep]
                    flat_cos = flat_cos[keep]
                    flat_nul = flat_nul[keep]
                    if has_label:
                        flat_same = flat_same[keep]
                        flat_same_nul = flat_same_nul[keep]
            arrays = [
                pa.array(flat_q, type=pa.int64()),
                pa.array(
                    flat_c,
                    type=pa.int64(),
                    mask=flat_cn if flat_cn.any() else None,
                ),
            ]
            if has_label:
                arrays.append(
                    pa.array(flat_same, type=pa.bool_(), mask=flat_same_nul)
                )
            arrays.append(
                pa.array(flat_cos, type=pa.float64(), mask=flat_nul)
            )
            yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)

    return base.mapInArrow(fn, schema=out_schema)
