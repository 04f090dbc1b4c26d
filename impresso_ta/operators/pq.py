"""Product quantization (PQ) for compressed-domain similarity search.

IVF (similarity.py) prunes WHICH vectors a query scores; PQ shrinks
WHAT each score costs: a 64-dim float32 vector (256 B) becomes m
one-byte codes (here m=4 ints for engine portability), and query↔vector
distance is approximated by m table lookups instead of a 64-term dot
product. At 100 TB of embeddings the scan is memory-bandwidth-bound, so
a 64× smaller representation is a ~64× cheaper linear scan — and the
codes column is what you'd persist alongside the parquet to make every
subsequent ANN query cheap (FAISS's IVF-PQ architecture = ivf_assign
for the candidate cells + these codes for the in-cell scoring).

Determinism discipline (same as IVF/DSIR/PMI): the codebook is seeded
from the first ``ksub`` corpus vectors by id (model-sized, collected
once), per-subspace distances are rounded to ``round_to`` BEFORE the
argmin with ties to the smallest code, and the ADC sum adds the m
rounded lookups in fixed subspace order — so encodes and rankings are
bit-identical across runs, partitionings, and engines (the DuckDB
oracle recomputes the same pipeline).

Approximation contract: PQ distances are estimates; recall against the
exact scan is measured by the ``similarity_pq_recall`` oracle the same
way the IVF/LSH paths are.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from impresso_ta.operators.partitioning import spread_small_input

Codebook = list[list[list[float]]]  # [m][ksub][sub_dim]

#: Above this many inlined floats (m·ksub·sub_dim) the literal expression
#: form loses twice: the driver burns seconds of py4j round trips BUILDING
#: the Columns, and codegen chokes on the giant expression (measured at the
#: repo defaults m=4·ksub=8·sub=16 = 512 literals over sf0.1: literal
#: build 8.0 s + exec 7.3 s vs relation 0.7 s + 4.7 s) — and a realistic
#: m=16/ksub=256 book is 64k literals compiled into EVERY encode/topk
#: plan. Route to the broadcast-relation form (O(1) plan size), the same
#: cutover ``similarity.LITERAL_MAX_NLIST`` applies to IVF centroids.
#: Literal stays only for genuinely tiny books.
LITERAL_MAX_BOOK_LITERALS = 256


def _sub_sq_l2(
    vec: Column, centroid: list[float], offset: int, round_to: int
) -> Column:
    """Rounded squared L2 between vec[offset : offset+len(centroid)] and
    a literal centroid — fixed-order double arithmetic, codegen'd."""
    terms = None
    for i, c in enumerate(centroid):
        d = F.element_at(vec, offset + i + 1).cast("double") - F.lit(float(c))
        t = d * d
        terms = t if terms is None else terms + t
    return F.round(terms, round_to)


def _book_relation(spark, codebook: Codebook):
    """One-row DataFrame holding the whole codebook as ``_book``:
    array (length m, sorted by j) of struct(j, cents) where cents is an
    array (length ksub, sorted by code) of struct(c, cvec) — broadcast-
    joined to corpus/query rows so encode and ADC-table expressions stay
    map-side with O(1) plan size at any m·ksub. The relation twin of
    ``similarity._centroids_relation``."""
    rows = [
        (j, c, [float(x) for x in cv])
        for j, cents in enumerate(codebook)
        for c, cv in enumerate(cents)
    ]
    return (
        spark.createDataFrame(rows, "j int, c int, cvec array<double>")
        .groupBy("j")
        .agg(F.array_sort(F.collect_list(F.struct("c", "cvec"))).alias("cents"))
        .agg(
            F.array_sort(F.collect_list(F.struct("j", "cents"))).alias("_book")
        )
    )


def _sub_sq_l2_rel(
    vec: Column, cvec: Column, offset: int, sub: int, round_to: int
) -> Column:
    """Rounded squared L2 between vec[offset : offset+sub] and a
    relation-borne centroid vector. zip_with + a left-to-right aggregate
    fold — bit-identical to the literal form's fixed-order sum (the
    fold's 0.0 seed is exact: t0 is a square, so 0.0 + t0 == t0)."""
    terms = F.zip_with(
        F.slice(vec, offset + 1, sub),
        cvec,
        lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
    )
    return F.round(
        F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x), round_to
    )


def _resolve_strategy(strategy: str, codebook: Codebook) -> str:
    if strategy == "auto":
        n_literals = (
            len(codebook) * len(codebook[0]) * len(codebook[0][0])
        )
        return (
            "literal"
            if n_literals <= LITERAL_MAX_BOOK_LITERALS
            else "relation"
        )
    if strategy not in ("literal", "relation"):
        raise ValueError(f"unknown PQ strategy {strategy!r}")
    return strategy


def pq_codebook(
    corpus: DataFrame,
    m: int = 4,
    ksub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
    round_to: int = 6,
) -> Codebook:
    """Deterministic PQ codebook: subspace j's centroids are the j-th
    sub-vectors of the ``ksub`` smallest-id corpus vectors (the IVF
    seeding convention), optionally refined with per-subspace Lloyd
    steps (posexplode → groupBy(subspace, code, pos) avg — the shuffle
    carries m·ksub·sub_dim running sums, independent of corpus size).
    Collect is model-sized: ksub rows."""
    seed_rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.col(id_col))
        .limit(ksub)
        .collect()
    )
    if len(seed_rows) < ksub:
        raise ValueError(f"corpus has fewer than ksub={ksub} vectors")
    dims = len(seed_rows[0][vec_col])
    if dims % m:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    sub = dims // m
    book: Codebook = [
        [[float(r[vec_col][j * sub + i]) for i in range(sub)] for r in seed_rows]
        for j in range(m)
    ]
    for _ in range(refine_iters):
        enc = pq_encode(corpus, book, id_col=id_col, vec_col=vec_col)
        per_dim = (
            enc.join(corpus.select(id_col, vec_col), id_col)
            .select(
                F.posexplode("codes").alias("j", "code"),
                F.col(vec_col).alias("_v"),
            )
            .select(
                "j",
                "code",
                F.posexplode(
                    F.slice(F.col("_v"), F.col("j") * sub + 1, sub)
                ).alias("pos", "x"),
            )
            .groupBy("j", "code", "pos")
            .agg(F.round(F.avg(F.col("x").cast("double")), round_to).alias("c"))
            .collect()
        )
        new_book = [[list(book[j][c]) for c in range(ksub)] for j in range(m)]
        for r in per_dim:
            new_book[r["j"]][r["code"]][r["pos"]] = float(r["c"])
        book = new_book
    return book


def pq_encode(
    corpus: DataFrame,
    codebook: Codebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    strategy: str = "auto",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Encode each vector as m subspace codes: code_j = argmin of the
    ROUNDED squared L2 to subspace j's centroids, ties → smallest code.
    Output (id, codes array<int>) is the 64×-compressed representation
    to persist. Zero corpus shuffle either way; two strategies with
    bit-identical codes (parity-tested):

    - ``literal`` (auto only ≤ LITERAL_MAX_BOOK_LITERALS inlined
      floats): the book baked into per-codeword score structs.
    - ``relation`` (auto default at the repo's 64-dim shapes): the book
      as a broadcast one-row relation, argmin via array_min over a
      transform — plan size AND driver build cost O(1), so m=16/
      ksub=256 (64k literals in the literal form) is expressible, and
      even the m=4/ksub=8 default measures ~2.5× faster end-to-end.

    ``extra_cols`` carries named input columns through to the output
    (the ``ivf_assign`` convention) — e.g. the IVF ``cell`` when
    building the persisted IVF-PQ store, so assign + encode fuse into
    one scan-project instead of a join on id.
    """
    m = len(codebook)
    sub = len(codebook[0][0])
    strategy = _resolve_strategy(strategy, codebook)
    carry = [F.col(c) for c in (extra_cols or [])]
    code_cols = []
    if strategy == "relation":
        book = _book_relation(corpus.sparkSession, codebook)
        def _cand(j):
            # NB: a two-parameter lambda would make F.transform pass the
            # ARRAY INDEX as the second argument — bind j via closure
            return lambda s: F.struct(
                _sub_sq_l2_rel(
                    F.col(vec_col), s["cvec"], j * sub, sub, round_to
                ).alias("d"),
                s["c"].alias("c"),
            )

        for j in range(m):
            cents_j = F.element_at(F.col("_book"), j + 1)["cents"]
            code_cols.append(F.array_min(F.transform(cents_j, _cand(j)))["c"])
        return (
            spread_small_input(corpus)
            .crossJoin(F.broadcast(book))
            .select(
                F.col(id_col), F.array(*code_cols).alias("codes"), *carry
            )
        )
    for j in range(m):
        cands = F.array(
            *[
                F.struct(
                    _sub_sq_l2(F.col(vec_col), cent, j * sub, round_to).alias(
                        "d"
                    ),
                    F.lit(c).alias("c"),
                )
                for c, cent in enumerate(codebook[j])
            ]
        )
        code_cols.append(F.array_min(cands)["c"])
    return spread_small_input(corpus).select(
        F.col(id_col), F.array(*code_cols).alias("codes"), *carry
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebook: Codebook | None = None,
    m: int = 4,
    ksub: int = 8,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    strategy: str = "auto",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: every query precomputes its
    m×ksub table of rounded sub-distances row-locally, the corpus is
    scanned as CODES ONLY (the compressed column), and each pair costs
    m array lookups + a fixed-order sum of m rounded doubles.

    Plan: encode = zero-shuffle map over the corpus; queries (with
    their tables inlined as array columns) BROADCAST against the code
    scan — no corpus shuffle, no row explosion beyond |queries| per
    code row; per-query top-k via window over the scored pairs. At
    scale, compose with ivf_assign to scan only probed cells (IVF-PQ).
    ``strategy`` routes the codebook exactly as in ``pq_encode``
    (broadcast relation unless the book is tiny — results
    bit-identical).

    Returns (query_id, neighbor_id, approx_dist, rnk).
    """
    if codebook is None:
        codebook = pq_codebook(
            corpus, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col
        )
    m = len(codebook)
    sub = len(codebook[0][0])
    strategy = _resolve_strategy(strategy, codebook)
    codes = pq_encode(
        corpus,
        codebook,
        id_col=id_col,
        vec_col=vec_col,
        round_to=round_to,
        strategy=strategy,
    )
    # Table entries are 1e4-scaled BIGINTs (the DSIR/PMI integer-exact
    # discipline): the m-term ADC sum is then order-immune across
    # engines instead of relying on fixed-order double addition.
    scale = 10 ** round_to
    if strategy == "relation":
        book = _book_relation(corpus.sparkSession, codebook)
        def _qtab(j):
            # closure-bound j (two-param lambdas receive the array index)
            return lambda s: F.round(
                _sub_sq_l2_rel(
                    F.col(vec_col), s["cvec"], j * sub, sub, round_to
                )
                * scale
            ).cast("long")

        qtabs = queries.crossJoin(F.broadcast(book)).select(
            F.col(id_col).alias("query_id"),
            *[
                F.transform(
                    F.element_at(F.col("_book"), j + 1)["cents"], _qtab(j)
                ).alias(f"_qt{j}")
                for j in range(m)
            ],
        )
    else:
        qtabs = queries.select(
            F.col(id_col).alias("query_id"),
            *[
                F.array(
                    *[
                        F.round(
                            _sub_sq_l2(F.col(vec_col), cent, j * sub, round_to)
                            * scale
                        ).cast("long")
                        for cent in codebook[j]
                    ]
                ).alias(f"_qt{j}")
                for j in range(m)
            ],
        )
    approx = None
    for j in range(m):
        term = F.element_at(
            F.col(f"_qt{j}"), F.element_at("codes", j + 1) + 1
        )
        approx = term if approx is None else approx + term
    scored = codes.crossJoin(F.broadcast(qtabs)).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(approx / scale, round_to).alias("approx_dist"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("neighbor_id").asc()
    )
    return scored.select(
        "*", F.row_number().over(w).cast("int").alias("rnk")
    ).where(F.col("rnk") <= k)


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    nlist: int = 8,
    nprobe: int = 2,
    m: int = 4,
    ksub: int = 8,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    strategy: str = "auto",
) -> DataFrame:
    """IVF-PQ (the FAISS architecture, composed from this repo's two
    halves): the coarse quantizer (``ivf_assign``'s Voronoi cells over
    the ``nlist`` smallest-id seed centroids, max rounded cosine) prunes
    WHICH vectors each query scores — candidate volume ~corpus·nprobe/
    nlist — and the PQ codes make each surviving candidate cost m table
    lookups on a 64×-smaller representation instead of a full dot
    product. At 100 TB both levers matter: IVF bounds the rows touched,
    PQ bounds the bytes per row.

    Plan: cell assignment and PQ encode are both zero-shuffle map
    passes over the corpus; queries compute probe cells AND their
    scaled-BIGINT ADC tables row-locally, then BROADCAST — the only
    corpus-sized operation is the equi-join on ``cell``. Both model
    sides are plan-size-routed: the IVF centroids through
    ``ivf_assign``'s literal-vs-relation cutover (LITERAL_MAX_NLIST)
    and the PQ codebook through this module's
    (LITERAL_MAX_BOOK_LITERALS), via ``strategy``. Same determinism contract as pq_topk (integer
    ADC sums, rounded assignment scores, id tie-breaks).

    Returns (query_id, neighbor_id, approx_dist, rnk).
    """
    from impresso_ta.operators.similarity import ivf_assign

    seed_rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(id_col)
        .limit(nlist)
        .collect()
    )
    centroids = [(int(r[id_col]), list(r[vec_col])) for r in seed_rows]
    codebook = pq_codebook(
        corpus, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col
    )
    strategy = _resolve_strategy(strategy, codebook)
    # assign + encode fuse into ONE zero-shuffle scan-project (the cell
    # rides through pq_encode's extra_cols — no join back on id)
    codes = ivf_pq_index_frame(
        corpus, centroids, codebook, id_col, vec_col, round_to, strategy
    )
    probes = _pq_probe_frame(
        corpus.sparkSession, queries, centroids, codebook, nprobe,
        id_col, vec_col, round_to, strategy,
    )
    return _adc_rank(codes, probes, len(codebook), k, id_col, round_to)


def ivf_pq_index_frame(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebook: Codebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    strategy: str = "auto",
) -> DataFrame:
    """The persisted IVF-PQ store's frame: (id, codes array<int>, cell)
    — the FAISS on-disk shape (coarse cell + PQ codes, ~16× fewer bytes
    than the raw-vector store at realistic m/ksub since only m small
    ints survive per row). One zero-shuffle map pass over the corpus:
    ``ivf_assign`` keeps the vector alongside the cell and
    ``pq_encode`` carries the cell through ``extra_cols``, so Catalyst
    fuses assignment + encode into a single scan-project. Write it with
    ``similarity.write_ivf_index`` (one file per cell) and serve with
    :func:`ivf_pq_topk_indexed`. Incremental appends with FROZEN
    centroids AND codebook compose exactly like the raw IVF store."""
    from impresso_ta.operators.similarity import ivf_assign

    strategy = _resolve_strategy(strategy, codebook)
    assigned = ivf_assign(corpus, centroids, id_col, vec_col, round_to)
    return pq_encode(
        assigned,
        codebook,
        id_col=id_col,
        vec_col=vec_col,
        round_to=round_to,
        strategy=strategy,
        extra_cols=["cell"],
    )


def _pq_probe_frame(
    spark,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebook: Codebook,
    nprobe: int,
    id_col: str,
    vec_col: str,
    round_to: int,
    strategy: str,
) -> DataFrame:
    """(query_id, _qt0.._qt{m-1}, cell): each query exploded to its
    ``nprobe`` nearest IVF cells, carrying its m scaled-BIGINT ADC
    tables — all row-local (the PQ twin of ``similarity._probe_frame``).
    Probe-cell scoring follows ``ivf_assign``'s literal-vs-relation
    cutover; the ADC tables follow the codebook ``strategy``."""
    from impresso_ta.operators.similarity import (
        LITERAL_MAX_NLIST,
        _cell_scores_over,
        _cell_scores_sql,
        _centroids_relation,
        norm,
    )

    m = len(codebook)
    sub = len(codebook[0][0])
    scale = 10 ** round_to
    if strategy == "relation":
        book = _book_relation(spark, codebook)
        def _qtab(j):
            # closure-bound j (two-param lambdas receive the array index)
            return lambda s: F.round(
                _sub_sq_l2_rel(
                    F.col(vec_col), s["cvec"], j * sub, sub, round_to
                )
                * scale
            ).cast("long")

        qt_cols = [
            F.transform(
                F.element_at(F.col("_book"), j + 1)["cents"], _qtab(j)
            ).alias(f"_qt{j}")
            for j in range(m)
        ]
        q_base = queries.crossJoin(F.broadcast(book))
    else:
        qt_cols = [
            F.array(
                *[
                    F.round(
                        _sub_sq_l2(F.col(vec_col), cent, j * sub, round_to)
                        * scale
                    ).cast("long")
                    for cent in codebook[j]
                ]
            ).alias(f"_qt{j}")
            for j in range(m)
        ]
        q_base = queries
    q = q_base.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("_qnorm"),
        *qt_cols,
    )
    # probe-cell computation follows the same literal-vs-relation
    # cutover as ivf_assign: above LITERAL_MAX_NLIST the per-centroid
    # score array comes from the broadcast _cents relation instead of
    # an O(nlist·dims)-literal expression (bit-identical scores)
    if len(centroids) > LITERAL_MAX_NLIST:
        q = q.crossJoin(F.broadcast(_centroids_relation(spark, centroids)))
        scores = _cell_scores_over(F.col("qv"), F.col("_qnorm"), round_to)
    else:
        frags = _cell_scores_sql("`qv`", "`_qnorm`", centroids, round_to)
        scores = F.expr(f"array({','.join(frags)})")
    probe_cells = F.transform(
        F.slice(F.reverse(F.array_sort(scores)), 1, nprobe),
        lambda s: (-s["negcell"]).cast("int"),
    )
    return q.select(
        "query_id",
        *[f"_qt{j}" for j in range(m)],
        F.explode(probe_cells).alias("cell"),
    )


def _adc_rank(
    codes: DataFrame,
    probes: DataFrame,
    m: int,
    k: int,
    id_col: str,
    round_to: int,
) -> DataFrame:
    """ADC scoring + top-k over a (id, codes, cell) frame joined with a
    ``_pq_probe_frame``: each surviving candidate costs m table lookups
    + a fixed-order BIGINT sum; the probes broadcast (serving batches
    are small by contract) so the codes side is never shuffled."""
    scale = 10 ** round_to
    approx = None
    for j in range(m):
        term = F.element_at(
            F.col(f"_qt{j}"), F.element_at("codes", j + 1) + 1
        )
        approx = term if approx is None else approx + term
    scored = codes.join(F.broadcast(probes), "cell").select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(approx / scale, round_to).alias("approx_dist"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("neighbor_id").asc()
    )
    return scored.select(
        "*", F.row_number().over(w).cast("int").alias("rnk")
    ).where(F.col("rnk") <= k)


def ivf_pq_topk_indexed(
    index: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebook: Codebook,
    nprobe: int = 2,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    strategy: str = "auto",
    static_prune: bool = True,
) -> DataFrame:
    """``ivf_pq_topk`` over a PERSISTED code store — the FAISS on-disk
    architecture completed: ``index`` is the (id, codes, cell) frame
    :func:`ivf_pq_index_frame` produced at ingest, written
    cell-partitioned via ``similarity.write_ivf_index``. Serving then
    touches neither the raw vectors (PQ bounds the BYTES per row — the
    store holds m small ints, not dims floats) nor the unprobed cells
    (``static_prune`` bounds the FILES read, the same guaranteed
    file-level pruning ``ivf_topk_indexed`` uses — a collected
    probed-cell set applied as a plan-time partition filter, because
    the DPP heuristic measurably declines broadcast reuse at
    nlist > LITERAL_MAX_NLIST and reads every file).

    ``centroids`` and ``codebook`` must be the ones the index was
    built with (frozen across incremental appends); results are then
    bit-identical to inline ``ivf_pq_topk`` over the original corpus
    (parity-tested). The probe frame is localCheckpoint'ed once so a
    non-deterministic queries frame cannot probe cells the pruned scan
    no longer contains."""
    strategy = _resolve_strategy(strategy, codebook)
    probes = _pq_probe_frame(
        index.sparkSession, queries, centroids, codebook, nprobe,
        id_col, vec_col, round_to, strategy,
    )
    if static_prune:
        probes = probes.localCheckpoint(eager=True)
        cells = sorted(
            r["cell"] for r in probes.select("cell").distinct().collect()
        )
        if cells and len(cells) < len(centroids):
            index = index.filter(F.col("cell").isin(cells))
    return _adc_rank(index, probes, len(codebook), k, id_col, round_to)
