"""Product quantization (operators/pq.py): codebook seeding/refine,
encode argmin parity, ADC top-k determinism."""

import pytest

from pyspark.sql import functions as F

from impresso_ta.operators.pq import pq_codebook, pq_encode, pq_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _sub_l2(v, cent, off):
    return round(sum((float(v[off + i]) - cent[i]) ** 2 for i in range(len(cent))), 4)


def test_codebook_shape_and_seeding(spark, emb):
    book = pq_codebook(emb, m=4, ksub=8)
    assert len(book) == 4 and len(book[0]) == 8 and len(book[0][0]) == 16
    # subspace j centroids = sub-vectors of the 8 smallest-id rows
    seeds = {r.vec_id: list(r.embedding) for r in emb.filter("vec_id < 8").collect()}
    for j in range(4):
        for c in range(8):
            assert book[j][c] == pytest.approx(
                [float(x) for x in seeds[c][j * 16 : (j + 1) * 16]]
            )


def test_codebook_guards(spark, emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq_codebook(emb, m=5, ksub=4)
    with pytest.raises(ValueError, match="fewer than ksub"):
        pq_codebook(emb.limit(3), m=4, ksub=8)


def test_encode_matches_python_argmin(spark, emb):
    book = pq_codebook(emb, m=4, ksub=8)
    sample = emb.limit(40)
    got = {r.vec_id: list(r.codes) for r in pq_encode(sample, book).collect()}
    for r in sample.collect():
        v = [float(x) for x in r.embedding]
        want = [
            min(((_sub_l2(v, book[j][c], j * 16)), c) for c in range(8))[1]
            for j in range(4)
        ]
        assert got[r.vec_id] == want
    assert all(0 <= c < 8 for codes in got.values() for c in codes)


def test_topk_partitioning_invariant_and_k_bound(spark, emb):
    qs = emb.filter(F.col("vec_id") % 17 == 0)
    a = sorted(map(tuple, pq_topk(emb, qs, k=3).collect()))
    b = sorted(map(tuple, pq_topk(emb.repartition(7), qs, k=3).collect()))
    assert a == b
    per_q = {}
    for row in a:
        per_q.setdefault(row[0], []).append(row[3])
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 3
               for v in per_q.values())


def test_refine_reduces_quantization_error(spark, emb):
    def mean_err(book):
        enc = pq_encode(emb, book)
        joined = enc.join(emb, "vec_id").collect()
        tot = 0.0
        for r in joined:
            v = [float(x) for x in r.embedding]
            tot += sum(
                _sub_l2(v, book[j][r.codes[j]], j * 16) for j in range(4)
            )
        return tot / len(joined)

    base = pq_codebook(emb, m=4, ksub=8)
    refined = pq_codebook(emb, m=4, ksub=8, refine_iters=2)
    assert refined != base
    # Lloyd steps are non-increasing in reconstruction error
    assert mean_err(refined) <= mean_err(base) + 1e-9


def test_ivfpq_full_probe_equals_plain_pq(spark, emb):
    from impresso_ta.operators.pq import ivf_pq_topk

    qs = emb.filter(F.col("vec_id") % 29 == 0)
    # probing ALL nlist cells = unpruned compressed scan = pq_topk
    # (small nlist/ksub keep the literal-expression codegen cheap here;
    # the catalog oracle covers the 8/8 shape)
    full = sorted(
        map(tuple, ivf_pq_topk(emb, qs, nlist=4, nprobe=4, ksub=4, k=3).collect())
    )
    plain = sorted(map(tuple, pq_topk(emb, qs, m=4, ksub=4, k=3).collect()))
    assert full == plain


def test_ivfpq_pruning_returns_subset_ranking(spark, emb):
    from impresso_ta.operators.pq import ivf_pq_topk

    qs = emb.filter(F.col("vec_id") % 29 == 0)
    pruned = ivf_pq_topk(emb, qs, nlist=4, nprobe=2, ksub=4, k=3).collect()
    # ranks well-formed per query and approx_dist non-decreasing in rank
    per_q = {}
    for r in pruned:
        per_q.setdefault(r.query_id, []).append((r.rnk, r.approx_dist))
    for rows in per_q.values():
        rows.sort()
        assert [rk for rk, _ in rows] == list(range(1, len(rows) + 1))
        dists = [d for _, d in rows]
        assert dists == sorted(dists)


def test_relation_strategy_parity_codes_and_topk(spark, emb):
    """The broadcast-relation codebook form is bit-identical to the
    literal form — codes, ADC distances, and ranks."""
    from impresso_ta.operators.pq import ivf_pq_topk

    book = pq_codebook(emb, m=4, ksub=8)
    lit = {
        r.vec_id: list(r.codes)
        for r in pq_encode(emb, book, strategy="literal").collect()
    }
    rel = {
        r.vec_id: list(r.codes)
        for r in pq_encode(emb, book, strategy="relation").collect()
    }
    assert lit == rel
    qs = emb.filter(F.col("vec_id") % 17 == 0)
    a = sorted(map(tuple, pq_topk(emb, qs, book, k=3, strategy="literal").collect()))
    b = sorted(map(tuple, pq_topk(emb, qs, book, k=3, strategy="relation").collect()))
    assert a == b and len(a) > 0
    c = sorted(map(tuple, ivf_pq_topk(emb, qs, nlist=4, nprobe=4, k=3,
                                      strategy="literal").collect()))
    d = sorted(map(tuple, ivf_pq_topk(emb, qs, nlist=4, nprobe=4, k=3,
                                      strategy="relation").collect()))
    assert c == d and len(c) > 0


def test_auto_routes_big_codebook_to_relation_with_small_plan(spark):
    """m=16/ksub=256 = 4096 codewords (64k literals in the literal form):
    auto must route to the relation form, whose plan stays O(1)-sized
    and executes."""
    import random

    from impresso_ta.operators.pq import (
        LITERAL_MAX_BOOK_LITERALS,
        _resolve_strategy,
    )

    rng = random.Random(7)
    rows = [
        (i, [round(rng.uniform(-1, 1), 4) for _ in range(64)])
        for i in range(300)
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    book = pq_codebook(vecs, m=16, ksub=256)
    assert 16 * 256 * 4 > LITERAL_MAX_BOOK_LITERALS
    assert _resolve_strategy("auto", book) == "relation"
    enc = pq_encode(vecs, book)  # auto
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert len(plan) < 200_000  # the literal form would inline 64k terms
    got = enc.limit(5).collect()
    assert all(len(r.codes) == 16 for r in got)
    assert all(0 <= c < 256 for r in got for c in r.codes)


def test_ivfpq_big_nlist_routes_probe_side_to_relation(spark, emb):
    """nlist above LITERAL_MAX_NLIST: probe cells come from the broadcast
    _cents relation — results identical to a literal-forced small run
    restricted to the same full-probe setting."""
    from impresso_ta.operators.pq import ivf_pq_topk

    n = emb.count()
    qs = emb.filter(F.col("vec_id") % 29 == 0)
    # full probe at two nlist settings spanning the cutover: both are
    # exhaustive scans, so the ADC ranking must be identical
    small = sorted(map(tuple, ivf_pq_topk(
        emb, qs, nlist=4, nprobe=4, k=3).collect()))
    big = sorted(map(tuple, ivf_pq_topk(
        emb, qs, nlist=80, nprobe=80, k=3).collect()))
    assert [r[:2] for r in small] == [r[:2] for r in big]


def _cell_scan_files_read(df) -> int | None:
    """Max numFiles over the cell-partitioned scans in the EXECUTED plan
    (the test_similarity_ivf.py metric-assertion pattern — plan strings
    can claim pruning the runtime doesn't do)."""
    files_read = None
    stack, seen = [df._jdf.queryExecution().executedPlan()], set()
    while stack:
        node = stack.pop()
        if node.id() in seen:
            continue
        seen.add(node.id())
        name = node.getClass().getSimpleName()
        if "FileSourceScan" in name and "cell" in node.toString():
            o = node.metrics().get("numFiles")
            if o.isDefined():
                files_read = max(files_read or 0, o.get().value())
        try:
            it = node.children().iterator()
            while it.hasNext():
                stack.append(it.next())
        except Exception:
            pass
        for meth in ("finalPhysicalPlan", "executedPlan", "plan", "child"):
            try:
                stack.append(getattr(node, meth)())
            except Exception:
                pass
    return files_read


def test_ivf_pq_indexed_parity_pruning_and_size(spark, emb, tmp_path):
    """The persisted IVF-PQ code store: bit-identical serving vs inline
    ivf_pq_topk, guaranteed file-level pruning (executed-plan numFiles,
    not plan text), and a store measurably smaller than the raw-vector
    index — both 100 TB levers (files touched AND bytes per row) on the
    same store."""
    import os

    from impresso_ta.operators.pq import (
        ivf_pq_index_frame,
        ivf_pq_topk,
        ivf_pq_topk_indexed,
        pq_codebook,
    )
    from impresso_ta.operators.similarity import ivf_assign, write_ivf_index

    qs = emb.filter(F.col("vec_id") % 97 == 0)
    seeds = [
        (int(r.vec_id), list(r.embedding))
        for r in emb.orderBy("vec_id").limit(8).collect()
    ]
    book = pq_codebook(emb, m=4, ksub=8)
    inline = sorted(map(tuple, ivf_pq_topk(
        emb, qs, nlist=8, nprobe=2, m=4, ksub=8, k=3).collect()))

    store = str(tmp_path / "ivfpq_index")
    write_ivf_index(ivf_pq_index_frame(emb, seeds, book), store)
    n_files = sum(
        1 for _r, _d, fs in os.walk(store)
        for f in fs if f.endswith(".parquet")
    )
    assert n_files == 8  # one file per cell (the write_ivf_index layout)
    index = spark.read.parquet(store)
    served = ivf_pq_topk_indexed(index, qs, seeds, book, nprobe=2, k=3)
    assert sorted(map(tuple, served.collect())) == inline

    # pruning as a METRIC: re-serve and read the scan's numFiles
    probed = ivf_pq_topk_indexed(index, qs, seeds, book, nprobe=2, k=3)
    probed.collect()
    files_read = _cell_scan_files_read(probed)
    assert files_read is not None and files_read < n_files

    # static_prune=False (corpus-sized-queries path) stays identical
    unpruned = ivf_pq_topk_indexed(
        index, qs, seeds, book, nprobe=2, k=3, static_prune=False
    )
    assert sorted(map(tuple, unpruned.collect())) == inline

    # the bytes lever: the code store must be materially smaller than
    # the raw-vector store over the SAME corpus and layout
    raw_store = str(tmp_path / "ivf_raw_index")
    write_ivf_index(ivf_assign(emb, seeds), raw_store)
    size = lambda p: sum(  # noqa: E731
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(p) for f in fs if f.endswith(".parquet")
    )
    assert size(store) < size(raw_store) / 2

    # incremental append with FROZEN centroids + codebook composes
    new_batch = emb.selectExpr(
        "vec_id + 100000 AS vec_id", "embedding", "label"
    ).limit(3)
    ivf_pq_index_frame(new_batch, seeds, book).write.mode(
        "append"
    ).partitionBy("cell").parquet(store)
    grown = spark.read.parquet(store)
    assert grown.count() == emb.count() + 3
    out2 = ivf_pq_topk_indexed(
        grown, qs, seeds, book, nprobe=8, k=3
    ).collect()
    assert any(r.neighbor_id >= 100000 for r in out2)  # clones tie in
