"""C4 filters, corpus-wide line dedup, bigram-LM scoring, semantic dedup:
hand-checkable invariants on tiny inputs + plan-shape assertions."""

import hashlib
import math

from pyspark.sql import functions as F

from impresso_ta.operators.dedup import line_dedup, semantic_dedup
from impresso_ta.operators.text_analysis import bigram_lm_scores, c4_filters


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_line_dedup_keeps_first_occurrence(spark):
    span = " ".join(f"w{i}" for i in range(10))  # one full 10-word span
    tail_a = " ".join(f"a{i}" for i in range(10))
    tail_b = " ".join(f"b{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (0, f"{span} {tail_a}"),  # first occurrence of span
            (1, f"{span} {tail_b}"),  # duplicate span → dropped
            (2, tail_b),  # duplicate of doc 1's tail → dropped entirely
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs, span_words=10).collect()}
    assert out[0]["n_spans"] == 2 and out[0]["n_kept"] == 2
    assert out[0]["kept_fp"] == _md5(f"{span} {tail_a}")
    assert out[1]["n_spans"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["kept_fp"] == _md5(tail_b)
    assert out[2]["n_spans"] == 1 and out[2]["n_kept"] == 0
    assert out[2]["kept_fp"] == _md5("")


def test_line_dedup_plan_has_no_window(spark):
    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = line_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    # the scale-safe shape: first-occurrence via partial-agg groupBy,
    # never a window over the (skewable) span-hash key
    assert "Window" not in plan


def test_c4_filters_rules(spark):
    good = " ".join(f"word{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (0, good),
            (1, "too short"),
            (2, good + " visit javascript now"),
            (3, " ".join(["12345"] * 30)),  # no alphabetic words
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in c4_filters(docs).collect()}
    assert out[0]["keep"] and not out[0]["has_blacklist"]
    assert not out[1]["keep"]  # below min_words
    assert out[2]["has_blacklist"] and not out[2]["keep"]
    assert out[3]["alpha_frac"] == 0.0 and not out[3]["keep"]


def test_bigram_lm_prefers_frequent_bigrams(spark):
    # "x y" appears in every repeat doc → high count → low NLL;
    # doc 9's bigrams are unique → maximally surprising.
    docs = spark.createDataFrame(
        [(i, "x y x y x y") for i in range(9)] + [(9, "q r s t u v")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["avg_nll"] for r in bigram_lm_scores(docs).collect()}
    assert out[9] > out[0]
    # hand-check doc 9: vocabulary V=8 (x,y,q,r,s,t,u,v); each of its 5
    # bigrams has c2=1, left-context c1=1 → nll = -ln(2/(1+8))
    assert out[9] == round(-math.log(2.0 / 9.0), 4)


def test_semantic_dedup_drops_higher_id_twin(spark):
    e1 = [1.0, 0.0, 0.0]
    e2 = [0.0, 1.0, 0.0]
    rows = [
        (0, e1),
        (1, e2),
        (5, e1),  # exact twin of 0, same cell → dropped
        (7, [0.8, 0.6, 0.0]),  # cell 0 (cos 0.8 vs 0.6), cos 0.8 < τ → kept
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    seeds = [(0, e1), (1, e2)]
    out = {
        r["vec_id"]: r for r in semantic_dedup(emb, seeds, threshold=0.99).collect()
    }
    assert out[0]["keep"] and out[1]["keep"]
    assert not out[5]["keep"] and out[5]["cell"] == 0
    assert out[7]["keep"] and out[7]["cell"] == 0


def test_hashed_doc_vectors_unit_norm_and_similarity(spark):
    from impresso_ta.operators.similarity import cosine_topk
    from impresso_ta.operators.text_analysis import hashed_doc_vectors

    docs = spark.createDataFrame(
        [
            (0, "spark shuffles the corpus by key"),
            (1, "spark shuffles the corpus by key"),  # exact dup of 0
            (2, "an entirely different set of words here"),
        ],
        "doc_id long, text string",
    )
    vecs = hashed_doc_vectors(docs)
    rows = {r["doc_id"]: r["vector"] for r in vecs.collect()}
    assert len(rows) == 3 and all(len(v) == 64 for v in rows.values())
    for v in rows.values():
        assert abs(sum(x * x for x in v) - 1.0) < 1e-4  # unit norm
    assert rows[0] == rows[1] != rows[2]

    # composition: nearest neighbor of doc 0 (excluding itself) is its dup
    top = cosine_topk(
        vecs.withColumnRenamed("doc_id", "vec_id").withColumnRenamed(
            "vector", "embedding"
        ),
        vecs.filter("doc_id = 0")
        .withColumnRenamed("doc_id", "vec_id")
        .withColumnRenamed("vector", "embedding"),
        k=2,
    ).collect()
    ranked = sorted(top, key=lambda r: r["rank"])
    assert ranked[0]["neighbor_id"] in (0, 1) and ranked[1]["neighbor_id"] in (0, 1)


def test_normalize_text_rules(spark):
    from impresso_ta.operators.text_analysis import normalized_docs

    docs = spark.createDataFrame(
        [
            (0, "plain text stays"),
            (1, "curly “quotes” and — dash"),
            (2, "ctrl\x07chars\tand   runs"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in normalized_docs(docs).collect()}
    assert out[0]["text"] == "plain text stays" and not out[0]["changed"]
    assert out[1]["text"] == 'curly "quotes" and - dash' and out[1]["changed"]
    assert out[2]["text"] == "ctrlchars and runs" and out[2]["changed"]


def test_quality_outliers_flags_extremes(spark):
    from impresso_ta.operators.text_analysis import quality_outliers

    rows = [(i, "word " * 20) for i in range(30)] + [(99, "word " * 2000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in quality_outliers(docs).collect()}
    assert out[99]["is_outlier"] and out[99]["z_tokens"] > 3
    assert not out[0]["is_outlier"]


def test_deterministic_split_stable_on_subsets(spark):
    from impresso_ta.operators.corpus import deterministic_split

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    full = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(docs, fr).collect()
    }
    assert set(full.values()) == {"train", "val", "test"}
    # subset invariance: halving the corpus never moves a doc's split
    half = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(
            docs.filter("doc_id % 2 = 0"), fr
        ).collect()
    }
    for doc_id, split in half.items():
        assert full[doc_id] == split

    import pytest

    with pytest.raises(ValueError):
        deterministic_split(docs, {"train": 0.5, "val": 0.1})


def test_language_consistency_flags_code_switching(spark):
    from impresso_ta.operators.text_analysis import language_consistency

    en = "the cat and the dog is of the house to go " * 2
    fr = "le chat et les chiens des villes et le pont " * 2
    docs = spark.createDataFrame(
        [
            (0, en + en + en + en),       # pure English
            (1, en + en + fr + fr),       # half-and-half → mixed
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in language_consistency(docs, span_words=20).collect()
    }
    assert out[0]["majority_lang"] == "en" and not out[0]["is_mixed"]
    assert out[1]["is_mixed"] and out[1]["majority_frac"] < 0.8
    assert out[1]["majority_lang"] in ("en", "fr")


def test_semantic_dedup_auto_scales_nlist(spark):
    from impresso_ta.operators.dedup import semantic_dedup_auto

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    out = semantic_dedup_auto(emb, target_cell_size=10, threshold=0.99)
    rows = out.collect()
    assert len(rows) == n
    # nlist = ceil(n/10) distinct seed cells → max observed cell well
    # below the whole corpus; every vec assigned
    cells = {}
    for r in rows:
        cells[r["cell"]] = cells.get(r["cell"], 0) + 1
    assert len(cells) > 1
    assert max(cells.values()) < n
    # at tau=0.99 with random vectors nothing drops
    assert all(r["keep"] for r in rows)


def test_semantic_dedup_auto_distributed_matches_collect(spark):
    """Parity at nlist > LITERAL_MAX_NLIST: the distributed seed path
    (DataFrame centroid relation, no driver-Python materialization)
    must match the collect-to-literal path row for row."""
    from impresso_ta.operators.dedup import semantic_dedup_auto
    from impresso_ta.operators.similarity import LITERAL_MAX_NLIST

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    cell = 2  # nlist = ceil(n/2) >> LITERAL_MAX_NLIST
    assert n / cell > LITERAL_MAX_NLIST
    kw = dict(target_cell_size=cell, threshold=0.9)
    got = sorted(
        tuple(r)
        for r in semantic_dedup_auto(emb, strategy="distributed", **kw).collect()
    )
    want = sorted(
        tuple(r)
        for r in semantic_dedup_auto(emb, strategy="collect", **kw).collect()
    )
    assert got == want
    # auto picks the distributed path at this nlist
    auto = sorted(
        tuple(r) for r in semantic_dedup_auto(emb, **kw).collect()
    )
    assert auto == want


def test_semantic_dedup_auto_hints_skip_sizing_actions(spark, monkeypatch):
    """n/dims hints must suppress the router's count()/first() driver
    actions (full scans on an uncached 100TB input) and produce the
    identical result."""
    from impresso_ta.operators.dedup import semantic_dedup_auto

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    kw = dict(target_cell_size=10, threshold=0.99)
    want = sorted(tuple(r) for r in semantic_dedup_auto(emb, **kw).collect())

    from pyspark.sql import DataFrame

    def _boom(self, *a, **kw):  # pragma: no cover - failure path
        raise AssertionError("sizing action ran despite n/dims hints")

    monkeypatch.setattr(DataFrame, "count", _boom)
    monkeypatch.setattr(DataFrame, "first", _boom)
    hinted = semantic_dedup_auto(emb, n=n, dims=64, **kw)
    monkeypatch.undo()
    assert sorted(tuple(r) for r in hinted.collect()) == want


def test_semantic_dedup_lsh_twins_always_caught(spark):
    """Identical vectors produce identical sign bits at ANY n_bits, so
    exact twins can never be split across LSH cells — the higher id is
    dropped just as in the Voronoi variant."""
    from impresso_ta.operators.dedup import semantic_dedup_lsh

    base = [(i % 7) / 7.0 - 0.4 for i in range(64)]
    other = [((i * 3) % 11) / 11.0 - 0.5 for i in range(64)]
    rows = [(0, base), (3, other), (9, list(base))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    for bits in (1, 4, 8):
        out = {
            r["vec_id"]: r
            for r in semantic_dedup_lsh(
                emb, n_bits=bits, threshold=0.99
            ).collect()
        }
        assert out[0]["keep"]
        assert not out[9]["keep"], f"twin survived at n_bits={bits}"
        assert out[0]["cell"] == out[9]["cell"]
        assert 0 <= out[0]["cell"] < (1 << bits)


def test_hyperplane_cells_deterministic_and_match_hashlib(spark):
    """Cell ids are a pure function of the vector and the md5-derived
    hyperplanes — recompute one vector's cell in plain Python and
    compare (guards the engine-portable weight formula the DuckDB
    oracle mirrors)."""
    import hashlib

    from pyspark.sql import functions as F

    from impresso_ta.operators.dedup import hyperplane_cells

    vec = [((i * 5) % 13) / 13.0 - 0.45 for i in range(64)]
    emb = spark.createDataFrame(
        [(1, vec)], "vec_id long, embedding array<float>"
    )
    got = emb.select(
        hyperplane_cells(F.col("embedding"), n_bits=6, dims=64).alias("c")
    ).collect()[0]["c"]

    expected = 0
    import numpy as np

    v32 = np.array(vec, dtype=np.float32)  # Spark stores float32
    for k in range(6):
        w = [
            (int(hashlib.md5(f"{k}_{d}".encode()).hexdigest()[:6], 16) % 2001
             - 1000) / 1000.0
            for d in range(64)
        ]
        dot = sum(float(v32[d]) * w[d] for d in range(64))
        if round(dot, 4) >= 0:
            expected += 1 << k
    assert got == expected


def test_semantic_dedup_auto_lsh_strategy(spark):
    """strategy='lsh' sizes n_bits from the corpus (⌈log2 n/cell⌉) and
    still drops exact twins; cells bounded by 2^bits."""
    from impresso_ta.operators.dedup import semantic_dedup_auto

    base = [((i * 3) % 17) / 17.0 - 0.4 for i in range(8)]
    rows = [(i, [x + i * 0.01 for x in base]) for i in range(40)]
    rows.append((99, list(rows[0][1])))  # exact twin of id 0
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r
        for r in semantic_dedup_auto(
            emb, target_cell_size=10, threshold=0.999, strategy="lsh"
        ).collect()
    }
    # n=41, cell=10 → nlist=5 → n_bits=3 → cells < 8
    assert all(0 <= r["cell"] < 8 for r in out.values())
    assert out[0]["keep"] and not out[99]["keep"]


def test_semantic_dedup_auto_routes_past_broadcast_budget(spark):
    """'auto' must not feed a Voronoi centroid relation bigger than the
    broadcast budget to a broadcast join (VERDICT r3 #3): with the
    budget forced below nlist*dims*8 the auto path takes the row-local
    LSH-cell route and is bit-identical to an explicit strategy='lsh'
    run at the same (corpus-derived) sizing."""
    from impresso_ta.operators.dedup import semantic_dedup_auto

    base = [((i * 5) % 13) / 13.0 - 0.3 for i in range(8)]
    rows = [(i, [x + i * 0.02 for x in base]) for i in range(70)]
    rows.append((200, list(rows[3][1])))  # exact twin of id 3
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(target_cell_size=1, threshold=0.999)
    # nlist = 71 > LITERAL_MAX_NLIST (64) so the collect tier is out;
    # dims=8 → relation = 71*8*8 B; a 1 B budget forces the LSH tier
    via_auto = sorted(
        tuple(r)
        for r in semantic_dedup_auto(
            emb, strategy="auto", broadcast_budget_bytes=1, **kw
        ).collect()
    )
    via_lsh = sorted(
        tuple(r)
        for r in semantic_dedup_auto(emb, strategy="lsh", **kw).collect()
    )
    assert via_auto == via_lsh
    got = {r[0]: r for r in via_auto}
    assert not got[200][-1]  # exact twin of a smaller id never survives
    assert any(r[-1] for r in via_auto)  # and the pass is not drop-all


def test_incremental_minhash_dedup_drops_only_near_dups(spark):
    """New docs near-duplicating an EXISTING doc are dropped; new docs
    that only near-duplicate each OTHER both survive (incremental gate
    compares against the ingested corpus, not within the batch)."""
    from impresso_ta.operators.dedup import incremental_minhash_dedup

    base = " ".join(f"tok{i}" for i in range(60))
    other = " ".join(f"w{i} v{i}" for i in range(40))
    existing = spark.createDataFrame(
        [(0, base), (2, other)], "doc_id long, text string"
    )
    twin_a = base + " extra"
    batch_dup = " ".join(f"z{i} y{i}" for i in range(50))
    new = spark.createDataFrame(
        [
            (1, twin_a),            # near-dup of existing 0 → dropped
            (3, batch_dup),         # near-dup of 5 but NOT of existing → kept
            (5, batch_dup + " q"),  # same → kept
            (7, " ".join(f"unique{i}" for i in range(30))),  # kept
        ],
        "doc_id long, text string",
    )
    kept = {
        r["doc_id"]
        for r in incremental_minhash_dedup(new, existing, threshold=0.8)
        .select("doc_id")
        .collect()
    }
    assert kept == {3, 5, 7}


def test_semantic_dedup_lsh_multiprobe_catches_boundary_pair(spark):
    """A near-dup pair split by ONE near-boundary hyperplane is missed
    single-probe but caught with n_probes=2; probed drops dominate
    unprobed drops on the same input."""
    import hashlib

    import numpy as np

    from impresso_ta.operators.dedup import semantic_dedup_lsh

    dims, bits = 16, 3
    w = np.array(
        [
            [
                (int(hashlib.md5(f"{k}_{d}".encode()).hexdigest()[:6], 16)
                 % 2001 - 1000) / 1000.0
                for d in range(dims)
            ]
            for k in range(bits)
        ]
    )
    rng = np.array([((i * 5) % 13) / 13.0 - 0.45 for i in range(dims)])
    base = rng / np.linalg.norm(rng)
    # push base very close to hyperplane 0's boundary, clearly off 1&2
    d0 = base @ w[0]
    base = base - (d0 - 1e-3) * w[0] / (w[0] @ w[0])
    # twin: reflect across hyperplane 0 only → adjacent cell, cosine≈1
    twin = base - 2 * (base @ w[0]) * w[0] / (w[0] @ w[0])
    cos = float(base @ twin / (np.linalg.norm(base) * np.linalg.norm(twin)))
    assert cos > 0.99
    filler = [
        (10 + i, [float(x) for x in (rng * (0.3 + 0.1 * i)) + i * 0.05])
        for i in range(4)
    ]
    emb = spark.createDataFrame(
        [(0, [float(x) for x in base]), (1, [float(x) for x in twin])]
        + filler,
        "vec_id long, embedding array<float>",
    )
    kw = dict(n_bits=bits, threshold=0.99, dims=dims)
    single = {
        r["vec_id"]: r for r in semantic_dedup_lsh(emb, **kw).collect()
    }
    probed = {
        r["vec_id"]: r
        for r in semantic_dedup_lsh(emb, n_probes=2, **kw).collect()
    }
    # the pair straddles hyperplane 0 → different cells → single misses
    assert single[0]["cell"] != single[1]["cell"]
    assert single[1]["keep"]
    # multiprobe flips the low-margin bit and re-unites the pair
    assert not probed[1]["keep"]
    assert probed[0]["keep"]
    # dominance: probed drop set contains the unprobed drop set
    dropped_single = {k for k, r in single.items() if not r["keep"]}
    dropped_probed = {k for k, r in probed.items() if not r["keep"]}
    assert dropped_single <= dropped_probed
