"""Embedding-space benchmark decontamination: exact survivors vs a
NumPy ground truth, degenerate-vector safety, and the broadcast
no-shuffle plan."""

import numpy as np

from impresso_ta.operators.similarity import semantic_decontamination


def _frames(spark):
    rng = np.random.default_rng(7)
    bench = rng.normal(size=(5, 8))
    train = np.vstack(
        [
            rng.normal(size=(40, 8)),          # random: mostly clean
            bench[0] + 0.01 * rng.normal(size=8),   # near-copy of bench 0
            -bench[1],                          # anti-parallel: clean
        ]
    )
    tdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(train)],
        "vec_id long, embedding array<float>",
    )
    bdf = spark.createDataFrame(
        [(100 + i, [float(x) for x in v]) for i, v in enumerate(bench)],
        "vec_id long, embedding array<float>",
    )
    return train, bench, tdf, bdf


def _expected_survivors(train, bench, threshold):
    def cos(a, b):
        return round(
            float(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b)), 4
        )

    return sorted(
        i
        for i, tv in enumerate(train)
        if not any(cos(tv, bv) >= threshold for bv in bench)
    )


def test_matches_numpy_ground_truth(spark):
    train, bench, tdf, bdf = _frames(spark)
    for threshold in (0.35, 0.8, 0.999):
        got = sorted(
            r["vec_id"]
            for r in semantic_decontamination(
                tdf, bdf, threshold=threshold
            ).collect()
        )
        assert got == _expected_survivors(train, bench, threshold)
    # the planted near-copy is dropped at any reasonable threshold
    assert 40 not in set(
        r["vec_id"]
        for r in semantic_decontamination(tdf, bdf, threshold=0.8).collect()
    )


def test_schema_passthrough_and_zero_vector_safe(spark):
    tdf = spark.createDataFrame(
        [(1, [0.0, 0.0], "keep-me"), (2, [1.0, 0.0], "x")],
        "vec_id long, embedding array<float>, extra string",
    )
    bdf = spark.createDataFrame(
        [(9, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    out = semantic_decontamination(tdf, bdf, threshold=0.9)
    rows = {r["vec_id"]: r["extra"] for r in out.collect()}
    # zero-norm train vector: cosine NULL -> never contaminated, kept
    assert rows == {1: "keep-me"}
    assert out.columns == ["vec_id", "embedding", "extra"]


def test_plan_is_rowlocal_no_shuffle(spark):
    # r12: the exact screen is one MapInArrow over the train scan —
    # still zero exchanges over the corpus (the bench side rides in the
    # task closure, the r11 form's one-row broadcast made JVM-local)
    _, _, tdf, bdf = _frames(spark)
    plan = (
        semantic_decontamination(tdf, bdf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInArrow" in plan
    # the train side reaches the screen without any hash exchange
    assert "Exchange hashpartitioning" not in plan


def test_arrow_screen_matches_jvm_exists_on_boundary_values(spark):
    """The vectorized screen vs the retained JVM EXISTS reference on
    vectors engineered to land cosines exactly at the round(x,4)
    boundary (0.34995 edges), plus degenerate rows (zero vector, NaN,
    mismatched dims, NULL)."""
    import math

    from impresso_ta.operators.similarity import (
        _semantic_decontamination_exists,
    )

    rng = np.random.default_rng(123)
    bench = [[1.0, 0.0, 0.0, 0.0]]
    rows = []
    # cosines swept across the boundary: cos = c for unit vectors
    for i, c in enumerate(
        [0.34990, 0.34994999, 0.34995, 0.3499500001, 0.35, 0.3500499,
         0.34995000000000003, 0.3499499999999999]
    ):
        s = math.sqrt(max(0.0, 1 - c * c))
        rows.append((i, [c, s, 0.0, 0.0]))
    for i in range(50):
        v = rng.normal(size=4)
        rows.append((100 + i, [float(x) for x in v]))
    rows += [
        (900, [0.0, 0.0, 0.0, 0.0]),
        (901, [float("nan"), 1.0, 0.0, 0.0]),   # NaN cosine IS a hit
        (902, [1.0, 0.0]),              # shorter than bench
        (903, [1.0, 0.0, 0.0, 0.0, 0.0]),  # longer than bench
        (904, None),
        (905, [float("inf"), 1.0, 0.0, 0.0]),
        (906, [1e200, 1e200, 0.0, 0.0]),   # norm-product overflow
        (907, [1e-200, 1e-200, 0.0, 0.0]),  # norm-product underflow
        # length-3 group: pairs degenerate BENCH vectors (NaN / zero /
        # huge-norm) with clean, zero and tiny train rows
        (910, [1.0, 0.0, 0.0]),
        (911, [0.0, 0.0, 0.0]),
        (912, [1e-200, 0.0, 0.0]),
        # length-2 group: clean bench, degenerate train only
        (920, [0.7, 0.7]),
    ]
    tdf = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bdf = spark.createDataFrame(
        [
            (99, bench[0]),
            (98, [float("nan"), 0.0, 0.0]),
            (97, [0.0, 0.0, 0.0]),
            (96, [1e200, 1e200, 1e200]),
            (95, [1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    for threshold in (0.35, 0.7, 0.9999):
        fast = sorted(
            r["vec_id"]
            for r in semantic_decontamination(
                tdf, bdf, threshold=threshold, lsh_bench_threshold=None
            ).collect()
        )
        ref = sorted(
            r["vec_id"]
            for r in _semantic_decontamination_exists(
                tdf, bdf, "embedding", threshold, 4
            ).collect()
        )
        assert fast == ref, threshold


def test_lsh_exhaustive_probing_equals_exact(spark):
    """n_probes = 2^n_bits places every bench vector in every cell, so
    the bucketed form must reproduce the broadcast form exactly — pins
    the map-build/explode/lookup plumbing."""
    from impresso_ta.operators.similarity import semantic_decontamination_lsh

    train, bench, tdf, bdf = _frames(spark)
    exact = sorted(
        r["vec_id"]
        for r in semantic_decontamination(
            tdf, bdf, threshold=0.35, lsh_bench_threshold=None
        ).collect()
    )
    got = sorted(
        r["vec_id"]
        for r in semantic_decontamination_lsh(
            tdf, bdf, threshold=0.35, n_bits=3, dims=8, n_probes=8
        ).collect()
    )
    assert got == exact


def test_lsh_survivors_are_a_superset_of_exact(spark):
    """One-sided approximation: LSH can only MISS a contamination hit
    (keeping extra rows), never invent one (dropping clean rows)."""
    from impresso_ta.operators.similarity import semantic_decontamination_lsh

    train, bench, tdf, bdf = _frames(spark)
    exact = set(
        r["vec_id"]
        for r in semantic_decontamination(
            tdf, bdf, threshold=0.35, lsh_bench_threshold=None
        ).collect()
    )
    for probes in (1, 2, 4):
        got = set(
            r["vec_id"]
            for r in semantic_decontamination_lsh(
                tdf, bdf, threshold=0.35, n_bits=3, dims=8, n_probes=probes
            ).collect()
        )
        assert got >= exact, probes
    # the planted near-copy of bench[0] collides with it in every cell
    # (identical up to 1% noise -> same sign pattern at these margins)
    assert 40 not in set(
        r["vec_id"]
        for r in semantic_decontamination_lsh(
            tdf, bdf, threshold=0.8, n_bits=3, dims=8, n_probes=2
        ).collect()
    )


def test_large_bench_auto_routes_to_lsh(spark):
    """Above lsh_bench_threshold the entry point delegates to the
    bucketed form: with exhaustive probing the result is still exact,
    and the plan carries the cell-map lookup instead of the flat
    bench array."""
    train, bench, tdf, bdf = _frames(spark)
    routed = semantic_decontamination(
        tdf, bdf, threshold=0.35,
        lsh_bench_threshold=1, n_bits=3, dims=8, n_probes=8,
    )
    exact = sorted(
        r["vec_id"]
        for r in semantic_decontamination(
            tdf, bdf, threshold=0.35, lsh_bench_threshold=None
        ).collect()
    )
    assert sorted(r["vec_id"] for r in routed.collect()) == exact
    assert "map_from_entries" in routed._jdf.queryExecution().analyzed().toString()
