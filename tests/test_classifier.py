"""Hashed-feature logistic regression: exact parity with a pure-Python
reference implementation (same rounding discipline), the model actually
learns a vocabulary split, and the weight table rides as a broadcast."""

import hashlib
import math

from impresso_ta.operators.classifier import lr_hashed_score, lr_hashed_train

DIM = 64

POS = [(2 * i, "paris museum art gallery") for i in range(8)]
NEG = [(2 * i + 1, "zebra xylophone quux blorp") for i in range(8)]


def _bucket(word):
    return int(hashlib.md5(word.encode()).hexdigest()[:12], 16) % DIM


def _term9(x):
    """The engine's exact-BIGINT addend (classifier._term9): scale the
    per-term double product by 1e9 and round half-away-from-zero on the
    shortest decimal representation (Spark's BigDecimal.valueOf path)."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        Decimal(repr(x * 1e9)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
    )


def _py_train(rows, labels, iters=3, lr=1.0):
    db = {}
    for did, text in rows:
        for word in text.strip().split():
            b = _bucket(word)
            db[(did, b)] = db.get((did, b), 0) + 1
    n = float(len(rows))
    w = {}
    for it in range(iters):
        if it == 0:
            r = {did: round(labels[did] - 0.5, 9) for did, _ in rows}
        else:
            m9 = {}
            for (did, b), c in db.items():
                if b in w:
                    m9[did] = m9.get(did, 0) + _term9(c * w[b])
            m = {did: round(v / 1e9, 9) for did, v in m9.items()}
            r = {
                did: round(
                    labels[did]
                    - round(
                        1.0 / (1.0 + math.exp(-m.get(did, 0.0))), 9
                    ),
                    9,
                )
                for did, _ in rows
            }
        g9 = {}
        for (did, b), c in db.items():
            g9[b] = g9.get(b, 0) + _term9(c * r[did] / n)
        g = {b: round(v / 1e9 * lr, 9) for b, v in g9.items()}
        w = (
            g
            if not w
            else {b: round(w[b] + g[b], 9) for b in w}
        )
    return w


def _frames(spark):
    rows = POS + NEG
    labels = {did: 1.0 if did % 2 == 0 else 0.0 for did, _ in rows}
    df = spark.createDataFrame(
        [(did, text, labels[did]) for did, text in rows],
        "doc_id long, text string, y double",
    )
    return rows, labels, df


def test_weights_match_python_reference(spark):
    rows, labels, df = _frames(spark)
    got = {
        r["bucket"]: r["w"]
        for r in lr_hashed_train(df, "y", dim=DIM).collect()
    }
    want = _py_train(rows, labels)
    assert got.keys() == want.keys()
    for b in want:
        assert abs(got[b] - want[b]) < 1e-9, b


def test_model_learns_the_split_and_scores_holdout(spark):
    _, _, df = _frames(spark)
    weights = lr_hashed_train(df, "y", dim=DIM)
    holdout = spark.createDataFrame(
        [
            (100, "paris gallery art museum painting"),
            (101, "blorp quux gnarl xylophone"),
            (102, None),
        ],
        "doc_id long, text string",
    )
    scored = {
        r["doc_id"]: r["lr_prob"]
        for r in lr_hashed_score(holdout, weights, dim=DIM).collect()
    }
    assert scored[100] > 0.5 > scored[101]
    assert scored[102] == 0.5  # null text: zero margin exactly
    out = lr_hashed_score(holdout, weights, dim=DIM)
    assert out.columns == ["doc_id", "text", "lr_prob"]


def test_scoring_plan_broadcasts_the_model(spark):
    _, _, df = _frames(spark)
    weights = lr_hashed_train(df, "y", dim=DIM)
    plan = (
        lr_hashed_score(df, weights, dim=DIM)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_tf_features_separate_regardless_of_length(spark):
    """tf=True length-normalizes the hashed counts: two documents with
    the same vocabulary MIX but 10x different lengths score the same,
    and the learned split still holds. With raw counts (tf=False) the
    long document's margin is 10x the short one's — the measured
    sigmoid-saturation failure mode."""
    rows = [
        (2 * i, "paris museum art gallery " * (1 if i % 2 else 10))
        for i in range(8)
    ] + [
        (2 * i + 1, "zebra xylophone quux blorp " * (1 if i % 2 else 10))
        for i in range(8)
    ]
    df = spark.createDataFrame(
        [(did, text, float(1 - did % 2)) for did, text in rows],
        "doc_id long, text string, y double",
    )
    weights = lr_hashed_train(df, "y", dim=DIM, tf=True, learn_rate=100.0)
    scored = {
        r["doc_id"]: r["lr_prob"]
        for r in lr_hashed_score(df, weights, dim=DIM, tf=True).collect()
    }
    # same mix, different lengths -> identical tf vector -> same score
    assert scored[0] == scored[2]
    assert scored[1] == scored[3]
    # and the vocabulary split is learned
    assert min(scored[d] for d in scored if d % 2 == 0) > max(
        scored[d] for d in scored if d % 2 == 1
    )


def test_rowlocal_scorer_matches_batch_scorer(spark):
    """lr_hashed_score_rowlocal (the stateless streaming form: one-row
    weight map broadcast + in-array margin) reproduces the batch
    scorer's rounded probabilities exactly — both tf and raw-count
    feature forms, including the null-text zero-margin row."""
    from impresso_ta.operators.classifier import lr_hashed_score_rowlocal

    _, _, df = _frames(spark)
    holdout = spark.createDataFrame(
        [
            (100, "paris gallery art museum painting"),
            (101, "blorp quux gnarl xylophone paris"),
            (102, None),
            (103, "zebra zebra zebra art"),
        ],
        "doc_id long, text string",
    )
    for tf in (True, False):
        weights = lr_hashed_train(df, "y", dim=DIM, tf=tf, learn_rate=10.0)
        batch = {
            r["doc_id"]: r["lr_prob"]
            for r in lr_hashed_score(holdout, weights, dim=DIM, tf=tf).collect()
        }
        rowlocal = {
            r["doc_id"]: r["lr_prob"]
            for r in lr_hashed_score_rowlocal(
                holdout, weights, dim=DIM, tf=tf
            ).collect()
        }
        assert rowlocal == batch, f"tf={tf}"
        assert rowlocal[102] == 0.5


def test_rowlocal_scorer_plan_is_shuffle_free(spark):
    """The row-local scorer adds NO exchange to the scored frame: the
    model rides as a broadcast one-row map, the margin is row-local."""
    from impresso_ta.operators.classifier import lr_hashed_score_rowlocal

    _, _, df = _frames(spark)
    trained = lr_hashed_train(df, "y", dim=DIM)
    # sever the training lineage (its aggregates legitimately shuffle;
    # the cached frame would still PRINT them) — the assertion targets
    # the scorer's own plan
    weights = spark.createDataFrame(
        trained.collect(), "bucket long, w double"
    )
    docs = spark.createDataFrame(
        [(1, "paris museum")], "doc_id long, text string"
    )
    plan = (
        lr_hashed_score_rowlocal(docs, weights, dim=DIM)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only exchanges allowed: the one-row weight-map fold
    # (SinglePartition over ≤dim rows) and its broadcast — never a
    # hash/range repartition of the scored docs
    import re

    assert not re.search(r"Exchange (hash|range)partitioning", plan), plan
