"""DSIR importance resampling: hashlib ground-truth parity for the
log-weights, target-likeness ranking, deterministic Gumbel selection,
and the broadcast/TakeOrdered plan shape."""

import hashlib
import math

from impresso_ta.operators.corpus import dsir_log_weights, dsir_resample

RAW = [
    (1, "paris museum art louvre gallery"),
    (2, "zebra xylophone quux blorp"),
    (3, "paris art exhibition museum"),
    (4, "random junk words here nothing"),
    (5, None),
]
TARGET = [
    (100, "paris art museum painting"),
    (101, "louvre gallery exhibition art"),
]
DIM = 256


def _bucket(word: str) -> int:
    return int(hashlib.md5(word.encode()).hexdigest()[:12], 16) % DIM


def _expected_weights():
    raw_counts: dict[int, int] = {}
    tgt_counts: dict[int, int] = {}
    per_doc: dict[int, dict[int, int]] = {}
    for did, text in RAW:
        if text is None:
            continue
        per_doc[did] = {}
        for w in text.strip().split():
            b = _bucket(w)
            raw_counts[b] = raw_counts.get(b, 0) + 1
            per_doc[did][b] = per_doc[did].get(b, 0) + 1
    for _, text in TARGET:
        for w in text.strip().split():
            b = _bucket(w)
            tgt_counts[b] = tgt_counts.get(b, 0) + 1
    R, T = sum(raw_counts.values()), sum(tgt_counts.values())
    out = {}
    for did, buckets in per_doc.items():
        lw = sum(
            c
            * round(
                math.log((tgt_counts.get(b, 0) + 1) / (T + DIM))
                - math.log((raw_counts.get(b, 0) + 1) / (R + DIM)),
                9,
            )
            for b, c in buckets.items()
        )
        out[did] = round(lw, 6)
    out[5] = 0.0  # null text: no tokens, no evidence
    return out


def _frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    return raw, tgt


def test_weights_match_hashlib_ground_truth(spark):
    raw, tgt = _frames(spark)
    got = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_log_weights(raw, tgt, dim=DIM).collect()
    }
    exp = _expected_weights()
    assert set(got) == set(exp)
    for did in exp:
        assert abs(got[did] - exp[did]) < 1e-6, did


def test_target_like_docs_outrank_junk(spark):
    raw, tgt = _frames(spark)
    got = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_log_weights(raw, tgt).collect()
    }
    # every doc sharing vocabulary with the target beats every doc
    # sharing none
    assert min(got[1], got[3]) > max(got[2], got[4])


def test_resample_deterministic_and_bounded(spark):
    raw, tgt = _frames(spark)
    a = sorted(
        r["doc_id"] for r in dsir_resample(raw, tgt, 3).collect()
    )
    b = sorted(
        r["doc_id"] for r in dsir_resample(raw, tgt, 3).collect()
    )
    assert a == b and len(a) == 3
    # schema: raw columns pass through, plus the weight
    assert dsir_resample(raw, tgt, 3).columns == [
        "doc_id",
        "text",
        "dsir_logw",
    ]


def test_plan_broadcast_model_takeordered_select(spark):
    raw, tgt = _frames(spark)
    wplan = (
        dsir_log_weights(raw, tgt)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the dim-row log-ratio model reaches the doc counts as a broadcast
    assert "BroadcastHashJoin" in wplan
    assert "CartesianProduct" not in wplan
    splan = (
        dsir_resample(raw, tgt, 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # orderBy+limit compiles to TakeOrdered, not a global sort
    assert "TakeOrderedAndProject" in splan


def test_threshold_select_matches_topk_prefix(spark):
    """The quantile-threshold form selects exactly the top-|sel| docs
    of the TakeOrdered form (same scores, same noise) — at test size
    the sketch is exact, so the two selections must agree."""
    from impresso_ta.operators.corpus import dsir_resample_threshold

    rows = [
        (i, ("paris art " if i % 3 == 0 else "zebra quux ") * (1 + i % 5))
        for i in range(120)
    ]
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = spark.createDataFrame(
        [(900, "paris art museum gallery")], "doc_id long, text string"
    )
    sel = dsir_resample_threshold(raw, tgt, fraction=0.25)
    got = sorted(r["doc_id"] for r in sel.collect())
    assert abs(len(got) - 30) <= max(1, 0.02 * 120)
    want = sorted(
        r["doc_id"] for r in dsir_resample(raw, tgt, n=len(got)).collect()
    )
    assert got == want
    assert sel.columns == ["doc_id", "text", "dsir_logw"]


def test_threshold_select_no_global_sort(spark):
    from impresso_ta.operators.corpus import dsir_resample_threshold

    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    plan = (
        dsir_resample_threshold(raw, tgt, fraction=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" not in plan
    assert "rangepartitioning" not in plan  # no global sort exchange
    import pytest

    with pytest.raises(ValueError, match="fraction"):
        dsir_resample_threshold(raw, tgt, fraction=1.5)


def test_bigram_features_separate_word_order_styles(spark):
    """The ngram=2 feature set (unigrams + bigrams, the paper's full
    n<=2 set) separates two pools with IDENTICAL unigram histograms
    but different word ORDER; unigrams alone provably cannot (their
    bucket counts are equal by construction, so every log-weight
    collapses to the corpus prior)."""
    from impresso_ta.operators.corpus import dsir_log_weights

    # style A: "alpha beta" collocation; style B: "beta alpha".
    # Same words, same counts, opposite order.
    a = [(i, "alpha beta stop " * 20) for i in range(10)]
    b = [(100 + i, "beta alpha stop " * 20) for i in range(10)]
    raw = spark.createDataFrame(a + b, "doc_id long, text string")
    tgt = spark.createDataFrame(
        [(900, "alpha beta stop " * 20)], "doc_id long, text string"
    )

    uni = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_log_weights(raw, tgt, ngram=1).collect()
    }
    # unigram histograms identical -> identical weights across styles
    assert len({round(v, 6) for v in uni.values()}) == 1

    bi = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_log_weights(raw, tgt, ngram=2).collect()
    }
    # bigram features see the collocation: every style-A doc outweighs
    # every style-B doc
    assert min(bi[d] for d in bi if d < 100) > max(
        bi[d] for d in bi if d >= 100
    )


def test_dsir_ngram_pipeline_stage(spark):
    """dsir_ngram=2 reaches dsir_resample through prepare_corpus: the
    selected docs are the target-ordered style."""
    from impresso_ta.operators.pipeline import prepare_corpus

    a = [(i, "alpha beta stop " * 20) for i in range(10)]
    b = [(100 + i, "beta alpha stop " * 20) for i in range(10)]
    raw = spark.createDataFrame(a + b, "doc_id long, text string")
    tgt = spark.createDataFrame(
        [(900, "alpha beta stop " * 20)], "doc_id long, text string"
    )
    res = prepare_corpus(
        raw, c4=False, gopher=False, line_spans=None, doc_dedup=False,
        dsir_target=tgt, dsir_n=8, dsir_ngram=2,
    )
    assert all(r["doc_id"] < 100 for r in res.docs.collect())
    res.unpersist()
