"""Repetition quality filters, shingle-containment dedup signal, and
corpus vocabulary: hand-computable fixtures where every fraction is
known exactly, plus determinism/edge cases the oracle data can't pin
down (short docs, pure repeats, mosaic-of-copies docs)."""

from impresso_ta.operators.corpus import vocabulary
from impresso_ta.operators.dedup import duplicated_shingle_fraction
from impresso_ta.operators.text_analysis import repetition_features


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_features_exact_values(spark):
    # doc 1: "a a a b" → top word 'a' 3/4; 2-grams: aa,aa,ab → 'a a'
    # occurs twice (dup frac 2/3); 3-grams: aaa,aab → all unique (0).
    # doc 2: all-distinct words → every fraction at its floor.
    d = _df(spark, [(1, "a a a b"), (2, "w x y z")])
    out = {r["doc_id"]: r for r in repetition_features(d).collect()}
    assert out[1]["top_word_frac"] == 0.75
    assert out[1]["dup_2gram_frac"] == round(2 / 3, 4)
    assert out[1]["dup_3gram_frac"] == 0.0
    assert not out[1]["keep"]
    assert out[2]["top_word_frac"] == 0.25
    assert out[2]["dup_2gram_frac"] == 0.0
    assert out[2]["dup_3gram_frac"] == 0.0
    # 0.25 > 0.15 default top-word threshold: short distinct docs are
    # still dropped — thresholds are corpus-calibrated, not universal
    assert not out[2]["keep"]


def test_repetition_features_pure_repeat_doc(spark):
    d = _df(spark, [(7, "spam spam spam spam spam")])
    r = repetition_features(d).collect()[0]
    assert r["top_word_frac"] == 1.0
    assert r["dup_2gram_frac"] == 1.0
    assert r["dup_3gram_frac"] == 1.0
    assert not r["keep"]


def test_repetition_features_keep_path(spark):
    # 8 distinct words: top word 1/8 ≤ 0.15, no dup grams → keep
    d = _df(spark, [(3, "q w e r t y u i")])
    r = repetition_features(d).collect()[0]
    assert r["keep"]


def test_duplicated_shingle_fraction_mosaic(spark):
    # doc 3 is a mosaic: first 5 words copy doc 1, last 5 copy doc 2,
    # so every one of its 5-shingles that lies fully inside a copied
    # half is shared. With k=5 and 10 words there are 6 shingles; the
    # 2 boundary-free ones (positions 1 and 6) are shared, the 4
    # straddling shingles are unique.
    a = "alpha beta gamma delta epsilon"
    b = "one two three four five"
    d = _df(
        spark,
        [
            (1, a + " zeta eta theta iota kappa"),
            (2, "six seven eight nine ten " + b),
            (3, a + " " + b),
        ],
    )
    out = {r["doc_id"]: r for r in duplicated_shingle_fraction(d, k=5).collect()}
    assert out[3]["n_shingles"] == 6
    assert out[3]["dup_shingle_frac"] == round(2 / 6, 4)
    assert out[3]["keep"]
    # doc 1 shares exactly its first shingle with doc 3
    assert out[1]["n_shingles"] == 6
    assert out[1]["dup_shingle_frac"] == round(1 / 6, 4)


def test_duplicated_shingle_fraction_drop_above(spark):
    # exact duplicate pair: every shingle shared → frac 1.0, dropped
    d = _df(spark, [(1, "p q r s t u"), (2, "p q r s t u")])
    out = {r["doc_id"]: r for r in duplicated_shingle_fraction(d, k=5).collect()}
    for r in out.values():
        assert r["dup_shingle_frac"] == 1.0
        assert not r["keep"]


def test_vocabulary_counts_and_order(spark):
    d = _df(spark, [(1, "b a b c"), (2, "a b  a")])
    rows = vocabulary(d, top_k=2).collect()
    # tf: b=3, a=3 (tie → word asc), c=1 cut by top_k
    assert [(r["word"], r["tf"], r["df"]) for r in rows] == [
        ("a", 3, 2),
        ("b", 3, 2),
    ]


def test_vocabulary_df_counts_docs_not_occurrences(spark):
    d = _df(spark, [(1, "x x x"), (2, "x")])
    r = vocabulary(d, top_k=1).collect()[0]
    assert (r["word"], r["tf"], r["df"]) == ("x", 4, 2)
