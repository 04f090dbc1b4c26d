"""Bit-parity of the Arrow MinHash signature pass vs the expression
form (r12: minhash_arrow.minhash_signatures_arrow replaces the shingle
explode + 24-min groupBy for the batch dedup operators)."""

from pyspark.sql import functions as F

from impresso_ta.operators import dedup
from impresso_ta.operators.minhash_arrow import minhash_signatures_arrow

# tokenizer / gram edges: empty text (one "" shingle), whitespace-only,
# NULL (absent from output), sub-k docs (ONE short gram), leading
# non-space whitespace (kept empty token), unicode, exact clones,
# repeated shingles inside one doc (array_distinct), long docs
ADVERSARIAL = [
    (1, ""),
    (2, "   "),
    (3, None),
    (4, "one"),
    (5, "two words"),
    (6, "exactly three words"),
    (7, "a b c d e f g h"),
    (8, "a b c d e f g h"),  # clone of 7
    (9, "\tleading tab keeps an empty token here"),
    (10, "ünïcode wörds répétés ünïcode wörds répétés ünïcode wörds"),
    (11, "a a a a a a a a a a"),
    (12, " ".join(f"w{i % 37}" for i in range(400))),
    (13, "trailing newline keeps empty\n"),
]


def _docs(spark):
    return spark.createDataFrame(ADVERSARIAL, "doc_id long, text string")


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_signature_parity(spark):
    docs = _docs(spark)
    arrow = minhash_signatures_arrow(
        docs, "doc_id", "text", k=3, num_perm=24, with_sets=True
    )
    sh, sigs, _ = dedup._minhash_parts(
        docs, "doc_id", "text", 3, 24, 8, engine="expr"
    )
    sets = sh.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("h")).alias("hs"),
        F.count("*").alias("n_shingles"),
    )
    expr = sigs.join(sets.select("doc_id", "hs"), "doc_id")
    cols = arrow.columns
    assert _sorted_rows(arrow.select(cols)) == _sorted_rows(
        expr.select(cols)
    )


def test_lsh_pairs_and_survivors_parity(spark, sf_dir):
    from impresso_ta.queries import t

    docs = t(spark, sf_dir, "documents")
    for build in (
        lambda eng: dedup.minhash_lsh_pairs(docs, engine=eng),
        lambda eng: dedup.minhash_dedup_survivors(docs, engine=eng),
    ):
        assert _sorted_rows(build("arrow")) == _sorted_rows(build("expr"))
        spark.catalog.clearCache()


def test_incremental_parity(spark, sf_dir):
    from impresso_ta.queries import t

    docs = t(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 2 == 1)
    ex = docs.filter(F.col("doc_id") % 2 == 0)
    a = dedup.incremental_minhash_dedup(new, ex, engine="arrow")
    e = dedup.incremental_minhash_dedup(new, ex, engine="expr")
    assert _sorted_rows(a.select("doc_id")) == _sorted_rows(
        e.select("doc_id")
    )
    spark.catalog.clearCache()


def test_adversarial_end_ops_parity(spark):
    docs = _docs(spark)
    a = dedup.minhash_dedup_survivors(docs, engine="arrow")
    e = dedup.minhash_dedup_survivors(docs, engine="expr")
    assert _sorted_rows(a) == _sorted_rows(e)
    spark.catalog.clearCache()
