"""Edges of the round-8 additions: fuzzy blocked join (blocking recall
semantics, length prefilter losslessness) and PMI collocations (integer
exactness, single-token docs)."""

from pyspark.sql import functions as F

from impresso_ta.operators.fuzzy import fuzzy_blocked_join
from impresso_ta.operators.text_analysis import pmi_collocations


def test_fuzzy_blocked_join_matches_and_blocks(spark):
    left = spark.createDataFrame(
        [(1, "golden retriever"), (2, "zebra stripe")],
        "a_key long, a_name string",
    )
    right = spark.createDataFrame(
        [(10, "golden retriver"),   # 1 deletion, same block 'golden'
         (11, "golden retrvr"),     # 4 edits — verified out
         (12, "gulden retriever")], # 1 sub but DIFFERENT block — never compared
        "b_key long, b_name string",
    )
    got = {
        (r["a_key"], r["b_key"], r["edit_dist"])
        for r in fuzzy_blocked_join(
            left, right, "a_name", "b_name", max_dist=2
        ).collect()
    }
    assert got == {(1, 10, 1)}


def test_fuzzy_join_length_prefilter_is_lossless(spark):
    # same block ('abcd'), len diff 2 with exactly 2 edits: must survive
    left = spark.createDataFrame([(1, "abcd x")], "a_key long, a_name string")
    right = spark.createDataFrame(
        [(2, "abcd xef")], "b_key long, b_name string"
    )
    rows = fuzzy_blocked_join(
        left, right, "a_name", "b_name", max_dist=2
    ).collect()
    assert len(rows) == 1 and rows[0]["edit_dist"] == 2


def test_pmi_integer_exactness_and_edges(spark):
    # 'a b' x5 plus noise; single-token doc must not break synthesis
    docs = spark.createDataFrame(
        [("a b",)] * 5 + [("c",)] + [("a c b d",)],
        "text string",
    )
    rows = pmi_collocations(docs, min_count=5, top_n=10).collect()
    assert [(r["x"], r["y"]) for r in rows] == [("a", "b")]
    r = rows[0]
    # N=15 tokens (5x'a b' + 'c' + 'a c b d'), c_a=6, c_b=6, c_ab=5:
    # ((5*1e6) div 6) * 15 div 6 = 833333*15 div 6 = 2083332
    assert (r["c_xy"], r["c_x"], r["c_y"]) == (5, 6, 6)
    assert r["pmi_scaled"] == ((5 * 1_000_000) // 6) * 15 // 6


def test_pmi_plan_broadcasts_vocabulary(spark):
    docs = spark.createDataFrame([("a b c a b",)] * 4, "text string")
    plan = (
        pmi_collocations(docs, min_count=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_jaccard_prefix_matches_full_join(spark):
    """Prefix filtering is EXACT: same pairs as the all-shared-shingle
    join on the same corpus."""
    from impresso_ta.operators.dedup import jaccard_pairs, jaccard_prefix_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
        (3, "a completely different document about spark engines"),
        (4, "a completely different document about spark engines"),
        (5, "the quick brown fox sleeps under the lazy dog today"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    full = {(r["doc_a"], r["doc_b"], r["jaccard"])
            for r in jaccard_pairs(docs, k=3, threshold=0.5).collect()}
    pref = {(r["doc_a"], r["doc_b"], r["jaccard"])
            for r in jaccard_prefix_pairs(docs, k=3, threshold=0.5).collect()}
    assert pref == full and (3, 4, 1.0) in pref


def test_jaccard_prefix_prunes_boilerplate_candidates(spark):
    """A shingle shared by EVERY doc must generate no candidate pairs
    when it's not in anyone's prefix: N docs sharing only boilerplate
    produce zero candidates (the df² blowup the full join suffers)."""
    from impresso_ta.operators.dedup import jaccard_prefix_pairs

    # each doc: unique body + one boilerplate tail shared by all.
    # Unique shingles are rare (df=1) -> fill every prefix; the shared
    # shingle (df=N) sorts last and stays OUT of every prefix.
    rows = [
        (i, f"u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f u{i}g u{i}h "
            "shared boiler plate")
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = jaccard_prefix_pairs(docs, k=3, threshold=0.7)
    assert out.count() == 0  # no true pairs at 0.7 (and none leaked)
