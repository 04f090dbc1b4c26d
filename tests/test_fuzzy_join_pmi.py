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


def test_fuzzy_contracted_expansion_identity(spark):
    """contracted=True carries the SAME information as the expanded
    default: every expanded row pair is one contracted value pair
    fanned n_left x n_right ways, with the same edit_dist."""
    left = spark.createDataFrame(
        [(i, "golden retriever") for i in range(3)]
        + [(10, "golden retriver"), (11, "zebra stripe")],
        "a_key long, a_name string",
    )
    right = spark.createDataFrame(
        [(20, "golden retriever"), (21, "golden retriever"),
         (22, "golden retrvr"), (23, "zebra stripes")],
        "b_key long, b_name string",
    )
    expanded = fuzzy_blocked_join(
        left, right, "a_name", "b_name", max_dist=2
    ).collect()
    contracted = fuzzy_blocked_join(
        left, right, "a_name", "b_name", max_dist=2, contracted=True
    ).collect()
    # identity 1: total expanded rows == sum(n_left * n_right)
    assert len(expanded) == sum(r["n_left"] * r["n_right"] for r in contracted)
    # identity 2: the (value_l, value_r, edit_dist) sets agree
    exp_pairs = {(r["a_name"], r["b_name"], r["edit_dist"]) for r in expanded}
    con_pairs = {
        (r["value_l"], r["value_r"], r["edit_dist"]) for r in contracted
    }
    assert exp_pairs == con_pairs
    # identity 3: multiplicities are the true per-value row counts
    got = {(r["value_l"], r["value_r"]): (r["n_left"], r["n_right"])
           for r in contracted}
    assert got[("golden retriever", "golden retriever")] == (3, 2)
    assert got[("golden retriver", "golden retriever")] == (1, 2)
    assert got[("zebra stripe", "zebra stripes")] == (1, 1)


def test_fuzzy_contracted_requires_collapse(spark):
    import pytest

    df = spark.createDataFrame([(1, "x")], "a_key long, a_name string")
    with pytest.raises(ValueError, match="collapse_clones"):
        fuzzy_blocked_join(
            df, df, "a_name", "a_name",
            collapse_clones=False, contracted=True,
        )


def test_jaccard_contracted_expansion_identity(spark):
    """The contracted frame's pair mass equals the expanded form:
    sum(n_a*n_b) over inter rows + sum(m*(m-1)/2) over clique rows
    == len(jaccard_prefix_pairs), and fanning each inter row through
    its clone groups reproduces the expanded pair set exactly."""
    from impresso_ta.operators.dedup import (
        jaccard_prefix_contracted,
        jaccard_prefix_pairs,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),   # clone of 1
        (3, "the quick brown fox jumps over the lazy dog tonight"),
        (4, "a completely different document about spark engines"),
        (5, "a completely different document about spark engines"), # clone of 4
        (6, "a completely different document about spark engines"), # clone of 4
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    expanded = jaccard_prefix_pairs(docs, k=3, threshold=0.5).collect()
    con = jaccard_prefix_contracted(docs, k=3, threshold=0.5).collect()
    inter = [r for r in con if r["doc_a"] != r["doc_b"]]
    intra = [r for r in con if r["doc_a"] == r["doc_b"]]
    mass = sum(r["n_a"] * r["n_b"] for r in inter) + sum(
        r["n_a"] * (r["n_a"] - 1) // 2 for r in intra
    )
    assert mass == len(expanded)
    # clique rows: group {1,2} (m=2) and {4,5,6} (m=3), jaccard 1.0
    assert {(r["doc_a"], r["n_a"], r["jaccard"]) for r in intra} == {
        (1, 2, 1.0), (4, 3, 1.0),
    }
    # fan the inter rows through clone membership and compare exactly
    members = {1: [1, 2], 3: [3], 4: [4, 5, 6]}
    fanned = set()
    for r in inter:
        for x in members[r["doc_a"]]:
            for y in members[r["doc_b"]]:
                fanned.add((min(x, y), max(x, y), r["jaccard"]))
    for r in intra:
        ids = members[r["doc_a"]]
        for i, x in enumerate(ids):
            for y in ids[i + 1:]:
                fanned.add((x, y, 1.0))
    assert fanned == {
        (r["doc_a"], r["doc_b"], r["jaccard"]) for r in expanded
    }
