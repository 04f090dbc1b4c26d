"""Exact-substring dedup (Lee et al. 2022 ExactSubstr semantics):
repeated k-token windows removed everywhere except their globally-first
(doc_id, pos) occurrence; overlapping duplicate windows union their
coverage; short documents pass through untouched."""

from impresso_ta.operators.dedup import exact_substring_dedup


def _run(spark, rows, k=4):
    d = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["kept_text"])
        for r in exact_substring_dedup(d, k=k).collect()
    }


def test_cross_doc_boilerplate_removed_from_later_doc(spark):
    boiler = "all rights reserved contact us"
    rows = [
        (1, f"unique alpha text {boiler}"),
        (2, f"{boiler} different beta body"),
    ]
    got = _run(spark, rows, k=5)
    # doc 1 holds the first occurrence -> untouched
    assert got[1] == (8, 0, f"unique alpha text {boiler}")
    # doc 2's copy of the 5-token boilerplate window is removed
    n_tokens, n_removed, kept = got[2]
    assert n_tokens == 8 and n_removed == 5
    assert kept == "different beta body"


def test_within_doc_repetition_removed_at_second_occurrence(spark):
    rows = [(7, "spam eggs ham toast middle spam eggs ham toast")]
    got = _run(spark, rows, k=4)
    n_tokens, n_removed, kept = got[7]
    assert n_tokens == 9 and n_removed == 4
    assert kept == "spam eggs ham toast middle"


def test_short_docs_untouched(spark):
    rows = [(1, "too short"), (2, "too short")]  # < k tokens: no windows
    got = _run(spark, rows, k=4)
    assert got[1] == (2, 0, "too short")
    assert got[2] == (2, 0, "too short")


def test_overlapping_duplicate_windows_union_coverage(spark):
    # the 5-token repeat yields two overlapping duplicate 4-windows in
    # doc 2; coverage is their union (all 5 tokens), not 8
    rep = "one two three four five"
    rows = [(1, f"{rep} ending alpha beta"), (2, f"{rep} other tail words")]
    got = _run(spark, rows, k=4)
    assert got[1][1] == 0
    n_tokens, n_removed, kept = got[2]
    assert n_tokens == 8 and n_removed == 5
    assert kept == "other tail words"


def test_first_occurrence_is_global_min_doc_then_pos(spark):
    rep = "w x y z"
    rows = [
        (5, f"{rep} padding tokens here"),
        (3, f"lead {rep} trail tokens"),  # doc 3 < doc 5: doc 3 keeps it
    ]
    got = _run(spark, rows, k=4)
    assert got[3][1] == 0
    assert got[5][1] == 4
    assert got[5][2] == "padding tokens here"


def test_deterministic(spark):
    rows = [(i, f"base text block {i % 3} repeated tokens body") for i in range(30)]
    a = _run(spark, rows, k=4)
    b = _run(spark, rows, k=4)
    assert a == b


def test_string_ids_survive_untouched(spark):
    """Non-numeric doc ids must pass through — a failed numeric cast
    silently dropping documents was the round-5 hazard. First
    occurrence uses the id column's native (lexicographic) order."""
    boiler = "all rights reserved contact us"
    d = spark.createDataFrame(
        [("art-b", f"{boiler} later body text"),
         ("art-a", f"lead in {boiler}")],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: (r["n_removed"], r["kept_text"])
        for r in exact_substring_dedup(d, k=5).collect()
    }
    assert set(got) == {"art-a", "art-b"}  # nothing dropped
    assert got["art-a"] == (0, f"lead in {boiler}")  # 'art-a' < 'art-b'
    assert got["art-b"] == (5, "later body text")


def test_pathological_fully_duplicated_long_doc(spark):
    """A long document that is one phrase repeated end-to-end marks
    nearly every window for removal (n_removals ~ n_tokens). The gap
    sweep must stay linear: the old per-token exists() scan was
    O(n_tokens x n_removals) here. Expected survivors: the first k
    tokens (the globally-first window) plus the tokens after the last
    complete duplicate window's coverage."""
    reps = 2500  # 10k tokens, ~9.99k removal windows
    text = " ".join("alpha beta gamma delta" for _ in range(reps))
    got = _run(spark, [(1, text)], k=4)
    n_tokens, n_removed, kept = got[1]
    assert n_tokens == 4 * reps
    # only 4 distinct window contents exist (the 4 rotations of the
    # phrase), first occurring at positions 1-4; every window starting
    # at 5..n-3 repeats one of them -> tokens 5..n covered, 1-4 kept.
    assert kept == "alpha beta gamma delta"
    assert n_removed == n_tokens - 4
