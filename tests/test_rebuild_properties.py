"""Property-based invariants for the text-assembly kernel (hypothesis).

The reference has no randomized testing (SURVEY §5); these properties
encode FIXTURES.md §8.3 over arbitrary canonical page structures:
- every token's s+l stays within the fulltext,
- break offsets are monotonically non-decreasing and in-range,
- cross-page continuation equals concatenated assembly,
- assembly is deterministic.
"""

from hypothesis import given, settings, strategies as st

from impresso_ta.rebuild.text import rebuild_text

_token_text = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Po")),
    min_size=0,
    max_size=8,
)


@st.composite
def tokens(draw):
    tx = draw(_token_text)
    kind = draw(st.sampled_from(["plain", "plain", "plain", "hy", "nf"]))
    tok = {"tx": tx, "c": [draw(st.integers(0, 5000)) for _ in range(4)]}
    if kind == "hy":
        tok["hy"] = True
    elif kind == "nf":
        tok["nf"] = draw(_token_text)
    # occasionally drop coordinates (token must be skipped)
    if draw(st.booleans()) and draw(st.integers(0, 9)) == 0:
        tok["c"] = None
    return tok


@st.composite
def regions(draw):
    n_paras = draw(st.integers(1, 3))
    return {
        "c": [0, 0, 100, 100],
        "p": [
            {
                "c": None,
                "l": [
                    {"c": None, "t": draw(st.lists(tokens(), max_size=6))}
                    for _ in range(draw(st.integers(1, 3)))
                ],
            }
            for _ in range(n_paras)
        ],
    }


pages = st.lists(regions(), min_size=0, max_size=4)
langs = st.sampled_from([None, "fr", "de", "en", "xx"])


@settings(max_examples=200, deadline=None)
@given(page=pages, lang=langs)
def test_offsets_within_fulltext(page, lang):
    ft, coords, offsets = rebuild_text(page, lang)
    for t in coords["tokens"]:
        assert t["s"] <= len(ft)
        if not t.get("hy1"):
            assert t["s"] + max(t["l"], 0) <= len(ft)
    for seq in (offsets["line"], offsets["para"], offsets["region"]):
        assert all(0 <= o <= len(ft) for o in seq)
        assert seq == sorted(seq)


@settings(max_examples=100, deadline=None)
@given(page=pages, lang=langs)
def test_deterministic(page, lang):
    assert rebuild_text(page, lang) == rebuild_text(page, lang)


@settings(max_examples=100, deadline=None)
@given(p1=pages, p2=pages, lang=langs)
def test_cross_page_continuation_is_concatenation(p1, p2, lang):
    ft1, _, _ = rebuild_text(p1, lang)
    ft_cont, _, _ = rebuild_text(p2, lang, ft1 or None)
    ft2_alone, _, _ = rebuild_text(p2, lang)
    assert ft_cont == ft1 + ft2_alone
