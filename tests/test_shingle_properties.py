"""Property test: the zip_with shingle construction (dedup.word_shingles)
matches the naive sliding-window reference on arbitrary word lists."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from impresso_ta.operators.dedup import word_shingles

_WORD = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=8,
)


def _ref_shingles(words: list[str], k: int) -> set[str]:
    if len(words) < k:
        return {" ".join(words)}
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


@given(words=st.lists(_WORD, min_size=1, max_size=25), k=st.integers(2, 4))
@settings(max_examples=25, deadline=None)
def test_word_shingles_matches_reference(spark, words, k):
    text = " ".join(words)
    got = spark.range(1).select(
        word_shingles(F.lit(text), k).alias("sh")
    ).collect()[0]["sh"]
    assert set(got) == _ref_shingles(words, k)
    # distinctness
    assert len(got) == len(set(got))
