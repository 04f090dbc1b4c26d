"""Whitespace rules — mirrors the reference's only true unit test
(ref: tests/test_tokenization.py) plus edge cases."""

from impresso_ta.functions.whitespace import insert_whitespace


def test_reference_asserts():
    # exact parity with ref tests/test_tokenization.py:4-9
    assert insert_whitespace("Lausanne", ",", None, "fr") is False
    assert insert_whitespace("(", "encore", None, "fr") is False
    assert insert_whitespace(".", "01", "52", "fr") is False
    assert insert_whitespace(",", "500", "000", "fr") is False
    assert insert_whitespace(",", "500", None, "fr") is True


def test_defaults_and_unknown_language():
    assert insert_whitespace("mot", "suivant", None, "fr") is True
    # unknown language → None (falsy), parity with ref tokenization.py:23-27
    assert insert_whitespace("word", "next", None, "xx") is None
    assert insert_whitespace("word", "next", None, None) is None


def test_hyphen_and_apostrophe():
    assert insert_whitespace("-", "mot", "un", "fr") is False
    assert insert_whitespace("mot", "-", "un", "fr") is False
    assert insert_whitespace("'", "a", "l", "fr") is False


def test_german_guillemets():
    assert insert_whitespace("Wort", "»", None, "de") is False
    assert insert_whitespace("«", "Wort", None, "de") is False
    # decimal point between digits stays unspaced
    assert insert_whitespace(".", "5", "3", "de") is False
