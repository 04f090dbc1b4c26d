"""Language-aware whitespace insertion rules for OCR token assembly.

Re-implements natively (the reference imports these from the public
``impresso_essentials.text_utils``; a duplicated copy lives at
ref: text_preparation/tokenization.py:9-60 and the rules table at
ref: text_preparation/importers/tetml/tetml2canonical.py:917-932).

Semantics (ref: tokenization.py:29-60):
- no space around apostrophe/hyphen-like tokens,
- no space *before* closing punctuation (the check is on the FOLLOWING
  token), no space *after* opening punctuation,
- digit-grouping: ``500,000`` / ``3.14`` stay unspaced when a ``.``/``,``
  token is surrounded by digit tokens,
- unknown language → ``None`` (falsy → concatenated without space), exactly
  as the reference behaves.

This is a pure Python function used inside the rebuild UDTF (the hot path
is Arrow-batched; per-token work is unavoidable — the decision depends on a
3-token sliding window, ref: paper_rebuilders.py:76-83).
"""

from __future__ import annotations

# fr/de mirror ref tetml2canonical.py:917-932; en/lb/it are engine
# extensions following the same shape (the reference corpus includes these
# languages but delegates their rules to impresso_essentials).
_NO_WS_BEFORE_FR = frozenset([".", ",", ")", "]", "}", "°", "..."])
_NO_WS_BEFORE_DE = frozenset([".", ";", ":", ",", ")", "]", "}", "°", "...", "»"])
_NO_WS_BEFORE_EN = frozenset([".", ",", ";", ":", ")", "]", "}", "°", "...", "!", "?"])

WHITESPACE_RULES: dict[str, dict[str, frozenset[str]]] = {
    "fr": {
        "pct_no_ws_before": _NO_WS_BEFORE_FR,
        "pct_no_ws_after": frozenset(["(", "[", "{"]),
        "pct_no_ws_before_after": frozenset(["'", "-"]),
        "pct_number": frozenset([".", ","]),
    },
    "de": {
        "pct_no_ws_before": _NO_WS_BEFORE_DE,
        "pct_no_ws_after": frozenset(["(", "[", "{", "«"]),
        "pct_no_ws_before_after": frozenset(["-"]),
        "pct_number": frozenset([".", ","]),
    },
    "en": {
        "pct_no_ws_before": _NO_WS_BEFORE_EN,
        "pct_no_ws_after": frozenset(["(", "[", "{"]),
        "pct_no_ws_before_after": frozenset(["'", "-"]),
        "pct_number": frozenset([".", ","]),
    },
    "lb": {
        "pct_no_ws_before": _NO_WS_BEFORE_DE,
        "pct_no_ws_after": frozenset(["(", "[", "{", "«"]),
        "pct_no_ws_before_after": frozenset(["-"]),
        "pct_number": frozenset([".", ","]),
    },
    "it": {
        "pct_no_ws_before": _NO_WS_BEFORE_FR,
        "pct_no_ws_after": frozenset(["(", "[", "{"]),
        "pct_no_ws_before_after": frozenset(["'", "-"]),
        "pct_number": frozenset([".", ","]),
    },
}


def insert_whitespace(
    token: str | None,
    next_t: str | None,
    prev_t: str | None,
    lang: str | None,
) -> bool | None:
    """Whether a whitespace should be inserted after ``token``.

    Returns ``None`` (falsy) for unknown languages — parity with
    ref: tokenization.py:23-27.
    """
    rules = WHITESPACE_RULES.get(lang) if lang else None
    if rules is None:
        return None

    if (
        token in rules["pct_no_ws_before_after"]
        or next_t in rules["pct_no_ws_before_after"]
    ):
        return False
    if next_t in rules["pct_no_ws_before"]:
        return False
    if token in rules["pct_no_ws_after"]:
        return False
    if (
        token in rules["pct_number"]
        and prev_t is not None
        and next_t is not None
    ):
        return not (prev_t.isdigit() and next_t.isdigit())
    return True
