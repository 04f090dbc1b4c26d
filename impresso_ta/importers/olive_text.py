"""Olive-format line normalization (SURVEY X3 + W4 at import time).

Olive's legacy OCR does not encode whitespace; multi-word expressions are
split into pseudo-tokens sharing a ``qid``. Re-implements the reference's
line normalization (ref: olive/helpers.py:27-125, :170-214):

- ``merge_pseudo_tokens``: tokens sharing an in-line qid merge into one
  token; merged coords = first token's (x, y) + last token's (w, h),
- ``normalize_hyphenation``: a trailing '-' marks hyphen-start; a bare
  '-' token with a normalized form merges into the preceding token,
- ``normalize_line``: runs the merges, drops non-qid normalized forms,
  then sets ``gn`` (glue/no-space) flags from the whitespace rules over
  the 3-token window.

Pure Python (runs inside the Olive parse UDTF); deliberately dict-based
like the other text-assembly kernels.
"""

from __future__ import annotations

from typing import Any

from impresso_ta.functions.whitespace import insert_whitespace


def merge_tokens(tokens: list[dict[str, Any]]) -> dict[str, Any]:
    """Merge consecutive pseudo-tokens into one (coords span first→last,
    style from the first; ref: olive/helpers.py:27-52)."""
    return {
        "tx": "".join(t.get("tx") or "" for t in tokens),
        "c": (tokens[0].get("c") or [None, None])[:2]
        + (tokens[-1].get("c") or [None, None, None, None])[2:],
        "s": tokens[0].get("s"),
    }


def merge_pseudo_tokens(line: dict[str, Any]) -> dict[str, Any]:
    """Merge in-line qid groups (ref: olive/helpers.py:55-97). qids that
    appear only once (word continues on the next line) are left alone."""
    tokens = line["t"]
    qid_counts: dict[str, int] = {}
    for tok in tokens:
        if tok.get("qid") is not None:
            qid_counts[tok["qid"]] = qid_counts.get(tok["qid"], 0) + 1
    inline_qids = {q for q, n in qid_counts.items() if n > 1}
    if not inline_qids:
        return line

    for qid in inline_qids:
        group = [t for t in tokens if t.get("qid") == qid]
        insertion_point = tokens.index(group[0])
        for t in group:
            tokens.remove(t)
        tokens.insert(insertion_point, merge_tokens(group))
    return line


def normalize_hyphenation(line: dict[str, Any]) -> dict[str, Any]:
    """End-of-line hyphen handling (ref: olive/helpers.py:100-125)."""
    tokens = line["t"]
    for i, token in enumerate(tokens):
        if i == len(tokens) - 1:
            tx = token.get("tx") or ""
            if tx.endswith("-") and tx != "-":
                token["hy"] = True
            if tx == "-" and token.get("nf") is not None and i > 0:
                prev_token = tokens[i - 1]
                line["t"] = tokens[:-2]
                line["t"].append(
                    {
                        "tx": (prev_token.get("tx") or "") + tx,
                        "c": (prev_token.get("c") or [None, None])[:2]
                        + (token.get("c") or [None] * 4)[2:],
                        "s": token.get("s"),
                        "hy": True,
                        "nf": token.get("nf"),
                    }
                )
    return line


def normalize_line(line: dict[str, Any], lang: str | None) -> dict[str, Any]:
    """Full Olive line normalization (ref: olive/helpers.py:170-214):
    qid merges, nf cleanup, then gn flags from the whitespace rules."""
    has_mw = any(t.get("qid") is not None for t in line["t"])
    if has_mw:
        line = merge_pseudo_tokens(line)
        line = normalize_hyphenation(line)

    tokens = line["t"]
    n = len(tokens)
    for i, token in enumerate(tokens):
        if token.get("qid") is None and token.get("nf") is not None and not token.get("hy"):
            token["nf"] = None
        token.pop("qid", None)

        prev_t = tokens[i - 1].get("tx") if i > 0 else None
        next_t = tokens[i + 1].get("tx") if i < n - 1 else None
        if not insert_whitespace(token.get("tx"), next_t, prev_t, lang):
            token["gn"] = True
    return line
