"""Order-sensitive fulltext assembly (pure Python, runs inside UDTFs).

Re-implements the semantics of the reference's per-CI text rebuild
(ref: rebuilders/paper_rebuilders.py:10-174 ``rebuild_paper_text`` /
``rebuild_paper_text_passim`` and rebuilders/audio_rebuilders.py:11-84
``rebuild_audio_text``): a single ordered traversal
region→paragraph→line→token accumulating a running char offset (SURVEY W3),
a 3-token sliding window for whitespace decisions (W4), and hyphenation
handling (X2).

These functions are deliberately plain-Python: the traversal carries
cross-page state (the running ``string``), so it is one sequential pass per
content item. Distribution happens one level up (one task per issue via
``applyInPandas``); Arrow moves the nested page structs in batches.

Conventions: tokens are dicts with keys tx / c / hy / nf / gn (missing or
None both mean "absent", matching the canonical JSON where absent keys are
simply not serialized).
"""

from __future__ import annotations

from typing import Any, Optional

from impresso_ta.functions.whitespace import insert_whitespace


def _present(token: dict, key: str) -> bool:
    return token.get(key) is not None


def rebuild_text(
    regions: list[dict],
    language: Optional[str],
    string: Optional[str] = None,
) -> tuple[str, dict[str, list], dict[str, list]]:
    """Assemble fulltext for ONE page's regions of one content item.

    Returns ``(fulltext, coordinates, offsets)`` where coordinates holds the
    per-token offset index (``ppreb.t``) and region coords, and offsets the
    line/para/region break positions (ref: paper_rebuilders.py:10-97).
    Pass the previous page's fulltext as ``string`` to continue across pages.
    """
    coordinates: dict[str, list] = {"regions": [], "tokens": []}
    offsets: dict[str, list] = {"line": [], "para": [], "region": []}
    if string is None:
        string = ""

    for reg in regions:
        if len(string) > 0:
            offsets["region"].append(len(string))
        coordinates["regions"].append(reg.get("c"))

        for para in reg.get("p") or []:
            if len(string) > 0:
                offsets["para"].append(len(string))

            for line in para.get("l") or []:
                tokens = line.get("t") or []
                n_tok = len(tokens)
                for n, token in enumerate(tokens):
                    if not _present(token, "c"):
                        # tokens without coordinates are dropped outright
                        # (ref: paper_rebuilders.py:52-54)
                        continue
                    entry: dict[str, Any] = {"c": token["c"], "s": len(string)}

                    tx = token.get("tx")
                    hyphen_start = _present(token, "hy") and token["hy"]
                    token_text = None
                    if hyphen_start:
                        # first part of a hyphenated word: indexed but not
                        # emitted into the fulltext (the second part carries
                        # the normalized form); length convention mirrors
                        # ref: paper_rebuilders.py:60-61.
                        entry["l"] = len((tx or "")[:-1]) - 1
                        entry["hy1"] = True
                    elif _present(token, "nf"):
                        entry["l"] = len(token["nf"])
                        entry["hy2"] = True
                        token_text = token["nf"]
                    else:
                        entry["l"] = len(tx) if tx else 0
                        token_text = tx if tx is not None else ""

                    if not hyphen_start:
                        next_t = tokens[n + 1].get("tx") if n != n_tok - 1 else None
                        prev_t = tokens[n - 1].get("tx") if n != 0 else None
                        ws = insert_whitespace(tx, next_t, prev_t, language)
                        string += f"{token_text} " if ws else f"{token_text}"

                    if n == n_tok - 1:
                        # line break offset: at the start of a hyphenated
                        # tail, else after the EMITTED text. The reference
                        # uses len(tx) here (paper_rebuilders.py:92-93)
                        # which overshoots the fulltext when a normalized
                        # form shorter than tx ends a line (found by
                        # property testing); identical for plain tokens.
                        if hyphen_start:
                            offsets["line"].append(entry["s"])
                        else:
                            offsets["line"].append(
                                entry["s"] + len(token_text or "")
                            )

                    coordinates["tokens"].append(entry)

    return string, coordinates, offsets


def rebuild_text_passim(
    regions: list[dict],
    language: Optional[str],
    string: Optional[str] = None,
) -> tuple[str, list[dict]]:
    """Passim variant: every token becomes an output region with
    start/length/coords; line ends get ``\\n`` (ref:
    paper_rebuilders.py:100-174). Hyphenated parts are kept as-is.
    """
    out_regions: list[dict] = []
    if string is None:
        string = ""

    for reg in regions:
        for para in reg.get("p") or []:
            for line in para.get("l") or []:
                tokens = line.get("t") or []
                n_tok = len(tokens)
                for n, token in enumerate(tokens):
                    if not _present(token, "c"):
                        continue
                    c = token["c"]
                    out = {
                        "start": len(string),
                        "length": None,
                        "coords": {"x": c[0], "y": c[1], "w": c[2], "h": c[3]},
                    }
                    tx = token.get("tx") or ""
                    if n == n_tok - 1:
                        piece = f"{tx}\n"
                    else:
                        ws = insert_whitespace(
                            token.get("tx"),
                            tokens[n + 1].get("tx"),
                            tokens[n - 1].get("tx") if n != 0 else None,
                            language,
                        )
                        piece = f"{tx} " if ws else f"{tx}"
                    string += piece
                    out["length"] = len(piece)
                    out_regions.append(out)

    return string, out_regions


def rebuild_audio_text(
    sections: list[dict],
    language: Optional[str],
    string: Optional[str] = None,
) -> tuple[str, dict[str, list], dict[str, list]]:
    """Audio variant: section→utterance→speech-segment→token with time
    coords (ref: audio_rebuilders.py:11-84)."""
    coordinates: dict[str, list] = {"sections": [], "utterances": [], "tokens": []}
    offsets: dict[str, list] = {"speech_seg": [], "utterance": [], "section": []}
    if string is None:
        string = ""

    for sec in sections:
        if len(string) > 0:
            offsets["section"].append(len(string))
        coordinates["sections"].append(sec.get("tc"))

        for utterance in sec.get("u") or []:
            if len(string) > 0:
                offsets["utterance"].append(len(string))

            for speech_seg in utterance.get("ss") or []:
                tokens = speech_seg.get("t") or []
                n_tok = len(tokens)
                for n, token in enumerate(tokens):
                    if not _present(token, "tc"):
                        continue
                    entry: dict[str, Any] = {"tc": token["tc"], "s": len(string)}
                    tx = token.get("tx")
                    if tx:
                        entry["l"] = len(tx)
                        token_text = tx
                    else:
                        entry["l"] = 0
                        token_text = ""

                    if not (_present(token, "hy") and token.get("hy")):
                        next_t = tokens[n + 1].get("tx") if n != n_tok - 1 else None
                        prev_t = tokens[n - 1].get("tx") if n != 0 else None
                        ws = insert_whitespace(tx, next_t, prev_t, language)
                        string += f"{token_text} " if ws else f"{token_text}"

                    if n == n_tok - 1:
                        offsets["speech_seg"].append(entry["s"] + entry["l"])

                    coordinates["tokens"].append(entry)

    return string, coordinates, offsets
