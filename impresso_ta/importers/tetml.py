"""TETML (PDFlib TET) importer plugin — FedGaz-style issues.

Re-implements the reference's TETML import semantics
(ref: importers/tetml/classes.py:59-157, tetml/helpers.py:43-373) with
stdlib ElementTree:

- one ``*.tetml`` file per article; files sorted → CI ``i{n:04}`` minted
  in file order (deterministic, SURVEY W2),
- article page ranges assigned sequentially across files
  (ref: classes.py:130-133 — a page belongs to exactly one file),
- word boxes converted from PDF bottom-left coordinates to IIIF
  top-left pixel space through the placed-image/TIFF ratios
  (ref: helpers.py:223-284 ``compute_box``, including its w-ratio height
  quirk — kept for output parity),
- hyphenated words (two boxes) split into a ``hy`` head and an ``nf``
  tail; >2 boxes treated as one word with the enclosing box (A7),
- special-symbol tokens filtered (F9), leading page-number token dropped,
- ``gn`` glue flags from the whitespace rules (X1).
"""

from __future__ import annotations

import math
import os
import re
import xml.etree.ElementTree as ET
from pathlib import Path
from typing import Any, Optional

from impresso_ta.functions.whitespace import insert_whitespace
from impresso_ta.importers.base import FormatPlugin, register

IIIF_ENDPOINT_URI = "https://impresso-project.ch/api/proxy/iiif/"
FILTER_WORDS = {"#", "ST", "#ST", "ST#", "#ST#"}


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _children(el: ET.Element, name: str):
    return [c for c in el.iter() if _strip_ns(c.tag) == name]


def _compute_box(
    llx: float, lly: float, urx: float, ury: float,
    pageheight: float, ratiow: float, ratioh: float,
) -> list[int]:
    """PDF (origin bottom-left, points) → IIIF (origin top-left, pixels).
    Mirrors ref helpers.py:274-284 including its use of the width ratio
    for the height term (output parity with the reference)."""
    x = llx * ratiow
    y = (pageheight - ury) * ratioh
    x2 = urx * ratiow
    y2 = (pageheight - ury) * ratiow + (ury - lly) * ratiow
    return [math.ceil(x), math.floor(y), math.ceil(x2 - x), math.ceil(y2 - y)]


def _bounding(boxes: list[list[int]]) -> list[int]:
    x1 = min(b[0] for b in boxes)
    y1 = min(b[1] for b in boxes)
    x2 = max(b[0] + b[2] for b in boxes)
    y2 = max(b[1] + b[3] for b in boxes)
    return [x1, y1, x2 - x1, y2 - y1]


def _word_tokens(
    word: ET.Element, pageheight: float, ratiow: float, ratioh: float
) -> list[dict[str, Any]]:
    """One TETML Word → 1 token, or 2 tokens when hyphenated
    (ref: helpers.py:75-220)."""
    boxes = _children(word, "Box")
    texts = _children(word, "Text")
    text = texts[0].text if texts else None

    def box_coords(b):
        return _compute_box(
            float(b.get("llx")), float(b.get("lly")),
            float(b.get("urx")), float(b.get("ury")),
            pageheight, ratiow, ratioh,
        )

    if len(boxes) == 1:
        if text is None:
            return []
        return [{"tx": text, "c": box_coords(boxes[0])}]
    if len(boxes) == 2:
        head_tx = "".join(g.text or "" for g in _children(boxes[0], "Glyph"))
        tail_tx = "".join(g.text or "" for g in _children(boxes[1], "Glyph"))
        return [
            {"tx": head_tx, "c": box_coords(boxes[0]), "hy": True},
            {"tx": tail_tx, "c": box_coords(boxes[1]), "nf": text},
        ]
    if len(boxes) > 2:
        if text is None:
            return []
        return [{"tx": text, "c": _bounding([box_coords(b) for b in boxes])}]
    return []


def _is_page_number(tx: str, i_line: int, i_word: int) -> bool:
    return (
        any(ch.isdigit() for ch in tx)
        and len(tx) < 4
        and i_line == 0
        and i_word < 3
    )


def _add_gn(tokens: list[dict], language: Optional[str]) -> None:
    n = len(tokens)
    for i, tok in enumerate(tokens):
        prev_t = tokens[i - 1]["tx"] if i > 0 else None
        next_t = tokens[i + 1]["tx"] if i < n - 1 else None
        if not insert_whitespace(tok.get("tx"), next_t, prev_t, language):
            tok["gn"] = True


def parse_tetml_article(
    xml_bytes: bytes, language: Optional[str]
) -> list[list[dict]]:
    """One TETML file → list of pages, each a list of canonical regions
    (one region per Para, one paragraph per region — the TETML layout
    model, same shape the ALTO path produces)."""
    root = ET.fromstring(xml_bytes)

    # image pixel dimensions for the coordinate ratios
    placed = _children(root, "PlacedImage")
    images = {img.get("id"): img for img in _children(root, "Image")}

    pages_out: list[list[dict]] = []
    for page in _children(root, "Page"):
        pageheight = float(page.get("height"))

        pi = _children(page, "PlacedImage")
        pi = pi[0] if pi else (placed[0] if placed else None)
        if pi is not None and pi.get("image") in images:
            img = images[pi.get("image")]
            ratiow = float(img.get("width")) / float(pi.get("width"))
            ratioh = float(img.get("height")) / float(pi.get("height"))
        else:
            ratiow = ratioh = 1.0

        regions: list[dict] = []
        i_line_global = 0
        for para in _children(page, "Para"):
            lines_out = []
            for line in _children(para, "Line"):
                tokens: list[dict] = []
                i_word = 0
                for word in _children(line, "Word"):
                    for tok in _word_tokens(word, pageheight, ratiow, ratioh):
                        if tok["tx"] in FILTER_WORDS:
                            continue
                        if _is_page_number(tok["tx"] or "", i_line_global, i_word):
                            i_word += 1
                            continue
                        tokens.append(tok)
                        i_word += 1
                if tokens:
                    _add_gn(tokens, language)
                    lines_out.append(
                        {"c": _bounding([t["c"] for t in tokens]), "t": tokens}
                    )
                i_line_global += 1
            if lines_out:
                region_box = _bounding([ln["c"] for ln in lines_out])
                regions.append(
                    {"c": region_box, "p": [{"c": region_box, "l": lines_out}]}
                )
        pages_out.append(regions)
    return pages_out


class TetmlPlugin(FormatPlugin):
    """FedGaz-style TETML issues (one file per article)."""

    name = "tetml"
    language: Optional[str] = "de"  # FedGaz corpus is German

    def parse_issue_dir(
        self, alias: str, date: str, edition: str, path: str
    ) -> dict[str, Any]:
        issue_id = f"{alias}-{date}-{edition}"
        files = sorted(str(p) for p in Path(path).rglob("*.tetml"))
        if not files:
            raise FileNotFoundError(f"No *.tetml files in {path}")

        cis: list[dict] = []
        page_regions: dict[int, list[dict]] = {}
        current_page = 1
        for i, fname in enumerate(files, start=1):
            ci_id = f"{issue_id}-i{str(i).zfill(4)}"
            with open(fname, "rb") as f:
                pages = parse_tetml_article(f.read(), self.language)
            page_nos = list(range(current_page, current_page + len(pages)))
            current_page += len(pages)
            for page_no, regions in zip(page_nos, pages):
                for reg in regions:
                    reg["pOf"] = ci_id
                page_regions[page_no] = regions
            cis.append(
                {
                    "m": {
                        "id": ci_id,
                        "pp": page_nos,
                        "tp": "article",
                        # the reference gets lg from the FedGaz metadata
                        # lookup (J9, ref fedgaz/classes.py:175-241); the
                        # plugin-level language is the generic-TETML default
                        "lg": self.language,
                        "ro": i,
                    },
                    "l": {
                        "id": os.path.basename(fname),
                        "source": re.sub(r"^.*?(?=[^/]+$)", "", fname),
                    },
                }
            )

        pages_out = []
        for page_no in sorted(page_regions):
            page_id = f"{issue_id}-p{str(page_no).zfill(4)}"
            pages_out.append(
                {
                    "id": page_id,
                    "st": "newspaper",
                    "sm": "print",
                    "cc": True,
                    "iiif_img_base_uri": IIIF_ENDPOINT_URI + page_id,
                    "r": page_regions[page_no],
                }
            )

        return {
            "id": issue_id,
            "st": "newspaper",
            "sm": "print",
            "i": cis,
            "pp": [p["id"] for p in pages_out],
            "_pages": pages_out,
        }


register(TetmlPlugin())
