"""BCUL (ABBYY FineReader) importer plugin.

Re-implements the reference's BCUL semantics (ref: importers/bcul/
helpers.py:129-260, bcul/classes.py:94-135, :359-410):

- issue directory: one ``*mit.xml`` metadata file + per-page ABBYY XML
  (possibly ``.xml.bz2`` — decompressed in-task),
- ABBYY coords are (l, t, r, b) → canonical [l, t, r-l, b-t],
- one content item PER PAGE (``tp='page'`` — remapped to None at rebuild,
  ref: helpers.py TYPE_MAPPINGS), all page regions carry that CI,
- words reassembled from per-character ``charParams`` runs: a new word
  starts at wordStart/wordFirst or after a space char; word coords start
  at the first char's box and extend to each following char's (r, b),
- lines without charParams fall back to ``formatting`` runs with
  line-level coords.
"""

from __future__ import annotations

import bz2
import os
import re
import xml.etree.ElementTree as ET
from typing import Any, Optional

from impresso_ta.importers.base import FormatPlugin, register

IIIF_IMG_BASE_URI = "https://scriptorium.bcu-lausanne.ch/api"


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _coords(el: ET.Element) -> Optional[list[int]]:
    try:
        l, t = int(el.get("l")), int(el.get("t"))
        r, b = int(el.get("r")), int(el.get("b"))
        return [l, t, r - l, b - t]
    except (TypeError, ValueError):
        return None


def parse_char_tokens(chars: list[ET.Element]) -> list[dict[str, Any]]:
    """charParams run → word tokens (ref: bcul/helpers.py:150-210)."""
    tokens: list[dict[str, Any]] = []
    tx: Optional[str] = None
    coords: Optional[list[int]] = None
    last_was_space = True
    for idx, ch in enumerate(chars):
        is_start = (ch.get("wordStart") in ("true", "1")) or (
            ch.get("wordFirst") in ("true", "1")
        )
        curr = ch.text
        if idx == 0 or is_start or last_was_space:
            if curr is not None and curr != " ":
                if tx is not None and coords:
                    tokens.append({"tx": tx, "c": coords})
                tx = curr
                coords = _coords(ch)
                last_was_space = False
        else:
            if curr is None or curr == " ":
                last_was_space = True
            else:
                tx = (tx or "") + curr
                if coords is not None:
                    try:
                        b, r = int(ch.get("b")), int(ch.get("r"))
                        coords[2] = r - coords[0]
                        coords[3] = b - coords[1]
                    except (TypeError, ValueError):
                        pass
    if tx is not None and coords:
        tokens.append({"tx": tx, "c": coords})
    return tokens


def parse_abbyy_page(xml_bytes: bytes, page_ci_id: str) -> list[dict]:
    """One ABBYY page file → canonical regions (ref: helpers.py:213-260)."""
    root = ET.fromstring(xml_bytes)
    regions = []
    for block in root.iter():
        if _strip_ns(block.tag) != "block":
            continue
        if (block.get("blockType") or "Text") != "Text":
            continue
        block_coords = _coords(block)
        lines = []
        for line in block.iter():
            if _strip_ns(line.tag) != "line":
                continue
            line_coords = _coords(line)
            chars = [c for c in line.iter() if _strip_ns(c.tag) == "charParams"]
            if chars:
                tokens = parse_char_tokens(chars)
            else:
                fmts = [f for f in line.iter() if _strip_ns(f.tag) == "formatting"]
                tokens = [
                    {"tx": "".join(f.itertext()), "c": line_coords} for f in fmts
                ]
            lines.append({"c": line_coords, "t": tokens})
        if lines:
            regions.append(
                {
                    "c": block_coords,
                    "p": [{"c": block_coords, "l": lines}],
                    "pOf": page_ci_id,
                }
            )
    return regions


def _read_maybe_bz2(path: str) -> bytes:
    if path.endswith(".bz2"):
        with bz2.open(path, "rb") as f:
            return f.read()
    with open(path, "rb") as f:
        return f.read()


class AbbyyBculPlugin(FormatPlugin):
    name = "abbyy_bcul"

    def parse_issue_dir(
        self, alias: str, date: str, edition: str, path: str
    ) -> dict[str, Any]:
        issue_id = f"{alias}-{date}-{edition}"
        page_files: dict[int, str] = {}
        for f in sorted(os.listdir(path)):
            m = re.search(r"page_(\d+)\.xml(\.bz2)?$", f)
            if m:
                page_files[int(m.group(1))] = os.path.join(path, f)
        if not page_files:
            raise FileNotFoundError(f"No ABBYY page XML files in {path}")

        cis = []
        pages = []
        for n, page_no in enumerate(sorted(page_files), start=1):
            ci_id = f"{issue_id}-i{str(n).zfill(4)}"
            page_id = f"{issue_id}-p{str(page_no).zfill(4)}"
            regions = parse_abbyy_page(
                _read_maybe_bz2(page_files[page_no]), ci_id
            )
            page_identifier = os.path.basename(page_files[page_no]).split(".")[0]
            cis.append(
                {
                    "m": {
                        "id": ci_id,
                        "pp": [page_no],
                        "tp": "page",
                        "ro": n,
                    },
                    "l": {"id": page_identifier},
                }
            )
            pages.append(
                {
                    "id": page_id,
                    "st": "newspaper",
                    "sm": "print",
                    "cc": True,
                    "iiif_img_base_uri": f"{IIIF_IMG_BASE_URI}/{page_identifier}",
                    "r": regions,
                }
            )

        return {
            "id": issue_id,
            "st": "newspaper",
            "sm": "print",
            "i": cis,
            "pp": [p["id"] for p in pages],
            "_pages": pages,
        }


register(AbbyyBculPlugin())
