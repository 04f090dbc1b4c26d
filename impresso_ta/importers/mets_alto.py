"""Generic METS/ALTO importer plugin.

Re-implements the semantics of the reference's generic Mets/Alto layer
(ref: importers/mets_alto/alto.py:30-152 token/region/style parsing,
classes.py:120-135 block→CI mapping, and the structMap-driven CI
extraction its five subclasses share) with stdlib ``xml.etree`` — no
BeautifulSoup, no lxml dependency; parsing happens executor-side inside
the import UDTF (SURVEY S5).

Token semantics (ref: alto.py:50-68):
- ``String`` elements → tokens with [x,y,w,h] from HPOS/VPOS/WIDTH/HEIGHT
  (int(float(...)) — ALTO files carry decimals),
- ``SUBS_TYPE=HypPart1`` → tx += '-', hy=True,
- ``SUBS_TYPE=HypPart2`` → nf = SUBS_CONTENT,
- strings without coordinates are skipped with a note.

CI extraction: logical ``structMap`` divs that are not page/issue
containers become content items ordered by (ORDER, ID) — an explicitly
total order so CI numbering is deterministic across runs (SURVEY W2:
stable IDs are a hard engine invariant).
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET
from typing import Any, Optional

from impresso_ta.importers.base import (
    FormatPlugin,
    read_bytes_with_retries,
    register,
)

# Transparent container divs (recursed through, never CIs themselves)
_CONTAINER_TYPES = {
    "page",
    "issue",
    "volume",
    "newspaper",
    "title_section",
    "content",
    "document",
}

# div TYPEs that ARE content items: everything underneath them (heading,
# body, paragraph, text, author, ...) contributes parts, not new CIs
# (observed in BNL METS: ARTICLE > HEADING/BODY/BODY_CONTENT/PARAGRAPH
# divs each carrying <area BEGIN=block-id>)
_CI_TYPES = {
    "article": "article",
    "advertisement": "advertisement",
    "section": "section",
    "death_notice": "death_notice",
    "obituary": "obituary",
    "weather": "weather",
    "image": "image",
    "illustration": "image",
    "picture": "image",
    "table": "table",
    "chronicle": "chronicle",
}

# component divs that only become CIs when they appear OUTSIDE any
# CI-type div (e.g. TEXTBLOCK/HEADLINE children of TITLE_SECTION)
_COMPONENT_AS_CI = {
    "textblock": "article",
    "headline": "article",
    "motto": "article",
    "publishing_stmt": "article",
    "paragraph": "article",
    "text": "article",
}


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _iter_named(root: ET.Element, name: str):
    for el in root.iter():
        if _strip_ns(el.tag) == name:
            yield el


def _coords(el: ET.Element) -> Optional[list[int]]:
    try:
        return [
            int(float(el.get("HPOS"))),
            int(float(el.get("VPOS"))),
            int(float(el.get("WIDTH"))),
            int(float(el.get("HEIGHT"))),
        ]
    except (TypeError, ValueError):
        return None


def parse_alto_styles(root: ET.Element) -> list[dict]:
    """TextStyle elements → canonical styles (ref: alto.py:129-152)."""
    styles = []
    for st in _iter_named(root, "TextStyle"):
        name = st.get("FONTFAMILY")
        if st.get("FONTSTYLE"):
            name = f"{name}-{st.get('FONTSTYLE')}"
        fs = st.get("FONTSIZE")
        styles.append(
            {
                "id": _style_num(st.get("ID")),
                "f": name,
                "fs": float(fs) if fs not in (None, "") else None,
                "rgb": None,
            }
        )
    return styles


def _style_num(style_id: Optional[str]) -> Optional[int]:
    if style_id is None:
        return None
    m = re.search(r"(\d+)$", style_id)
    return int(m.group(1)) if m else None


def parse_alto_page(
    xml_bytes: bytes, mappings: dict[str, str]
) -> tuple[list[dict], list[str], list[dict]]:
    """One ALTO file → (regions, notes, styles).

    ``mappings``: OCR block id → canonical CI id (built from the issue's
    legacy parts, ref: classes.py:120-131; SURVEY J5).
    """
    root = ET.fromstring(xml_bytes)
    regions: list[dict] = []
    notes: list[str] = []

    for ps in _iter_named(root, "PrintSpace"):
        for block in _iter_named(ps, "TextBlock"):
            block_coords = _coords(block)
            lines = []
            first_string_id: Optional[str] = None
            for line_el in _iter_named(block, "TextLine"):
                tokens = []
                for child in list(line_el):
                    if _strip_ns(child.tag) != "String":
                        continue
                    if first_string_id is None:
                        first_string_id = child.get("ID")
                    c = _coords(child)
                    if c is None:
                        notes.append(
                            f"Token {child.get('ID')} does not have coordinates"
                        )
                        continue
                    token: dict[str, Any] = {"tx": child.get("CONTENT"), "c": c}
                    subs = child.get("SUBS_TYPE")
                    if subs == "HypPart1":
                        token["tx"] = (token["tx"] or "") + "-"
                        token["hy"] = True
                    elif subs == "HypPart2":
                        token["nf"] = child.get("SUBS_CONTENT")
                    style = _style_num(
                        (child.get("STYLEREFS") or "").split(" ")[0] or None
                    )
                    if style is not None:
                        token["s"] = style
                    tokens.append(token)
                lines.append({"c": _coords(line_el), "t": tokens})

            # generic ALTO: one paragraph per text block (ref: alto.py:117-119).
            # pOf: block-id mapping (BNL/RERO) or word-id mapping of the
            # block's first token (BL word-range areas).
            region = {
                "c": block_coords,
                "p": [{"c": block_coords, "l": lines}],
                "pOf": mappings.get(block.get("ID"))
                or (mappings.get(first_string_id) if first_string_id else None),
            }
            regions.append(region)

    return regions, notes, parse_alto_styles(root)


def parse_mets_cis(
    xml_bytes: bytes, issue_id: str
) -> tuple[list[dict], list[str]]:
    """METS logical structMap → content items with legacy parts.

    Deterministic: divs sorted by (ORDER as int, div ID); CIs minted
    ``{issue_id}-i{n:04}`` in that order; ``m.pp`` derived from the page
    numbers of the div's area FILEIDs (resolved through the fileSec).
    Returns (content_items, notes).
    """
    root = ET.fromstring(xml_bytes)
    notes: list[str] = []

    # fileSec: file ID → page number (from the file's group/SEQ or the
    # numeric suffix of its href)
    file_to_page: dict[str, int] = {}
    for fel in _iter_named(root, "file"):
        fid = fel.get("ID")
        if not fid:
            continue
        seq = fel.get("SEQ") or fel.get("GROUPID")
        page_no = None
        if seq and seq.isdigit():
            page_no = int(seq)
        else:
            for flocat in _iter_named(fel, "FLocat"):
                href = (
                    flocat.get("{http://www.w3.org/1999/xlink}href")
                    or flocat.get("href")
                    or ""
                )
                m = re.search(r"(\d+)(?:\.\w+)?$", href)
                if m:
                    page_no = int(m.group(1))
                    break
        if page_no is not None:
            file_to_page[fid] = page_no

    # dmdSec MODS metadata: DMDID → ISO language code (BNL articles carry
    # <mods:languageTerm> per dmdSec)
    dmd_lang: dict[str, str] = {}
    for dmd in _iter_named(root, "dmdSec"):
        dmd_id = dmd.get("ID")
        if not dmd_id:
            continue
        for lt in _iter_named(dmd, "languageTerm"):
            if lt.text and lt.text.strip():
                dmd_lang[dmd_id] = lt.text.strip()
                break

    # logical structMap → CI divs in DOCUMENT ORDER (depth-first) — an
    # explicitly total, input-stable order (SURVEY W2).
    logical = None
    for sm in _iter_named(root, "structMap"):
        if (sm.get("TYPE") or "").lower() == "logical":
            logical = sm
            break
    if logical is None:
        logical = root

    def _div_parts(div: ET.Element, role: str) -> tuple[list[dict], set[int]]:
        parts: list[dict] = []
        pages: set[int] = set()
        for area in _iter_named(div, "area"):
            fileid = area.get("FILEID")
            comp_id = area.get("BEGIN") or fileid
            page_no = file_to_page.get(fileid)
            if page_no is not None:
                pages.add(page_no)
            parts.append(
                {
                    "comp_role": role,
                    "comp_id": comp_id,
                    "comp_fileid": fileid,
                    "comp_page_no": page_no,
                }
            )
        if not parts:
            for fptr in _iter_named(div, "fptr"):
                fileid = fptr.get("FILEID")
                if fileid is None:
                    continue
                page_no = file_to_page.get(fileid)
                if page_no is not None:
                    pages.add(page_no)
                parts.append(
                    {
                        "comp_role": role,
                        "comp_id": fileid,
                        "comp_fileid": fileid,
                        "comp_page_no": page_no,
                    }
                )
        return parts, pages

    ci_divs: list[tuple[ET.Element, str]] = []

    def _collect(el: ET.Element) -> None:
        for child in list(el):
            if _strip_ns(child.tag) != "div":
                _collect(child)
                continue
            dtype = (child.get("TYPE") or "").lower()
            if dtype in _CI_TYPES:
                ci_divs.append((child, _CI_TYPES[dtype]))
                # descendants are components of this CI — don't recurse
            elif dtype in _COMPONENT_AS_CI:
                ci_divs.append((child, _COMPONENT_AS_CI[dtype]))
            else:
                # container (or unknown): recurse
                _collect(child)

    _collect(logical)

    # BL-style indirection: self-closing article divs linked to PHYSICAL
    # pagearea divs via <structLink><smLinkGrp> (observed in BL METS:
    # smLocatorLink #art0001 ↔ #pa0001001..., pagearea areas carry
    # word-id ranges into the ALTO files).
    XLINK = "{http://www.w3.org/1999/xlink}"
    link_groups: dict[str, list[str]] = {}
    for grp in _iter_named(root, "smLinkGrp"):
        hrefs = [
            (loc.get(f"{XLINK}href") or "").lstrip("#")
            for loc in _iter_named(grp, "smLocatorLink")
        ]
        if hrefs:
            link_groups[hrefs[0]] = hrefs[1:]
    phys_divs: dict[str, ET.Element] = {}
    phys_parent_order: dict[str, Optional[int]] = {}
    for sm in _iter_named(root, "structMap"):
        if (sm.get("TYPE") or "").lower() != "physical":
            continue
        for page_div in _iter_named(sm, "div"):
            if (page_div.get("TYPE") or "").lower() != "page":
                continue
            order = page_div.get("ORDER")
            page_no = int(order) if order and order.isdigit() else None
            for sub in _iter_named(page_div, "div"):
                sid = sub.get("ID")
                if sid:
                    phys_divs[sid] = sub
                    phys_parent_order[sid] = page_no

    def _expand_range(begin: str, end: Optional[str]) -> list[str]:
        if not end or end == begin:
            return [begin]
        mb = re.match(r"(.*?)(\d+)$", begin)
        me = re.match(r"(.*?)(\d+)$", end)
        if not mb or not me or mb.group(1) != me.group(1):
            return [begin]
        lo, hi = int(mb.group(2)), int(me.group(2))
        if hi < lo or hi - lo > 10000:
            return [begin]
        width = len(mb.group(2))
        return [f"{mb.group(1)}{str(i).zfill(width)}" for i in range(lo, hi + 1)]

    extra_mappings: dict[str, str] = {}
    cis: list[dict] = []
    for n, (div, tp) in enumerate(ci_divs, start=1):
        ci_id = f"{issue_id}-i{str(n).zfill(4)}"
        div_id = div.get("ID") or ""
        parts, pages = _div_parts(div, (div.get("TYPE") or "").lower())
        if not parts and div_id in link_groups:
            # BL path: resolve through structLink → physical pagearea divs
            role = (div.get("TYPE") or "").lower()
            for phys_id in link_groups[div_id]:
                pd = phys_divs.get(phys_id)
                if pd is None:
                    continue
                page_no = phys_parent_order.get(phys_id)
                fileid = None
                for area in _iter_named(pd, "area"):
                    if area.get("BETYPE") == "IDREF":
                        fileid = area.get("FILEID")
                        if page_no is None:
                            page_no = file_to_page.get(fileid)
                        for wid in _expand_range(
                            area.get("BEGIN"), area.get("END")
                        ):
                            extra_mappings[wid] = ci_id
                if page_no is not None:
                    pages.add(page_no)
                parts.append(
                    {
                        "comp_role": role,
                        "comp_id": phys_id,
                        "comp_fileid": fileid,
                        "comp_page_no": page_no,
                    }
                )
        if not pages:
            notes.append(f"{ci_id}: no pages resolved from METS div {div_id}")
        lang = None
        for dmd_id in (div.get("DMDID") or "").split():
            if dmd_id in dmd_lang:
                lang = dmd_lang[dmd_id]
                break
        cis.append(
            {
                "m": {
                    "id": ci_id,
                    "pp": sorted(pages),
                    "tp": tp,
                    "t": div.get("LABEL"),
                    "lg": lang,
                    "ro": n,
                },
                "l": {"id": div_id, "parts": parts},
            }
        )
    return cis, notes, extra_mappings


def _find_mets_file(path: str) -> Optional[str]:
    try:
        hits = sorted(
            f for f in os.listdir(path) if "mets.xml" in f.lower()
        )
    except OSError:
        return None
    if hits:
        return os.path.join(path, hits[0])
    # BNF "Oeuvre" layout: the METS lives in toc/T*.xml under a
    # non-mets name — accept any XML in toc/ whose root element is mets.
    toc_dir = os.path.join(path, "toc")
    if os.path.isdir(toc_dir):
        for f in sorted(os.listdir(toc_dir)):
            if not f.lower().endswith(".xml"):
                continue
            cand = os.path.join(toc_dir, f)
            try:
                # Check only the root element, then move on to the next
                # candidate if it isn't a METS document.
                for _, el in ET.iterparse(cand, events=("start",)):
                    if _strip_ns(el.tag) == "mets":
                        return cand
                    break
            except ET.ParseError:
                continue
    return None


def _find_page_files(path: str) -> list[str]:
    """ALTO page files: ``text/`` subdir (Lux layout, ref:
    lux/detect.py:63-84), ``ALTO/`` subdir (RERO layout, ref:
    rero/detect.py:63-97), else *.xml next to the METS file."""
    base = path
    for sub in ("text", "ALTO", "alto", "ocr"):
        cand = os.path.join(path, sub)
        if os.path.isdir(cand):
            base = cand
            break
    try:
        return sorted(
            os.path.join(base, f)
            for f in os.listdir(base)
            if f.lower().endswith(".xml") and "mets" not in f.lower()
        )
    except OSError:
        return []


class MetsAltoPlugin(FormatPlugin):
    """Issue directory with a ``*mets.xml`` + ALTO page files."""

    name = "mets_alto"

    def parse_issue_dir(
        self, alias: str, date: str, edition: str, path: str
    ) -> dict:
        issue_id = f"{alias}-{date}-{edition}"
        mets_path = _find_mets_file(path)
        if mets_path is None:
            raise FileNotFoundError(f"Could not find METS file in {path}")
        cis, notes, extra_mappings = parse_mets_cis(
            read_bytes_with_retries(mets_path), issue_id
        )

        # block id → ci id through legacy parts (ref: classes.py:120-131),
        # plus word-level mappings from BL-style structLink ranges
        mappings: dict[str, str] = dict(extra_mappings)
        for ci in cis:
            for part in ci["l"]["parts"]:
                if part["comp_id"]:
                    mappings.setdefault(part["comp_id"], ci["m"]["id"])

        pages = []
        page_files = _find_page_files(path)
        issue_styles: list[dict] = []
        seen_styles: set[int] = set()
        for idx, pf in enumerate(page_files, start=1):
            m = re.search(r"(\d+)\.xml$", pf, re.IGNORECASE)
            page_no = int(m.group(1)) if m else idx
            page_id = f"{issue_id}-p{str(page_no).zfill(4)}"
            regions, page_notes, styles = parse_alto_page(
                read_bytes_with_retries(pf), mappings
            )
            for st in styles:
                if st["id"] is not None and st["id"] not in seen_styles:
                    seen_styles.add(st["id"])
                    issue_styles.append(st)
            pages.append(
                {
                    "id": page_id,
                    "st": "newspaper",
                    "sm": "print",
                    "cc": True,  # generic ALTO coords are iiif-ready
                    "r": regions,
                    "n": page_notes or None,
                }
            )

        return {
            "id": issue_id,
            "st": "newspaper",
            "sm": "print",
            "i": cis,
            "pp": [p["id"] for p in pages],
            "s": issue_styles or None,
            "n": "; ".join(notes) if notes else None,
            "_pages": pages,
        }


register(MetsAltoPlugin())
