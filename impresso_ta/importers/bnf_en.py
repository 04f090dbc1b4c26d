"""BNF-Europeana (Gallica) importer plugin — S2 ``bnf_en``.

Semantics matched from the reference importer
(ref: text_preparation/importers/bnf_en/classes.py:141-399 and
detect.py:278-332), re-implemented on stdlib ElementTree and run
executor-side inside the import UDTF. Key differences from the generic
METS/ALTO plugin that make a dedicated plugin necessary:

- **dmdSec-driven CI enumeration** (ref classes.py:279-315): dmdSec IDs
  sorted lowercase-lexicographically mint the ``-iNNNN`` counters — not
  structMap document order. A dmdSec whose DMDID matches no div inside
  the ``TYPE="CONTENT"`` struct div is skipped (issue/volume metadata);
  one matching several divs is skipped with a note (ref warns).
- **SECTION decomposition** (ref classes.py:249-277): a SECTION div
  decomposes into its descendant divs of BNF content types, sorted by
  div ID, each becoming its own CI.
- **Page numbers from FILEIDs** (ref classes.py:165): ``ALTO00004`` → 4.
- **Image/table coordinates** (ref classes.py:324-383): from the ALTO
  ComposedBlock/TextBlock named by the CI's legacy part (largest area
  wins), with an ark-based ``info.json`` IIIF link.
- **Issue-level ark**: resolved from the Gallica Issues API at discovery
  time (S4); it reaches the executor encoded in the discovery ``path``
  as ``<dir>::ark=<ark>`` so the plugin stays a pure function of its
  discovery row (the reference carries it in BnfEnIssueDir).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from datetime import datetime
from typing import Any, Optional

from impresso_ta.importers.base import (
    FormatPlugin,
    read_bytes_with_retries,
    register,
)
from impresso_ta.importers.mets_alto import (
    _coords,
    _find_mets_file,
    _iter_named,
    _strip_ns,
    parse_alto_page,
)

IIIF_ENDPOINT_URI = "https://gallica.bnf.fr/iiif/ark:/12148"

# BNF div types that are content items (ref bnf/helpers.py:16-23)
BNF_CONTENT_TYPES = {
    "article",
    "advertisement",
    "illustration",
    "ornament",
    "freead",
    "table",
}
SECTION_TYPE = "section"

# ref bnf_en/classes.py:37-40 (narrower than the BNF mapping on purpose)
TYPE_TRANSLATION = {"illustration": "image", "advertisement": "ad"}

# types whose CIs get coordinates + iiif link (ref classes.py:244)
_IMAGE_TYPES = {"image", "table"}

EDITIONS_MAPPINGS = {1: "a", 2: "b", 3: "c", 4: "d", 5: "e"}


def split_ark_path(path: str) -> tuple[str, Optional[str]]:
    """``<dir>::ark=<ark>`` → (dir, ark); plain paths → (path, None)."""
    if "::ark=" in path:
        base, ark = path.split("::ark=", 1)
        return base, ark or None
    return path, None


def _page_no_of_fileid(fileid: Optional[str]) -> Optional[int]:
    """``ALTO00004`` → 4 (ref classes.py:165)."""
    if not fileid:
        return None
    digits = fileid.replace("ALTO", "")
    try:
        return int(digits)
    except ValueError:
        return None


def _parse_content_parts(item_div: ET.Element) -> list[dict[str, Any]]:
    """Direct children of a CI div → legacy ``parts`` (ref
    classes.py:141-175): comp_role is the child's TYPE, areas are found
    recursively under each child."""
    parts: list[dict[str, Any]] = []
    for child in list(item_div):
        type_attr = child.get("TYPE")
        comp_role = type_attr.lower() if type_attr else None
        for area in _iter_named(child, "area"):
            fileid = area.get("FILEID")
            parts.append(
                {
                    "comp_role": comp_role,
                    "comp_id": area.get("BEGIN"),
                    "comp_fileid": fileid,
                    "comp_page_no": _page_no_of_fileid(fileid),
                }
            )
    return parts


def _decompose_section(div: ET.Element) -> list[ET.Element]:
    """Descendant divs of BNF content types, sorted by div ID (ref
    classes.py:249-277 — findAll is recursive, so nested sections'
    contents are already included)."""
    section_divs = [
        d
        for d in _iter_named(div, "div")
        if d is not div and (d.get("TYPE") or "").lower() in BNF_CONTENT_TYPES
    ]
    return sorted(section_divs, key=lambda d: (d.get("ID") or "").lower())


def _dmd_languages(root: ET.Element) -> dict[str, str]:
    """dmdSec ID → first mods languageTerm text (ref classes.py:177-195)."""
    langs: dict[str, str] = {}
    for dmd in _iter_named(root, "dmdSec"):
        dmd_id = dmd.get("ID")
        if not dmd_id:
            continue
        for lt in _iter_named(dmd, "languageTerm"):
            if lt.text and lt.text.strip():
                langs[dmd_id] = lt.text.strip()
                break
    return langs


def _reading_order(cis: list[dict]) -> dict[str, int]:
    """ref utils.py:139-158: sort by CI number, stable-resort by page
    list; 1-based rank."""
    pairs = [(ci["m"]["id"], ci["m"]["pp"]) for ci in cis]
    ordered = sorted(
        sorted(pairs, key=lambda x: int(x[0].split("-i")[-1])),
        key=lambda x: x[1],
    )
    return {pid: idx + 1 for idx, (pid, _) in enumerate(ordered)}


def parse_bnf_en_cis(
    xml_bytes: bytes, issue_id: str
) -> tuple[list[dict], list[str]]:
    """METS → content items in the reference's dmdSec order. Returns
    (cis, notes); image/table coordinates are attached later by the
    plugin (they need the ALTO pages)."""
    root = ET.fromstring(xml_bytes)
    notes: list[str] = []

    content = None
    for div in _iter_named(root, "div"):
        if div.get("TYPE") == "CONTENT":
            content = div
            break
    if content is None:
        raise ValueError(f"{issue_id}: no TYPE=CONTENT div in METS structMap")

    by_dmdid: dict[str, list[ET.Element]] = {}
    for div in _iter_named(content, "div"):
        dmdid = div.get("DMDID")
        if dmdid:
            by_dmdid.setdefault(dmdid, []).append(div)

    langs = _dmd_languages(root)
    dmd_ids = sorted(
        (d.get("ID") for d in _iter_named(root, "dmdSec") if d.get("ID")),
        key=str.lower,
    )

    cis: list[dict] = []
    counter = 1

    def _make_ci(div: ET.Element, n: int) -> dict:
        div_type = (div.get("TYPE") or "").lower()
        div_type = TYPE_TRANSLATION.get(div_type, div_type)
        metadata: dict[str, Any] = {
            "id": f"{issue_id}-i{str(n).zfill(4)}",
            "tp": div_type,
            "pp": [],
            "t": div.get("LABEL"),
        }
        # language by the div's OWN DMDID (ref classes.py:228): divs
        # decomposed out of a section carry none → no lg, as in the ref
        own_dmd = div.get("DMDID")
        lang = langs.get(own_dmd) if own_dmd else None
        if lang is not None:
            metadata["lg"] = lang
        parts = _parse_content_parts(div)
        for p in parts:
            pno = p["comp_page_no"]
            if pno is not None and pno not in metadata["pp"]:
                metadata["pp"].append(pno)
        return {"m": metadata, "l": {"id": div.get("ID"), "parts": parts}}

    for dmd_id in dmd_ids:
        divs = by_dmdid.get(dmd_id, [])
        if len(divs) == 0:
            continue
        if len(divs) > 1:
            notes.append(f"Multiple divs matching {dmd_id} in structmap")
            continue
        div = divs[0]
        if (div.get("TYPE") or "").lower() == SECTION_TYPE:
            for sd in _decompose_section(div):
                cis.append(_make_ci(sd, counter))
                counter += 1
        else:
            cis.append(_make_ci(div, counter))
            counter += 1

    ro = _reading_order(cis)
    for ci in cis:
        ci["m"]["ro"] = ro[ci["m"]["id"]]
    return cis, notes


def _image_info(
    ci: dict, page_root: ET.Element, ark: str, page_no: int
) -> tuple[Optional[list[int]], str]:
    """Coordinates of the largest matching ALTO block + ark IIIF link
    (ref classes.py:324-383; coordinate conversion is disabled there too
    — raw ALTO coords ship, cc stays page-level)."""
    blocks: dict[str, ET.Element] = {}
    for el in page_root.iter():
        if _strip_ns(el.tag) in ("ComposedBlock", "TextBlock"):
            el_id = el.get("ID")
            if el_id:
                blocks.setdefault(el_id, el)
    coords = None
    max_area = 0
    for part in ci["l"]["parts"]:
        el = blocks.get(part["comp_id"] or "")
        if el is None:
            continue
        c = _coords(el)
        if c is None:
            continue
        area = c[2] * c[3]
        if area > max_area:
            max_area = area
            coords = c
    iiif_link = f"{IIIF_ENDPOINT_URI}/{ark}/f{page_no}/info.json"
    return coords, iiif_link


class BnfEnPlugin(FormatPlugin):
    """BNF-Europeana issue directory: ``*-METS.xml`` + ``ALTO/`` pages,
    issue ark in the path suffix."""

    name = "bnf_en"

    def parse_issue_dir(
        self, alias: str, date: str, edition: str, path: str
    ) -> dict:
        path, ark = split_ark_path(path)
        if ark is None:
            raise ValueError(
                f"{path}: no IIIF ark for BNF-EN issue (discovery must "
                "resolve arks via the Gallica Issues API — see "
                "detect_bnf_en_issues)"
            )
        issue_id = f"{alias}-{date}-{edition}"
        mets_path = _find_mets_file(path)
        if mets_path is None:
            raise FileNotFoundError(f"Could not find METS file in {path}")
        cis, notes = parse_bnf_en_cis(
            read_bytes_with_retries(mets_path), issue_id
        )

        mappings: dict[str, str] = {}
        for ci in cis:
            for part in ci["l"]["parts"]:
                if part["comp_id"]:
                    mappings.setdefault(part["comp_id"], ci["m"]["id"])

        alto_dir = os.path.join(path, "ALTO")
        if not os.path.isdir(alto_dir):
            raise FileNotFoundError(
                f"Could not find pages for {issue_id}: {alto_dir}"
            )
        page_bytes: dict[int, bytes] = {}
        for fname in sorted(os.listdir(alto_dir)):
            if fname.startswith(".") or ".xml" not in fname:
                continue
            # ref classes.py:127: page number from the filename stem
            page_no = int(fname.split(".")[0].split("-")[1])
            page_bytes[page_no] = read_bytes_with_retries(
                os.path.join(alto_dir, fname)
            )

        pages = []
        issue_styles: list[dict] = []
        seen_styles: set[int] = set()
        for page_no in sorted(page_bytes):
            regions, page_notes, styles = parse_alto_page(
                page_bytes[page_no], mappings
            )
            for st in styles:
                if st["id"] is not None and st["id"] not in seen_styles:
                    seen_styles.add(st["id"])
                    issue_styles.append(st)
            pages.append(
                {
                    "id": f"{issue_id}-p{str(page_no).zfill(4)}",
                    "st": "newspaper",
                    "sm": "print",
                    "cc": True,
                    "iiif_img_base_uri": (
                        f"{IIIF_ENDPOINT_URI}/{ark}/f{page_no}"
                    ),
                    "r": regions,
                    "n": page_notes or None,
                }
            )

        # image/table CIs: coords from the ALTO block, ark IIIF link
        root_cache: dict[int, ET.Element] = {}
        for ci in cis:
            if ci["m"]["tp"] not in _IMAGE_TYPES:
                continue
            pp = ci["m"]["pp"]
            if len(pp) != 1:
                notes.append(
                    f"{ci['m']['id']}: image spans {len(pp)} pages"
                )
                continue
            page_no = pp[0]
            if page_no not in page_bytes:
                notes.append(f"{ci['m']['id']}: page {page_no} missing")
                continue
            if page_no not in root_cache:
                root_cache[page_no] = ET.fromstring(page_bytes[page_no])
            coords, iiif_link = _image_info(
                ci, root_cache[page_no], ark, page_no
            )
            ci["c"] = coords
            ci["m"]["iiif_link"] = iiif_link

        return {
            "id": issue_id,
            "st": "newspaper",
            "sm": "print",
            "i": cis,
            "pp": [p["id"] for p in pages],
            "s": issue_styles or None,
            "iiif_manifest_uri": (
                f"{IIIF_ENDPOINT_URI}/{ark}/manifest.json"
            ),
            "n": "; ".join(notes) if notes else None,
            "_pages": pages,
        }


def detect_bnf_en_issues(spark, base_dir: str, iiif_arks: dict[str, str]):
    """S4 discovery for BNF-EN dumps (ref detect.py:278-358).

    Directory layout ``<base>/<Journal-Name>/<yyyymmdd>_<edition>[_*]``;
    alias is the journal dir lowercased with dashes stripped.
    ``iiif_arks`` maps canonical issue ids to Gallica arks — production
    fills it from the Issues API (an injected fetcher keeps the engine
    offline-pure, as in sources.discovery.detect_issues_from_api); issues
    without an ark are dropped, as in the reference (detect.py:323-324).
    Runs driver-side (a discovery listing is tiny) and returns a normal
    discovery DataFrame whose paths carry the ark suffix.
    """
    from impresso_ta.schemas import DISCOVERY_SCHEMA

    rows = []
    for journal in sorted(os.listdir(base_dir)):
        jdir = os.path.join(base_dir, journal)
        if not os.path.isdir(jdir):
            continue
        alias = journal.lower().replace("-", "").strip()
        for issue_dir in sorted(os.listdir(jdir)):
            path = os.path.join(jdir, issue_dir)
            if not os.path.isdir(path):
                continue
            bits = issue_dir.split("_")
            try:
                d = datetime.strptime(bits[0], "%Y%m%d").date()
                ed = EDITIONS_MAPPINGS[int(bits[1])]
            except (KeyError, ValueError, IndexError):
                continue
            issue_id = f"{alias}-{d.year}-{d.month:02}-{d.day:02}-{ed}"
            ark = iiif_arks.get(issue_id)
            if ark is None:
                continue
            rows.append((alias, d, ed, f"{path}::ark={ark}", "bnf_en"))
    return spark.createDataFrame(rows, DISCOVERY_SCHEMA)


register(BnfEnPlugin())
