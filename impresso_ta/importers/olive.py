"""Olive legacy-XML importer plugin (GDL/JDG/IMP-style issues).

Re-implements the reference's Olive import semantics
(ref: importers/olive/parsers.py:15-252, olive/classes.py:332-395,
olive/helpers.py:27-344):

- issue = ``TOC.xml`` + article/ad XML files under ``Document.zip`` or an
  unpacked ``Document/`` tree (windows-1252 encoded),
- TOC entities mint canonical CI ids with a GLOBAL counter across pages
  (ref: parsers.py:100-117) — ids must match the reference's golden
  outputs byte-for-byte,
- article parts split across pages chain via CONTINUATION_FROM/TO; chains
  are walked head-first and combined with first-part metadata
  (SURVEY J7; ref classes.py:344-395 + helpers.py:128-167),
- primitives → regions; ``<L>`` starts lines (``P="S"|"SA"`` starts a new
  paragraph), ``<W>``/``<Q>``/``<q>`` are tokens with corner boxes and
  style refs; ``<QW QID=..>`` carries the normalized multi-word form
  merged by line normalization (X3, impresso_ta.importers.olive_text),
- ToC recompose: Article/Ad entities join combined articles by head
  legacy id (continuation tails vanish); Picture entities join image
  metadata and resolve ``pOf`` through ``EMBEDDED_INTO`` (J6/J8),
- styles from ``styleGallery.txt`` (X14; ref parsers.py:15-49).

Corner boxes are converted to canonical [x,y,w,h]. When the issue's
``*-image-info.json`` sidecar is available (discovery path option
``::image_dirs=<dir>[,<dir>…]``), the X7 box strategies rescale every
coordinate to IIIF space and flip ``cc=True`` per converted page
(ref: olive/helpers.py:420-603 via ``importers.olive_boxes``); without
a sidecar ``cc`` stays False, as in the reference.
"""

from __future__ import annotations

import io
import os
import re
import xml.etree.ElementTree as ET
import zipfile
from typing import Any, Optional

import json

from impresso_ta.importers.base import FormatPlugin, register
from impresso_ta.importers.olive_boxes import (
    convert_page_regions,
    convert_xywh_box,
    get_scale_factor,
    parse_page_meta,
)
from impresso_ta.importers.olive_text import normalize_line
from impresso_ta.operators.recompose import TITLE_BLACKLIST

IIIF_ENDPOINT_URI = "https://impresso-project.ch/api/proxy/iiif"

LANG_MAP = {"french": "fr", "english": "en", "german": "de", "italian": "it"}


def _split_image_dirs(path: str) -> tuple[str, list[str]]:
    """``<dir>::image_dirs=<a>,<b>`` → (dir, [a, b])."""
    if "::image_dirs=" in path:
        base, dirs = path.split("::image_dirs=", 1)
        return base, [d for d in dirs.split(",") if d]
    return path, []


def _load_image_info(
    image_dirs: list[str], alias: str, date: str, edition: str
) -> list[dict]:
    """Per-issue image-info sidecar (ref olive/classes.py:397-440):
    ``<dir>/<alias>/<yyyy/mm/dd>/<ed>/<alias>-<date>-<ed>-image-info.json``
    from the first directory that has a non-empty one."""
    for im_dir in image_dirs:
        p = os.path.join(
            im_dir,
            alias,
            date.replace("-", "/"),
            edition,
            f"{alias}-{date}-{edition}-image-info.json",
        )
        if os.path.exists(p):
            with open(p, "r", encoding="utf-8") as f:
                data = json.load(f)
            if data:
                return data
    return []


def normalize_language(lang: Optional[str]) -> Optional[str]:
    if not lang:
        return None
    return LANG_MAP.get(lang.lower(), lang[:2].lower())


def parse_styles(text: str) -> list[dict[str, Any]]:
    """styleGallery.txt → canonical styles (ref: parsers.py:15-49)."""
    styles = []
    pattern = re.compile(r'(\d{3})=(".*?"),(\d+\.?\d*),(\(.*?\))')
    for line in re.split(r"\r?\n", text):
        if not line:
            continue
        m = pattern.match(line)
        if not m:
            continue
        n, font, fs, color = m.groups()
        styles.append(
            {
                "id": int(n),
                "f": font.strip('"'),
                "fs": float(fs),
                "rgb": [int(v) for v in color.strip("()").split(",")],
            }
        )
    return styles


def _box(el: ET.Element) -> Optional[list[int]]:
    box = el.get("BOX") or el.get("box")
    if not box:
        return None
    try:
        return [int(float(v)) for v in box.split()]
    except ValueError:
        return None


def _corners_to_xywh(c: Optional[list[int]]) -> Optional[list[int]]:
    if not c or len(c) != 4:
        return c
    return [c[0], c[1], c[2] - c[0], c[3] - c[1]]


def parse_olive_article(xml_bytes: bytes) -> dict[str, Any]:
    """One Ar/Ad XML file → part dict (ref: parsers.py:137-252)."""
    root = ET.fromstring(xml_bytes)
    if root.tag.lower() != "xmd-entity":
        for el in root.iter():
            if el.tag.lower() == "xmd-entity":
                root = el
                break

    meta_el = next((e for e in root.iter() if e.tag == "Meta"), None)
    link_el = next((e for e in root.iter() if e.tag == "Link"), None)

    lang = normalize_language(root.get("LANGUAGE"))
    out: dict[str, Any] = {
        "meta": {
            "title": meta_el.get("NAME") if meta_el is not None else None,
            "page_no": [int(root.get("PAGE_NO"))],
            "language": lang,
            "type": {"raw": root.get("ENTITY_TYPE")},
            "issue_date": meta_el.get("ISSUE_DATE") if meta_el is not None else None,
        },
        "r": [],
        "legacy": {
            "id": root.get("ID"),
            "source": link_el.get("SOURCE") if link_el is not None else None,
            "continuation_from": root.get("CONTINUATION_FROM"),
            "continuation_to": root.get("CONTINUATION_TO"),
        },
    }

    # QID → normalized multi-word form
    qw_map = {
        el.get("QID"): (el.text or "")
        for el in root.iter()
        if el.tag.upper() == "QW" and el.get("QID")
    }

    for primitive in (el for el in root.iter() if el.tag == "Primitive"):
        region: dict[str, Any] = {"c": _box(primitive), "p": []}
        para: Optional[dict] = None
        line: Optional[dict] = None
        line_counter = 0

        for tag in list(primitive):
            name = tag.tag
            if name == "L":
                if para is None and line is None:
                    para = {"l": []}
                    line = {"c": None, "t": []}
                if line_counter > 0 and line is not None:
                    para["l"].append(normalize_line(line, lang))
                if tag.get("P") in ("S", "SA") and line_counter > 0:
                    region["p"].append(para)
                    para = {"l": []}
                line = {"c": _box(tag), "t": []}
                line_counter += 1
            elif name in ("W", "Q", "q"):
                if line is None:
                    para = para or {"l": []}
                    line = {"c": None, "t": []}
                token: dict[str, Any] = {
                    "c": _box(tag),
                    "tx": tag.text,
                }
                style = tag.get("STYLE_REF")
                if style is not None:
                    token["s"] = int(style)
                qid = tag.get("QID")
                if name in ("Q", "q") and qid is not None:
                    token["nf"] = qw_map.get(qid)
                    token["qid"] = qid
                line["t"].append(token)

        if line is not None and para is not None:
            para["l"].append(normalize_line(line, lang))
            region["p"].append(para)
        if para is not None and region["p"]:
            out["r"].append(region)

    return out


def parse_olive_toc(xml_bytes: bytes, issue_id: str) -> dict[int, dict[str, dict]]:
    """TOC.xml → {page_no: {legacy_id: entity}} with GLOBAL-counter
    canonical ids (ref: parsers.py:76-135)."""
    root = ET.fromstring(xml_bytes)
    toc: dict[int, dict[str, dict]] = {}
    counter = 0
    for page in (el for el in root.iter() if el.tag == "Page"):
        page_no = int(page.get("PAGE_NO"))
        page_data: dict[str, dict] = {}
        for n, entity in enumerate(
            el for el in page.iter() if el.tag == "Entity"
        ):
            counter += 1
            legacy_id = entity.get("ID")
            item = {
                "legacy_id": legacy_id,
                "id": f"{issue_id}-i{str(counter).zfill(4)}",
                "type": entity.get("ENTITY_TYPE"),
                "seq": n + 1,
            }
            if (item["type"] or "").lower() == "picture":
                if entity.get("EMBEDDED_INTO") is not None:
                    item["embedded_into"] = entity.get("EMBEDDED_INTO")
            page_data[legacy_id] = item
        toc[page_no] = page_data
    return toc


def parse_olive_image(xml_bytes: bytes) -> Optional[dict]:
    """Pc XML → image metadata (ref: parsers.py:50-74)."""
    try:
        root = ET.fromstring(xml_bytes)
        target = None
        for el in root.iter():
            if el.tag.lower() == "xmd-entity":
                target = el
                break
        if target is None:
            return None
        img_el = next((e for e in target.iter() if e.tag.lower() == "img"), None)
        meta_el = next((e for e in target.iter() if e.tag == "Meta"), None)
        if img_el is None:
            return None
        return {
            "id": target.get("ID"),
            "coords": [int(float(v)) for v in (img_el.get("BOX") or img_el.get("box")).split()],
            "name": meta_el.get("NAME") if meta_el is not None else None,
            "resolution": meta_el.get("IMAGES_RESOLUTION") if meta_el is not None else None,
            "filepath": img_el.get("HREF") or img_el.get("href"),
        }
    except Exception:  # noqa: BLE001 — faulty image XML → skipped (J6 note)
        return None


def _combine_parts(parts: list[dict]) -> Optional[dict]:
    """SURVEY J7 (ref: helpers.py:128-167): metadata from the first part,
    legacy ids/sources listed, page numbers flattened in part order."""
    if not parts:
        return None
    if len(parts) == 1:
        return parts[0]
    first = parts[0]
    return {
        "meta": {
            "title": first["meta"]["title"],
            "page_no": [int(n) for p in parts for n in p["meta"]["page_no"]],
            "language": first["meta"]["language"],
            "type": {"raw": first["meta"]["type"]["raw"]},
            "issue_date": first["meta"]["issue_date"],
        },
        "legacy": {
            "id": [p["legacy"]["id"] for p in parts],
            "source": [p["legacy"]["source"] for p in parts],
        },
        "parts": parts,
    }


class _IssueFiles:
    """Uniform access to Document.zip members or an unpacked Document/."""

    def __init__(self, path: str):
        zip_path = os.path.join(path, "Document.zip")
        self._zf = None
        self._dir = None
        if os.path.isfile(zip_path):
            with open(zip_path, "rb") as f:
                self._zf = zipfile.ZipFile(io.BytesIO(f.read()))
            self.names = sorted(
                n for n in self._zf.namelist() if not n.startswith("._")
            )
        elif os.path.isdir(os.path.join(path, "Document")):
            self._dir = os.path.join(path, "Document")
            names = []
            for root, _dirs, files in os.walk(self._dir):
                for f in sorted(files):
                    rel = os.path.relpath(os.path.join(root, f), self._dir)
                    names.append(rel.replace(os.sep, "/"))
            self.names = sorted(names)
        else:
            raise FileNotFoundError(
                f"Neither Document.zip nor Document/ found in {path}"
            )

    def read(self, name: str) -> bytes:
        if self._zf is not None:
            return self._zf.read(name)
        with open(os.path.join(self._dir, name), "rb") as f:
            return f.read()


def _keep_title(title: Optional[str]) -> Optional[str]:
    if title is None or title.lower() in TITLE_BLACKLIST:
        return None
    return title


class OlivePlugin(FormatPlugin):
    name = "olive"

    def parse_issue_dir(
        self, alias: str, date: str, edition: str, path: str
    ) -> dict[str, Any]:
        issue_id = f"{alias}-{date}-{edition}"
        path, image_dirs = _split_image_dirs(path)

        toc_path = os.path.join(path, "TOC.xml")
        if not os.path.isfile(toc_path):
            raise FileNotFoundError(f"No TOC.xml in {path}")
        with open(toc_path, "rb") as f:
            toc = parse_olive_toc(f.read(), issue_id)

        files = _IssueFiles(path)

        # ---- parse article/ad parts and walk continuation chains ----
        item_names = [
            n
            for n in files.names
            if n.endswith(".xml")
            and re.search(r"(?:^|/)(?:Ar|Ad)[^/]*\.xml$", n)
        ]
        by_legacy: dict[str, dict] = {}
        order: list[str] = []
        for name in item_names:
            part = parse_olive_article(files.read(name))
            lid = part["legacy"]["id"]
            by_legacy[lid] = part
            order.append(lid)

        consumed: set[str] = set()
        combined_articles: list[dict] = []
        content_elements: list[dict] = []
        for lid in order:
            if lid in consumed:
                continue
            part = by_legacy[lid]
            cf = part["legacy"].get("continuation_from")
            if cf is not None and cf in by_legacy:
                continue  # a tail — picked up by its head's chain
            chain = []
            cursor: Optional[str] = lid
            while cursor is not None and cursor in by_legacy and cursor not in consumed:
                chain.append(by_legacy[cursor])
                consumed.add(cursor)
                cursor = by_legacy[cursor]["legacy"].get("continuation_to")
            content_elements += chain
            combined = _combine_parts(chain)
            if combined is not None:
                combined_articles.append(combined)

        # ---- images ----
        images = []
        for name in files.names:
            if name.endswith(".xml") and re.search(r"(?:^|/)Pc[^/]*\.xml$", name):
                img = parse_olive_image(files.read(name))
                if img is not None:
                    images.append(img)
        images_by_id = {img["id"]: img for img in images}

        # ---- recompose ToC (J6/J8; ref helpers.py:236-349) ----
        def head_id(article: dict):
            lid = article["legacy"]["id"]
            return lid[0] if isinstance(lid, list) else lid

        articles_by_head = {head_id(a): a for a in combined_articles}
        part_to_ci: dict[str, str] = {}
        cis: list[dict] = []
        for page_no in sorted(toc):
            for legacy_id, entity in toc[page_no].items():
                etype = (entity["type"] or "").lower()
                if etype in ("article", "ad"):
                    article = articles_by_head.get(legacy_id)
                    if article is None:
                        continue  # continuation tail entity
                    lids = article["legacy"]["id"]
                    lids_list = lids if isinstance(lids, list) else [lids]
                    for lid in lids_list:
                        part_to_ci[lid] = entity["id"]
                    cis.append(
                        {
                            "m": {
                                "id": entity["id"],
                                # raw flattened part order, duplicates kept —
                                # golden parity (the rebuild stage applies
                                # sorted(set(pp)), ref helpers.py:358)
                                "pp": [
                                    int(n) for n in article["meta"]["page_no"]
                                ],
                                "lg": article["meta"]["language"],
                                "tp": (article["meta"]["type"]["raw"] or "").lower(),
                                "t": _keep_title(article["meta"]["title"]),
                            },
                            "l": {
                                "id": str(lids) if isinstance(lids, list) else lids,
                                "source": str(article["legacy"]["source"]),
                            },
                        }
                    )
                elif etype == "picture":
                    img = images_by_id.get(legacy_id)
                    if img is None:
                        continue  # faulty image XML → skipped
                    ci = {
                        "m": {
                            "id": entity["id"],
                            "pp": [page_no],
                            "tp": "picture",
                            "t": _keep_title(img["name"]),
                        },
                        "l": {"id": legacy_id, "source": img["filepath"]},
                        "c": _corners_to_xywh(img["coords"]),
                    }
                    emb = entity.get("embedded_into")
                    if emb and emb in toc[page_no]:
                        ci["pOf"] = toc[page_no][emb]["id"]
                    cis.append(ci)

        # ---- reading order (W1; ref utils.py:139-158) ----
        ordered = sorted(
            cis,
            key=lambda ci: (
                ci["m"]["pp"][0] if ci["m"]["pp"] else 10**9,
                int(ci["m"]["id"].rsplit("i", 1)[1]),
            ),
        )
        for ro, ci in enumerate(ordered, start=1):
            ci["m"]["ro"] = ro

        # ---- pages from content elements (coords corners → xywh) ----
        page_regions: dict[int, list[dict]] = {pn: [] for pn in toc}
        for part in content_elements:
            ci_id = part_to_ci.get(part["legacy"]["id"])
            page_no = part["meta"]["page_no"][0]
            for region in part["r"]:
                conv_region = {
                    "c": _corners_to_xywh(region.get("c")),
                    "pOf": ci_id,
                    "p": [
                        {
                            "c": _corners_to_xywh(region.get("c")),
                            "l": [
                                {
                                    "c": _corners_to_xywh(line.get("c")),
                                    "t": [
                                        {**tok, "c": _corners_to_xywh(tok.get("c"))}
                                        for tok in line["t"]
                                    ],
                                }
                                for line in para["l"]
                            ],
                        }
                        for para in region["p"]
                    ],
                }
                page_regions.setdefault(page_no, []).append(conv_region)

        # ---- styles ----
        styles = None
        for name in files.names:
            if name.endswith("styleGallery.txt"):
                styles = parse_styles(
                    files.read(name).decode("windows-1252", errors="replace")
                )
                break

        # ---- X7 coordinate conversion (ref helpers.py:420-650) ----
        image_info = (
            _load_image_info(image_dirs, alias, date, edition)
            if image_dirs
            else []
        )
        info_by_page = {int(rec["pg"]): rec for rec in image_info}
        pg_xml_names = {
            int(n.split("/")[0]): n
            for n in files.names
            if ".xml" in n and "/Pg" in n
        }
        notes: list[str] = []
        scale_by_page: dict[int, float] = {}
        for page_no, rec in info_by_page.items():
            if page_no not in pg_xml_names:
                notes.append(f"p{page_no}: no Pg xml for box strategy")
                continue
            try:
                meta = parse_page_meta(files.read(pg_xml_names[page_no]))
                strat = rec["strat"]
                source = rec["s"]
                jpg_bytes = None
                if strat == "jpg_uniq":
                    cand = [
                        n for n in files.names if n.endswith(source)
                    ]
                    if cand:
                        jpg_bytes = files.read(cand[0])
                scale = get_scale_factor(meta, strat, source, jpg_bytes)
            except Exception as exc:  # noqa: BLE001 — cc stays False
                notes.append(f"p{page_no}: box conversion failed: {exc}")
                scale = None
            if scale is not None:
                scale_by_page[page_no] = scale
            else:
                notes.append(
                    f"p{page_no}: could not find scale factor "
                    f"(strategy {rec.get('strat')})"
                )

        # picture CIs on pages with an image-info record: convert coords
        # and promote tp picture→image (ref classes.py:470-501)
        for ci in cis:
            if ci["m"].get("tp") != "picture":
                continue
            pg = ci["m"]["pp"][0] if ci["m"]["pp"] else None
            if pg is None or pg not in info_by_page:
                continue
            scale = scale_by_page.get(pg)
            if scale is not None and ci.get("c"):
                ci["c"] = convert_xywh_box(ci["c"], scale)
                ci["m"]["cc"] = True
                ci["m"]["iiif_link"] = (
                    f"{IIIF_ENDPOINT_URI}/{issue_id}-p{str(pg).zfill(4)}"
                    "/info.json"
                )
            else:
                ci["m"]["cc"] = False
            ci["m"]["tp"] = "image"

        pages = []
        for page_no in sorted(page_regions):
            page_id = f"{issue_id}-p{str(page_no).zfill(4)}"
            scale = scale_by_page.get(page_no)
            regions = page_regions[page_no]
            if scale is not None:
                regions = convert_page_regions(regions, scale)
            pages.append(
                {
                    "id": page_id,
                    "st": "newspaper",
                    "sm": "print",
                    # cc=True only for converted pages; without a sidecar
                    # record the reference ships cc=False too
                    "cc": scale is not None,
                    "iiif_img_base_uri": f"{IIIF_ENDPOINT_URI}/{page_id}",
                    "r": regions,
                }
            )

        return {
            "id": issue_id,
            "st": "newspaper",
            "sm": "print",
            "i": cis,
            "pp": [p["id"] for p in pages],
            "s": styles,
            "n": "; ".join(notes) if notes else None,
            "_pages": pages,
        }


register(OlivePlugin())
