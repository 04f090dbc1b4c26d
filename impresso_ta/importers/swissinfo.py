"""SwissInfo radio-bulletin importer plugin — S2 ``swissinfo``.

Consumes the **pre-extracted OCR JSON** (the output of the reference's
out-of-engine S9 PDF preprocessing,
``importer_scripts/preprocessing/swissinfo_extract_ocr_from_pdfs.py``);
semantics matched from the reference importer
(ref: text_preparation/importers/swissinfo/classes.py:27-285 and
helpers.py:15-131, detect.py:47-103):

- One issue directory ``<base>/<ALIAS>/<yyyy>/<mm>/<dd>/<edition>/``
  holding ``{issue_id}.json``; the bulletin metadata file
  (``SOC_rb_metadata.json``) sits at the collection root, five levels up
  (ref classes.py:266-267).
- Typescript medium: ``st=radio_broadcast``, ``sm=typescript``; pages
  carry facsimile dims ``fw``/``fh`` from the rescaled jp2 size and
  ``cc=True`` (all SwissInfo coords ship rescaled, ref classes.py:55).
- One content item per bulletin: ``chronicle`` when the bulletin has an
  entry in the metadata file (title/program wiring, ref
  classes.py:265-285), else ``radio_bulletin``.
- Block→paragraph line parsing with cross-line hyphen repair (ref
  helpers.py:15-115); page region = aggregated block bbox (A7), with
  the one-paragraph merge when blocks are line-split (ref
  classes.py:98-105, the mean-paragraph-size < 3.5 heuristic).

Ingestion contract for S9 (documented, since the raw pdfplumber dumps
in the reference's sample are NOT importable): each ``ocr_pages`` entry
has 0-based ``page_num``, ``blocks_with_lines`` (each with
``rescaled_bbox`` x1y1x2y2, ``number``, ``lines`` → ``spans`` with
``text`` + ``rescaled_bbox``), ``blocks_without_lines``,
``ocr_page_size``; the issue JSON carries ``lang``, ``original_path``
and ``jp2_full_paths``/``jp2_img_size`` named by canonical page id.
"""

from __future__ import annotations

import json
import os
from statistics import mean
from typing import Any, Optional

from impresso_ta.importers.base import (
    FormatPlugin,
    read_bytes_with_retries,
    register,
)

IIIF_ENDPOINT_URI = "https://impresso-project.ch/api/proxy/iiif/"
METADATA_FILENAME = "SOC_rb_metadata.json"

SWISSINFO_CI_TYPE = "chronicle"
DEFAULT_RB_TYPE = "radio_bulletin"
SWISSINFO_RB_CHANNEL = "SOC (KWD)"


def _xywh(coords: list) -> list[int]:
    """x1y1x2y2 → xywh, int-cast (ref utils.py:272-285)."""
    c = [int(v) for v in coords]
    return [c[0], c[1], c[2] - c[0], c[3] - c[1]]


def parse_lines(
    blocks_with_lines: list[dict], pg_id: str, pg_notes: list[str]
) -> tuple[list[list[int]], list[dict]]:
    """OCR blocks → (block x1y1x2y2 coords, canonical paragraphs), with
    the reference's cross-line hyphen repair (ref helpers.py:15-115):
    a line-final token ending in ``-`` flags ``hy``; the next line's
    first token gets ``nf`` = merged full word."""
    all_blocks_xy = []
    paragraphs: list[dict] = []
    hyphen_at_last = False
    for block_id, block in enumerate(blocks_with_lines):
        all_blocks_xy.append(block["rescaled_bbox"])
        block_lines: list[dict] = []
        for line_id, line in enumerate(block["lines"]):
            tokens: list[dict] = []
            for t_id, token in enumerate(line["spans"]):
                if token["text"] == " ":
                    continue
                curr: dict[str, Any] = {
                    "c": _xywh(token["rescaled_bbox"]),
                    "tx": token["text"],
                    "gn": False,
                }
                if (
                    (block_id != 0 or line_id != 0)
                    and t_id == 0
                    and hyphen_at_last
                ):
                    # sanity notes as in ref helpers.py:52-87
                    prev_tok = (
                        block_lines[-1]["t"][-1]
                        if line_id != 0 and block_lines
                        else (
                            paragraphs[-1]["l"][-1]["t"][-1]
                            if paragraphs
                            else None
                        )
                    )
                    if prev_tok is not None and "hy" not in prev_tok:
                        pg_notes.append(
                            f"block {block_id} ('number' "
                            f"{block.get('number')}), line {line_id}, "
                            f"token {t_id} - problem with hyphenation: "
                            "hyphen_at_last is true but no 'hy' in "
                            "previous token."
                        )
                    if prev_tok is not None:
                        curr["nf"] = (
                            prev_tok["tx"].split("-")[0] + token["text"]
                        )
                hyphen_at_last = False
                tokens.append(curr)
            if len(tokens) > 1 and tokens[-1]["tx"].endswith("-"):
                tokens[-1]["hy"] = True
                hyphen_at_last = True
            else:
                hyphen_at_last = False
            block_lines.append(
                {"c": _xywh(line["rescaled_bbox"]), "t": tokens}
            )
        paragraphs.append(
            {"c": _xywh(block["rescaled_bbox"]), "l": block_lines}
        )
    return all_blocks_xy, paragraphs


def compute_agg_coords(all_coords: list[list]) -> list:
    """Bounding box of blocks in x1y1x2y2 (A7, ref helpers.py:118-131)."""
    return [
        min(c[0] for c in all_coords),
        min(c[1] for c in all_coords),
        max(c[2] for c in all_coords),
        max(c[3] for c in all_coords),
    ]


def _page_region(
    ocr_page: dict,
    page_id: str,
    ci_id: str,
    split_page_blocks: bool,
    notes: list[str],
) -> list[dict]:
    """One aggregated region per page (ref classes.py:78-114)."""
    all_blocks_xy, paragraphs = parse_lines(
        ocr_page["blocks_with_lines"], page_id, notes
    )
    if not all_blocks_xy:
        notes.append(f"{page_id} - no line coords to merge, empty region")
        return []
    region_coords = _xywh(compute_agg_coords(all_blocks_xy))
    if split_page_blocks:
        merged = []
        for p in paragraphs:
            merged.extend(p["l"])
        paragraphs = [{"c": region_coords, "l": merged}]
    return [{"c": region_coords, "p": paragraphs, "pOf": ci_id}]


def _load_bulletin_metadata(
    metadata_path: str, src_pdf_file: str
) -> Optional[dict]:
    """Entry for this bulletin in the collection metadata (ref
    classes.py:265-285); None when absent — not all bulletins had
    metadata in the swi.xml export."""
    if not os.path.exists(metadata_path):
        return None
    records = json.loads(read_bytes_with_retries(metadata_path))
    archive_key = os.path.splitext(os.path.basename(src_pdf_file))[0]
    hits = [r for r in records if r.get("archive_key") == archive_key]
    return hits[0] if hits else None


class SwissInfoPlugin(FormatPlugin):
    """SwissInfo radio bulletin: pre-extracted OCR JSON, typescript
    medium."""

    name = "swissinfo"

    def parse_issue_dir(
        self, alias: str, date: str, edition: str, path: str
    ) -> dict:
        issue_id = f"{alias}-{date}-{edition}"
        json_path = os.path.join(path, f"{issue_id}.json")
        if not os.path.exists(json_path):
            raise FileNotFoundError(
                f"{issue_id} - The issue's folder {path} does not contain "
                "the required json file."
            )
        bulletin = json.loads(read_bytes_with_retries(json_path))
        lang = bulletin.get("lang")
        src_pdf_file = "/".join(
            (bulletin.get("original_path") or "").split("/")[-3:]
        )

        notes: list[str] = []
        ci_id = f"{issue_id}-i0001"

        # pass 1 (ref classes.py:182-248): page inventory, missing-OCR
        # detection, and the split-page heuristic (shared by all pages)
        ocr_pages = bulletin.get("ocr_pages") or []
        split_page_blocks = False
        missing_pages: list[int] = []
        page_infos: list[tuple[int, dict]] = []
        for page in ocr_pages:
            page_no = int(page["page_num"]) + 1
            if len(page["blocks_with_lines"]) == 0:
                missing_pages.append(page_no)
                notes.append(
                    f"{issue_id}, page {page_no} has no block with lines, "
                    "it will not contain text."
                )
            else:
                par_sizes = [
                    len(b["lines"]) for b in page["blocks_with_lines"]
                ]
                split_page_blocks = split_page_blocks or (
                    mean(par_sizes) < 3.5 or len(par_sizes) > 20
                )
            page_id = f"{issue_id}-p{str(page_no).zfill(4)}"
            jp2 = (bulletin.get("jp2_full_paths") or [None] * len(ocr_pages))[
                page["page_num"]
            ]
            if jp2 is not None:
                jp2_name = jp2.split("/")[-1].split(".")[0]
                if jp2_name != page_id:
                    raise ValueError(
                        f"{issue_id} problem with page numbering/naming, "
                        f"page_img_name ({jp2_name}) != page_id ({page_id})"
                    )
            notes.append(
                f"Page {page_no}: page size within OCR before coord "
                f"rescaling: {page.get('ocr_page_size')}"
            )
            page_infos.append((page_no, page))

        if page_infos and len(missing_pages) == len(page_infos):
            # ref classes.py:240-244: no OCR anywhere → not ingested
            raise ValueError(
                f"{issue_id}, No OCR in any of the pages! "
                "This issue won't be ingested."
            )

        # content item (ref classes.py:250-285)
        metadata_path = os.path.join(
            *([path] + [".."] * 5), METADATA_FILENAME
        )
        bmeta = _load_bulletin_metadata(
            os.path.normpath(metadata_path), src_pdf_file
        )
        ci_m: dict[str, Any] = {
            "id": ci_id,
            "lg": lang,
            "pp": [no for no, _ in page_infos],
            "tp": SWISSINFO_CI_TYPE if bmeta else DEFAULT_RB_TYPE,
            "ro": 1,
        }
        program = None
        if bmeta:
            ci_m["t"] = bmeta.get("segment_title")
            ci_m["var_t"] = bmeta.get("program_title")
            program = bmeta.get("program_title") or ""
            if bmeta.get("program_subtitle"):
                program += f" - {bmeta['program_subtitle']}"
        cis = [{"m": ci_m, "l": {"source": src_pdf_file}}]

        # pass 2: page regions
        pages = []
        for page_no, page in page_infos:
            page_id = f"{issue_id}-p{str(page_no).zfill(4)}"
            page_notes: list[str] = []
            regions = _page_region(
                page, page_id, ci_id, split_page_blocks, page_notes
            )
            img_size = page.get("jp2_img_size") or bulletin.get(
                "jp2_img_size"
            )
            par_sizes = [
                len(b["lines"]) for b in page["blocks_with_lines"]
            ]
            pages.append(
                {
                    "id": page_id,
                    "st": "radio_broadcast",
                    "sm": "typescript",
                    "cc": True,  # SwissInfo coords ship rescaled
                    "iiif_img_base_uri": (
                        f"{IIIF_ENDPOINT_URI}{page_id}/info.json"
                    ),
                    "fw": int(img_size[0]) if img_size else None,
                    "fh": int(img_size[1]) if img_size else None,
                    "r": regions,
                    # A8: the reference declares this field but never
                    # fills it (classes.py:46,76) — we complete it
                    "parag_avg_size": (
                        float(mean(par_sizes)) if par_sizes else None
                    ),
                    "n": page_notes or None,
                }
            )

        issue = {
            "id": issue_id,
            "st": "radio_broadcast",
            "sm": "typescript",
            "i": cis,
            "pp": [p["id"] for p in pages],
            "rc": SWISSINFO_RB_CHANNEL,
            "n": "; ".join(notes) if notes else None,
            "_pages": pages,
        }
        if program:
            issue["rp"] = program
        return issue


def detect_swissinfo_issues(spark, base_dir: str):
    """Discovery for the SwissInfo JSON dump (ref detect.py:74-103):
    ``<base>/WW2-SOC-bulletins-json/<ALIAS>/<yyyy>/<mm>/<dd>/<edition>``.
    Driver-side walk (tiny listing) → standard discovery DataFrame."""
    from datetime import date as _date

    from impresso_ta.schemas import DISCOVERY_SCHEMA

    root = os.path.join(base_dir, "WW2-SOC-bulletins-json")
    rows = []
    for alias in sorted(os.listdir(root)):
        adir = os.path.join(root, alias)
        if not os.path.isdir(adir):
            continue
        for y in sorted(os.listdir(adir)):
            for m in sorted(os.listdir(os.path.join(adir, y))):
                for d in sorted(os.listdir(os.path.join(adir, y, m))):
                    for ed in sorted(os.listdir(os.path.join(adir, y, m, d))):
                        rows.append(
                            (
                                alias,
                                _date(int(y), int(m), int(d)),
                                ed,
                                os.path.join(adir, y, m, d, ed),
                                "swissinfo",
                            )
                        )
    return spark.createDataFrame(rows, DISCOVERY_SCHEMA)


register(SwissInfoPlugin())
