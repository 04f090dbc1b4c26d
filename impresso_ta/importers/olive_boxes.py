"""Olive X7 coordinate conversion — BoxStrategy scale factors.

The Olive OCR computed box coordinates against one of several source
images (tif / highest png / unique png / unique jpg); impresso's JP2
display images were acquired from the best available source, so region
coordinates must be rescaled before IIIF links resolve. Strategy
selection and arithmetic match the reference
(ref: text_preparation/importers/olive/helpers.py:420-603), with two
container-friendly substitutions:

- the unique-jpg x-dimension is read by a pure-Python JPEG SOF header
  scan instead of OpenCV (same value, no native dependency);
- page image metadata comes from the issue's own ``Pg*.xml`` files
  (already in the archive), parsed with ElementTree.

Which strategy applies per page is recorded in the per-issue
``*-image-info.json`` sidecar produced by impresso's image ingestion
(``strat`` + source image ``s`` per page) — the importer receives the
sidecar directory via the discovery path options.
"""

from __future__ import annotations

import struct
import xml.etree.ElementTree as ET
from typing import Any, Optional

#: the five strategies recorded in image-info sidecars (ref
#: helpers.py:478-484). ``png_uniq`` is unimplemented in the reference
#: too (an explicit TODO); ``jpg_highest`` has no branch there either.
BOX_STRATEGIES = ("tif", "png_highest", "png_uniq", "jpg_uniq", "jpg_highest")


def convert_xywh_box(coords: list[int], scale_factor: float) -> list[int]:
    """Rescale an [x,y,w,h] box (ref helpers.py:436-474: the reference
    scales corner boxes into xywh with per-element round(); on an
    already-xywh box that is exactly per-element round(v*s))."""
    return [round(v * scale_factor) for v in coords]


def jpeg_x_dim(data: bytes) -> Optional[int]:
    """Width of a JPEG from its SOF segment (replaces the reference's
    cv.imdecode(...).shape[1] — identical value, no OpenCV)."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 9 < len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        # SOF0..SOF15 except DHT(C4)/DAC(CC)/RST variants
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            # segment: len(2) precision(1) height(2) width(2)
            return struct.unpack(">H", data[i + 7 : i + 9])[0]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        i += 2 + seg_len
    return None


def parse_page_meta(page_xml: bytes) -> dict[str, Any]:
    """Pg*.xml → the metadata the strategies need: page number, Olive's
    images resolution, page width, and the PAGE_IMG source resolution
    (ref helpers.py:540-546 reads the same attributes via soup)."""
    root = ET.fromstring(page_xml)
    meta = next((el for el in root.iter() if el.tag == "Meta"), None)
    out: dict[str, Any] = {
        "page_no": meta.get("PAGE_NO") if meta is not None else None,
        "images_resolution": (
            meta.get("IMAGES_RESOLUTION") if meta is not None else None
        ),
        "page_width": meta.get("PAGE_WIDTH") if meta is not None else None,
        "page_img_xres_dpi": None,
    }
    for f in root.iter():
        if f.tag == "Files" and f.get("TYPE") == "PAGE_IMG":
            if f.get("PRESENT") == "1":
                out["page_img_xres_dpi"] = f.get("XRESOLUTION_DPI")
            break
    return out


def get_scale_factor(
    page_meta: dict[str, Any],
    box_strategy: str,
    img_source_name: str,
    jpg_bytes: Optional[bytes] = None,
) -> Optional[float]:
    """Scale factor for one page, or None when the strategy cannot be
    resolved (ref helpers.py:486-603 — the page then ships cc=False).

    - ``tif``: jp2 acquired from the tif; factor = PAGE_IMG source dpi /
      Olive images resolution.
    - ``png_highest``: jp2 from the highest png, which Olive also used
      for OCR → 1.0 when the png filename's resolution suffix matches
      Olive's images resolution, else unresolvable.
    - ``png_uniq``: unimplemented in the reference (TODO there).
    - ``jpg_uniq``: 1.0 when the unique jpg's x-dimension equals Olive's
      page width (``jpg_bytes`` = the archived jpg), else unresolvable.
    """
    if box_strategy == "tif":
        src = page_meta.get("page_img_xres_dpi")
        dst = page_meta.get("images_resolution")
        if src and dst:
            return int(src) / int(dst)
        return None
    if box_strategy == "png_highest":
        if "_" not in img_source_name:
            return None
        stem = img_source_name.rsplit(".", 1)[0]
        png_res = stem.split("_", 1)[-1]
        if png_res == page_meta.get("images_resolution"):
            return 1.0
        return None
    if box_strategy == "jpg_uniq":
        if jpg_bytes is None:
            return None
        jpg_x = jpeg_x_dim(jpg_bytes)
        olive_x = page_meta.get("page_width")
        if jpg_x is not None and olive_x and jpg_x == int(olive_x):
            return 1.0
        return None
    # png_uniq (reference TODO) and jpg_highest (no reference branch)
    return None


def convert_page_regions(
    regions: list[dict], scale_factor: float
) -> list[dict]:
    """Rescale every region/paragraph/line/token box in-place-style
    (ref helpers.py:605-650), returning the converted structure."""

    def _cv(c):
        return convert_xywh_box(c, scale_factor) if c else c

    return [
        {
            **reg,
            "c": _cv(reg.get("c")),
            "p": [
                {
                    **para,
                    "c": _cv(para.get("c")),
                    "l": [
                        {
                            **line,
                            "c": _cv(line.get("c")),
                            "t": [
                                {**tok, "c": _cv(tok.get("c"))}
                                for tok in line.get("t") or []
                            ],
                        }
                        for line in para.get("l") or []
                    ],
                }
                for para in reg.get("p") or []
            ],
        }
        for reg in regions
    ]
