"""SWA (Basel) importer plugin — ALTO pages in year archives, CSV-driven.

Re-implements the reference's SWA semantics (ref: importers/swa/
classes.py:26-180, swa/detect.py:60-185):

- discovery comes from a CSV manifest (SURVEY S3,
  ``sources.discovery.detect_issues_from_csv``); each issue row's
  ``path`` is ``{year_archive.zip}::{member1;member2;...}`` — the alto
  members of that issue inside the archive, in page order,
- SWA has no article segmentation: ONE content item per page, minted by
  replacing the page id's ``p`` with ``i`` (ref: classes.py:57-70);
  every region of the page carries that CI,
- alto files are utf-8-sig encoded (ref: SWA_XML_ENCODING); the page
  image IIIF uri derives from the member filename.
"""

from __future__ import annotations

import io
import os
import zipfile
from typing import Any

from impresso_ta.importers.base import FormatPlugin, register
from impresso_ta.importers.mets_alto import parse_alto_page

IIIF_IMG_BASE_URI = "https://ub-sipi.ub.unibas.ch/impresso"


class SwaPlugin(FormatPlugin):
    name = "swa"

    def parse_issue_dir(
        self, alias: str, date: str, edition: str, path: str
    ) -> dict[str, Any]:
        issue_id = f"{alias}-{date}-{edition}"
        if "::" not in path:
            raise ValueError(
                f"SWA path must be 'archive.zip::member;member', got {path!r}"
            )
        zip_path, members_spec = path.split("::", 1)
        members = [m for m in members_spec.split(";") if m]
        if not members:
            raise ValueError(f"No alto members listed for {issue_id}")

        with open(zip_path, "rb") as f:
            zf = zipfile.ZipFile(io.BytesIO(f.read()))

        cis = []
        pages = []
        for page_no, member in enumerate(members, start=1):
            page_id = f"{issue_id}-p{str(page_no).zfill(4)}"
            ci_id = f"{issue_id}-i{str(page_no).zfill(4)}"
            raw = zf.read(member)
            # utf-8-sig: strip the BOM some SWA altos carry
            if raw.startswith(b"\xef\xbb\xbf"):
                raw = raw[3:]
            regions, notes, _styles = parse_alto_page(raw, {})
            for reg in regions:
                reg["pOf"] = ci_id
            filename = os.path.basename(member)
            cis.append(
                {
                    "m": {
                        "id": ci_id,
                        "pp": [page_no],
                        "tp": "page",
                        "ro": page_no,
                    },
                    "l": {"id": filename},
                }
            )
            pages.append(
                {
                    "id": page_id,
                    "st": "newspaper",
                    "sm": "print",
                    "cc": True,
                    "iiif_img_base_uri": os.path.join(
                        IIIF_IMG_BASE_URI, filename.split(".")[0]
                    ),
                    "r": regions,
                    "n": notes or None,
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


register(SwaPlugin())
