"""Zip-archive issue source (SURVEY S6).

Olive/SWA/BL issues arrive as one ``Document.zip`` per issue; the
reference unpacks to a temp dir and re-reads files (ref:
importers/classes.py:200-266 ``ZipArchive``, olive/classes.py:213-240).
Here the archive is parsed from an in-memory buffer inside the task — no
temp dir, no second read, and issue+pages stay in the same task (the
archive-locality requirement from SURVEY §4: one task per archive).

This plugin handles METS/ALTO content packaged in a zip; the same class
is the base for any zipped format (override ``member_is_mets`` /
``member_is_page``). Zero-byte or corrupt archives become error rows
upstream (the import UDTF catches raises).
"""

from __future__ import annotations

import io
import os
import re
import zipfile
from typing import Any

from impresso_ta.importers.base import FormatPlugin, register
from impresso_ta.importers.mets_alto import parse_alto_page, parse_mets_cis


class ZipMetsAltoPlugin(FormatPlugin):
    """Issue = one ``*.zip`` in the issue directory, containing a METS
    file and ALTO page files."""

    name = "zip_mets_alto"

    def member_is_mets(self, name: str) -> bool:
        return "mets" in name.lower() and name.lower().endswith(".xml")

    def member_is_page(self, name: str) -> bool:
        return name.lower().endswith(".xml") and "mets" not in name.lower()

    def _find_zip(self, path: str) -> str:
        hits = sorted(
            f for f in os.listdir(path) if f.lower().endswith(".zip")
        )
        if not hits:
            raise FileNotFoundError(f"No issue archive (*.zip) in {path}")
        return os.path.join(path, hits[0])

    def parse_issue_dir(
        self, alias: str, date: str, edition: str, path: str
    ) -> dict[str, Any]:
        issue_id = f"{alias}-{date}-{edition}"
        zip_path = self._find_zip(path)
        with open(zip_path, "rb") as f:
            buf = io.BytesIO(f.read())

        with zipfile.ZipFile(buf) as zf:
            names = sorted(zf.namelist())  # deterministic member order
            mets_names = [n for n in names if self.member_is_mets(n)]
            if not mets_names:
                raise FileNotFoundError(
                    f"No METS member in archive {os.path.basename(zip_path)}"
                )
            cis, notes, extra_mappings = parse_mets_cis(
                zf.read(mets_names[0]), issue_id
            )

            mappings: dict[str, str] = dict(extra_mappings)
            for ci in cis:
                for part in ci["l"]["parts"]:
                    if part["comp_id"]:
                        mappings.setdefault(part["comp_id"], ci["m"]["id"])

            pages = []
            page_members = [n for n in names if self.member_is_page(n)]
            for idx, member in enumerate(page_members, start=1):
                m = re.search(r"(\d+)\.xml$", member, re.IGNORECASE)
                page_no = int(m.group(1)) if m else idx
                page_id = f"{issue_id}-p{str(page_no).zfill(4)}"
                regions, page_notes, _styles = parse_alto_page(
                    zf.read(member), mappings
                )
                pages.append(
                    {
                        "id": page_id,
                        "st": "newspaper",
                        "sm": "print",
                        "cc": True,
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
            "n": "; ".join(notes) if notes else None,
            "_pages": pages,
        }


register(ZipMetsAltoPlugin())
