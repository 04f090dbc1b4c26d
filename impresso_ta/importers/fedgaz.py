"""FedGaz importer: TETML + newspaper-level ``metadata.tsv`` enrichment.

Extends the generic TETML plugin with the reference's FedGaz semantics
(ref: importers/fedgaz/classes.py:64-401):

- a ``metadata.tsv`` at the newspaper (alias) directory carries per-article
  ``article_title``, ``volume_language``, ``canonical_page_first/last`` and
  a ``pruned`` flag (classes.py:175-240); title/language/page-span override
  the values derived from the TETML files,
- page NUMBERS come from the metadata spans, not from sequential
  assignment — a pruned article shares its last page with the next
  article's first (both TETML files contain a copy of the shared page),
- for each pruned article the importer fuzzy-matches the NEXT article's
  title inside the next article's first (shared) page to find the real
  in-page boundary (classes.py:242-344): regions before the match are
  re-attributed (``pOf``) to the pruned article, and the pruned article's
  own duplicate copy of the shared page is dropped (classes.py:399-401)
  whether or not the match succeeds.

Deviations, deliberate: the reference walks ``article_data[i_art - 1]``
with ``i_art`` starting at 0, silently pairing the FIRST article with the
LAST via Python's negative indexing — we pair strictly consecutive
articles. Region granularity: our TETML parse emits one region per
paragraph, so re-attribution flips whole regions' ``pOf`` instead of
splicing paragraph lists (same canonical output shape: full paragraphs
only, classes.py:362).

Everything runs worker-side inside the import UDTF — the metadata file is
a few KB per newspaper, read once per issue task; at 100 TB scale this
stays embarrassingly parallel (no driver-side state, no shuffle added).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

from impresso_ta.importers.base import register
from impresso_ta.importers.tetml import (
    IIIF_ENDPOINT_URI,
    TetmlPlugin,
    parse_tetml_article,
)


def find_metadata_file(alias: str, issue_path: str, fname: str = "metadata.tsv") -> str:
    """Newspaper top directory = the path segment equal to ``alias``
    (ref: fedgaz/classes.py:180-182)."""
    parts = Path(issue_path).parts
    try:
        i = parts.index(alias)
    except ValueError as e:
        raise FileNotFoundError(
            f"alias {alias!r} not a segment of {issue_path!r}; "
            f"metadata file {fname} must live in the newspaper top directory"
        ) from e
    return str(Path(*parts[: i + 1]) / fname)


def read_issue_metadata(alias: str, issue_path: str, date: str):
    """metadata.tsv rows for one issue date, indexed by article_docid
    (ref: fedgaz/classes.py:175-203)."""
    import pandas as pd

    fpath = find_metadata_file(alias, issue_path)
    if not os.path.exists(fpath):
        raise FileNotFoundError(
            f"File with additional metadata needs to be placed in the top "
            f"newspaper directory and named metadata.tsv (looked at {fpath})"
        )
    df = pd.read_csv(
        fpath,
        sep="\t",
        parse_dates=["issue_date"],
        dtype={"article_docid": str},
        index_col="article_docid",
    )
    return df[df["issue_date"] == pd.Timestamp(date)]


def _fuzzy_title_pattern(title: str):
    """The reference's cost model: insertions very cheap (bad OCR inserts
    noise), ~20% total error budget (ref: fedgaz/classes.py:290-302)."""
    import regex

    title = str(title).lower()[:30]
    title = title.replace("(", r"\(").replace(")", r"\)")
    max_cost_total = max(2, int(0.2 * len(title)))
    max_insert = int(0.3 * len(title))
    fuzzy = "{i<=" + str(max_insert) + ",1i+3d+3s<=" + str(max_cost_total * 3) + "}"
    return regex.compile(r"(?b)(" + title + r")" + fuzzy)


def _match_region_index(regions: list[dict], title: str) -> Optional[int]:
    """Index of the region (on the shared page) whose tokens contain the
    best fuzzy match of ``title``; None when nothing matches."""
    tokens: list[str] = []
    tok_region: list[int] = []
    for i_reg, reg in enumerate(regions):
        for para in reg["p"]:
            for line in para["l"]:
                for tok in line["t"]:
                    tokens.append(tok["tx"] or "")
                    tok_region.append(i_reg)
    if not tokens:
        return None
    text = " ".join(tokens).lower()
    m = _fuzzy_title_pattern(title).search(text)
    if m is None:
        return None
    tok_idx = text[: m.start(1)].count(" ")
    return tok_region[min(tok_idx, len(tok_region) - 1)]


class FedgazPlugin(TetmlPlugin):
    """FedGaz issues: TETML articles + metadata.tsv logical structure."""

    name = "fedgaz"
    language = "de"

    def parse_issue_dir(
        self, alias: str, date: str, edition: str, path: str
    ) -> dict[str, Any]:
        issue_id = f"{alias}-{date}-{edition}"
        meta = read_issue_metadata(alias, path, date)
        files = sorted(str(p) for p in Path(path).rglob("*.tetml"))
        if not files:
            raise FileNotFoundError(f"No *.tetml files in {path}")

        arts: list[dict] = []
        next_page = 1
        for i, fname in enumerate(files, start=1):
            ci_id = f"{issue_id}-i{str(i).zfill(4)}"
            docid = os.path.basename(fname).split(".")[0]
            with open(fname, "rb") as f:
                pages = parse_tetml_article(f.read(), self.language)
            for regions in pages:
                for reg in regions:
                    reg["pOf"] = ci_id
            if docid in meta.index:
                row = meta.loc[docid]
                title = str(row["article_title"])
                lg = str(row["volume_language"])
                pp = list(
                    range(
                        int(row["canonical_page_first"]),
                        int(row["canonical_page_last"]) + 1,
                    )
                )
                pruned = bool(row.get("pruned", False))
            else:
                title, lg = os.path.basename(fname), self.language
                pp = list(range(next_page, next_page + len(pages)))
                pruned = False
            next_page = (pp[-1] if pp else next_page) + 1
            arts.append(
                {
                    "ci_id": ci_id,
                    "docid": docid,
                    "title": title,
                    "lg": lg,
                    "pp": pp,
                    "pruned": pruned,
                    "pages": pages,
                    "fname": fname,
                    "ro": i,
                }
            )

        # In-page boundary recovery for pruned articles
        # (ref: fedgaz/classes.py:242-344, 346-401).
        for i in range(1, len(arts)):
            prev, cur = arts[i - 1], arts[i]
            if not prev["pruned"]:
                continue
            if cur["pages"]:
                shared = cur["pages"][0]
                idx = _match_region_index(shared, cur["title"])
                if idx is not None and idx > 0:
                    for reg in shared[:idx]:
                        reg["pOf"] = prev["ci_id"]
            # the pruned article's own copy of the shared page is always
            # dropped — its canonical content comes from the next file
            if prev["pages"]:
                del prev["pages"][-1]

        # Assemble issue pages: metadata page numbers; on the shared page
        # the next article's file wins (it carries both articles' regions).
        page_regions: dict[int, list[dict]] = {}
        cis: list[dict] = []
        for art in arts:
            can_pages = art["pp"][:-1] if art["pruned"] else art["pp"]
            for page_no, regions in zip(can_pages, art["pages"]):
                page_regions[page_no] = regions
            cis.append(
                {
                    "m": {
                        "id": art["ci_id"],
                        "pp": art["pp"],
                        "tp": "article",
                        "t": art["title"],
                        "lg": art["lg"],
                        "ro": art["ro"],
                    },
                    "l": {
                        "id": art["docid"],
                        "source": os.path.basename(art["fname"]),
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


register(FedgazPlugin())
