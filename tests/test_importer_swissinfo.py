"""SwissInfo importer on a generated OCR-JSON fixture (the reference's
sample ships only the raw pre-OCR pdfplumber dump — S9 is out-of-engine
— so the fixture follows the importer's documented ingest contract, ref
swissinfo/classes.py:182-248). Covers: hyphen repair, the
split-page-blocks heuristic, metadata title/program wiring (chronicle vs
radio_bulletin), fw/fh facsimile dims, missing-OCR notes, the
all-pages-missing error channel, and PAGE_SCHEMA validation."""

import json
import os

import pytest

from impresso_ta.importers import import_issues
from impresso_ta.importers.swissinfo import detect_swissinfo_issues
from impresso_ta.operators.validate import validate_pages
from impresso_ta.rebuild import rebuild_issues_solr


def _span(text, x1, y1, x2, y2):
    return {"text": text, "rescaled_bbox": [x1, y1, x2, y2]}


def _block(number, lines):
    xs = [c for ln in lines for c in (ln["rescaled_bbox"][0], ln["rescaled_bbox"][2])]
    ys = [c for ln in lines for c in (ln["rescaled_bbox"][1], ln["rescaled_bbox"][3])]
    return {
        "number": number,
        "rescaled_bbox": [min(xs), min(ys), max(xs), max(ys)],
        "lines": lines,
    }


def _line(y, spans):
    xs = [s["rescaled_bbox"][0] for s in spans] + [
        s["rescaled_bbox"][2] for s in spans
    ]
    return {"rescaled_bbox": [min(xs), y, max(xs), y + 20], "spans": spans}


@pytest.fixture(scope="module")
def swissinfo_dump(tmp_path_factory):
    base = tmp_path_factory.mktemp("swissinfo")
    root = base / "WW2-SOC-bulletins-json"

    def write_issue(alias, y, m, d, ed, bulletin):
        idir = root / alias / y / m / d / ed
        idir.mkdir(parents=True)
        iid = f"{alias}-{y}-{m}-{d}-{ed}"
        (idir / f"{iid}.json").write_text(json.dumps(bulletin))
        return iid

    # issue 1: two OCR pages + one empty page; hyphenated line break
    # ("bulle-" / "tin"); 2-line blocks → split_page_blocks (mean < 3.5)
    iid1 = "SOC_CJ-1945-07-12-a"
    p1_block1 = _block(
        1,
        [
            _line(100, [_span("Le", 10, 100, 40, 120), _span("bulle-", 50, 100, 120, 120)]),
            _line(130, [_span("tin", 10, 130, 45, 150), _span("radio", 55, 130, 120, 150)]),
        ],
    )
    p1_block2 = _block(
        2,
        [
            _line(200, [_span("Situation", 10, 200, 110, 220), _span(" ", 111, 200, 112, 220)]),
            _line(230, [_span("militaire", 10, 230, 100, 250)]),
        ],
    )
    p2_block = _block(
        1,
        [
            _line(90, [_span("Suite", 12, 90, 70, 110)]),
            _line(120, [_span("du", 12, 120, 40, 140), _span("texte", 50, 120, 110, 140)]),
        ],
    )
    bulletin1 = {
        "lang": "fr",
        "original_path": "/local/dump/SOC/1945/CJ-1945-07-12-FR.pdf",
        "jp2_full_paths": [
            f"jp2/{iid1}-p0001.jp2",
            f"jp2/{iid1}-p0002.jp2",
            f"jp2/{iid1}-p0003.jp2",
        ],
        "ocr_pages": [
            {
                "page_num": 0,
                "jp2_img_size": [2480, 3508],
                "ocr_page_size": [610.08, 849.36],
                "blocks_with_lines": [p1_block1, p1_block2],
                "blocks_without_lines": [],
            },
            {
                "page_num": 1,
                "jp2_img_size": [2480, 3508],
                "ocr_page_size": [610.08, 849.36],
                "blocks_with_lines": [p2_block],
                "blocks_without_lines": [],
            },
            {
                "page_num": 2,
                "jp2_img_size": [2480, 3508],
                "ocr_page_size": [610.08, 849.36],
                "blocks_with_lines": [],
                "blocks_without_lines": [{"number": 9}],
            },
        ],
    }
    write_issue("SOC_CJ", "1945", "07", "12", "a", bulletin1)

    # issue 2: no metadata entry → default radio_bulletin type
    iid2 = "SOC_CJ-1946-01-03-a"
    bulletin2 = {
        "lang": "de",
        "original_path": "/local/dump/SOC/1946/CJ-1946-01-03-DE.pdf",
        "jp2_full_paths": [f"jp2/{iid2}-p0001.jp2"],
        "ocr_pages": [
            {
                "page_num": 0,
                "jp2_img_size": [2480, 3508],
                "ocr_page_size": [610.08, 849.36],
                "blocks_with_lines": [
                    _block(
                        1,
                        [
                            _line(100, [_span(f"Zeile{i}", 10, 100 + 30 * i, 80, 120 + 30 * i)])
                            for i in range(4)
                        ],
                    )
                ],
                "blocks_without_lines": [],
            }
        ],
    }
    write_issue("SOC_CJ", "1946", "01", "03", "a", bulletin2)

    # issue 3: OCR empty everywhere → must land in the error channel
    iid3 = "SOC_CJ-1947-02-01-a"
    bulletin3 = {
        "lang": "fr",
        "original_path": "/local/dump/SOC/1947/CJ-1947-02-01-FR.pdf",
        "jp2_full_paths": [f"jp2/{iid3}-p0001.jp2"],
        "ocr_pages": [
            {
                "page_num": 0,
                "jp2_img_size": [2480, 3508],
                "ocr_page_size": [610.08, 849.36],
                "blocks_with_lines": [],
                "blocks_without_lines": [],
            }
        ],
    }
    write_issue("SOC_CJ", "1947", "02", "01", "a", bulletin3)

    (root / "SOC_rb_metadata.json").write_text(
        json.dumps(
            [
                {
                    "archive_key": "CJ-1945-07-12-FR",
                    "segment_title": "Chronique de guerre",
                    "program_title": "Courrier de l'audition",
                    "program_subtitle": "Edition du soir",
                }
            ]
        )
    )
    return str(base)


@pytest.fixture(scope="module")
def imported(spark, swissinfo_dump):
    disc = detect_swissinfo_issues(spark, swissinfo_dump)
    res = import_issues(disc, ts="2024-01-01T00:00:00Z")
    issues = {
        r["id"]: r.asDict(recursive=True) for r in res.issues.collect()
    }
    errors = [r.asDict() for r in res.errors.collect()]
    return res, issues, errors


def test_detect_and_error_channel(imported):
    res, issues, errors = imported
    assert set(issues) == {"SOC_CJ-1945-07-12-a", "SOC_CJ-1946-01-03-a"}
    assert len(errors) == 1
    assert "No OCR in any of the pages" in errors[0]["error"]
    assert errors[0]["canonical_path"] == "SOC_CJ-1947-02-01-a"


def test_issue_and_ci_metadata(imported):
    _, issues, _ = imported
    iss = issues["SOC_CJ-1945-07-12-a"]
    assert iss["st"] == "radio_broadcast" and iss["sm"] == "typescript"
    assert iss["rc"] == "SOC (KWD)"
    assert iss["rp"] == "Courrier de l'audition - Edition du soir"
    (ci,) = iss["i"]
    assert ci["m"]["tp"] == "chronicle"
    assert ci["m"]["t"] == "Chronique de guerre"
    assert ci["m"]["var_t"] == "Courrier de l'audition"
    assert ci["m"]["lg"] == "fr"
    assert ci["m"]["pp"] == [1, 2, 3]
    assert ci["l"]["source"] == "SOC/1945/CJ-1945-07-12-FR.pdf"
    # page-3-has-no-OCR note captured on the issue
    assert "page 3 has no block with lines" in iss["n"]

    # no metadata entry → default type, no program
    iss2 = issues["SOC_CJ-1946-01-03-a"]
    assert iss2["i"][0]["m"]["tp"] == "radio_bulletin"
    assert iss2["rp"] is None


def test_pages_regions_and_hyphens(imported):
    res, _, _ = imported
    pages = {
        r["id"]: r.asDict(recursive=True) for r in res.pages.collect()
    }
    p1 = pages["SOC_CJ-1945-07-12-a-p0001"]
    assert p1["sm"] == "typescript" and p1["cc"] is True
    assert p1["fw"] == 2480 and p1["fh"] == 3508
    assert p1["iiif_img_base_uri"].endswith(
        "SOC_CJ-1945-07-12-a-p0001/info.json"
    )
    # one aggregated region (A7 bbox over both blocks)
    assert len(p1["r"]) == 1
    reg = p1["r"][0]
    assert reg["pOf"] == "SOC_CJ-1945-07-12-a-i0001"
    assert reg["c"] == [10, 100, 110, 150]  # xywh over blocks 1+2
    # split_page_blocks fired (mean lines/block = 2 < 3.5): one merged
    # paragraph carrying all 4 lines
    assert len(reg["p"]) == 1
    lines = reg["p"][0]["l"]
    assert len(lines) == 4
    # hyphen repair: "bulle-" flagged hy, next line's "tin" nf="bulletin"
    l0_tokens = lines[0]["t"]
    assert l0_tokens[-1]["tx"] == "bulle-" and l0_tokens[-1]["hy"] is True
    l1_tokens = lines[1]["t"]
    assert l1_tokens[0]["tx"] == "tin" and l1_tokens[0]["nf"] == "bulletin"
    # space-only span skipped
    texts = [t["tx"] for ln in lines for t in ln["t"]]
    assert " " not in texts
    # A8 completion: average paragraph (block) size in lines
    assert p1["parag_avg_size"] == 2.0
    # empty-OCR page ships with zero regions but exists
    p3 = pages["SOC_CJ-1945-07-12-a-p0003"]
    assert p3["r"] == []


def test_pages_validate_and_rebuild(imported, spark):
    res, _, _ = imported
    from pyspark.sql import functions as F

    validated = validate_pages(res.pages)
    assert validated.filter(F.size("_violations") > 0).count() == 0
    rb = rebuild_issues_solr(res.issues, res.pages, ts="2024-01-01T00:00:00Z")
    rows = {r["id"]: r.asDict(recursive=True) for r in rb.collect()}
    ci = rows["SOC_CJ-1945-07-12-a-i0001"]
    assert ci["st"] == "radio_broadcast" and ci["sm"] == "typescript"
    # hyphen merge survives the rebuild: "bulletin" in fulltext
    assert "bulletin radio" in ci["ft"]
    assert ci["rc"] == "SOC (KWD)"
