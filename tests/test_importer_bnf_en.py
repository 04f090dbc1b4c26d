"""BNF-EN importer on the reference's real sample data (7 issues across
6 journals), mirroring the reference's own E2E test
(ref: tests/importers/test_bnf_en_importer.py — import runs, image CIs
carry 4 coords + an info.json iiif link) plus CI-id stability."""

import os

import pytest

from impresso_ta.importers import import_issues
from impresso_ta.importers.bnf_en import detect_bnf_en_issues
from impresso_ta.rebuild import rebuild_issues_solr

SAMPLE = "/root/reference/text_preparation/data/sample_data/BNF-EN"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLE), reason="reference sample data not available"
)

# offline stand-in for the Gallica Issues API resolution (S4): canonical
# issue id → ark (dropped-issue behavior is exercised by leaving one out)
ARKS = {
    "legaulois-1882-02-08-a": "bpt6k520793t",
    "legaulois-1884-04-30-b": "bpt6k521601m",
    "lepji-1900-06-03-a": "bpt6k6466555z",
    "lematin-1893-04-02-b": "bpt6k5530501g",
    "jdpl-1821-08-01-a": "bpt6k13571747",
    "oerennes-1918-12-17-a": "bpt6k6605712k",
}


@pytest.fixture(scope="module")
def imported(spark):
    disc = detect_bnf_en_issues(spark, SAMPLE, ARKS)
    res = import_issues(disc, ts="2024-01-01T00:00:00Z")
    issues = [r.asDict(recursive=True) for r in res.issues.collect()]
    errors = [r.asDict() for r in res.errors.collect()]
    return disc, issues, errors, res


def test_detect_drops_arkless_issues(spark, imported):
    disc, _, _, _ = imported
    rows = disc.collect()
    # 7 sample issue dirs, 6 arks provided → OE-Caen dropped (ref
    # detect.py:323-324 returns None without an ark)
    assert len(rows) == 6
    assert all("::ark=" in r["path"] for r in rows)


def test_import_all_green(imported):
    _, issues, errors, _ = imported
    assert errors == []
    assert {i["id"] for i in issues} == {
        "legaulois-1882-02-08-a",
        "legaulois-1884-04-30-b",
        "lepji-1900-06-03-a",
        "lematin-1893-04-02-b",
        "jdpl-1821-08-01-a",
        "oerennes-1918-12-17-a",
    }


def test_gaulois_issue_shape(imported):
    _, issues, _, _ = imported
    iss = {i["id"]: i for i in issues}["legaulois-1882-02-08-a"]
    assert len(iss["pp"]) == 4
    assert iss["iiif_manifest_uri"] == (
        "https://gallica.bnf.fr/iiif/ark:/12148/bpt6k520793t/manifest.json"
    )
    cis = iss["i"]
    # 23 articles + 1 table (MODSMD_PICT1) + section-decomposed ads
    tps = {ci["m"]["tp"] for ci in cis}
    assert "article" in tps and "ad" in tps and "table" in tps
    # dmdSec-lexicographic numbering: first CI is MODSMD_ARTICLE1's div
    first = cis[0]
    assert first["m"]["id"] == "legaulois-1882-02-08-a-i0001"
    assert first["m"]["t"] == "M. PAUL BERT ET LE CLERGE'"
    assert first["m"]["lg"] == "fr"
    # reading order covers 1..n uniquely
    ros = sorted(ci["m"]["ro"] for ci in cis)
    assert ros == list(range(1, len(cis) + 1))


def test_image_coordinates_and_iiif(imported):
    """Reference test_image_coordinates: every image/table CI has 4
    coords and an info.json iiif link."""
    _, issues, _, _ = imported
    checked = 0
    for iss in issues:
        for ci in iss["i"]:
            if ci["m"]["tp"] in ("image", "table"):
                assert ci["c"] is not None and len(ci["c"]) == 4, ci["m"]["id"]
                assert "info.json" in ci["m"]["iiif_link"]
                checked += 1
    assert checked > 0


def test_page_iiif_and_region_wiring(imported):
    _, _, _, res = imported
    pages = [r.asDict(recursive=True) for r in res.pages.collect()]
    gaulois = [
        p for p in pages if p["id"].startswith("legaulois-1882-02-08-a")
    ]
    assert len(gaulois) == 4
    p1 = next(p for p in gaulois if p["id"].endswith("p0001"))
    assert p1["iiif_img_base_uri"] == (
        "https://gallica.bnf.fr/iiif/ark:/12148/bpt6k520793t/f1"
    )
    # regions carry pOf wiring into the CIs minted from the METS
    pofs = {r["pOf"] for r in p1["r"] if r["pOf"]}
    assert any(pof.startswith("legaulois-1882-02-08-a-i") for pof in pofs)


def test_ci_ids_stable_across_runs(spark, imported):
    _, issues, _, _ = imported
    disc = detect_bnf_en_issues(spark, SAMPLE, ARKS)
    res2 = import_issues(disc, ts="2024-01-01T00:00:00Z")
    ids_run2 = {
        i["id"]: [ci["m"]["id"] for ci in i["i"]]
        for i in (r.asDict(recursive=True) for r in res2.issues.collect())
    }
    ids_run1 = {i["id"]: [ci["m"]["id"] for ci in i["i"]] for i in issues}
    assert ids_run1 == ids_run2


def test_rebuild_bnf_en(spark, imported):
    _, _, _, res = imported
    rb = rebuild_issues_solr(res.issues, res.pages, ts="2024-01-01T00:00:00Z")
    rows = [r.asDict(recursive=True) for r in rb.collect()]
    ok = [r for r in rows if not r.get("has_problem")]
    assert len(ok) > 100
    with_text = [r for r in ok if r.get("ft")]
    assert len(with_text) > 50
