"""Generic METS/ALTO importer on the reference's real BNL (Luxembourg)
sample issue — E2E import + rebuild, the reference's own test strategy."""

import os
from datetime import date

import pytest

from impresso_ta.importers import import_issues
from impresso_ta.rebuild import rebuild_issues_solr
from impresso_ta.schemas import DISCOVERY_SCHEMA

SAMPLE = (
    "/root/reference/text_preparation/data/sample_data/Luxembourg/"
    "protected_027/1497608_newspaper_armeteufel_1904-01-17"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLE), reason="reference sample data not available"
)


@pytest.fixture(scope="module")
def bnl(spark):
    disc = spark.createDataFrame(
        [("armeteufel", date(1904, 1, 17), "a", SAMPLE, "mets_alto")],
        DISCOVERY_SCHEMA,
    )
    return import_issues(disc, ts="2024-01-01T00:00:00Z")


def test_structure(bnl):
    assert bnl.errors.count() == 0
    issue = bnl.issues.collect()[0].asDict(recursive=True)
    assert issue["id"] == "armeteufel-1904-01-17-a"
    assert len(issue["pp"]) == 4
    # article-level divs become CIs; their HEADING/BODY/PARAGRAPH
    # components do NOT (was 144 CIs naive, 24 structured)
    assert 15 <= len(issue["i"]) <= 40
    titles = [ci["m"]["t"] for ci in issue["i"] if ci["m"]["t"]]
    assert "Soll ich zum Volke sprechen." in titles
    # dmdSec MODS language propagated
    arts = [ci for ci in issue["i"] if ci["m"]["t"]]
    assert all(ci["m"]["lg"] == "de" for ci in arts)
    # parts map ALTO blocks (J5)
    first = next(ci for ci in issue["i"] if ci["m"]["t"] == "Soll ich zum Volke sprechen.")
    assert any(
        (p["comp_id"] or "").startswith("P1_TB") for p in first["l"]["parts"]
    )


def test_rebuild_real_text(bnl):
    rb = rebuild_issues_solr(bnl.issues, bnl.pages, ts="2024-01-01T00:00:00Z")
    rows = {r["id"]: r.asDict(recursive=True) for r in rb.collect()}
    art = next(
        r for r in rows.values()
        if (r.get("title") or "") == "Soll ich zum Volke sprechen."
    )
    assert art["lg"] == "de"
    # German whitespace rules: spaced words, glued sentence punctuation
    assert art["ft"].startswith("Soll ich zum Volke sprechen. ")
    assert len(art["ft"]) > 500
    assert len(art["lb"]) > 10
    n_text = sum(1 for r in rows.values() if r.get("ft"))
    assert n_text >= len(rows) - 2
