"""TETML importer on the reference's own FedGaz sample data (read-only
input — the reference repo's test strategy is E2E import on sample data,
SURVEY §5). Skipped when the sample tree is absent.

Golden parity: the reference golden-checks TETML via
``verify_imported_issues`` (ref tests/importers/test_tetml_importer.py:
129-172 + utils.py:92-136) against shipped expected JSONs; those
expected files for Tetml are NOT in the reference checkout (only Olive's
are), so ``tests/golden/Tetml`` freezes the same invariant — CI ids and
full legacy metadata must never change between runs/versions."""

import json
import os
from datetime import date

import pytest

from impresso_ta.importers import import_issues
from impresso_ta.rebuild import rebuild_issues_solr
from impresso_ta.schemas import DISCOVERY_SCHEMA

GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "Tetml"
)

SAMPLE = "/root/reference/text_preparation/data/sample_data/Tetml/FedGazDe/1857/09/26"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLE), reason="reference sample data not available"
)


@pytest.fixture(scope="module")
def tetml_import(spark):
    disc = spark.createDataFrame(
        [("FedGazDe", date(1857, 9, 26), "a", SAMPLE, "tetml")],
        DISCOVERY_SCHEMA,
    )
    return import_issues(disc, ts="2024-01-01T00:00:00Z")


def test_issue_structure(tetml_import):
    res = tetml_import
    assert res.errors.count() == 0
    issue = res.issues.collect()[0].asDict(recursive=True)
    assert issue["id"] == "FedGazDe-1857-09-26-a"
    # 5 tetml files → 5 articles, deterministic order/minting
    assert [ci["m"]["id"][-5:] for ci in issue["i"]] == [
        "i0001", "i0002", "i0003", "i0004", "i0005",
    ]
    assert all(ci["m"]["tp"] == "article" for ci in issue["i"])
    # sequential non-overlapping page ranges across articles
    all_pages = [p for ci in issue["i"] for p in ci["m"]["pp"]]
    assert all_pages == sorted(all_pages)
    assert len(set(all_pages)) == len(all_pages)
    assert issue["pp"][0] == "FedGazDe-1857-09-26-a-p0001"


def test_pages_have_text_and_coords(tetml_import):
    pages = [r.asDict(recursive=True) for r in tetml_import.pages.collect()]
    assert len(pages) >= 5
    p1 = next(p for p in pages if p["id"].endswith("p0001"))
    tokens = [
        t
        for reg in p1["r"]
        for para in reg["p"]
        for line in para["l"]
        for t in line["t"]
    ]
    assert len(tokens) > 50
    # coordinates are positive IIIF pixel boxes
    assert all(
        t["c"][2] >= 0 and t["c"][3] >= 0 and t["c"][0] >= 0 for t in tokens
    )
    # the front-page masthead is present
    assert any(t["tx"] == "Schweizerisches" for t in tokens)
    # regions carry the owning article
    assert all(reg["pOf"] for reg in p1["r"])


def test_rebuild_sample(tetml_import):
    res = tetml_import
    rebuilt = rebuild_issues_solr(res.issues, res.pages, ts="2024-01-01T00:00:00Z")
    rows = [r.asDict(recursive=True) for r in rebuilt.collect()]
    assert len(rows) == 5 and all(not r["has_problem"] for r in rows)
    ft = {r["id"]: r["ft"] for r in rows}
    art1 = ft["FedGazDe-1857-09-26-a-i0001"]
    assert "Schweizerisches" in art1 and len(art1) > 500
    # German whitespace rules applied (no space before period)
    assert ". " in art1
    for r in rows:
        for p in r["ppreb"]:
            for t in p["t"]:
                assert t["s"] + max(t["l"], 0) <= len(r["ft"])


def test_verify_imported_issues_golden(tetml_import):
    """The reference's verify_imported_issues semantics (utils.py:92-136):
    every expected CI id must exist, and each CI's legacy metadata must
    equal the frozen golden exactly."""
    res = tetml_import
    actual = res.issues.collect()[0].asDict(recursive=True)
    golden_path = os.path.join(GOLDEN, f"{actual['id']}-issue.json")
    expected = json.load(open(golden_path))

    actual_ids = {ci["m"]["id"] for ci in actual["i"]}
    expected_ids = {ci["m"]["id"] for ci in expected["i"]}
    assert expected_ids.difference(actual_ids) == set()

    expected_by_id = {ci["m"]["id"]: ci for ci in expected["i"]}
    for ci in actual["i"]:
        exp = expected_by_id.get(ci["m"]["id"])
        if exp is None:
            continue  # ref utils.py:126-129: late additions tolerated
        actual_l = {k: v for k, v in (ci["l"] or {}).items() if v is not None}
        assert actual_l == exp["l"], ci["m"]["id"]
