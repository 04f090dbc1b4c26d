"""ABBYY/BCUL importer on the reference's real FAL 1762 sample issue."""

import os
from datetime import date

import pytest

from impresso_ta.importers import import_issues
from impresso_ta.rebuild import rebuild_issues_solr
from impresso_ta.schemas import DISCOVERY_SCHEMA

SAMPLE = "/root/reference/text_preparation/data/sample_data/BCUL/46165"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLE), reason="reference sample data not available"
)


@pytest.fixture(scope="module")
def bcul(spark):
    disc = spark.createDataFrame(
        [("FAL", date(1762, 12, 7), "a", SAMPLE, "abbyy_bcul")],
        DISCOVERY_SCHEMA,
    )
    return import_issues(disc, ts="2024-01-01T00:00:00Z")


def test_structure(bcul):
    assert bcul.errors.count() == 0
    issue = bcul.issues.collect()[0].asDict(recursive=True)
    assert issue["id"] == "FAL-1762-12-07-a"
    # one CI per page, tp='page'
    assert len(issue["i"]) == len(issue["pp"]) == 4
    assert all(ci["m"]["tp"] == "page" for ci in issue["i"])
    assert issue["i"][0]["m"]["pp"] == [1]


def test_word_reassembly(bcul):
    pages = {r["id"]: r.asDict(recursive=True) for r in bcul.pages.collect()}
    p1 = pages["FAL-1762-12-07-a-p0001"]
    tokens = [
        t
        for reg in p1["r"]
        for para in reg["p"]
        for line in para["l"]
        for t in line["t"]
    ]
    assert len(tokens) > 30
    # words reassembled from charParams: multi-char tokens with 4-coords
    multi = [t for t in tokens if t["tx"] and len(t["tx"]) > 3]
    assert len(multi) > 10
    assert all(len(t["c"]) == 4 and t["c"][2] > 0 for t in multi)
    # bz2-compressed pages decompressed in-task (pages 1-4 exist)
    assert len(pages) == 4


def test_rebuild_pages(bcul):
    rb = rebuild_issues_solr(bcul.issues, bcul.pages, ts="2024-01-01T00:00:00Z",
                             default_language="fr")
    rows = [r.asDict(recursive=True) for r in rb.collect()]
    assert len(rows) == 4 and all(not r["has_problem"] for r in rows)
    # tp='page' remaps to None (TYPE_MAPPINGS), olr False
    assert all(r["tp"] is None and r["olr"] is False for r in rows)
    assert all(len(r["ft"] or "") > 200 for r in rows)
