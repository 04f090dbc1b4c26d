"""Generic METS/ALTO importer on the reference's real RERO2 sample
(ALTO/ subdir layout, Article divs with PARAGRAPH/TEXT components)."""

import os
from datetime import date

import pytest

from impresso_ta.importers import import_issues
from impresso_ta.rebuild import rebuild_issues_solr
from impresso_ta.schemas import DISCOVERY_SCHEMA

SAMPLE = (
    "/root/reference/text_preparation/data/sample_data/RERO2/EZR/data/EZR/"
    "18400221_01"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLE), reason="reference sample data not available"
)


def test_rero_import_and_rebuild(spark):
    disc = spark.createDataFrame(
        [("EZR", date(1840, 2, 21), "a", SAMPLE, "mets_alto")],
        DISCOVERY_SCHEMA,
    )
    res = import_issues(disc, ts="2024-01-01T00:00:00Z")
    assert res.errors.count() == 0
    issue = res.issues.collect()[0].asDict(recursive=True)
    assert issue["id"] == "EZR-1840-02-21-a"
    assert len(issue["pp"]) == 6  # ALTO/ subdir page files found
    assert 5 <= len(issue["i"]) <= 30

    rb = rebuild_issues_solr(
        res.issues, res.pages, ts="2024-01-01T00:00:00Z", default_language="de"
    )
    rows = [r.asDict(recursive=True) for r in rb.collect()]
    with_text = [r for r in rows if r.get("ft")]
    assert len(with_text) >= len(rows) - 2
    # default_language fills missing lg so text is spaced
    longest = max(with_text, key=lambda r: len(r["ft"]))
    assert " " in longest["ft"] and len(longest["ft"]) > 500
