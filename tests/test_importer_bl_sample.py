"""Generic METS/ALTO importer on the reference's real BL sample issue —
the BL variant links articles to physical pagearea divs through
structLink with word-id ranges instead of direct block areas."""

import os
from datetime import date

import pytest

from impresso_ta.importers import import_issues
from impresso_ta.rebuild import rebuild_issues_solr
from impresso_ta.schemas import DISCOVERY_SCHEMA

SAMPLE = (
    "/root/reference/text_preparation/data/sample_data/BL/"
    "BLIP_20190920_01/0002088/1832/1123"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLE), reason="reference sample data not available"
)


def test_bl_import_and_rebuild(spark):
    disc = spark.createDataFrame(
        [("BLIP2088", date(1832, 11, 23), "a", SAMPLE, "mets_alto")],
        DISCOVERY_SCHEMA,
    )
    res = import_issues(disc, ts="2024-01-01T00:00:00Z")
    assert res.errors.count() == 0
    issue = res.issues.collect()[0].asDict(recursive=True)
    assert len(issue["pp"]) == 8
    assert len(issue["i"]) == 54
    # page numbers resolved through the physical structMap ORDER
    assert all(ci["m"]["pp"] for ci in issue["i"])
    # dmdSec language
    assert issue["i"][0]["m"]["lg"] == "en"

    rb = rebuild_issues_solr(res.issues, res.pages, ts="2024-01-01T00:00:00Z")
    rows = [r.asDict(recursive=True) for r in rb.collect()]
    with_text = [r for r in rows if r.get("ft")]
    # word-range mappings give every article its text
    assert len(with_text) == 54
    assert any("shadows, clouds, and darkness" in r["ft"] for r in with_text)
