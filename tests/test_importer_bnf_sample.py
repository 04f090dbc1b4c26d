"""Generic METS/ALTO importer on the reference's real BNF Oeuvre sample
(METS under toc/T*.xml, ALTO v3 pages under ocr/)."""

import os
from datetime import date

import pytest

from impresso_ta.importers import import_issues
from impresso_ta.rebuild import rebuild_issues_solr
from impresso_ta.schemas import DISCOVERY_SCHEMA

SAMPLE = "/root/reference/text_preparation/data/sample_data/BNF/Oeuvre/4616238"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLE), reason="reference sample data not available"
)


def test_bnf_import_and_rebuild(spark):
    disc = spark.createDataFrame(
        [("LDF", date(1915, 12, 1), "a", SAMPLE, "mets_alto")],
        DISCOVERY_SCHEMA,
    )
    res = import_issues(disc, ts="2024-01-01T00:00:00Z")
    assert res.errors.count() == 0
    issue = res.issues.collect()[0].asDict(recursive=True)
    assert len(issue["pp"]) == 4
    assert len(issue["i"]) > 20

    rb = rebuild_issues_solr(
        res.issues, res.pages, ts="2024-01-01T00:00:00Z", default_language="fr"
    )
    rows = [r.asDict(recursive=True) for r in rb.collect()]
    with_text = [r for r in rows if r.get("ft")]
    assert len(with_text) == len(rows)
    assert any("DERNIÈRE HEURE" in r["ft"] for r in with_text)
