"""SWA importer on the reference's real year-archive sample: CSV-manifest
discovery (S3) + in-archive ALTO pages with one CI per page."""

import os
from datetime import date

import pytest

from impresso_ta.importers import import_issues
from impresso_ta.rebuild import rebuild_issues_solr
from impresso_ta.schemas import DISCOVERY_SCHEMA
from impresso_ta.sources.discovery import detect_issues_from_csv

ZIP = (
    "/root/reference/text_preparation/data/sample_data/SWA/impresso_ocr/"
    "schwha_000094152_DSV01_1884.zip"
)
PREFIX = "schwha_000094152_DSV01_1884/ocr/schwha_000094152_DSV01_1884_alto"
MEMBERS = ";".join(
    f"{PREFIX}/BAU_1_000094152_1884_{n:04d}.xml" for n in (71, 73, 74)
)

pytestmark = pytest.mark.skipif(
    not os.path.isfile(ZIP), reason="reference sample data not available"
)


def test_swa_import_from_csv_manifest(spark, tmp_path):
    csv = tmp_path / "schwha.csv"
    csv.write_text(
        "alias,date,edition,path\n" f'schwha,1884-01-01,a,"{ZIP}::{MEMBERS}"\n'
    )
    disc = detect_issues_from_csv(spark, str(csv), "swa")
    res = import_issues(disc, ts="2024-01-01T00:00:00Z")
    assert res.errors.count() == 0

    issue = res.issues.collect()[0].asDict(recursive=True)
    assert issue["id"] == "schwha-1884-01-01-a"
    # one CI per page, ids minted p→i
    assert len(issue["i"]) == len(issue["pp"]) == 3
    assert [ci["m"]["id"][-5:] for ci in issue["i"]] == ["i0001", "i0002", "i0003"]
    assert all(ci["m"]["tp"] == "page" for ci in issue["i"])

    rb = rebuild_issues_solr(
        res.issues, res.pages, ts="2024-01-01T00:00:00Z", default_language="de"
    )
    rows = [r.asDict(recursive=True) for r in rb.collect()]
    assert len(rows) == 3 and all(not r["has_problem"] for r in rows)
    assert sum(len(r["ft"] or "") for r in rows) > 1000


def test_swa_bad_member_is_error_row(spark):
    disc_df = spark.createDataFrame(
        [("schwha", date(1884, 1, 1), "b", f"{ZIP}::missing/member.xml", "swa")],
        DISCOVERY_SCHEMA,
    )
    res = import_issues(disc_df)
    assert res.issues.count() == 0
    assert res.errors.count() == 1
