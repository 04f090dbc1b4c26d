"""FedGaz importer: metadata.tsv enrichment + pruned-article boundary
recovery, exercised on the reference's real sample TETML (copied to tmp so
we can add the metadata file the sample tree doesn't ship — the reference
has no FedGaz-with-metadata fixture either, its fedgaz importer is only
covered by the plain-TETML path)."""

import os
import shutil
from datetime import date

import pytest

from impresso_ta.importers import import_issues
from impresso_ta.schemas import DISCOVERY_SCHEMA

SAMPLE = "/root/reference/text_preparation/data/sample_data/Tetml/FedGazDe/1857/09/26"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLE), reason="reference sample data not available"
)

METADATA = """\
article_docid\tissue_date\tarticle_title\tvolume_language\tcanonical_page_first\tcanonical_page_last\tpruned
10002300\t1857-09-26\tBundesgesetz über die Militärpflichtersazsteuer\tde\t1\t2\tTrue
10002301\t1857-09-26\tbetreffend die Verfassung des Kantons Freiburg\tde\t2\t2\tFalse
10002302\t1857-09-26\tKreisschreiben des Bundesrathes\tde\t3\t4\tFalse
10002303\t1857-09-26\tBotschaft des Bundesrathes\tfr\t5\t6\tFalse
10002304\t1857-09-26\tBericht der Kommission\tde\t7\t12\tFalse
"""


@pytest.fixture(scope="module")
def fedgaz_import(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("fedgaz")
    issue_dir = root / "FedGazDe" / "1857" / "09" / "26"
    issue_dir.parent.mkdir(parents=True)
    shutil.copytree(SAMPLE, issue_dir)
    (root / "FedGazDe" / "metadata.tsv").write_text(METADATA)
    disc = spark.createDataFrame(
        [("FedGazDe", date(1857, 9, 26), "a", str(issue_dir), "fedgaz")],
        DISCOVERY_SCHEMA,
    )
    return import_issues(disc, ts="2024-01-01T00:00:00Z")


def test_metadata_overrides(fedgaz_import):
    res = fedgaz_import
    assert res.errors.count() == 0
    issue = res.issues.collect()[0].asDict(recursive=True)
    by_id = {ci["m"]["id"][-5:]: ci["m"] for ci in issue["i"]}
    assert by_id["i0001"]["t"].startswith("Bundesgesetz")
    assert by_id["i0004"]["lg"] == "fr"
    # page spans come from the metadata, not sequential assignment:
    # i0001 (pruned) shares page 2 with i0002
    assert by_id["i0001"]["pp"] == [1, 2]
    assert by_id["i0002"]["pp"] == [2]
    assert by_id["i0005"]["pp"] == list(range(7, 13))
    # the shared page is materialized once
    assert issue["pp"] == [
        f"FedGazDe-1857-09-26-a-p{n:04}" for n in range(1, 13)
    ]


def test_pruned_boundary_reattribution(fedgaz_import):
    pages = {
        p["id"][-5:]: p.asDict(recursive=True)
        for p in fedgaz_import.pages.collect()
    }
    assert len(pages) == 12
    # page 1: entirely the pruned article's own file
    assert {r["pOf"] for r in pages["p0001"]["r"]} == {
        "FedGazDe-1857-09-26-a-i0001"
    }
    # page 2 comes from i0002's file; the fuzzy title match (title starts
    # at region 2: "betreffend die Verfassung…") sends regions 0-1 back to
    # the pruned i0001
    shared = [r["pOf"] for r in pages["p0002"]["r"]]
    assert shared[:2] == ["FedGazDe-1857-09-26-a-i0001"] * 2
    assert set(shared[2:]) == {"FedGazDe-1857-09-26-a-i0002"}


def test_missing_metadata_is_error_row(spark, tmp_path):
    issue_dir = tmp_path / "FedGazDe" / "1857" / "09" / "26"
    issue_dir.parent.mkdir(parents=True)
    shutil.copytree(SAMPLE, issue_dir)
    disc = spark.createDataFrame(
        [("FedGazDe", date(1857, 9, 26), "a", str(issue_dir), "fedgaz")],
        DISCOVERY_SCHEMA,
    )
    res = import_issues(disc)
    errs = res.errors.collect()
    assert len(errs) == 1 and "metadata.tsv" in errs[0]["error"]
    assert res.issues.count() == 0
