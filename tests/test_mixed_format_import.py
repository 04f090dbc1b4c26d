"""Mixed-format dispatch: ONE import_issues call over a discovery frame
holding different formats routes each row to its plugin (S2 per-format
dispatch, end to end on real reference sample data) — and the combined
canonical output rebuilds in one pass."""

import os
from datetime import date

import pytest

from impresso_ta.importers import import_issues
from impresso_ta.rebuild import rebuild_issues_solr
from impresso_ta.rebuild.solr import split_errors
from impresso_ta.schemas import DISCOVERY_SCHEMA

BNL = (
    "/root/reference/text_preparation/data/sample_data/Luxembourg/"
    "protected_027/1497608_newspaper_armeteufel_1904-01-17"
)
TETML = "/root/reference/text_preparation/data/sample_data/Tetml/FedGazDe/1857/09/26"

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(BNL) and os.path.isdir(TETML)),
    reason="reference sample data not available",
)


def test_one_pass_imports_both_formats_and_rebuilds(spark):
    disc = spark.createDataFrame(
        [
            ("armeteufel", date(1904, 1, 17), "a", BNL, "mets_alto"),
            ("FedGazDe", date(1857, 9, 26), "a", TETML, "tetml"),
        ],
        DISCOVERY_SCHEMA,
    )
    issues, pages, errors = import_issues(disc, ts="2024-01-01T00:00:00Z")
    assert errors.count() == 0
    got = {r["id"] for r in issues.select("id").collect()}
    assert got == {"armeteufel-1904-01-17-a", "FedGazDe-1857-09-26-a"}

    ok, rb_errors = split_errors(rebuild_issues_solr(issues, pages))
    assert rb_errors.count() == 0
    per_issue = {
        r["id"][: r["id"].rindex("-i")] for r in ok.select("id").collect()
    }
    assert per_issue == {"armeteufel-1904-01-17-a", "FedGazDe-1857-09-26-a"}
    # both formats produced non-empty fulltext through the same pipeline
    from pyspark.sql import functions as F

    n_text = ok.filter(F.length("ft") > 0).count()
    assert n_text > 0
