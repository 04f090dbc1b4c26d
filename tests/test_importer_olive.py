"""Olive importer vs the reference's own golden outputs — the reference's
golden-output invariant (ref: utils.py:92-136 verify_imported_issues):
CI ID sets equal + legacy metadata identical, per issue."""

import ast
import json
import os
from datetime import date

import pytest

from impresso_ta.importers import import_issues
from impresso_ta.rebuild import rebuild_issues_solr
from impresso_ta.schemas import DISCOVERY_SCHEMA

SAMPLE_BASE = "/root/reference/text_preparation/data/sample_data/Olive"
GOLDEN_BASE = (
    "/root/reference/text_preparation/data/out/canonical_out/expected/Olive"
)

# only these sample issues ship with their Document/ OCR content
CASES = [
    ("GDL", date(1900, 1, 2)),
    ("IMP", date(1901, 9, 3)),
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLE_BASE), reason="reference sample data not available"
)


def _norm_legacy_id(v):
    # golden stores lists; the canonical schema stores their string form
    if isinstance(v, str) and v.startswith("["):
        return ast.literal_eval(v)
    return v


@pytest.mark.parametrize("alias,d", CASES, ids=lambda v: str(v))
def test_golden_ci_ids(spark, alias, d):
    sample = os.path.join(
        SAMPLE_BASE, alias, f"{d.year:04d}", f"{d.month:02d}", f"{d.day:02d}"
    )
    issue_id = f"{alias}-{d.isoformat()}-a"
    golden_path = os.path.join(GOLDEN_BASE, f"{issue_id}-issue.json")
    if not (os.path.isdir(sample) and os.path.isfile(golden_path)):
        pytest.skip("sample or golden missing")

    disc = spark.createDataFrame(
        [(alias, d, "a", sample, "olive")], DISCOVERY_SCHEMA
    )
    res = import_issues(disc, ts="2024-01-01T00:00:00Z")
    assert res.errors.count() == 0
    mine = {
        ci["m"]["id"]: ci
        for ci in res.issues.collect()[0].asDict(recursive=True)["i"]
    }
    gold = {ci["m"]["id"]: ci for ci in json.load(open(golden_path))["i"]}

    # golden invariant 1: identical CI ID sets
    assert set(mine) == set(gold)
    # golden invariant 2: FULL legacy metadata identical (the reference's
    # verify_imported_issues asserts l-equality, utils.py:114-131) —
    # ids (incl. multipart lists) and sources
    for k in gold:
        assert _norm_legacy_id(mine[k]["l"]["id"]) == gold[k]["l"]["id"], k
        if gold[k]["l"].get("source") is not None:
            assert (
                _norm_legacy_id(mine[k]["l"]["source"])
                == gold[k]["l"]["source"]
            ), k
    # page lists and types match
    for k in gold:
        assert mine[k]["m"]["pp"] == gold[k]["m"]["pp"], k
        assert mine[k]["m"]["tp"] == gold[k]["m"]["tp"], k


def test_olive_rebuild(spark):
    sample = os.path.join(SAMPLE_BASE, "GDL", "1900", "01", "02")
    disc = spark.createDataFrame(
        [("GDL", date(1900, 1, 2), "a", sample, "olive")], DISCOVERY_SCHEMA
    )
    res = import_issues(disc, ts="2024-01-01T00:00:00Z")
    rb = rebuild_issues_solr(res.issues, res.pages, ts="2024-01-01T00:00:00Z")
    rows = {r["id"]: r.asDict(recursive=True) for r in rb.collect()}
    art = rows["GDL-1900-01-02-a-i0001"]
    # multi-word qid tokens merged (X3) and French rules applied
    assert art["ft"].startswith("Lausanne, 2 janvier 1900")
    assert "installé" in art["ft"]  # Q/q/QW pseudo-token merge
    assert len(art["ft"]) > 5000
    with_text = sum(1 for r in rows.values() if r.get("ft"))
    assert with_text >= 75
