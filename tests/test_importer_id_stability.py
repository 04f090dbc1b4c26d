"""W2 invariant sweep: CONTENT-ITEM IDS ARE STABLE ACROSS RUNS for every
importer, on the reference's real sample data (the reference documents
this as a hard requirement — docs/architecture.rst 'content item IDs are
expected to remain stable')."""

import os
from datetime import date

import pytest

from impresso_ta.importers import import_issues
from impresso_ta.schemas import DISCOVERY_SCHEMA

SAMPLES = "/root/reference/text_preparation/data/sample_data"

# (format, alias, date, sample subdir relative to SAMPLES)
CASES = [
    ("olive", "GDL", date(1900, 1, 2), "Olive/GDL/1900/01/02"),
    (
        "mets_alto",
        "armeteufel",
        date(1904, 1, 17),
        "Luxembourg/protected_027/1497608_newspaper_armeteufel_1904-01-17",
    ),
    ("tetml", "FedGazDe", date(1857, 9, 26), "Tetml/FedGazDe/1857/09/26"),
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLES), reason="reference sample data not available"
)


def _ids(res):
    rows = res.issues.collect()
    out = []
    for row in rows:
        d = row.asDict(recursive=True)
        out.append((d["id"], tuple(ci["m"]["id"] for ci in d["i"])))
    return sorted(out)


@pytest.mark.parametrize("fmt,alias,d,rel", CASES, ids=lambda v: str(v))
def test_ci_ids_stable_across_runs(spark, fmt, alias, d, rel):
    sample = os.path.join(SAMPLES, rel)
    if not os.path.isdir(sample):
        pytest.skip(f"sample dir missing: {rel}")
    disc = spark.createDataFrame(
        [(alias, d, "a", sample, fmt)], DISCOVERY_SCHEMA
    )
    first = _ids(import_issues(disc, ts="2024-01-01T00:00:00Z"))
    second = _ids(import_issues(disc, ts="2024-01-01T00:00:00Z"))
    assert first and first == second
    # a different wall-clock ts must not perturb ids either
    third = _ids(import_issues(disc, ts="2025-06-30T12:34:56Z"))
    assert [ids for _, ids in first] == [ids for _, ids in third]
