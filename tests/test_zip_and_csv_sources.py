"""Zip-archive issue source (S6) and CSV-manifest discovery (S3)."""

import zipfile

from impresso_ta.importers import import_issues
from impresso_ta.sources.discovery import detect_issues_from_csv
from tests.test_importer_mets_alto import ALTO_PAGE, METS


def _make_zip_issue(base, alias, y, m, d):
    issue_dir = base / alias / f"{y:04d}" / f"{m:02d}" / f"{d:02d}" / "a"
    issue_dir.mkdir(parents=True)
    with zipfile.ZipFile(issue_dir / "Document.zip", "w") as zf:
        zf.writestr("issue-mets.xml", METS)
        zf.writestr("text/0001.xml", ALTO_PAGE)
    return issue_dir


def test_zip_archive_import(spark, tmp_path):
    issue_dir = _make_zip_issue(tmp_path, "ZIP", 1920, 3, 4)
    csv = tmp_path / "manifest.csv"
    csv.write_text(
        "alias,date,edition,path\n"
        f"ZIP,1920-03-04,a,{issue_dir}\n"
        f"BAD,not-a-date,a,/nowhere\n"
    )
    disc = detect_issues_from_csv(spark, str(csv), "zip_mets_alto")
    # unparseable date dropped (S3 log-and-skip semantics)
    assert disc.count() == 1

    issues, pages, errors = import_issues(disc, ts="2024-01-01T00:00:00Z")
    iss = issues.collect()
    assert len(iss) == 1 and errors.count() == 0
    one = iss[0].asDict(recursive=True)
    assert one["id"] == "ZIP-1920-03-04-a"
    assert [ci["m"]["id"] for ci in one["i"]] == [
        "ZIP-1920-03-04-a-i0001",
        "ZIP-1920-03-04-a-i0002",
    ]
    pg = pages.collect()[0].asDict(recursive=True)
    # regions parsed from the in-memory archive, mapped to CIs
    assert [r["pOf"] for r in pg["r"]] == [
        "ZIP-1920-03-04-a-i0001",
        "ZIP-1920-03-04-a-i0002",
    ]


def test_corrupt_zip_is_error_row(spark, tmp_path):
    issue_dir = tmp_path / "ZIP" / "1920" / "03" / "05" / "a"
    issue_dir.mkdir(parents=True)
    (issue_dir / "Document.zip").write_bytes(b"this is not a zip")
    csv = tmp_path / "manifest.csv"
    csv.write_text(f"alias,date,edition,path\nZIP,1920-03-05,a,{issue_dir}\n")
    disc = detect_issues_from_csv(spark, str(csv), "zip_mets_alto")
    issues, _pages, errors = import_issues(disc)
    assert issues.count() == 0
    errs = errors.collect()
    assert len(errs) == 1 and errs[0]["canonical_path"] == "ZIP-1920-03-05-a"


def test_apply_import_config_modes(spark):
    import datetime

    from impresso_ta.schemas import DISCOVERY_SCHEMA
    from impresso_ta.sources.discovery import apply_import_config

    rows = [
        ("GDL", datetime.date(1900, 1, 2), "a", "/x/gdl1", "mets_alto"),
        ("GDL", datetime.date(1950, 6, 1), "a", "/x/gdl2", "mets_alto"),
        ("IMP", datetime.date(1900, 1, 2), "a", "/x/imp1", "mets_alto"),
        ("EXP", datetime.date(1910, 3, 4), "a", "/x/exp1", "mets_alto"),
    ]
    disc = spark.createDataFrame(rows, DISCOVERY_SCHEMA)

    # exclude mode: drop aliases, no date filtering
    out = apply_import_config(disc, {"titles": {}, "exclude_titles": ["GDL"]})
    assert {r["alias"] for r in out.collect()} == {"IMP", "EXP"}

    # include mode with range string
    out = apply_import_config(
        disc, {"titles": {"GDL": "1899/01/01-1940/12/31"}, "exclude_titles": []}
    )
    assert [r["path"] for r in out.collect()] == ["/x/gdl1"]

    # include mode, exact-date list
    out = apply_import_config(
        disc,
        {"titles": {"IMP": ["1900/01/02"], "EXP": []}, "exclude_titles": []},
    )
    assert {r["alias"] for r in out.collect()} == {"IMP", "EXP"}

    # year_only range
    out = apply_import_config(
        disc,
        {"titles": {"GDL": "1950/05/05-1950/06/06"}, "exclude_titles": [],
         "year_only": True},
    )
    assert [r["path"] for r in out.collect()] == ["/x/gdl2"]
