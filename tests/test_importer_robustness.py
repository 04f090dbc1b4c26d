"""Error-channel robustness: malformed inputs become error ROWS in the
reference's `{path}: {error}` format — the job never throws (SURVEY §7
risk 5; ref core.py:110-179 continues past bad issues)."""

from impresso_ta.importers import import_issues
from impresso_ta.sources.discovery import detect_issues


def _mk_issue_dir(root, alias="GDL", date="1900-01-02", edition="a"):
    d = root / alias / date.replace("-", "/") / edition
    d.mkdir(parents=True)
    return d


def test_malformed_mets_is_error_row(spark, tmp_path):
    d = _mk_issue_dir(tmp_path)
    (d / "GDL-1900-01-02-a-mets.xml").write_text("<mets:mets unclosed")
    disc = detect_issues(spark, str(tmp_path), "mets_alto")
    issues, pages, errors = import_issues(disc)
    assert issues.count() == 0
    errs = errors.collect()
    assert len(errs) == 1
    assert "mets" in errs[0]["error"].lower() or ":" in errs[0]["error"]


def test_truncated_alto_page_is_error_row(spark, tmp_path):
    d = _mk_issue_dir(tmp_path)
    (d / "GDL-1900-01-02-a-mets.xml").write_text(
        """<?xml version="1.0" encoding="utf-8"?>
<mets xmlns="http://www.loc.gov/METS/" xmlns:xlink="http://www.w3.org/1999/xlink">
  <structMap TYPE="logical">
    <div><div TYPE="ARTICLE" ID="MODSMD_ARTICLE1" LABEL="T" ORDER="1">
      <div TYPE="BODY"><div TYPE="BODY_CONTENT">
        <fptr><area FILEID="ALTO1" BEGIN="P1_TB1"/></fptr>
      </div></div>
    </div></div>
  </structMap>
  <fileSec><fileGrp>
    <file ID="ALTO1"><FLocat xlink:href="text/GDL-1900-01-02-a-p0001.xml"/></file>
  </fileGrp></fileSec>
</mets>"""
    )
    t = d / "text"
    t.mkdir()
    (t / "GDL-1900-01-02-a-p0001.xml").write_text("<alto><Layout><Page")
    disc = detect_issues(spark, str(tmp_path), "mets_alto")
    issues, pages, errors = import_issues(disc)
    errs = errors.collect()
    # the broken page fails its issue into the error channel; the job
    # itself never throws
    assert len(errs) == 1
    assert errs[0]["canonical_path"] == "GDL-1900-01-02-a"
    assert "ParseError" in errs[0]["error"]
    assert issues.count() == 0


def test_empty_directory_yields_nothing(spark, tmp_path):
    (tmp_path / "GDL").mkdir()
    disc = detect_issues(spark, str(tmp_path), "mets_alto")
    assert disc.count() == 0


def test_read_retries_transient_ioerror(tmp_path):
    from impresso_ta.importers.base import read_bytes_with_retries

    target = tmp_path / "page.xml"
    target.write_bytes(b"<alto/>")
    calls = {"n": 0}

    def flaky_opener(path, mode):
        calls["n"] += 1
        if calls["n"] < 3:
            raise IOError("transient")
        return open(path, mode)

    assert read_bytes_with_retries(str(target), _opener=flaky_opener) == b"<alto/>"
    assert calls["n"] == 3

    calls["n"] = -100  # always fails within 3 attempts
    import pytest as _pytest

    with _pytest.raises(IOError):
        read_bytes_with_retries(str(target), _opener=flaky_opener)
