"""ONB ANNOP discovery (the implemented half of the reference's
onb_annop importer — its classes.py is empty): ANNO layout walk, no
edition level, numeric-stem page ids sorted by int."""

from impresso_ta.sources.discovery import detect_issues_onb


def _tree(base):
    issue = base / "ANNO" / "nwb" / "1874" / "01" / "06"
    issue.mkdir(parents=True)
    # numeric stems, deliberately unpadded so lexical sort would be wrong
    for stem in ("2", "10", "1"):
        (issue / f"{stem}.xml").write_text("<alto/>")
    (issue / "notes.txt").write_text("ignored")
    other = base / "ANNO" / "aze" / "1900" / "12" / "31"
    other.mkdir(parents=True)
    (other / "00000001.xml").write_text("<alto/>")


def test_onb_discovery(spark, tmp_path):
    _tree(tmp_path)
    disc, pages = detect_issues_onb(spark, str(tmp_path))
    got = {(r["alias"], str(r["date"]), r["edition"]) for r in disc.collect()}
    assert got == {("nwb", "1874-01-06", "a"), ("aze", "1900-12-31", "a")}
    assert {r["format"] for r in disc.collect()} == {"onb_annop"}

    by_issue = {}
    for r in pages.collect():
        by_issue.setdefault(r["page_id"].rsplit("-p", 1)[0], []).append(
            (r["page_id"], r["file"])
        )
    # numeric page order: 1.xml, 2.xml, 10.xml → p0001, p0002, p0010
    assert by_issue["nwb-1874-01-06-a"] == [
        ("nwb-1874-01-06-a-p0001", "1.xml"),
        ("nwb-1874-01-06-a-p0002", "2.xml"),
        ("nwb-1874-01-06-a-p0010", "10.xml"),
    ]
    assert by_issue["aze-1900-12-31-a"] == [
        ("aze-1900-12-31-a-p0001", "00000001.xml")
    ]
