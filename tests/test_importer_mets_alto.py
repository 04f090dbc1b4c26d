"""End-to-end import lifecycle on synthetic METS/ALTO data:
detect (S1) → filters (F1-F3) → import UDTF (S5/J5/W2) → sinks (S11/S12/
S15/S16) → rebuild. Also checks the reference's key invariant: CI IDs are
stable across runs (golden-output strategy, ref: utils.py:92-136)."""

import os

import pytest

from impresso_ta.importers import import_issues
from impresso_ta.rebuild import rebuild_issues_solr
from impresso_ta.sources import (
    alias_filter,
    date_filter,
    detect_issues,
    incremental_filter,
    manifest_stats,
    read_issues,
    read_pages,
    write_errors,
    write_issues,
    write_pages,
)

ALTO_PAGE = """<?xml version="1.0" encoding="UTF-8"?>
<alto xmlns="http://www.loc.gov/standards/alto/ns-v3#">
  <Styles>
    <TextStyle ID="TXT_0" FONTSIZE="10" FONTFAMILY="Times New Roman"/>
    <TextStyle ID="TXT_1" FONTSIZE="12" FONTFAMILY="Arial" FONTSTYLE="italics"/>
  </Styles>
  <Layout><Page ID="P1"><PrintSpace HPOS="0" VPOS="0" WIDTH="2000" HEIGHT="3000">
    <TextBlock ID="TB1" HPOS="10" VPOS="10" WIDTH="800" HEIGHT="600">
      <TextLine HPOS="10" VPOS="10" WIDTH="800" HEIGHT="40">
        <String HPOS="10" VPOS="12" WIDTH="90" HEIGHT="30" CONTENT="Bonjour" STYLEREFS="TXT_0"/>
        <String HPOS="110" VPOS="12" WIDTH="60" HEIGHT="30" CONTENT="mon" SUBS_TYPE="HypPart1" SUBS_CONTENT="monde"/>
      </TextLine>
      <TextLine HPOS="10" VPOS="55" WIDTH="800" HEIGHT="40">
        <String HPOS="10" VPOS="56" WIDTH="50" HEIGHT="30" CONTENT="de" SUBS_TYPE="HypPart2" SUBS_CONTENT="monde"/>
        <String HPOS="70" VPOS="56" WIDTH="10" HEIGHT="30" CONTENT=","/>
        <String HPOS="90" VPOS="56" WIDTH="60" HEIGHT="30" CONTENT="salut"/>
        <String VPOS="56" WIDTH="60" HEIGHT="30" CONTENT="dropme"/>
      </TextLine>
    </TextBlock>
    <TextBlock ID="TB2" HPOS="900" VPOS="10" WIDTH="800" HEIGHT="600">
      <TextLine HPOS="900" VPOS="10" WIDTH="700" HEIGHT="40">
        <String HPOS="900" VPOS="12" WIDTH="100" HEIGHT="30" CONTENT="Annonce"/>
      </TextLine>
    </TextBlock>
  </PrintSpace></Page></Layout>
</alto>
"""

METS = """<?xml version="1.0" encoding="UTF-8"?>
<mets xmlns="http://www.loc.gov/METS/" xmlns:xlink="http://www.w3.org/1999/xlink">
  <fileSec>
    <fileGrp>
      <file ID="ALTO1" SEQ="1"><FLocat xlink:href="text/0001.xml"/></file>
    </fileGrp>
  </fileSec>
  <structMap TYPE="LOGICAL">
    <div TYPE="ISSUE" ID="ISS1">
      <div TYPE="ARTICLE" ID="ART1" ORDER="1" LABEL="Un article">
        <fptr><area FILEID="ALTO1" BEGIN="TB1"/></fptr>
      </div>
      <div TYPE="ADVERTISEMENT" ID="AD1" ORDER="2">
        <fptr><area FILEID="ALTO1" BEGIN="TB2"/></fptr>
      </div>
    </div>
  </structMap>
</mets>
"""


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("corpus")
    for alias, y, m, d in [("GAZ", 1900, 1, 2), ("GAZ", 1900, 1, 3), ("ABC", 1901, 5, 6)]:
        issue_dir = base / alias / f"{y:04d}" / f"{m:02d}" / f"{d:02d}" / "a"
        (issue_dir / "text").mkdir(parents=True)
        (issue_dir / "issue-mets.xml").write_text(METS)
        (issue_dir / "text" / "0001.xml").write_text(ALTO_PAGE)
    # one broken issue: METS missing
    broken = base / "GAZ" / "1900" / "01" / "04" / "a"
    broken.mkdir(parents=True)
    return str(base)


@pytest.fixture(scope="module")
def imported(spark, corpus_dir):
    disc = detect_issues(spark, corpus_dir, "mets_alto")
    issues, pages, errors = import_issues(disc, ts="2024-01-01T00:00:00Z")
    return disc, issues.cache(), pages.cache(), errors.cache()


def test_detect_and_filters(spark, corpus_dir, imported):
    disc = imported[0]
    rows = {(r.alias, str(r.date), r.edition) for r in disc.collect()}
    assert ("GAZ", "1900-01-02", "a") in rows and len(rows) == 4
    assert alias_filter(disc, ["GAZ"]).count() == 3
    assert alias_filter(disc, ["GAZ"], exclude=True).count() == 1
    assert date_filter(disc, {"GAZ": ("1900-01-01", "1900-01-02")}).count() == 2
    done = disc.limit(1)
    assert incremental_filter(disc, done).count() == 3


def test_import_canonical_shapes(imported):
    _, issues, pages, errors = imported
    iss = {r["id"]: r.asDict(recursive=True) for r in issues.collect()}
    assert set(iss) == {"GAZ-1900-01-02-a", "GAZ-1900-01-03-a", "ABC-1901-05-06-a"}
    one = iss["GAZ-1900-01-02-a"]
    # deterministic CI numbering by (ORDER, ID) — W2
    assert [ci["m"]["id"] for ci in one["i"]] == [
        "GAZ-1900-01-02-a-i0001",
        "GAZ-1900-01-02-a-i0002",
    ]
    assert one["i"][0]["m"]["tp"] == "article"
    assert one["i"][0]["m"]["t"] == "Un article"
    assert one["i"][1]["m"]["tp"] == "advertisement"
    assert one["i"][0]["m"]["pp"] == [1]
    assert one["pp"] == ["GAZ-1900-01-02-a-p0001"]
    # legacy parts carry the OCR block mapping (J5)
    assert one["i"][0]["l"]["parts"][0]["comp_id"] == "TB1"
    # styles hoisted from ALTO
    assert {s["id"] for s in one["s"]} == {0, 1}

    pg = {r["id"]: r.asDict(recursive=True) for r in pages.collect()}
    p1 = pg["GAZ-1900-01-02-a-p0001"]
    regions = p1["r"]
    assert [reg["pOf"] for reg in regions] == [
        "GAZ-1900-01-02-a-i0001",
        "GAZ-1900-01-02-a-i0002",
    ]
    tokens = regions[0]["p"][0]["l"][0]["t"]
    # HypPart1 → trailing hyphen + hy flag
    assert tokens[1]["tx"] == "mon-" and tokens[1]["hy"] is True
    line2 = regions[0]["p"][0]["l"][1]["t"]
    assert line2[0]["nf"] == "monde"
    # token without coordinates dropped, noted
    assert all(t["tx"] != "dropme" for t in line2)
    assert any("does not have coordinates" in n for n in p1["n"])
    # style ref carried onto token
    assert tokens[0]["s"] == 0

    errs = errors.collect()
    assert len(errs) == 1 and errs[0]["canonical_path"] == "GAZ-1900-01-04-a"
    assert "METS" in errs[0]["error"]


def test_id_stability_across_runs(spark, corpus_dir, imported):
    """Golden invariant (ref utils.py:92-136): re-import yields identical
    CI ids and legacy metadata."""
    _, issues, _, _ = imported
    disc2 = detect_issues(spark, corpus_dir, "mets_alto")
    issues2, _, _ = import_issues(disc2, ts="2024-01-01T00:00:00Z")
    a = sorted(
        (r["id"], [ci["m"]["id"] for ci in r["i"]], str([ci["l"] for ci in r["i"]]))
        for r in issues.select("id", "i").collect()
    )
    b = sorted(
        (r["id"], [ci["m"]["id"] for ci in r["i"]], str([ci["l"] for ci in r["i"]]))
        for r in issues2.select("id", "i").collect()
    )
    assert a == b


def test_sinks_roundtrip_and_manifest(spark, imported, tmp_path):
    _, issues, pages, errors = imported
    out_i = str(tmp_path / "issues")
    out_p = str(tmp_path / "pages")
    out_e = str(tmp_path / "errors")
    write_issues(issues, out_i)
    write_pages(pages, out_p)
    write_errors(errors, out_e)

    # bz2 jsonl roundtrip with the fixed schema
    back_i = read_issues(spark, out_i)
    assert back_i.count() == 3
    assert {r["id"] for r in back_i.select("id").collect()} == {
        "GAZ-1900-01-02-a",
        "GAZ-1900-01-03-a",
        "ABC-1901-05-06-a",
    }
    back_p = read_pages(spark, out_p)
    assert back_p.count() == 3
    # partition layout: alias=GAZ/year=1900
    assert os.path.isdir(os.path.join(out_i, "alias=GAZ", "year=1900"))
    # error log formatting: "{canonical_path}: {error}"
    err_text = spark.read.text(out_e).collect()[0]["value"]
    assert err_text.startswith("GAZ-1900-01-04-a: ")

    stats = {
        (r["alias"], r["year"]): r.asDict()
        for r in manifest_stats(issues).collect()
    }
    assert stats[("GAZ", 1900)]["n_issues"] == 2
    assert stats[("GAZ", 1900)]["n_content_items"] == 4
    assert stats[("GAZ", 1900)]["n_pages"] == 2


def test_import_then_rebuild(spark, imported):
    """The full lifecycle: imported canonical data feeds the rebuilder."""
    _, issues, pages, _ = imported
    rebuilt = rebuild_issues_solr(issues, pages, ts="2024-01-01T00:00:00Z")
    rows = {r["id"]: r.asDict(recursive=True) for r in rebuilt.collect()}
    art = rows["GAZ-1900-01-02-a-i0001"]
    # no language on the CI → unknown-language whitespace rules (no spaces)
    assert art["ft"] == "Bonjourmonde,salut"
    assert art["tp"] == "ar"
    ad = rows["GAZ-1900-01-02-a-i0002"]
    assert ad["ft"] == "Annonce"
